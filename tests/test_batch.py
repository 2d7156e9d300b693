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
