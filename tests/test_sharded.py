"""Sharded-scan determinism: 1-shard vs N-shard byte-exactness — the mirror
of the reference's threads=1 vs threads=8 test (test_krep.c:1071-1106)."""

import numpy as np
import pytest

import naive


def test_dryrun_8dev():
    import jax

    from krep_tpu.parallel import mesh

    assert len(jax.devices()) >= 8
    mesh.dryrun(8)


@pytest.mark.parametrize("pat", [b"the", b"e", b"th", b"quick", b"aaa"])
def test_sharded_vs_single(pat):
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    text = naive.gen_english(3, 50_000)
    data = np.frombuffer(text, np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    mc, lc = pmesh.sharded_counts(data, pat, mesh=m)
    starts = naive.all_starts(text, pat)
    assert mc == len(starts), pat
    assert lc == naive.matched_lines(text, starts), pat


def test_boundary_spanning_lines():
    """Lines and matches that straddle shard boundaries are counted once."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    # one long line containing matches everywhere: line count must be 1
    text = b"the " * 1000  # no newline at all
    data = np.frombuffer(text, np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    mc, lc = pmesh.sharded_counts(data, b"the", mesh=m)
    assert mc == 1000
    assert lc == 1

    # matches exactly at shard boundaries (shard = cdiv(4000,8) = 500)
    text2 = bytearray(b"x" * 4000)
    for pos in [498, 499, 500, 998, 1999, 3998]:
        text2[pos : pos + 2] = b"ab"
    data2 = np.frombuffer(bytes(text2), np.uint8)
    mc2, lc2 = pmesh.sharded_counts(data2, b"ab", mesh=m)
    want = naive.all_starts(bytes(text2), b"ab")
    assert mc2 == len(want)
    assert lc2 == naive.matched_lines(bytes(text2), want)
