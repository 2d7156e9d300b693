"""Sharded-scan determinism: 1-shard vs N-shard byte-exactness — the mirror
of the reference's threads=1 vs threads=8 test (test_krep.c:1071-1106)."""

import numpy as np
import pytest

import naive


def _need_devices(n):
    import jax

    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices (virtual CPU mesh)")


def test_dryrun_8dev():
    from krep_tpu.parallel import mesh

    _need_devices(8)
    mesh.dryrun(8)


@pytest.mark.parametrize("pat", [b"the", b"e", b"th", b"quick", b"aaa"])
def test_sharded_vs_single(pat):
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    _need_devices(8)

    text = naive.gen_english(3, 50_000)
    data = np.frombuffer(text, np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    mc, lc = pmesh.sharded_counts(data, pat, mesh=m)
    starts = naive.all_starts(text, pat)
    assert mc == len(starts), pat
    assert lc == naive.matched_lines(text, starts), pat


def test_search_string_routes_to_mesh():
    """search_string on ≥64KiB inputs under a multi-device backend goes
    through the sharded path; results must equal naive/oracle semantics."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    text = naive.gen_english(8, 200_000)
    # positions mode (bm semantics: ALL)
    p = SearchParams(patterns=(b"the",), algo_override="bm")
    r = search_string(p, text)
    want = naive.all_starts(text, b"the")
    assert r.positions[:, 0].tolist() == want
    # count lines
    p2 = SearchParams(patterns=(b"the",), count_mode=True)
    r2 = search_string(p2, text)
    assert r2.count == naive.matched_lines(text, want)
    # nonoverlap policy + max_count through the sharded path
    p3 = SearchParams(patterns=(b"aa",), algo_override="kmp", only_matching=True, max_count=7)
    r3 = search_string(p3, text)
    g = naive.greedy_nonoverlap(naive.all_starts(text, b"aa"), 2)[:7]
    assert r3.positions[:, 0].tolist() == g
    # whole word + case-insensitive
    p4 = SearchParams(patterns=(b"THE",), case_sensitive=False, whole_word=True,
                      count_mode=True, only_matching=True)
    r4 = search_string(p4, text)
    assert r4.count == len(naive.all_starts(text, b"THE", case_sensitive=False, whole_word=True))


def test_boundary_spanning_lines():
    """Lines and matches that straddle shard boundaries are counted once."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    _need_devices(8)

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
