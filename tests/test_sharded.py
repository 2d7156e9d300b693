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


def test_sharded_multi_pattern_vs_single():
    """Fused K-pattern sharded scan: totals, union line counts, and union
    starts must equal the unsharded union semantics — including mixed
    pattern lengths whose halo overlap differs per member."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    _need_devices(8)

    text = naive.gen_english(5, 60_000)
    data = np.frombuffer(text, np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    for pats in [
        (b"the", b"quick"),
        (b"the", b"e", b"brown fox jumps over"),  # 1..20 byte mix
        (b"a", b"aa", b"aaa"),                    # nested overlaps
    ]:
        mc, lc, starts = pmesh.sharded_scan(data, pats, want_mask=True, mesh=m)
        per = [naive.all_starts(text, p) for p in pats]
        union = sorted(set().union(*[set(s) for s in per]))
        assert mc == sum(len(s) for s in per), pats
        assert lc == naive.matched_lines(text, union), pats
        assert starts.tolist() == union, pats


def test_sharded_multi_pattern_whole_word_boundaries():
    """Whole-word multi-pattern at shard boundaries (prev-byte carry)."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    _need_devices(8)

    # shard = cdiv(4000, 8) = 500; plant word/non-word straddles
    body = bytearray(b" x" * 2000)
    for pos in [496, 499, 500, 1000, 1499]:
        body[pos : pos + 3] = b"cat"
    body[520:523] = b"dog"
    text = bytes(body)
    data = np.frombuffer(text, np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    pats = (b"cat", b"dog")
    mc, lc, starts = pmesh.sharded_scan(
        data, pats, whole_word=True, want_mask=True, mesh=m
    )
    per = [naive.all_starts(text, p, whole_word=True) for p in pats]
    union = sorted(set().union(*[set(s) for s in per]))
    assert mc == sum(len(s) for s in per)
    assert starts.tolist() == union


def test_search_multi_routes_to_mesh():
    """search_string with -f style multi-pattern on ≥64KiB inputs under a
    multi-device backend goes through the sharded path; positions and
    -m truncation must stay AC-emission exact."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    text = naive.gen_english(9, 150_000)
    pats = (b"the", b"quick", b"fox")
    p = SearchParams(patterns=pats, only_matching=True)
    r = search_string(p, text)
    want = []
    for pk in pats:
        want += [(s, s + len(pk)) for s in naive.all_starts(text, pk)]
    want.sort()
    assert [tuple(row) for row in r.positions.tolist()] == want

    # -m truncates in AC emission order (end asc, start asc)
    p2 = SearchParams(patterns=pats, only_matching=True, max_count=17)
    r2 = search_string(p2, text)
    emis = sorted(want, key=lambda se: (se[1], se[0]))[:17]
    emis.sort()
    assert [tuple(row) for row in r2.positions.tolist()] == emis

    # -c over the union of lines
    p3 = SearchParams(patterns=pats, count_mode=True)
    r3 = search_string(p3, text)
    union = sorted(set(s for s, _ in want))
    assert r3.count == naive.matched_lines(text, union)


def test_sharded_long_pattern_routes_to_mesh():
    """128-byte pattern: the device prefix filter shards across the mesh,
    host verification completes the match (krep.c SIMD_MAX_PATTERN_LEN
    handoff, krep.c:99-113)."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    longpat = (b"0123456789abcdef" * 8)  # 128 bytes
    body = bytearray(naive.gen_english(11, 120_000))
    body[5_000 : 5_128] = longpat
    body[63_990 : 64_118] = longpat  # straddles a shard boundary
    body[100_000 : 100_128] = longpat
    text = bytes(body)
    p = SearchParams(patterns=(longpat,), only_matching=True)
    r = search_string(p, text)
    assert r.positions[:, 0].tolist() == naive.all_starts(text, longpat)


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


def test_threads_flag_shapes_mesh():
    """-t maps onto the device mesh like the reference's chunk-thread count:
    -t 1 forces the single-device path; -t N caps shards at N; all settings
    agree with naive semantics (the threads=1 vs threads=8 determinism test,
    test_krep.c:1071-1106)."""
    from krep_tpu import SearchParams
    from krep_tpu.engine import search as sm

    _need_devices(8)

    text = naive.gen_english(21, 120_000)
    want = naive.all_starts(text, b"the")
    lines = naive.matched_lines(text, want)
    results = []
    for t in [None, 1, 2, 8, 99]:
        p = SearchParams(patterns=(b"the",), count_mode=True)
        r = sm.search_string(p, text, threads=t)
        results.append(r.count)
    assert all(c == lines for c in results), results

    # positions identical across thread settings
    p2 = SearchParams(patterns=(b"the",), algo_override="bm")
    pos = [sm.search_string(p2, text, threads=t).positions[:, 0].tolist()
           for t in [1, 3, 8]]
    assert pos[0] == pos[1] == pos[2] == want


def test_threads_flag_multi_pattern():
    """-t caps the mesh for the AC/multi-pattern path too (the reference's
    chunk threads share one AC trie, krep.c:2524-2536)."""
    from krep_tpu import SearchParams
    from krep_tpu.engine import search as sm

    _need_devices(8)

    text = naive.gen_english(23, 150_000)
    pats = (b"the", b"and", b"of")
    want = sum(len(naive.all_starts(text, p)) for p in pats)
    for t in [None, 1, 3, 8]:
        p = SearchParams(patterns=pats, count_mode=True, only_matching=True)
        assert sm.search_string(p, text, threads=t).count == want, t


def test_sharded_mxu_count_matches_single_device():
    """mesh.sharded_count (per-shard MXU bit-matmul, start_limit-bounded
    owned regions) must equal the single-device total, including matches
    spanning shard boundaries."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as mesh_mod

    _need_devices(8)

    text = naive.gen_english(37, 400_000)
    pats = tuple(
        text[i : i + 3 + (i % 5)] for i in range(0, 3 * 40, 3)
    )
    want = sum(len(naive.all_starts(text, p)) for p in pats)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    got = mesh_mod.sharded_count(
        np.frombuffer(text, np.uint8), pats, mesh=m, interpret=True
    )
    assert got == want


def test_sharded_mxu_whole_word_shard_boundaries():
    """per-shard MXU whole-word counting: the left boundary at a shard
    start must see the previous shard's last byte (prev_words) and the
    right boundary must read into the forward halo — both planted at the
    exact shard edge."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as mesh_mod

    _need_devices(8)

    body = bytearray(naive.gen_english(51, 400_000))
    shard = 400_000 // 8  # NOTE: build_shards_staged rounds S up to 64 KiB
    S = 65536
    # word char immediately before shard 1's first byte, 'cat' at its start
    body[S - 1 : S + 3] = b"xcat"
    # 'cat' ending exactly at shard 2's boundary, word char just after (in
    # shard 2's owned region, read via shard 1's forward halo)
    body[2 * S - 3 : 2 * S + 1] = b"cats"
    # a clean word match straddling shard 3's boundary
    body[3 * S - 1 : 3 * S + 4] = b" cat "
    text = bytes(body)
    pats = (b"cat",) + tuple(
        text[13 * i : 13 * i + 3 + (i % 5)] for i in range(40)
    )
    want = sum(
        len(naive.all_starts(text, p, whole_word=True)) for p in pats
    )
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    got = mesh_mod.sharded_count(
        np.frombuffer(text, np.uint8), pats, whole_word=True, mesh=m,
        interpret=True,
    )
    assert got == want


def test_sharded_mxu_count_two_window_long_members():
    """the per-shard MXU route with 14..29-byte members (two-window AND):
    boundary-spanning long matches must still count exactly once."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as mesh_mod

    _need_devices(8)

    body = bytearray(naive.gen_english(13, 400_000))
    pat = b"ABCDEFGHIJKLMNOPQRSTUVWXY"  # 25 bytes
    shard = 400_000 // 8
    body[shard - 12 : shard + 13] = pat       # straddles shard 0/1
    body[5 * shard - 3 : 5 * shard + 22] = pat
    text = bytes(body)
    pats = (pat,) + tuple(
        text[11 * i : 11 * i + 4 + (i % 26)] for i in range(40)
    )
    want = sum(len(naive.all_starts(text, p)) for p in pats)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    got = mesh_mod.sharded_count(
        np.frombuffer(text, np.uint8), pats, mesh=m, interpret=True
    )
    assert got == want


def _gen_patterns(text, k, seed, min_len=2, max_len=10):
    """k distinct corpus-derived patterns (mostly hitting)."""
    rng = np.random.default_rng(seed)
    n = len(text)
    pats = []
    while len(pats) < k:
        m = int(rng.integers(min_len, max_len))
        s = int(rng.integers(0, n - m))
        p = text[s : s + m].replace(b"\n", b"x").replace(b"\x00", b"y")
        if p and p not in pats:
            pats.append(p)
    return tuple(pats)


def test_sharded_large_k_positions_1_vs_8():
    """VERDICT r2 item 6: K=128 POSITION queries shard across the mesh via
    grouped fused scans + host attribution; 8-device output must be
    byte-exact with the single-device path (threads=1), every mode."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    text = naive.gen_english(21, 150_000)
    pats = _gen_patterns(text, 128, seed=5)
    for mode in [
        {"only_matching": True},
        {"only_matching": True, "max_count": 23},
        {},
        {"count_mode": True},
        {"count_mode": True, "only_matching": True},
    ]:
        p = SearchParams(patterns=pats, **mode)
        r8 = search_string(p, text)            # grouped sharded route
        r1 = search_string(p, text, threads=1)  # single-device route
        assert r8.count == r1.count, mode
        assert np.array_equal(r8.positions, r1.positions), mode


def test_sharded_whole_word_large_k():
    """Whole-word sets beyond FUSED_MAX shard via grouped scans; the host
    attribution enforces exact word boundaries."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    text = naive.gen_english(22, 100_000)
    pats = _gen_patterns(text, 80, seed=9, min_len=3, max_len=7)
    p = SearchParams(patterns=pats, whole_word=True, only_matching=True)
    r8 = search_string(p, text)
    r1 = search_string(p, text, threads=1)
    assert r8.count == r1.count
    assert np.array_equal(r8.positions, r1.positions)
    # spot-check against naive union semantics
    want = []
    for pk in set(pats):
        want += [(s, s + len(pk)) for s in naive.all_starts(text, pk, whole_word=True)]
    want = sorted(want)
    assert [tuple(row) for row in r8.positions.tolist()] == want


def test_sharded_mixed_long_members():
    """A set mixing short members and a >64-byte member takes the grouped
    sharded route (long member scanned by prefix, verified host-side)."""
    from krep_tpu import SearchParams, search_string

    _need_devices(8)

    longpat = bytes(range(33, 123))  # 90 bytes
    body = bytearray(naive.gen_english(23, 120_000))
    body[10_000 : 10_090] = longpat
    body[63_960 : 64_050] = longpat  # straddles the 8-way shard boundary
    text = bytes(body)
    pats = (longpat, b"the", b"fox")
    for mode in [
        {"only_matching": True},
        {"count_mode": True},
        {"count_mode": True, "only_matching": True},
    ]:
        p = SearchParams(patterns=pats, **mode)
        r8 = search_string(p, text)
        r1 = search_string(p, text, threads=1)
        assert r8.count == r1.count, mode
        assert np.array_equal(r8.positions, r1.positions), mode
    want = []
    for pk in pats:
        want += [(s, s + len(pk)) for s in naive.all_starts(text, pk)]
    want.sort()
    p = SearchParams(patterns=pats, only_matching=True)
    assert [tuple(row) for row in search_string(p, text).positions.tolist()] == want
