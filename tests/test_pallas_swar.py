"""SWAR kernel (pallas_swar) vs naive, interpret mode on CPU."""

import numpy as np
import pytest

import naive
from krep_tpu.ops import dispatch, pallas_swar


def run_swar(text: bytes, pattern: bytes, **kw):
    st = dispatch.stage(text)
    want_mask = kw.pop("want_mask", True)
    c, l, mask = pallas_swar.scan_literal(
        st.u32, st.true_len, pattern=pattern, want_mask=want_mask,
        interpret=True, **kw
    )
    starts = None
    if want_mask:
        mk = np.asarray(mask).view(np.uint8)
        starts = np.flatnonzero(mk[: len(text)]).tolist()
    return int(c), int(l), starts


CASES = [
    (b"abababa", b"aba"),
    (b"aaaaa", b"aa"),
    (b"the theme thread\nthe end", b"the"),
    (b"hello", b"hello"),
    (b"x" * 100000 + b"needle" + b"y" * 100000, b"needle"),
    (b"z" * 300000, b"zz"),
]


@pytest.mark.parametrize("text,pat", CASES)
def test_counts_and_mask(text, pat):
    c, l, starts = run_swar(text, pat)
    want = naive.all_starts(text, pat)
    assert starts == want
    assert c == len(want)
    assert l == naive.matched_lines(text, want)


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("ww", [True, False])
def test_random_corpus_modes(cs, ww):
    text = naive.gen_corpus(21, 300_000)  # spans two 256KiB tiles
    for pat in [b"the", b"e", b"TH", b"quick", b"e q", b"ck the"]:
        c, l, starts = run_swar(text, pat, case_sensitive=cs, whole_word=ww)
        want = naive.all_starts(text, pat, case_sensitive=cs, whole_word=ww)
        assert starts == want, (pat, cs, ww)
        assert c == len(want)
        assert l == naive.matched_lines(text, want)


def test_all_phases():
    """Matches at every byte phase mod 4 and across element boundaries."""
    body = bytearray(b"." * 4096)
    for pos in [0, 1, 2, 3, 125, 126, 127, 128, 129, 510, 511, 512, 513]:
        body[pos : pos + 5] = b"match"
    text = bytes(body)
    c, l, starts = run_swar(text, b"match")
    want = naive.all_starts(text, b"match")
    assert starts == want


def test_sparse_skip_path():
    """Tiles without candidates take the cheap path; line carry must still
    propagate across them."""
    T = 512 * 512  # one SWAR tile covers 256 KiB
    text = b"ab" + b" " * T + b"\n" + b" " * T + b"ab ab\n xx ab"
    c, l, starts = run_swar(text, b"ab")
    want = naive.all_starts(text, b"ab")
    assert starts == want
    assert l == naive.matched_lines(text, want)


def test_long_pattern_element_shifts():
    pat = bytes(range(33, 97))  # 64 bytes: the kernel's unroll budget
    text = b"z" * 70001 + pat + b"z" * 70002 + pat
    c, l, starts = run_swar(text, pat)
    assert c == 2
    assert starts == naive.all_starts(text, pat)


def test_over_64_rejected_and_routed():
    """>64B patterns raise in the kernel and route through the prefix-
    filter + host-verify path in the engine."""
    import pytest as _pytest

    pat = bytes(range(33, 118))  # 85 bytes
    text = b"z" * 70001 + pat + b"z" * 70002 + pat + b"z" * 10
    with _pytest.raises(NotImplementedError):
        run_swar(text, pat)

    from krep_tpu import SearchParams, search_string

    p = SearchParams(patterns=(pat,), only_matching=True)
    r = search_string(p, text)
    assert r.positions[:, 0].tolist() == naive.all_starts(text, pat)
    p2 = SearchParams(patterns=(pat,), count_mode=True, only_matching=True)
    assert search_string(p2, text).count == 2  # matches
    p2l = SearchParams(patterns=(pat,), count_mode=True)
    assert search_string(p2l, text).count == 1  # the text is one line
    # mixed multi-pattern set with a long member
    p3 = SearchParams(patterns=(pat, b"zz"), only_matching=True, count_mode=True)
    want = len(naive.all_starts(text, pat)) + len(naive.all_starts(text, b"zz"))
    assert search_string(p3, text).count == want


def test_case_fold_swar_high_bytes():
    """SWAR fold must not corrupt bytes ≥ 0x80 or near-Z boundary bytes."""
    text = bytes([0x40, 0x41, 0x5A, 0x5B, 0x60, 0x61, 0x7A, 0x7B, 0x80, 0xC1, 0xFF, 0x0A]) * 1000
    for pat in [b"A", b"a", b"\xc1", b"Z", b"["]:
        c, l, starts = run_swar(text, pat, case_sensitive=False)
        want = naive.all_starts(text, pat, case_sensitive=False)
        assert starts == want, pat


def test_scan_shard_stats():
    """Per-shard stats for the multi-chip line merge (scan_shard)."""
    import jax.numpy as jnp

    def stats(text, pat, ww=False, prev=0):
        st = dispatch.stage(text)
        c, f, trail, lead, hasnl, _ = pallas_swar.scan_shard(
            st.u32, st.true_len, jnp.int32(prev), pattern=pat,
            whole_word=ww, interpret=True,
        )
        return int(c), int(f), int(trail), int(lead), int(hasnl)

    assert stats(b"xx ab yy\nab zz", b"ab") == (2, 2, 1, 1, 1)
    assert stats(b"xx\nab", b"ab") == (1, 1, 1, 0, 1)
    assert stats(b"ab xx", b"ab") == (1, 1, 1, 1, 0)
    assert stats(b"xx yy", b"ab") == (0, 0, 0, 0, 0)
    assert stats(b"zz\nxx ab\nyy", b"ab") == (1, 1, 0, 0, 1)
    # word-char carry from the previous shard's last byte
    assert stats(b"ab cd", b"ab", ww=True, prev=1)[0] == 0
    assert stats(b"ab cd", b"ab", ww=True, prev=0)[0] == 1
    # lead survives across a match-free leading tile
    text = b" " * 600_000 + b"ab" + b"\n zz"
    assert stats(text, b"ab") == (1, 1, 0, 1, 1)


def test_word_boundary_across_tiles():
    T = 512 * 512
    body = bytearray(b" " * (T + 4096))
    body[T - 2 : T + 3] = b"word_"
    body[T + 10 : T + 14] = b"word"
    text = bytes(body)
    c, l, starts = run_swar(text, b"word", whole_word=True)
    want = naive.all_starts(text, b"word", whole_word=True)
    assert starts == want


def test_count_only_path_matches_mask_path():
    """The packing-free count-only path (want_mask=False, want_lines=False)
    must agree with the mask path's popcount for K patterns."""
    import jax.numpy as jnp

    text = naive.gen_corpus(31, 200_000)
    st = dispatch.stage(text)
    pats = (b"the", b"quick", b"e", b"ab")
    c_mask, _, mask = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats,
        want_mask=True, want_lines=False, interpret=True,
    )
    c_only, _, _ = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats,
        want_mask=False, want_lines=False, interpret=True,
    )
    want = sum(len(naive.all_starts(text, p)) for p in pats)
    assert int(c_only) == want
    assert int(c_mask) == want


def test_mask_kind_first_line():
    """mask_kind='first_line' flags exactly the -c dedup events."""
    text = b"the cat the dog\nno match\nthe end\n" * 500
    st = dispatch.stage(text)
    _, lines, mask = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=(b"the",),
        want_mask=True, want_lines=True, mask_kind="first_line",
        interpret=True,
    )
    mk = np.asarray(mask).view(np.uint8)[: len(text)]
    flagged = np.flatnonzero(mk)
    starts = naive.all_starts(text, b"the")
    # one flag per matched line, at that line's first match
    nl = np.flatnonzero(np.frombuffer(text, np.uint8) == 10)
    import collections

    first_by_line = {}
    for s in starts:
        li = int(np.searchsorted(nl, s, side="left"))
        first_by_line.setdefault(li, s)
    assert flagged.tolist() == sorted(first_by_line.values())
    assert int(lines) == len(first_by_line)


def test_packed_scan_cross_tile_carry():
    """The bit-packed (A,B) lane scan (32 rows/word) must preserve exact
    line accounting across grid tiles: 1 MiB -> two 1024-row tiles, with
    a line spanning the tile boundary and dense matches."""
    rng = np.random.default_rng(3)
    text = rng.choice(list(b"the quick brown fox\n"), size=1 << 20).astype(
        np.uint8
    ).tobytes()
    for pat in (b"e", b"the"):
        c, l, starts = run_swar(text, pat, want_mask=False)
        want = naive.all_starts(text, pat)
        assert c == len(want)
        assert l == naive.matched_lines(text, want)


def test_no_tail_guard_exact_on_fresh_staging():
    """assume_zero_tail elides the start-bound compares; on fresh staging
    (zero tail) every NUL-free pattern must still produce identical counts,
    lines, and masks — including matches ending exactly at true_len and
    patterns as long as the tail padding."""
    rng = np.random.default_rng(77)
    base = naive.gen_english(13, 60_000)
    for text in [base, base[:-1] + b"e", b"needle" * 100, b"ab"]:
        for pat in [b"the", b"e", base[-7:], b"needle", b"ab"]:
            st = dispatch.stage(text)
            outs = []
            for azt in (False, True):
                c, l, mask = pallas_swar.scan_literal(
                    st.u32, st.true_len, pattern=pat, want_mask=True,
                    interpret=True, assume_zero_tail=azt,
                )
                mk = np.asarray(mask).view(np.uint8)[: len(text)]
                outs.append((int(c), int(l), mk.tolist()))
            assert outs[0] == outs[1], (pat, len(text))
            want = naive.all_starts(text, pat)
            assert outs[0][0] == len(want), (pat, len(text))


def test_no_tail_guard_rejected_for_nul_patterns():
    """A NUL-containing pattern could match the zero padding; the flag must
    silently keep the guard (exactness over speed)."""
    text = b"a\x00b" * 1000
    st = dispatch.stage(text)
    pat = b"a\x00b"
    c, _, _ = pallas_swar.scan_literal(
        st.u32, st.true_len, pattern=pat, want_mask=False, want_lines=False,
        interpret=True, assume_zero_tail=True,
    )
    assert int(c) == len(naive.all_starts(text, pat))


def test_want_count_false_lines_exact():
    """want_count=False (the -c fast path) must keep the line count exact
    while reporting count=0."""
    text = naive.gen_english(14, 80_000)
    st = dispatch.stage(text)
    c, l, _ = pallas_swar.scan_literal(
        st.u32, st.true_len, pattern=b"the", want_mask=False,
        want_lines=True, interpret=True, want_count=False,
        assume_zero_tail=True,
    )
    want = naive.all_starts(text, b"the")
    assert int(c) == 0
    assert int(l) == naive.matched_lines(text, want)


def test_blockmul_subtile_carry_exact(monkeypatch):
    """KREP_TPU_BLOCKMUL=2 fetches a 2x block per grid step and walks it as
    TWO in-kernel sub-tiles sharing the SMEM carries — the measured-and-
    rejected knob must stay parity-exact, including the line-state carry
    chaining between sub-tiles of one block."""
    monkeypatch.setenv("KREP_TPU_TILE", "128")
    monkeypatch.setenv("KREP_TPU_BLOCKMUL", "2")
    text = naive.gen_english(33, 256 * 1024)
    st = dispatch.stage(text)
    for pat in [b"the", b"e"]:
        c, l, _ = pallas_swar.scan_literal(
            st.u32, st.true_len, pattern=pat, want_mask=False,
            want_lines=True, interpret=True, assume_zero_tail=True,
        )
        want = naive.all_starts(text, pat)
        assert int(c) == len(want), pat
        assert int(l) == naive.matched_lines(text, want), pat
    # a matched line spanning the intra-block sub-tile boundary (sub =
    # 128 rows = 64 KiB; block = 128 KiB) must count once
    body = bytearray(b" " * (256 * 1024))
    body[65530:65533] = b"cat"
    body[65540:65543] = b"cat"
    body[100] = 0x0A
    body[200_000] = 0x0A
    st2 = dispatch.stage(bytes(body))
    c, l, _ = pallas_swar.scan_literal(
        st2.u32, st2.true_len, pattern=b"cat", want_mask=False,
        want_lines=True, interpret=True,
    )
    assert int(c) == 2 and int(l) == 1


def test_block_subtile_carry_exact(monkeypatch):
    """Small forced tiles (KREP_TPU_TILE=128): counts/lines stay exact
    across many grid steps, incl. the line-state carry through SMEM."""
    monkeypatch.setenv("KREP_TPU_TILE", "128")
    text = naive.gen_english(31, 256 * 1024)  # R4 = 2048 rows -> T = 8 blocks
    st = dispatch.stage(text)
    for pat in [b"the", b"e", b"quick"]:
        c, l, _ = pallas_swar.scan_literal(
            st.u32, st.true_len, pattern=pat, want_mask=False,
            want_lines=True, interpret=True, assume_zero_tail=True,
        )
        want = naive.all_starts(text, pat)
        assert int(c) == len(want), pat
        assert int(l) == naive.matched_lines(text, want), pat
    # a matched line spanning a sub-tile boundary must count once:
    # sub = 128 rows = 64 KiB; put the only newlines far apart
    body = bytearray(b" " * (256 * 1024))
    body[65530:65533] = b"cat"   # just before the 64 KiB sub boundary
    body[65540:65543] = b"cat"   # just after
    body[100] = 0x0A
    body[200_000] = 0x0A
    text2 = bytes(body)
    st2 = dispatch.stage(text2)
    c, l, _ = pallas_swar.scan_literal(
        st2.u32, st2.true_len, pattern=b"cat", want_mask=False,
        want_lines=True, interpret=True,
    )
    assert int(c) == 2 and int(l) == 1


# ---- lines_from_mask: the mask-chained -c second stage ---------------------


def _union_starts(text, pats, case_sensitive=True, whole_word=False):
    u = set()
    for p in pats:
        u.update(naive.all_starts(text, p, case_sensitive, whole_word))
    return sorted(u)


def test_lines_from_mask_matches_fused_and_naive():
    """Chained (mask -> lines) result == the fused kernel's in-kernel line
    count == naive, over varied corpora and pattern sets."""
    for seed, size in ((3, 50_000), (9, 300_000), (13, 257 * 1024)):
        text = naive.gen_corpus(seed, size, alphabet=b"the fox\ndog cat_x")
        pats = (b"the", b"fox", b"dog", b"cat", b"og c")
        st = dispatch.stage(text)
        _, lines_fused, mask = pallas_swar.scan_multi(
            st.u32, st.true_len, patterns=pats, want_mask=True,
            want_lines=True, interpret=True,
        )
        lines_chained = pallas_swar.lines_from_mask(
            st.u32, mask, st.true_len, interpret=True
        )
        want = naive.matched_lines(text, _union_starts(text, pats))
        assert int(lines_fused) == want, (seed, size)
        assert int(lines_chained) == want, (seed, size)


def test_lines_from_mask_carry_across_tiles(monkeypatch):
    """A matched line spanning tile boundaries counts once; a line whose
    matches all sit in a later tile still counts."""
    monkeypatch.setenv("KREP_TPU_TILE", "256")  # 128 KiB tiles, many steps
    body = bytearray(b" " * (512 * 1024))
    body[10:13] = b"cat"           # tile 0, line 0
    body[131072 + 7 : 131072 + 10] = b"cat"   # tile 1, SAME line 0
    body[300_000] = 0x0A
    body[300_010:300_013] = b"cat"  # line 1
    text = bytes(body)
    st = dispatch.stage(text)
    _, _, mask = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=(b"cat",), want_mask=True,
        want_lines=False, interpret=True,
    )
    lines = pallas_swar.lines_from_mask(st.u32, mask, st.true_len, interpret=True)
    assert int(lines) == 2


def test_lines_from_mask_edge_cases():
    # empty mask -> 0; match on last byte of text; no trailing newline
    text = b"x" * 1000 + b"cat"
    st = dispatch.stage(text)
    _, _, mask = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=(b"cat",), want_mask=True,
        want_lines=False, interpret=True,
    )
    assert int(pallas_swar.lines_from_mask(st.u32, mask, st.true_len, interpret=True)) == 1
    import jax.numpy as jnp

    zero = jnp.zeros_like(mask)
    assert int(pallas_swar.lines_from_mask(st.u32, zero, st.true_len, interpret=True)) == 0


def test_lines_from_mask_nl_start_pattern():
    """A pattern starting with '\\n': state/first-match handling must match
    the fused kernel's (g = mword & k) semantics."""
    text = b"a\nb\na\nccc\n" * 50
    pats = (b"\na", b"ccc")
    st = dispatch.stage(text)
    _, lines_fused, mask = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats, want_mask=True,
        want_lines=True, interpret=True,
    )
    lines_chained = pallas_swar.lines_from_mask(
        st.u32, mask, st.true_len, nl_start_matches=True, interpret=True
    )
    assert int(lines_chained) == int(lines_fused)


def test_lines_from_mask_fuzz():
    rng = np.random.default_rng(77)
    for trial in range(6):
        size = int(rng.integers(1_000, 400_000))
        nl_p = float(rng.choice([0.0, 0.002, 0.05, 0.3]))
        arr = rng.integers(97, 102, size, dtype=np.uint8)  # a..e
        arr[rng.random(size) < nl_p] = 10
        text = arr.tobytes()
        kset = []
        for _ in range(int(rng.integers(1, 6))):
            m = int(rng.integers(1, 7))
            off = int(rng.integers(0, max(size - m, 1)))
            p = text[off : off + m]
            if p and b"\n" not in p:
                kset.append(p)
        if not kset:
            kset = [b"a"]
        pats = tuple(dict.fromkeys(kset))
        st = dispatch.stage(text)
        _, _, mask = pallas_swar.scan_multi(
            st.u32, st.true_len, patterns=pats, want_mask=True,
            want_lines=False, interpret=True,
        )
        lines = pallas_swar.lines_from_mask(st.u32, mask, st.true_len, interpret=True)
        want = naive.matched_lines(text, _union_starts(text, pats))
        assert int(lines) == want, (trial, size, nl_p, pats)


def test_v2_counts_match_at_newline_byte(monkeypatch):
    """V2 accounting bug (round 5): fw0 built from the MASKED state
    stream g dropped matches starting AT a '\\n' byte, so a line whose
    only match is its terminating '\\n' was never counted (reference:
    find_line_start attributes it to the terminated line,
    krep.c:363-386). 210 KB stages to an R4=512 bucket, so the forced
    256-row tile is V2-eligible with a T=2 grid (line carry covered);
    pre-fix this reported lines == 0."""
    monkeypatch.setenv("KREP_TPU_TILE", "256")
    body = b"xxxx\nyyyy\nzzzz\n" * 14000  # 210 KB
    st = dispatch.stage(body)
    c, l, mask = pallas_swar.scan_literal(
        st.u32, st.true_len, pattern=b"\ny", want_mask=True,
        want_lines=True, interpret=True,
    )
    starts = naive.all_starts(body, b"\ny")
    assert int(c) == len(starts)
    assert int(l) == naive.matched_lines(body, starts) == 14000
    # the chained lines kernel under nl_start semantics agrees
    l3 = pallas_swar.lines_from_mask(
        st.u32, mask, st.true_len, nl_start_matches=True, interpret=True
    )
    assert int(l3) == 14000
