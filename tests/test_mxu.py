"""MXU bit-matmul multi-pattern count kernel (ops/mxu_multi) vs naive,
interpret mode on CPU."""

import numpy as np
import pytest

import naive
from krep_tpu.ops import dispatch, mxu_multi


def run_mxu(text: bytes, pats, cs=True, strict=False):
    st = dispatch.stage(text)
    return int(
        mxu_multi.scan_count(
            st.u32, st.true_len, patterns=tuple(pats),
            case_sensitive=cs, strict=strict, interpret=True,
        )
    )


def naive_total(text: bytes, pats, cs=True):
    if not cs:
        from krep_tpu.ops.literal import fold_bytes_host

        text = fold_bytes_host(text)
        pats = [fold_bytes_host(p) for p in pats]
    return sum(len(naive.all_starts(text, p)) for p in pats)


TEXT = naive.gen_english(29, 200_000)


@pytest.mark.parametrize(
    "pats",
    [
        (b"the", b"fox", b"qu"),
        (b"e",),
        (b"a" * 13, b"the quick", b"x"),
        tuple(TEXT[i : i + 4] for i in range(0, 64, 4)),
    ],
)
def test_mxu_counts_vs_naive(pats):
    assert run_mxu(TEXT, pats) == naive_total(TEXT, pats)


def test_mxu_case_insensitive():
    pats = (b"The", b"AND", b"iS")
    assert run_mxu(TEXT, pats, cs=False) == naive_total(TEXT, pats, cs=False)


def test_mxu_strict_matches_default():
    """strict=True (explicit start bounds) must equal the default path,
    which relies on the zero-padding/NUL-free-pattern staging contract."""
    pats = (b"the", b"nd ", b"o")
    assert run_mxu(TEXT, pats, strict=True) == run_mxu(TEXT, pats)


def test_mxu_match_at_text_end():
    """a match whose window ends exactly at true_len must count; one byte
    later must not (zero padding makes overruns unmatchable)."""
    text = b"x" * 5000 + b"needle"
    assert run_mxu(text, (b"needle",)) == 1
    assert run_mxu(text, (b"needle0",)) == 0
    assert run_mxu(text, (b"dle",)) == 1


def test_mxu_rejects_long_patterns():
    with pytest.raises(NotImplementedError):
        run_mxu(TEXT, (b"a" * 30,))


# ---- two-window AND: 14..29-byte members (second dot over bytes 16..31)


def test_mxu_two_window_mixed_set_vs_naive():
    pats = (
        b"the",
        TEXT[100:114],          # 14 (shortest two-window length)
        TEXT[500:520],          # 20
        TEXT[777 : 777 + 29],   # 29 (cap)
        b"a" * 13,
        TEXT[3000:3026],        # 26
    )
    assert run_mxu(TEXT, pats) == naive_total(TEXT, pats)
    assert run_mxu(TEXT, pats, strict=True) == naive_total(TEXT, pats)


def test_mxu_two_window_case_insensitive():
    pats = (b"The", TEXT[40:60].upper(), TEXT[900:918].swapcase())
    assert run_mxu(TEXT, pats, cs=False) == naive_total(TEXT, pats, cs=False)


def test_mxu_two_window_boundary_plants():
    """long matches planted across 4 KiB segment and 128 KiB block
    boundaries at varied phases, union mask checked position-exact."""
    pat = b"ABCDEFGHIJKLMNOPQRSTUVWXY"  # 25 bytes
    text = bytearray(b"." * 300_000)
    spots = [4096 - 13, 4096 - 40, 8192 - 1, 131072 - 12, 131072 - 50,
             262144 - 7, 0, 300_000 - 25]
    for s in spots:
        text[s : s + 25] = pat
    text = bytes(text)
    st = dispatch.stage(text)
    c, mask = mxu_multi.scan_count(
        st.u32, st.true_len, patterns=(pat, b"ZZ"), want_mask=True,
        interpret=True,
    )
    mk = np.asarray(mask).view(np.uint8)[: len(text)]
    assert np.flatnonzero(mk).tolist() == sorted(spots)
    assert int(c) == len(spots)


def test_mxu_two_window_start_limit():
    """start_limit bounds long-pattern match STARTS to the owned region
    (a start just inside the limit counts even when the match body
    extends past it — the shard-halo contract)."""
    import jax.numpy as jnp

    pat = b"ABCDEFGHIJKLMNOPQRSTUVWXY"
    text = bytearray(b"." * 300_000)
    spots = [131072 - 12, 131072 - 50, 131072 + 40, 200_000]
    for s in spots:
        text[s : s + 25] = pat
    st = dispatch.stage(bytes(text))
    c = mxu_multi.scan_count(
        st.u32, st.true_len, jnp.int32(131072), patterns=(pat,),
        interpret=True,
    )
    # 131060's match BODY crosses the limit but its start is owned
    assert int(c) == sum(1 for s in spots if s < 131072)


def test_mxu_two_window_match_at_text_end():
    text = b"x" * 5000 + b"needleneedleneedle"
    pat = text[-18:]
    assert run_mxu(text, (pat,)) == 1
    assert run_mxu(text, (pat + b"Z",)) == 0


def test_fused_count_router_equivalence_long_members():
    """the router must agree between MXU (two-window) and VPU routes on a
    K>=32 set with 14..29-byte members."""
    from krep_tpu.ops import multi as multi_mod
    from krep_tpu.ops import pallas_swar

    pats = tuple(
        TEXT[7 * i : 7 * i + 4 + (i % 26)] for i in range(40)
    )
    assert len(pats) >= multi_mod.MXU_MIN_K
    assert any(len(p) > mxu_multi.MAX_LEN for p in pats)
    st = dispatch.stage(TEXT)
    want = naive_total(TEXT, pats)
    got_mxu = int(
        mxu_multi.scan_count(
            st.u32, st.true_len, patterns=pats, interpret=True
        )
    )
    c, _, _ = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats,
        want_mask=False, want_lines=False, interpret=True,
    )
    assert got_mxu == int(c) == want


def test_fused_count_router_equivalence():
    """fused_count_device must agree between its MXU and VPU routes."""
    import os

    import jax.numpy as jnp

    from krep_tpu.ops import multi as multi_mod
    from krep_tpu.ops import pallas_swar

    pats = tuple(
        TEXT[i : i + 3 + (i % 4)] for i in range(0, 3 * 40, 3)
    )
    assert len(pats) >= multi_mod.MXU_MIN_K
    st = dispatch.stage(TEXT)
    want = naive_total(TEXT, pats)
    got_mxu = int(
        mxu_multi.scan_count(
            st.u32, st.true_len, patterns=pats, interpret=True
        )
    )
    c, _, _ = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats,
        want_mask=False, want_lines=False, interpret=True,
    )
    assert got_mxu == int(c) == want


def test_mxu_union_mask_vs_naive():
    """want_mask=True returns the exact union start mask (v1 packed
    layout), identical to the SWAR mask."""
    import numpy as np

    pats = tuple(TEXT[i : i + 3 + (i % 4)] for i in range(0, 120, 3))
    st = dispatch.stage(TEXT)
    c, mask = mxu_multi.scan_count(
        st.u32, st.true_len, patterns=pats, want_mask=True, interpret=True
    )
    mk = np.asarray(mask).view(np.uint8)[: len(TEXT)]
    got = np.flatnonzero(mk).tolist()
    want = sorted({s for p in pats for s in naive.all_starts(TEXT, p)})
    assert got == want
    assert int(c) == naive_total(TEXT, pats)


# ---- whole-word (-w): the boundary dot (krep.c:1389-1420's word test)


def run_mxu_ww(text: bytes, pats, cs=True, strict=False, prev=0):
    st = dispatch.stage(text)
    return int(
        mxu_multi.scan_count(
            st.u32, st.true_len, None, prev, patterns=tuple(pats),
            case_sensitive=cs, strict=strict, whole_word=True,
            interpret=True,
        )
    )


def naive_total_ww(text: bytes, pats, cs=True):
    return sum(
        len(naive.all_starts(text, p, case_sensitive=cs, whole_word=True))
        for p in pats
    )


@pytest.mark.parametrize(
    "pats",
    [
        (b"the", b"fox", b"and", b"qu"),
        (b"e", b"a", b"_"),
        (b"a" * 13, b"the", b"x"),
        tuple(TEXT[i : i + 3 + (i % 5)] for i in range(0, 100, 5)),
    ],
)
def test_mxu_whole_word_vs_naive(pats):
    assert run_mxu_ww(TEXT, pats) == naive_total_ww(TEXT, pats)


def test_mxu_whole_word_two_window_members():
    pats = (b"the", TEXT[100:114], TEXT[500:520], TEXT[777 : 777 + 29])
    assert run_mxu_ww(TEXT, pats) == naive_total_ww(TEXT, pats)


def test_mxu_whole_word_case_insensitive():
    pats = (b"The", b"AND", b"iS")
    assert run_mxu_ww(TEXT, pats, cs=False) == naive_total_ww(
        TEXT, pats, cs=False
    )


def test_mxu_whole_word_block_boundary_carry():
    """a match starting exactly at a 128 KiB grid-block boundary must see
    the previous block's last byte (carried in SMEM scratch across grid
    steps) for its left-boundary test."""
    blk = 131072
    t = bytearray(b"." * (2 * blk))
    t[blk - 1 : blk + 3] = b"xcat"      # word char before -> not a word match
    assert run_mxu_ww(bytes(t), (b"cat",)) == 0
    t2 = bytearray(b"." * (2 * blk))
    t2[blk : blk + 3] = b"cat"          # '.' before -> word match
    assert run_mxu_ww(bytes(t2), (b"cat",)) == 1


def test_mxu_whole_word_prev_flag_and_text_edges():
    """prev_flag models the byte before the buffer (shard left edge);
    matches at position 0 and at text end are word-bounded by default."""
    t = b"cat in the hat"
    assert run_mxu_ww(t, (b"cat",), prev=0) == 1
    assert run_mxu_ww(t, (b"cat",), prev=1) == 0
    assert run_mxu_ww(b"the final cat", (b"cat",)) == 1
    assert run_mxu_ww(b"the final cats", (b"cat",)) == 0


def test_mxu_whole_word_strict_garbage_tail():
    """strict=True zeroes word flags at/past true_len so a match ending
    exactly at text end stays word-bounded despite a garbage tail."""
    st = dispatch.stage(b"the cat sat" + b"Z" * 50)
    c = mxu_multi.scan_count(
        st.u32, np.int32(11), patterns=(b"cat", b"sat"),
        whole_word=True, strict=True, interpret=True,
    )
    assert int(c) == 2


def test_mxu_whole_word_mask_exact():
    """the whole-word union mask is exact (boundary-pruned in-kernel),
    byte-identical to naive whole-word starts."""
    pats = (b"the", b"he", b"and", b"an")
    st = dispatch.stage(TEXT)
    c, mask = mxu_multi.scan_count(
        st.u32, st.true_len, patterns=pats, whole_word=True,
        want_mask=True, interpret=True,
    )
    mk = np.asarray(mask).view(np.uint8)[: len(TEXT)]
    got = np.flatnonzero(mk).tolist()
    want = sorted(
        {
            s
            for p in pats
            for s in naive.all_starts(TEXT, p, whole_word=True)
        }
    )
    assert got == want
    assert int(c) == naive_total_ww(TEXT, pats)


def test_mxu_whole_word_matches_swar_kernel():
    """MXU whole-word count == fused SWAR whole-word count on a corpus-
    derived K=32 set (the routing-equivalence contract)."""
    from krep_tpu.ops import pallas_swar

    pats = tuple(TEXT[i : i + 3 + (i % 6)] for i in range(0, 32 * 7, 7))
    st = dispatch.stage(TEXT)
    got_mxu = int(
        mxu_multi.scan_count(
            st.u32, st.true_len, patterns=pats, whole_word=True,
            interpret=True,
        )
    )
    c, _, _ = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats, whole_word=True,
        want_mask=False, want_lines=False, interpret=True,
    )
    assert got_mxu == int(c) == naive_total_ww(TEXT, pats)


# ---- in-kernel line accounting (want_lines) --------------------------------


def _union_lines(text, pats, cs=True, ww=False):
    u = set()
    for p in pats:
        u.update(naive.all_starts(text, p, cs, ww))
    return naive.matched_lines(text, sorted(u))


def run_mxu_lines(text: bytes, pats, cs=True, ww=False):
    st = dispatch.stage(text)
    cnt, lines = mxu_multi.scan_count(
        st.u32, st.true_len, patterns=tuple(pats),
        case_sensitive=cs, whole_word=ww, want_lines=True, interpret=True,
    )
    return int(cnt), int(lines)


def test_want_lines_matches_naive():
    text = naive.gen_corpus(11, 150_000, alphabet=b"the fox\ndog cat qx")
    pats = (b"the", b"fox", b"dog c", b"qx")
    cnt, lines = run_mxu_lines(text, pats)
    assert cnt == naive_total(text, pats)
    assert lines == _union_lines(text, pats)


def test_want_lines_whole_word_case_insensitive():
    text = naive.gen_corpus(13, 120_000, alphabet=b"The fox_y\ndog THE cat")
    pats = (b"the", b"fox", b"cat")
    for cs, ww in ((True, True), (False, False), (False, True)):
        _, lines = run_mxu_lines(text, pats, cs=cs, ww=ww)
        assert lines == _union_lines(text, pats, cs, ww), (cs, ww)


def test_want_lines_line_carry_across_blocks():
    """One line spanning multiple 128 KiB grid blocks with matches in
    several blocks must count once (the SMEM line-state carry)."""
    body = bytearray(b" " * (384 * 1024))
    body[100:103] = b"cat"
    body[200_000:200_003] = b"cat"    # block 1, same (only) line
    body[300_000] = 0x0A
    body[300_010:300_013] = b"cat"    # second line
    cnt, lines = run_mxu_lines(bytes(body), (b"cat", b"dogx"))
    assert cnt == 3 and lines == 2


def test_want_lines_two_window_long_members():
    """Sets with 14..29-byte members (two-window AND) keep exact lines."""
    text = naive.gen_corpus(17, 100_000, alphabet=b"the quick brown fox\n")
    long_p = text[50:72]  # 22 bytes, real substring
    pats = (b"quick", long_p, b"fox")
    cnt, lines = run_mxu_lines(text, pats)
    assert cnt == naive_total(text, pats)
    assert lines == _union_lines(text, pats)


def test_want_lines_nl_start_pattern():
    text = b"a\nb\na\nccc\n" * 40
    pats = tuple(dict.fromkeys([b"\na", b"ccc"] + [
        b"z%02d" % i for i in range(34)
    ]))  # pad K so the set shape is MXU-typical
    cnt, lines = run_mxu_lines(text, pats)
    assert cnt == naive_total(text, pats)
    # fused-kernel semantics oracle: lines counted at non-'\n' first matches
    st = dispatch.stage(text)
    from krep_tpu.ops import pallas_swar

    _, want, _ = pallas_swar.scan_multi(
        st.u32, st.true_len, patterns=pats, want_mask=False,
        want_lines=True, interpret=True,
    )
    assert lines == int(want)
