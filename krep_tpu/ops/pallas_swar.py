"""SWAR fused literal-scan Pallas kernel (v2 — the performance path).

The v1 kernel (pallas_scan.py) processes one byte per int32 lane because
Mosaic only rotates 32-bit vectors. This kernel instead packs FOUR text
bytes per uint32 lane (little-endian, zero-copy host reinterpret) and does
everything word-parallel:

  * pattern compares become masked word equalities: for each of the 4
    byte phases p, match-at-(4e+p) = AND over text words t of
    ((E_t & M_{p,t}) == P_{p,t}) — the (M, P) constants are precomputed
    per compile. ~(m+4) word ops replace 4m byte ops.
  * ASCII case folding is branch-free SWAR: per-byte A..Z detect via
    carryless range adds on the low-7-bit plane, then +0x20 on flagged
    bytes (mirrors lower_table, krep.c:124-134).
  * newline/word-char tests extract the 4 phase bytes of E_0 only.
  * the matched-line segmented OR-scan (krep.c:1331-1351 "-c" dedup)
    runs on 4-byte block compositions: per element (A = no '\\n' in the
    block, B = line-has-match at block end), then BIT-PACKED lane/row
    log-scans — rows scan independently along lanes, so 32 rows' (A,B)
    bits pack into one uint32 word and the 7-step lane scan runs on 1/32
    the VREGs (the dominant "-c" cost; 73 -> 139 GB/s, BENCH_NOTES.md).
  * sparse-pattern fast path: if no phase's first-word filter hits in a
    tile, the whole tile reduces to "carry &= no-newline-in-tile"
    (BMH-style skipping, krep.c:1294-1303, generalized to tiles).

Mask output packs the 4 phase bits as bytes of a uint32, which is exactly
the v1 byte-mask layout after reinterpretation — host code is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import HALO_ROWS, LANES

H4 = HALO_ROWS // 4  # halo rows in the uint32 view (4 bytes/lane ⇒ /4)

import os as _os

# Element-level affine-scan dtype for the matched-line accounting. The
# (A, B) values are 0/1 bits; narrower lanes pack more elements per VREG,
# cutting the VPU op count of the 7-step lane log-scan (the dominant cost
# of the "-c" path per BENCH_NOTES). i32 is the always-works baseline;
# i8/i16 are measured on hardware and the best default is baked here.
_SCAN_DTYPE = {
    "i32": jnp.int32,
    "i16": jnp.int16,
    "i8": jnp.int8,
}[_os.environ.get("KREP_TPU_LINESCAN", "i32")]

# V2 matched-line tail (see _sub_tile): per-word X − S·L identity consumed
# in the bit-packed domain instead of reconstructing per-byte s_before.
# Measured on v5e (config 1, 1 GiB, back-to-back min-filtered pairs):
# 200-204 GB/s vs 187-189 for the reconstruction path — default ON.
_LINES_V2 = _os.environ.get("KREP_TPU_LINESV2", "1") == "1"

# No-concat input path (see _make_kernel.kernel): read sub-tiles straight
# off the input refs and splice the single borrowed row into E() instead
# of materializing a (block+H4)-row concat per grid step.
_NOCAT = _os.environ.get("KREP_TPU_NOCAT", "0") == "1"

_U = lambda x: jnp.uint32(x)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _roll(x, shift, axis):
    size = x.shape[axis]
    shift = shift % size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=axis)


def swar_fold(x):
    """Byte-parallel ASCII lower-fold of a uint32 word array."""
    hb = x & _U(0x80808080)
    a = x & _U(0x7F7F7F7F)
    ge_a = (a + _U(0x3F3F3F3F)) & _U(0x80808080)   # byte ≥ 0x41
    gt_z = (a + _U(0x25252525)) & _U(0x80808080)   # byte ≥ 0x5B
    upper = ge_a & (~gt_z) & (~hb)
    return x + (upper >> 2)                         # +0x20 per upper byte


def swar_has_byte(x, b: int):
    """Nonzero iff any byte of x equals b (per-word flags at bit 7)."""
    v = x ^ _U(b * 0x01010101)
    return (v - _U(0x01010101)) & (~v) & _U(0x80808080)


def swar_word_flags(x):
    """Per-byte is_word_char flags (0x01 per matching byte): [0-9A-Za-z_],
    mirror of is_word_char (krep.h:298-305), carry-less on the 7-bit plane."""
    hb = x & _U(0x80808080)
    a = x & _U(0x7F7F7F7F)

    def ge(lo):  # flag at bit7 per byte iff byte ≥ lo (bytes < 0x80)
        return (a + _U((0x80 - lo) * 0x01010101)) & _U(0x80808080)

    digit = ge(0x30) & ~ge(0x3A)
    upper = ge(0x41) & ~ge(0x5B)
    lower = ge(0x61) & ~ge(0x7B)
    und = swar_has_byte(x, 0x5F)
    w = (digit | upper | lower | und) & ~hb
    return (w >> _U(7)) & _U(0x01010101)


def _phase_words(pat: bytes, p: int):
    """(t, mask, value) word constants for matches starting at byte phase p."""
    m = len(pat)
    out = []
    for t in range((p + m + 3) // 4):
        mask = 0
        val = 0
        for b in range(4):
            i = 4 * t + b - p
            if 0 <= i < m:
                mask |= 0xFF << (8 * b)
                val |= pat[i] << (8 * b)
        if mask:
            out.append((t, mask, val))
    return out


def _seg_scan_lane(A, B, lane_idx):
    """Inclusive lane scan of the affine-bool composition
    (A1,B1)∘(A2,B2) = (A1&A2, (B1&A2)|B2), elem1 earlier. A/B int32 0/1."""
    s = 1
    while s < LANES:
        As = _roll(A, s, axis=1)
        Bs = _roll(B, s, axis=1)
        ident = lane_idx < s
        As = jnp.where(ident, 1, As)
        Bs = jnp.where(ident, 0, Bs)
        B = (Bs & A) | B
        A = As & A
        s *= 2
    return A, B


def _seg_scan_rows(A, B, row_idx, nrows):
    s = 1
    while s < nrows:
        As = _roll(A, s, axis=0)
        Bs = _roll(B, s, axis=0)
        ident = row_idx < s
        As = jnp.where(ident, 1, As)
        Bs = jnp.where(ident, 0, Bs)
        B = (Bs & A) | B
        A = As & A
        s *= 2
    return A, B


# --- bit-packed affine scans ---------------------------------------------
# The (A, B) affine-bool values are single bits, and the tile's rows scan
# independently along lanes (rows are pure SIMD batch). So 32 rows' bits
# pack into ONE uint32 word per (packed-row, lane): bit c of packed word
# (r, l) = row c*Pr + r (Pr = tile_r/32; the slices are contiguous sublane
# blocks — no relayouts, unlike the rejected packed-layout reshape in
# BENCH_NOTES). The 7-step lane scan then runs on 1/32 the VREGs, which
# removes the dominant cost of the "-c" matched-line path.

def _seg_scan_lane_packed(A, B, lane_idx):
    """Lane scan of 32 bit-packed independent affine-bool scans.
    Identity = (A=all-ones, B=0)."""
    ones = _U(0xFFFFFFFF)
    s = 1
    while s < LANES:
        As = _roll(A, s, axis=1)
        Bs = _roll(B, s, axis=1)
        ident = lane_idx < s
        As = jnp.where(ident, ones, As)
        Bs = jnp.where(ident, _U(0), Bs)
        B = (Bs & A) | B
        A = As & A
        s *= 2
    return A, B


def _seg_scan_rows_packed(A, B, row_idx, nrows):
    ones = _U(0xFFFFFFFF)
    s = 1
    while s < nrows:
        As = _roll(A, s, axis=0)
        Bs = _roll(B, s, axis=0)
        ident = row_idx < s
        As = jnp.where(ident, ones, As)
        Bs = jnp.where(ident, _U(0), Bs)
        B = (Bs & A) | B
        A = As & A
        s *= 2
    return A, B


def _u32_scalar(arr, sel):
    """Extract the single selected element of a (r,1) uint32 array as a
    scalar (Mosaic lacks unsigned reduces; bitcast to i32, sum, bitcast)."""
    x = jax.lax.bitcast_convert_type(arr, jnp.int32)
    v = jnp.sum(jnp.where(sel, x, 0))
    # scalar i32 -> u32: same-width integer convert is bit-preserving
    # (Mosaic's tpu.bitcast only accepts vectors)
    return v.astype(jnp.uint32)


def _bit_scan_affine(a_w, b_w):
    """In-scalar log-scan of 32 bit-packed (A,B) pairs, LSB = earliest.
    Returns the INCLUSIVE scan words (bit c = composition of pairs 0..c)."""
    s = 1
    while s < 32:
        As = (a_w << _U(s)) | _U((1 << s) - 1)
        Bs = b_w << _U(s)
        b_w = (Bs & a_w) | b_w
        a_w = As & a_w
        s *= 2
    return a_w, b_w


# NOTE on the (nrows, 1) row-composition scan: a packed-layout variant
# (reshape the column to (nrows/128, 128), scan at full lane utilization,
# broadcast-merge back) was implemented and benchmarked at 1 GiB on v5e:
# 66.6 GB/s vs 71.6 GB/s for the plain column scan — the Mosaic relayout
# casts cost more than the narrow-layout scan they avoid. Kept as measured
# and rejected; see BENCH_NOTES.md.


def _line_account(k, g, mword, carry, sub_r, use_v2):
    """Matched-line accounting over one (sub_r, LANES) tile, packed affine
    domain — shared by the fused scan kernel and the mask-chained lines
    kernel (lines_from_mask).

    s_after = (s_before | match) & ~nl per byte (the "-c" dedup state,
    krep.c:1331-1351): composed within each 4-byte word by a 2-step
    log-scan on packed bytes, then across elements by the (A,B)
    affine-bool lane/row scans.

    k: flag words, byte = 1 ⇔ not an owned '\\n'. g: match-start flag
    words feeding the line state. mword: match flags feeding first-match
    detection (== g except when a pattern starts with '\\n'). carry:
    scalar, open line already has a match. Returns (dfirst, new_carry,
    fw): Δ matched-line count, the carry out, and — only on the non-V2
    path — the per-byte first-match-in-line flags (the "first_line" mask).

    use_v2 (requires sub_r % 256 == 0): per-word affine identity
      dfirst = Σ_w X_w − Σ_w S_w·L_w
    X_w = first-matches-per-segment entering state 0 (per-byte
    fw0 = g & ~EB0, popcounted), L_w = 1 iff the word's FIRST segment has
    a match (its first-match is not a new matched line when the line is
    already matched), S_w = state entering the word — consumed in the
    bit-packed domain, so the 32-slice sb0 expansion and its relayouts
    vanish. Exact: every matched line is counted once, at its first match.
    """
    one = _U(0x01010101)
    A = k
    B = g
    As = (A << _U(8)) | _U(0x01)
    Bs = B << _U(8)
    B = (Bs & A) | B
    A = As & A
    As = (A << _U(16)) | _U(0x0101)
    Bs = B << _U(16)
    B = (Bs & A) | B
    A = As & A
    # exclusive within word (for per-byte s_before)
    EAw = (A << _U(8)) | _U(0x01)
    EBw = B << _U(8)

    fw = None
    if sub_r % 256 == 0:
        # bit-packed element scans: bit c of packed (r, l) = element
        # (c*Pr + r, l). 1/32 the scan VREGs of the plain path.
        # Byte-3 extraction happens INSIDE the slice loop (on 1/32
        # size data) instead of on the full tile: bit 24 of slice c
        # routes straight to packed bit c with one shift + one mask.
        Pr = sub_r // 32

        def _pack_b24(X):
            out = (X[0:Pr] >> _U(24)) & _U(1)
            for c in range(1, 32):
                s = X[c * Pr : (c + 1) * Pr]
                v = (s >> _U(24 - c)) if c <= 24 else (s << _U(c - 24))
                out = out | (v & _U(1 << c))
            return out

        PA = _pack_b24(A)
        PB = _pack_b24(B)
        pl_idx = _iota2((Pr, LANES), 1)
        PAi, PBi = _seg_scan_lane_packed(PA, PB, pl_idx)
        LEA = _roll(PAi, 1, axis=1)
        LEB = _roll(PBi, 1, axis=1)
        fl = pl_idx == 0
        LEA = jnp.where(fl, _U(0xFFFFFFFF), LEA)
        LEB = jnp.where(fl, _U(0), LEB)
        # within-block row scan (blocks stay independent per bit)
        RA = PAi[:, LANES - 1 :]
        RB = PBi[:, LANES - 1 :]
        pridx = _iota2((Pr, 1), 0)
        RAi, RBi = _seg_scan_rows_packed(RA, RB, pridx, Pr)
        WEA = _roll(RAi, 1, axis=0)
        WEB = _roll(RBi, 1, axis=0)
        fr = pridx == 0
        WEA = jnp.where(fr, _U(0xFFFFFFFF), WEA)
        WEB = jnp.where(fr, _U(0), WEB)
        # block totals: bits of the last within-block scan row
        lastr = pridx == Pr - 1
        a_tot_w = _u32_scalar(RAi, lastr)
        b_tot_w = _u32_scalar(RBi, lastr)
        # block-prefix compositions, one scalar bit log-scan
        a_inc, b_inc = _bit_scan_affine(a_tot_w, b_tot_w)
        a_tot = ((a_inc >> _U(31)) & _U(1)).astype(jnp.int32)
        b_tot = ((b_inc >> _U(31)) & _U(1)).astype(jnp.int32)
        # exclusive block prefixes, then fold in the tile carry
        EAs = (a_inc << _U(1)) | _U(1)
        EBs = b_inc << _U(1)
        cbw = _U(0) - carry.astype(jnp.uint32)  # 0 or all-ones
        S_w = (cbw & EAs) | EBs  # bit c = state entering block c
        row_state_p = (S_w & WEA) | WEB
        sb0_p = (row_state_p & LEA) | LEB
        if use_v2:
            # first-match detection uses mword, NOT the state stream g: a
            # match AT a '\n' byte still counts the line that '\n'
            # terminates (find_line_start semantics, krep.c:363-386 — the
            # state is 0 there unless an earlier match already counted the
            # line). g's masking only affects the state, where it is a
            # no-op anyway ((s|1)&0 == (s|0)&0); the non-V2 path below has
            # always used mword for fw.
            fw0 = mword & (EBw ^ one)
            x_cnt = ((fw0 * one) >> _U(24)).astype(jnp.int32)
            # ≤1 first-match in a word's first segment ⇒ L ∈ {0,1};
            # the byte-collapse multiply also runs per slice
            Lmask = fw0 & EAw
            PL = ((Lmask[0:Pr] * one) >> _U(24)) & _U(1)
            for c in range(1, 32):
                s = Lmask[c * Pr : (c + 1) * Pr] * one
                v = (s >> _U(24 - c)) if c <= 24 else (s << _U(c - 24))
                PL = PL | (v & _U(1 << c))
            corr = sb0_p & PL
            # SWAR popcount on the (Pr, LANES) correction bits
            v = corr - ((corr >> _U(1)) & _U(0x55555555))
            v = (v & _U(0x33333333)) + ((v >> _U(2)) & _U(0x33333333))
            v = (v + (v >> _U(4))) & _U(0x0F0F0F0F)
            pc = ((v * _U(0x01010101)) >> _U(24)).astype(jnp.int32)
            dfirst = jnp.sum(x_cnt) - jnp.sum(pc)
            sb0 = None
        else:
            sb0 = jnp.concatenate(
                [(sb0_p >> _U(c)) & _U(1) for c in range(32)], axis=0
            )
    else:
        assert not use_v2, "V2 accounting needs sub_r % 256 == 0"
        # element-level composition = byte 3 of the inclusive scan;
        # narrow to _SCAN_DTYPE (0/1 values) for the log-scans
        lane_idx = _iota2((sub_r, LANES), 1)
        Ae = (A >> _U(24)).astype(_SCAN_DTYPE)
        Be = (B >> _U(24)).astype(_SCAN_DTYPE)
        Ai, Bi = _seg_scan_lane(Ae, Be, lane_idx)
        LEA = _roll(Ai, 1, axis=1)
        LEB = _roll(Bi, 1, axis=1)
        first_lane = lane_idx == 0
        LEA = jnp.where(first_lane, 1, LEA)
        LEB = jnp.where(first_lane, 0, LEB)
        RA = Ai[:, LANES - 1 :].astype(jnp.int32)
        RB = Bi[:, LANES - 1 :].astype(jnp.int32)
        ridx = _iota2((sub_r, 1), 0)
        RAi, RBi = _seg_scan_rows(RA, RB, ridx, sub_r)
        RPA = _roll(RAi, 1, axis=0)
        RPB = _roll(RBi, 1, axis=0)
        first_row = ridx == 0
        RPA = jnp.where(first_row, 1, RPA)
        RPB = jnp.where(first_row, 0, RPB)
        row_state = ((carry & RPA) | RPB).astype(_SCAN_DTYPE)
        last_row = ridx == sub_r - 1
        a_tot = jnp.max(jnp.where(last_row, RAi, 0))
        b_tot = jnp.max(jnp.where(last_row, RBi, 0))
        sb0 = ((row_state & LEA) | LEB).astype(jnp.uint32)

    if sb0 is not None:
        sbw = ((sb0 * one) & EAw) | EBw
        fw = mword & (sbw ^ one)
        dfirst = jnp.sum(
            ((fw * _U(0x01010101)) >> _U(24)).astype(jnp.int32)
        )

    new_carry = (carry & a_tot) | b_tot
    return dfirst, new_carry, fw


def _make_kernel(patterns: tuple[bytes, ...], case_sensitive: bool,
                 whole_word: bool, want_mask: bool, want_lines: bool,
                 tile_r: int, want_stats: bool = False,
                 mask_kind: str = "starts", has_limit: bool = False,
                 no_tail_guard: bool = False, want_count: bool = True,
                 sub_r: int | None = None):
    """K patterns fused in one pass over the text: per-pattern packed match
    words, counts summed (Aho-Corasick totals — AC count == Σ per-pattern
    counts, test_multiple_patterns.c:345-471), union mask for line
    accounting and host-side attribution.

    sub_r < tile_r processes the fetched block in tile_r//sub_r sequential
    SUB-TILES inside one grid step: temporaries stay sub_r-sized (VMEM),
    while the ~1.5-2us/step grid overhead amortizes over the whole block —
    the overhead is ~30% of the light -c scan at 2048-row steps."""
    from .literal import fold_bytes_host

    if sub_r is None:
        sub_r = tile_r
    assert tile_r % sub_r == 0
    n_sub = tile_r // sub_r

    pats = tuple(
        p if case_sensitive else fold_bytes_host(p) for p in patterns
    )
    lens = tuple(len(p) for p in pats)
    phase_tab = [[_phase_words(p, ph) for ph in range(4)] for p in pats]

    def kernel(tl_ref, main_ref, halo_ref, count_ref, *rest):
        if want_mask:
            mask_ref, scratch = rest
        else:
            (scratch,) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0] = 0   # match count
            scratch[1] = 0   # matched-line count
            scratch[2] = 0   # carry: open line already has a match
            scratch[3] = tl_ref[1]  # carry: byte before position 0 is word-char
            scratch[4] = 0   # stats: a newline has been seen
            scratch[5] = 0   # stats: match in the leading segment (lead)

        # no-concat mode: patterns ≤64B only ever borrow ONE row past the
        # sub-tile (element shift t ≤ 16 ⇒ row shift 0), so instead of
        # materializing a (block+H4)-row concat copy per grid step, each
        # sub-tile reads its rows straight off the input ref and splices
        # the single borrowed row (next sub-tile's row 0, or halo row 0)
        # into E()'s wrapped lanes. whole-word keeps the concat (its EW
        # shifts read further ahead).
        nocat = _NOCAT and not whole_word
        if nocat:
            buf_full = None
        else:
            buf_full = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
            if not case_sensitive:
                buf_full = swar_fold(buf_full)

        for h in range(n_sub):
            if nocat:
                buf_h = main_ref[h * sub_r : (h + 1) * sub_r]
                r0 = (h + 1) * sub_r
                nxt = (
                    main_ref[r0 : r0 + 1]
                    if h + 1 < n_sub
                    else halo_ref[0:1]
                )
                if not case_sensitive:
                    buf_h = swar_fold(buf_h)
                    nxt = swar_fold(nxt)
                bufs = (buf_h, nxt)
            else:
                bufs = None
            _sub_tile(i, h, buf_full, bufs, tl_ref, scratch,
                      mask_ref if want_mask else None)

    def _sub_tile(i, h, buf_full, bufs, tl_ref, scratch, mask_ref):
        if bufs is None:
            buf = buf_full[h * sub_r : (h + 1) * sub_r + H4]
            nxt = None
        else:
            buf, nxt = bufs
        shape = (sub_r, LANES)
        lane_idx = _iota2(shape, 1)
        row_idx = _iota2(shape, 0)

        # first byte offset of each packed element in the full text —
        # built lazily: with no_tail_guard and no shard limit nothing in
        # the kernel needs it (a measurable VPU saving per tile)
        gcache = {}

        def gbase_arr():
            if "g" not in gcache:
                gcache["g"] = (
                    (i * tile_r + h * sub_r + row_idx) * LANES + lane_idx
                ) * 4
            return gcache["g"]
        # start_limit: exclusive bound on match-START positions (and on
        # newline accounting) — the shard/slab "owned" region. Bytes in
        # [start_limit, true_len) are halo: matches may END there but no
        # match may START there and no newline there may close a line
        # (the next shard owns it; cross-shard merge dedups via lead/trail).
        # Callers guarantee start_limit is element-aligned or == true_len
        # (beyond-true_len padding is zero), so element masking is exact.
        # has_limit is trace-static: plain scans pay zero extra ops.
        start_limit = tl_ref[2] if has_limit else None

        # element shifts E_t (flat left shift by t uint32 elements), cached
        # and capped (patterns are ≤64 bytes ⇒ ≤17 distinct shifts; the cap
        # is a guard against VMEM-stack blowup if that bound ever moves)
        ecache = {}
        E_CACHE_MAX = 24

        def E(t):
            if t in ecache:
                return ecache[t]
            rs, ls = divmod(t, LANES)
            if nxt is not None:
                # no-concat: buf is exactly sub_r rows; the only
                # out-of-tile read is the borrowed row's first ls lanes
                assert rs == 0 and ls < LANES, "no-concat needs t <= 16"
                if ls == 0:
                    v = buf
                else:
                    rolled = _roll(buf, -ls, axis=1)
                    v1 = _roll(rolled, -1, axis=0)
                    hr = jnp.broadcast_to(_roll(nxt, -ls, axis=1), shape)
                    v1 = jnp.where(row_idx == sub_r - 1, hr, v1)
                    v = jnp.where(lane_idx < LANES - ls, rolled, v1)
            elif ls == 0:
                v = _roll(buf, -rs, axis=0)[:sub_r] if rs else buf[:sub_r]
            else:
                rolled = _roll(buf, -ls, axis=1)
                v0 = _roll(rolled, -rs, axis=0)[:sub_r] if rs else rolled[:sub_r]
                v1 = _roll(rolled, -(rs + 1), axis=0)[:sub_r]
                v = jnp.where(lane_idx < LANES - ls, v0, v1)
            if len(ecache) < E_CACHE_MAX:
                ecache[t] = v
            return v

        e0 = E(0)

        # cheap candidate filter: first-word compare per (pattern, phase).
        # Compare results are cached by constant — patterns sharing a
        # (possibly masked) word pay once (common in -f word sets). Only
        # constants that actually recur are cached, so single-use compares
        # don't have their live ranges pinned (VMEM pressure at large K).
        from collections import Counter

        const_uses = Counter()
        for tab in phase_tab:
            for ph in tab:
                for w_i, ent in enumerate(ph):
                    # first words are consumed twice: candidate OR + verify
                    const_uses[ent] += 2 if w_i == 0 else 1
        fwcache = {}

        def word_cmp(t, mk, vl):
            key = (t, mk, vl)
            if key in fwcache:
                return fwcache[key]
            w = E(t)
            if mk == 0xFFFFFFFF:
                out = w == _U(vl)
            else:
                out = (w & _U(mk)) == _U(vl)
            if const_uses[key] > 1:
                fwcache[key] = out
            return out

        def first_word_mask(k, p):
            return word_cmp(*phase_tab[k][p][0])

        cand = None
        for k in range(len(pats)):
            for p in range(4):
                fw = first_word_mask(k, p)
                cand = fw if cand is None else (cand | fw)
        has_cand = jnp.any(cand)

        true_len = tl_ref[0]
        # newline machinery only exists for line accounting / shard stats;
        # pure match counting (-c -o and the count_only fast path) skips
        # the detection, the any-reduce, and the carry select entirely
        need_nl = want_lines or want_stats
        one_ = _U(0x01010101)
        if need_nl:
            # k01 = 1 per byte iff byte != '\n', derived directly (two ops
            # fewer than the bit7-flag detect + normalize + invert chain):
            # nonzero-byte test on x^0x0A via a carry-safe masked add
            v_nl = e0 ^ _U(0x0A0A0A0A)
            k01 = (
                (((v_nl & _U(0x7F7F7F7F)) + _U(0x7F7F7F7F)) | v_nl)
                >> _U(7)
            ) & one_
            if has_limit:
                # newline accounting is owned-region only (element masking
                # is exact per the start_limit contract above; padding
                # beyond true_len is zeros → no '\n' there)
                k01 = jnp.where(gbase_arr() < start_limit, k01, one_)
            any_nl = jnp.any(k01 != one_)
        else:
            k01 = None
            any_nl = jnp.bool_(False)

        def full_path(_):
            # per-(pattern, phase) masks, packed immediately as bytes of one
            # uint32 (byte p == 1 ⇔ match starts at byte 4e+p) to keep the
            # VMEM high-water low — everything below runs packed.
            one = _U(0x01010101)

            new_wc3 = jnp.int32(0)
            wcb = wc0 = beforew = None
            ew_cache = {}
            if whole_word:
                wcb = swar_word_flags(buf)
                wc0 = wcb[:sub_r]
                # before: flags shifted +1 byte; byte0 from previous element
                L = _roll(wc0, 1, axis=1)
                Uu = _roll(L, 1, axis=0)
                prev_el = jnp.where(lane_idx > 0, L, Uu)
                at00 = (row_idx == 0) & (lane_idx == 0)
                prev_el = jnp.where(
                    at00, _U(0x1000000) * scratch[3].astype(jnp.uint32), prev_el
                )
                beforew = (wc0 << _U(8)) | (prev_el >> _U(24))
                sel = (row_idx == sub_r - 1) & (lane_idx == LANES - 1)
                new_wc3 = jnp.max(
                    jnp.where(sel, (wc0 >> _U(24)).astype(jnp.int32), 0)
                )

                def EW(t):
                    if t in ew_cache:
                        return ew_cache[t]
                    rs, ls = divmod(t, LANES)
                    if ls == 0:
                        v = _roll(wcb, -rs, axis=0)[:sub_r] if rs else wc0
                    else:
                        rolled = _roll(wcb, -ls, axis=1)
                        v0 = (
                            _roll(rolled, -rs, axis=0)[:sub_r]
                            if rs
                            else rolled[:sub_r]
                        )
                        v1 = _roll(rolled, -(rs + 1), axis=0)[:sub_r]
                        v = jnp.where(lane_idx < LANES - ls, v0, v1)
                    ew_cache[t] = v
                    return v

            # start must be in the owned region AND leave room for the whole
            # pattern before true_len; the compare array is shared across
            # patterns of equal length (a big saving for large -f sets).
            # no_tail_guard (static): when every pattern is NUL-free and the
            # staged tail past true_len is all zeros, no match can start
            # beyond true_len - m (a pattern byte would have to equal the
            # zero padding) — the whole bound-compare chain vanishes.
            limcache = {}

            def limit_mask(p, m_k):
                if no_tail_guard and not has_limit:
                    return None
                key = (p, m_k)
                if key not in limcache:
                    bound = true_len - m_k + 1
                    if has_limit:
                        bound = jnp.minimum(bound, start_limit)
                    limcache[key] = gbase_arr() + p < bound
                return limcache[key]

            def verified_acc(kk, p):
                acc = first_word_mask(kk, p)
                for (t, mk, vl) in phase_tab[kk][p][1:]:
                    acc = acc & word_cmp(t, mk, vl)
                lm = limit_mask(p, lens[kk])
                return acc if lm is None else acc & lm

            count_only = (
                not want_mask and not want_lines and not whole_word
                and not want_stats
            )
            if count_only:
                # total match count without per-pattern packing/popcounts:
                # accumulate phase hits as plain int adds
                accsum = jnp.zeros(shape, jnp.int32)
                for kk in range(len(pats)):
                    for p in range(4):
                        accsum = accsum + verified_acc(kk, p).astype(jnp.int32)
                dcount = jnp.sum(accsum)
                return (
                    dcount, jnp.int32(0), scratch[2], jnp.int32(0),
                    jnp.int32(0), jnp.zeros((1, 1), jnp.uint32),
                )

            mword = None  # union across patterns
            dcount = jnp.int32(0)
            for kk in range(len(pats)):
                m_k = lens[kk]
                mw_k = None
                for p in range(4):
                    # select-to-constant packs the phase bit in one op
                    # (astype + shift is two)
                    accw = jnp.where(
                        verified_acc(kk, p), _U(1 << (8 * p)), _U(0)
                    )
                    mw_k = accw if mw_k is None else (mw_k | accw)
                if whole_word:
                    qa, ra = divmod(m_k, 4)
                    if ra == 0:
                        afterw = EW(qa)
                    else:
                        afterw = (EW(qa) >> _U(8 * ra)) | (
                            EW(qa + 1) << _U(32 - 8 * ra)
                        )
                    mw_k = mw_k & (~beforew) & (~afterw) & one
                if want_count:
                    # lines-only callers (-c) skip the match-count popcount
                    dcount = dcount + jnp.sum(
                        ((mw_k * _U(0x01010101)) >> _U(24)).astype(jnp.int32)
                    )
                mword = mw_k if mword is None else (mword | mw_k)

            if not want_lines:
                out_w = mword if want_mask else jnp.zeros((1, 1), jnp.uint32)
                return dcount, jnp.int32(0), scratch[2], new_wc3, jnp.int32(0), out_w

            # --- matched-line accounting (shared helper _line_account) ---
            one = _U(0x01010101)
            k = k01                           # 1 ⇔ not an owned '\n'
            # a match flag can coincide with a '\n' byte only when some
            # pattern STARTS with '\n' — otherwise g = mword exactly
            if any(p[0:1] == b"\n" for p in pats):
                g = mword & k
            else:
                g = mword

            use_v2 = (
                _LINES_V2
                and sub_r % 256 == 0
                and not (want_mask and mask_kind == "first_line")
            )
            dfirst, new_carry, fw = _line_account(
                k, g, mword, scratch[2], sub_r, use_v2
            )

            lead_tile = jnp.int32(0)
            if want_stats:
                # does a match precede the first newline in this tile?
                # (byte-exact: ties within one word compare lowest flag bits)
                # (reductions stay in int32 — Mosaic lacks unsigned reduces;
                # the packed flag words fit int32 losslessly)
                BIG = jnp.int32(1 << 30)
                nlw = k ^ one                 # 1 ⇔ owned '\n'
                fi = row_idx * LANES + lane_idx
                vm = jnp.min(jnp.where(mword != _U(0), fi, BIG))
                vn = jnp.min(jnp.where(nlw != _U(0), fi, BIG))
                mw_at = jnp.max(jnp.where(fi == vm, mword.astype(jnp.int32), 0))
                nw_at = jnp.max(jnp.where(fi == vm, nlw.astype(jnp.int32), 0))
                m_low = mw_at & (-mw_at)
                n_low = nw_at & (-nw_at)
                same = (vm == vn) & (vm < BIG)
                lead_tile = (
                    (vm < vn) | (same & (n_low == 0)) | (same & (m_low < n_low))
                ).astype(jnp.int32)

            if want_mask:
                out_w = fw if mask_kind == "first_line" else mword
            else:
                out_w = jnp.zeros((1, 1), jnp.uint32)
            return dcount, dfirst, new_carry, new_wc3, lead_tile, out_w

        def cheap_path(_):
            carry = scratch[2]
            new_carry = jnp.where(any_nl, 0, carry)
            new_wc3 = jnp.int32(0)
            if whole_word:
                wc3 = (
                    ((e0[sub_r - 1 :, LANES - 1 :] >> _U(24)) & _U(0xFF))
                )
                x8 = wc3
                w = (
                    ((x8 >= 0x30) & (x8 <= 0x39))
                    | ((x8 >= 0x41) & (x8 <= 0x5A))
                    | ((x8 >= 0x61) & (x8 <= 0x7A))
                    | (x8 == 0x5F)
                )
                new_wc3 = jnp.max(w.astype(jnp.int32))
            if want_mask:
                mword = jnp.zeros((sub_r, LANES), jnp.uint32)
            else:
                mword = jnp.zeros((1, 1), jnp.uint32)
            return jnp.int32(0), jnp.int32(0), new_carry, new_wc3, jnp.int32(0), mword

        dcount, dfirst, new_carry, new_wc3, lead_tile, mword = jax.lax.cond(
            has_cand, full_path, cheap_path, 0
        )
        scratch[0] += dcount
        scratch[1] += dfirst
        scratch[2] = new_carry
        if whole_word:
            scratch[3] = new_wc3
        if want_stats:
            # lead: first match of the shard precedes its first newline
            scratch[5] = scratch[5] | ((1 - scratch[4]) * lead_tile)
            scratch[4] = scratch[4] | jnp.where(any_nl, 1, 0)
        if want_mask:
            mask_ref[h * sub_r : (h + 1) * sub_r] = mword

    def _finalize(i, count_ref, scratch):
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            count_ref[0] = scratch[0]
            count_ref[1] = scratch[1]
            count_ref[2] = scratch[2]  # trail: open line at end has a match
            count_ref[3] = scratch[5]  # lead
            count_ref[4] = scratch[4]  # any newline seen

    def kernel_entry(tl_ref, main_ref, halo_ref, count_ref, *rest):
        kernel(tl_ref, main_ref, halo_ref, count_ref, *rest)
        scratch = rest[-1]
        _finalize(pl.program_id(0), count_ref, scratch)

    return kernel_entry


def _pick_tile(R4: int, n_patterns: int = 1, light: bool = False) -> int:
    # light = no mask output and no whole-word (fewest live VMEM arrays).
    # Grid-step overhead (~1.5-2 us/step) dominates below 512 KiB tiles.
    # (double buffering stops fitting in VMEM). Multi-pattern kernels keep
    # more live arrays (E-shift cache + per-pattern words), so scale down
    # with K to stay inside the 16 MiB scoped-VMEM limit.
    # (512 for K=16 measured equal throughput but ~4x the compile time;
    # keep the smaller tile beyond K=8)
    if n_patterns <= 1:
        # 2048 became viable (and 15% faster on the -c headline: 139 ->
        # 160 GB/s) once the bit-packed scans cut the line-accounting
        # VMEM; with a mask output or whole-word flag arrays the extra
        # live buffers overflow scoped VMEM, so those keep 1024.
        # (4096 fails to compile: double-buffered input + in-word scan
        # arrays exceed the 16 MiB scoped-VMEM limit.)
        cap = 2048 if light else 1024
    elif n_patterns <= 8:
        cap = 512
    else:
        cap = 256
    env_cap = _os.environ.get("KREP_TPU_TILE")
    if env_cap:
        cap = int(env_cap)
    for t in (4096, 2048, 1024, 512, 384, 256, 128):
        if t <= cap and R4 % t == 0:
            return t
    return R4


def scan_literal(
    text32: jax.Array,
    true_len: jax.Array,
    *,
    pattern: bytes,
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = True,
    want_lines: bool = True,
    interpret: bool = False,
    mask_kind: str = "starts",
    assume_zero_tail: bool = False,
    want_count: bool = True,
):
    """Single-pattern SWAR scan — see scan_multi."""
    return scan_multi(
        text32,
        true_len,
        patterns=(pattern,),
        case_sensitive=case_sensitive,
        whole_word=whole_word,
        want_mask=want_mask,
        want_lines=want_lines,
        interpret=interpret,
        mask_kind=mask_kind,
        assume_zero_tail=assume_zero_tail,
        want_count=want_count,
    )


NO_LIMIT = 0x7FFFFFF0  # start_limit sentinel: no owned-region restriction


def _scan_raw(
    text32, true_len, prev_word, *, patterns, case_sensitive, whole_word,
    want_mask, want_lines, want_stats, interpret, start_limit=None,
    mask_kind="starts", assume_zero_tail=False, want_count=True,
):
    if mask_kind == "first_line":
        assert want_lines, "first_line mask needs the line-accounting path"
    rows_total, lanes = text32.shape
    assert lanes == LANES
    R4 = rows_total - H4
    light = not want_mask and not whole_word
    tile_r = _pick_tile(R4, len(patterns), light)
    # Fetch-block multiplier (KREP_TPU_BLOCKMUL): fetch mult x tile_r rows
    # per grid step and process them as sequential sub-tiles, keeping
    # temporaries tile_r-sized in VMEM (monolithic 4096-row tiles fail to
    # compile). Re-measured on v5e under the V2 matched-line tail (whose
    # dropped sb0 expansion freed VMEM): config 1 mult=2 203.6-206.7 vs
    # mult=1 200.7 GB/s — default 2 now; mult=4 still overflows scoped
    # VMEM. (Pre-V2 the ordering was reversed: mult=2 170.0 vs 187.2.)
    block_r = tile_r
    if light and len(patterns) <= 1:
        mult = int(_os.environ.get("KREP_TPU_BLOCKMUL", "2"))
        while mult > 1 and R4 % (tile_r * mult) != 0:
            mult //= 2
        block_r = tile_r * mult
    T = R4 // block_r
    # Patterns beyond 64 bytes would unroll into hundreds of shifted-word
    # temporaries (Mosaic stack-allocates them in VMEM); callers route long
    # patterns through the prefix-filter + host-verify path instead — the
    # same boundary where the reference hands off to scalar BMH
    # (SIMD_MAX_PATTERN_LEN, krep.c:99-113).
    if not patterns or any(len(p) == 0 or len(p) > 64 for p in patterns):
        raise NotImplementedError("pattern length outside kernel support")

    has_limit = start_limit is not None
    if start_limit is None:
        start_limit = jnp.int32(NO_LIMIT)
    # the tail-guard elision is sound only for NUL-free patterns over a
    # zero tail (see _make_kernel); anything else keeps the bound compare
    no_tail_guard = bool(assume_zero_tail) and all(
        0 not in p for p in patterns
    )
    tl = jnp.stack(
        [
            true_len.astype(jnp.int32),
            prev_word.astype(jnp.int32),
            jnp.asarray(start_limit, jnp.int32),
        ]
    )
    kernel = _make_kernel(
        tuple(patterns), case_sensitive, whole_word, want_mask, want_lines,
        block_r, want_stats, mask_kind, has_limit,
        no_tail_guard=no_tail_guard, want_count=want_count, sub_r=tile_r,
    )

    out_shape = [jax.ShapeDtypeStruct((8,), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if want_mask:
        out_shape.append(jax.ShapeDtypeStruct((R4, LANES), jnp.uint32))
        out_specs.append(
            pl.BlockSpec((block_r, LANES), lambda i, t: (i, 0), memory_space=pltpu.VMEM)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((block_r, LANES), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (H4, LANES),
                lambda i, t: ((i + 1) * (block_r // H4), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tl, text32, text32)

    counts = outs[0]
    mask = outs[1].reshape(-1) if want_mask else jnp.zeros((LANES,), jnp.uint32)
    return counts, mask


@functools.partial(
    jax.jit,
    static_argnames=(
        "patterns", "case_sensitive", "whole_word", "want_mask", "want_lines",
        "interpret", "mask_kind", "assume_zero_tail", "want_count",
    ),
)
def scan_multi(
    text32: jax.Array,
    true_len: jax.Array,
    *,
    patterns: tuple[bytes, ...],
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = True,
    want_lines: bool = True,
    interpret: bool = False,
    mask_kind: str = "starts",
    assume_zero_tail: bool = False,
    want_count: bool = True,
):
    """SWAR fused K-pattern scan over the uint32 staged view
    (dispatch.StagedText.u32): shape (R4 + H4, 128) uint32.

    Returns (total_match_count i32, matched_line_count i32 over the UNION
    of matches, union mask view (R4*128,) uint32 whose little-endian bytes
    are the per-byte 0/1 mask — "≥1 pattern starts here" for
    mask_kind="starts", or the -c dedup events for "first_line")."""
    counts, mask = _scan_raw(
        text32, true_len, jnp.int32(0),
        patterns=tuple(patterns), case_sensitive=case_sensitive,
        whole_word=whole_word, want_mask=want_mask, want_lines=want_lines,
        want_stats=False, interpret=interpret, mask_kind=mask_kind,
        assume_zero_tail=assume_zero_tail, want_count=want_count,
    )
    return counts[0], counts[1], mask


def _make_lines_kernel(block_r: int, nl_start_matches: bool, use_v2: bool):
    def kernel(tl_ref, main_ref, mask_ref, count_ref, scratch):
        del tl_ref  # zero tail past true_len can hold neither '\n' nor flags
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0] = 0   # matched-line count
            scratch[1] = 0   # carry: open line already has a match

        e0 = main_ref[:]
        mword = mask_ref[:]
        one_ = _U(0x01010101)
        # k01 = 1 per byte iff byte != '\n' (see _make_kernel's derivation)
        v_nl = e0 ^ _U(0x0A0A0A0A)
        k01 = (
            (((v_nl & _U(0x7F7F7F7F)) + _U(0x7F7F7F7F)) | v_nl) >> _U(7)
        ) & one_
        any_nl = jnp.any(k01 != one_)
        has_m = jnp.any(mword != _U(0))

        def full_path(_):
            g = (mword & k01) if nl_start_matches else mword
            dfirst, new_carry, _fw = _line_account(
                k01, g, mword, scratch[1], block_r, use_v2
            )
            return dfirst, new_carry

        def cheap_path(_):
            carry = scratch[1]
            return jnp.int32(0), jnp.where(any_nl, 0, carry)

        dfirst, new_carry = jax.lax.cond(has_m, full_path, cheap_path, 0)
        scratch[0] += dfirst
        scratch[1] = new_carry

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            count_ref[0] = scratch[0]
            count_ref[1] = scratch[1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nl_start_matches", "interpret")
)
def lines_from_mask(
    text32: jax.Array,
    mask: jax.Array,
    true_len: jax.Array,
    *,
    nl_start_matches: bool = False,
    interpret: bool = False,
):
    """Distinct matched-line count from a precomputed packed match-start
    mask — the device-side second stage that lets the MXU bit-matmul route
    serve multi-pattern -c with scalar-only readback (the reference's AC
    counts lines in-stream at any K, aho_corasick.c:390-403 +
    krep.c:1331-1351; before this kernel, K>=32 -c either ran the K-linear
    VPU fused scan or read the full union mask back to the host).

    mask: flat (R4*128,) uint32 in the v1 packed layout scan_multi /
    mxu_multi.scan_count emit with want_mask=True (little-endian byte p of
    word e = 1 <=> a match starts at byte 4e+p). text32: the SAME staged
    u32 view the mask was computed from (newline detection). Whole-word
    pruning is the mask producer's job (both kernels prune in-kernel).
    nl_start_matches: pass True when some pattern starts with '\\n' (the
    state update must not see a match flag on the newline byte itself —
    same rule as the fused kernel's g = mword & k).

    Returns the matched-line count (traced i32 scalar; only the scalar
    crosses the device boundary)."""
    rows_total, lanes = text32.shape
    assert lanes == LANES
    R4 = rows_total - H4
    mask2 = mask.reshape(R4, LANES)
    # two streamed inputs (text + mask): 1024-row tiles double-buffer
    # better than the light path's 2048 (measured on v5e: 218 vs 162
    # GB/s median at 128 MiB)
    tile_r = _pick_tile(R4, 1, light=True)
    if tile_r > 1024 and R4 % 1024 == 0:
        tile_r = 1024
    T = R4 // tile_r
    use_v2 = _LINES_V2 and tile_r % 256 == 0
    tl = true_len.astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (tile_r, LANES), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_r, LANES), lambda i, t: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
    )
    outs = pl.pallas_call(
        _make_lines_kernel(tile_r, nl_start_matches, use_v2),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2,), jnp.int32)],
        interpret=interpret,
    )(tl, text32, mask2)  # grid covers R4 rows; halo rows never read
    return outs[0][0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "patterns", "case_sensitive", "whole_word", "want_mask", "interpret",
    ),
)
def scan_shard_multi(
    text32: jax.Array,
    true_len: jax.Array,
    prev_word: jax.Array,
    start_limit: jax.Array,
    *,
    patterns: tuple[bytes, ...],
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = False,
    interpret: bool = False,
):
    """Per-shard fused K-pattern scan for the multi-chip path: like
    scan_multi but also returns the cross-shard line-merge stats, accepts
    the word-char flag of the byte preceding the shard, and bounds match
    STARTS and newline accounting to [0, start_limit) — the shard's owned
    region — so shards of mixed-length pattern sets never double-count halo
    bytes (the analogue of the reference sharing one AC trie across chunk
    threads, krep.c:2524-2536, with the chunk overlap of krep.c:2837-2846).

    Returns (count, local_first_in_line, trail, lead, has_nl, union mask)."""
    counts, mask = _scan_raw(
        text32, true_len, prev_word,
        patterns=tuple(patterns), case_sensitive=case_sensitive,
        whole_word=whole_word, want_mask=want_mask, want_lines=True,
        want_stats=True, interpret=interpret, start_limit=start_limit,
    )
    return counts[0], counts[1], counts[2], counts[3], counts[4], mask


def scan_shard(
    text32: jax.Array,
    true_len: jax.Array,
    prev_word: jax.Array,
    start_limit: jax.Array | None = None,
    *,
    pattern: bytes,
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = False,
    interpret: bool = False,
):
    """Single-pattern scan_shard_multi (the slab loop's kernel).

    start_limit must be the slab's OWNED byte count: newlines in the
    (m-1)-byte halo belong to the NEXT slab's line accounting — counting
    them here makes trail=0 after a halo newline while the next slab
    reports lead=1 for the same line, double-counting a boundary-spanning
    matched line in -c mode (matches for a pattern containing '\\n').
    Defaults to true_len only for halo-less single-shot scans."""
    if start_limit is None:
        start_limit = true_len
    return scan_shard_multi(
        text32, true_len, prev_word, start_limit,
        patterns=(pattern,), case_sensitive=case_sensitive,
        whole_word=whole_word, want_mask=want_mask, interpret=interpret,
    )
