"""MXU multi-pattern count kernel — "Teddy on the MXU".

The fused SWAR VPU path (pallas_swar.scan_multi) is exact but linear in K:
each pattern-phase needs its own masked word compares (measured 31.5 GB/s
at K=16, 7.7 at K=64 — BENCH_NOTES.md). The reference's answer at large K
is Aho-Corasick (aho_corasick.c:299-466), a per-byte DFA walk that has no
efficient TPU lowering (the state gather measured ~500x slower than fused
scans). This kernel instead turns multi-pattern matching into a matmul so
the MXU does the per-pattern work:

  * A match of pattern k at byte position 4w+p (word w, phase p) is a
    Hamming-distance-zero test over the window's bits. With text features
    t_{j,b} = bit b of stream byte 4w+j (j < 16) and weights
    g = (1 - 2*patbit), the distance is linear in the text bits:
        ham[(p,k), w] = sum_{j,b} t_{j,b} * g[(p,k),(j,b)] + sum(patbits)
    so  match <=> D[(p,k), w] == -sum(patbits),  where D = G @ W is ONE
    int8 matmul with contraction EXACTLY 128 (16 byte offsets x 8 bits —
    the MXU's native width). Patterns up to 13 bytes fit (p + len <= 16)
    in one dot; sets with 14..29-byte members run a SECOND dot over
    stream bytes 16..31 (words w+4..w+7) and AND the two half-window
    Hamming tests — realistic -f word sets (4-29 byte words) stay on the
    MXU instead of dropping to the K-linear VPU path.
  * W is built with elementwise ops only: the word stream is presented as
    (segments, 1024) rows (a free row-major reshape of the staged u32
    view), each segment row is sublane-broadcast to 128 rows, and bit
    (j, b) is extracted by ANDing with a per-row constant mask — no
    relayouts, no gathers, no variable shifts.
  * The (4K, 1024) distance block lives and dies in VMEM; only the hit
    count leaves the kernel. (An XLA conv formulation of the same math
    materializes the [N, K] distances in HBM — measured memory-bound.)

Count semantics match the fused path: per-pattern ALL-overlap counts
summed, i.e. the Aho-Corasick total (AC count == sum of per-pattern BMH
counts, test_multiple_patterns.c:345-471). Case-insensitive folds text
and patterns. Whole-word (-w, krep.c:1389-1420's boundary test) rides
the SAME dot rather than a per-length mask cascade: a match of row r
(phase p, length m) is word-bounded iff the bytes at offsets p-1 and
p+m from the word start are both non-word — so ~40 boundary feature
rows W_b[col(o), w] = is_word_char(byte 4w+o) (o = -1..3+maxlen, built
from the same segment extracts as W) are appended to W, and G gains
G[r, 128+col(o)] = 1 at each row's two boundary offsets. Because
Hamming distance is non-negative, D >= nb with equality exactly at a
match, and the boundary columns only ADD non-negative violations —
  D' == nb  <=>  exact match AND both boundary bytes non-word
— the whole-word test costs ~40 extra contraction rows on the existing
dot and ZERO extra vector ops at the D stage (the kernel's actual
bottleneck), independent of how many distinct pattern lengths the set
has. The is-word flag of the byte PRECEDING each 128 KiB grid block is
carried across grid steps in SMEM scratch (blocks execute in order on
TPU); block 0 takes it from the prev_flag scalar, which shard callers
set to the previous shard's last byte (mesh.build_shards_staged) so -w
stays exact at shard boundaries. Position queries route to the SWAR
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U = lambda x: jnp.uint32(x)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import LANES

SEG_WORDS = 1024          # words per segment row (4 KiB of text)
SEG_PER_STEP = 32         # segment rows per grid step (128 KiB of text)
# Segments per MXU dot (lane-concat of W blocks -> one (4Kp,128)@(128,gw)
# dot). Measured and rejected as the default: an ISOLATED (4Kp,128)@
# (128,1024) dot runs at only ~165 Top/s on v5e (pipeline fill/drain)
# vs ~560 at N=4096, and a stage-decomposed kernel shows the dot stage
# go 85 -> 142 GB/s at GSEG=4 — but the FULL K=64 kernel is flat
# (11.4 -> 10.9 GB/s): inside the real loop the compiler already
# software-pipelines the small dots behind the D-stage compare+sum,
# which is the actual bottleneck. Kept as a knob for re-testing on
# other TPU generations.
GROUP_SEGS = max(1, int(__import__("os").environ.get("KREP_TPU_MXU_GSEG", "1")))
# D-stage reduction engine: "auto" routes per kernel shape, "mxu"/"vpu"
# force one (tools/ab_dstage.py). Measured same-window A/B on v5e, 1 GiB,
# K=64: the phase-selector dot wins ONLY on the one-window count-only
# route (3b 12.72 vs 11.37 GB/s); everywhere else the extra (8, n_rows2)
# dot lands on an already-MXU-bound kernel and the VPU row-reduce wins —
# two-window 9.75 vs 9.08, boundary(-w) 7.47 vs 6.13, mask/lines 9.30
# vs 8.59.
_DSTAGE = __import__("os").environ.get("KREP_TPU_MXU_DSTAGE", "auto")
MAX_LEN = 13              # p + len <= 16 stream bytes covered by one dot
MAX_LEN_LONG = 29         # p + len <= 32 via the two-window AND (two dots)
ROWS = 128                # contraction: 16 byte offsets x 8 bits


def build_tables(patterns: tuple[bytes, ...], case_sensitive: bool,
                 whole_word: bool = False):
    """Host-side weight build. Returns (G1, nb1, G2, nb2, lens, bitmask,
    kp_s, qs) — G2/nb2 are None for an all-short set. With whole_word,
    G1 carries the boundary indicator columns appended after the 128
    Hamming columns, bitmask gains the matching boundary feature-row
    bit-select masks, and qs is the static tuple of word shifts the
    boundary features need (() unless whole_word).

    G1 (4Kp, 128) int8 covers stream bytes 0..15 of each (word, phase)
    window — the full test for patterns up to 13 bytes, and the FIRST
    half-window test for 14..29-byte patterns. Patterns are reordered
    shorts-first so the long members form an 8-row-aligned tail block
    per phase (kp_s rows of shorts+pad, then kp_l rows of longs+pad);
    G2 (4*kp_l, 128) carries ONLY the long rows' second half-window
    (stream bytes 16..31, words w+4..w+7) — the second dot's row count,
    and hence its MXU cost, scales with the long fraction instead of
    doubling the whole pass (measured: a full-width second dot landed
    BELOW the K-linear VPU path on a 4-20-byte K=64 set). Reordering is
    sound: scan_count returns a total count and a union mask, both
    order-independent. Padding rows keep negbias1 = 1 (never hit)."""
    from .literal import fold_bytes_host

    pats = [p if case_sensitive else fold_bytes_host(p) for p in patterns]
    pats.sort(key=lambda p: len(p) > MAX_LEN)  # stable: shorts first
    n_short = sum(1 for p in pats if len(p) <= MAX_LEN)
    n_long = len(pats) - n_short
    kp_s = -(-n_short // 8) * 8
    kp_l = -(-n_long // 8) * 8
    Kp = kp_s + kp_l
    # second-window contraction is truncated to the WORDS actually used:
    # max window-2 byte = max(p + len) - 16 over long rows (p <= 3), so a
    # 4-20-byte -f set builds only 1-2 of the 4 extra word-shift rowsets —
    # the W2 bit-extraction (not the dot) is the marginal cost that pushed
    # the full-width variant below the VPU path
    nwords2 = (
        0 if not n_long
        else -(-(3 + max(len(p) for p in pats) - 16) // 4)
    )
    rows2 = 32 * nwords2
    G1 = np.zeros((4 * Kp, ROWS), np.int8)
    nb1 = np.ones((4 * Kp, 1), np.int32)   # 1 => padding row never hits
    lens = np.full((4 * Kp, 1), 1 << 20, np.int32)
    G2 = np.zeros((4 * kp_l, rows2), np.int8) if n_long else None
    nb2 = np.zeros((4 * kp_l, 1), np.int32) if n_long else None
    for p in range(4):
        for k, pat in enumerate(pats):
            row = k if k < n_short else kp_s + (k - n_short)
            r1 = p * Kp + row
            s = [0, 0]
            for d, byte in enumerate(pat):
                w, j = divmod(p + d, 16)
                for b in range(8):
                    bit = (byte >> b) & 1
                    if w == 0:
                        G1[r1, 8 * j + b] = 1 - 2 * bit
                    else:
                        G2[p * kp_l + (k - n_short), 8 * j + b] = 1 - 2 * bit
                    s[w] += bit
            nb1[r1, 0] = -s[0]
            lens[r1, 0] = len(pat)
            if k >= n_short:
                nb2[p * kp_l + (k - n_short), 0] = -s[1]
    # per-W-row bit-select masks: row r = bit b of stream byte j (j=r//8,
    # b=r%8) living at bit 8*(j%4)+b of word (w + j//4); the second
    # window's rows shift by whole words only, so j%4 — and the mask —
    # are shared between windows
    bitmask = np.zeros((ROWS, 1), np.uint32)
    for r in range(ROWS):
        j, b = r // 8, r % 8
        bitmask[r, 0] = np.uint32(1) << np.uint32(8 * (j % 4) + b)
    qs = ()
    if whole_word:
        # boundary feature rows appended to W (and indicator columns to
        # G1): one group of 4 per word shift q actually touched by some
        # row's right offset o = p + m (bytes 0..3 of word w+q), plus ONE
        # row for o = -1 (the byte before the window — phase-0 rows' left
        # boundary). q = 0 is always present (left boundaries at
        # o = p-1 ∈ {0,1,2}); the group pads to a multiple of 8 for clean
        # sublane tiling.
        offs = sorted({p + len(pat) for p in range(4) for pat in pats})
        qs = tuple(sorted({0} | {o // 4 for o in offs}))
        neg_col = 4 * len(qs)
        BC = -(-(neg_col + 1) // 8) * 8
        col_of = {
            4 * q + jj: 4 * qi + jj
            for qi, q in enumerate(qs)
            for jj in range(4)
        }
        G1 = np.concatenate([G1, np.zeros((4 * Kp, BC), np.int8)], axis=1)
        mb = np.zeros((BC, 1), np.uint32)
        for qi in range(len(qs)):
            for jj in range(4):
                mb[4 * qi + jj, 0] = np.uint32(1) << np.uint32(8 * jj)
        mb[neg_col, 0] = 1  # the o=-1 feature row holds 0/1 words
        bitmask = np.concatenate([bitmask, mb], axis=0)
        for p in range(4):
            for k, pat in enumerate(pats):
                row = k if k < n_short else kp_s + (k - n_short)
                r1 = p * Kp + row
                G1[r1, ROWS + (neg_col if p == 0 else col_of[p - 1])] = 1
                G1[r1, ROWS + col_of[p + len(pat)]] = 1
    return (
        jnp.asarray(G1),
        jnp.asarray(nb1),
        None if G2 is None else jnp.asarray(G2),
        None if nb2 is None else jnp.asarray(nb2),
        jnp.asarray(lens),
        jnp.asarray(bitmask),
        kp_s,
        qs,
    )


def _make_kernel(n_rows2: int, case_sensitive: bool, strict: bool,
                 seg_per_step: int = SEG_PER_STEP, want_mask: bool = False,
                 has_limit: bool = False, windows: int = 1,
                 kp_s: int = 0, kp_l: int = 0, nwords2: int = 4,
                 whole_word: bool = False, qs: tuple = (),
                 want_lines: bool = False, nl_start: bool = False):
    SPS = seg_per_step
    def kernel(*refs):
        tl_ref = refs[0]
        g_refs = refs[1 : 1 + windows]
        nb_refs = refs[1 + windows : 1 + 2 * windows]
        len_ref, bm_ref, psel_ref, pc_ref, main_ref, halo_ref, count_ref = (
            refs[1 + 2 * windows : 8 + 2 * windows]
        )
        rest = refs[8 + 2 * windows :]
        if want_mask:
            mask_ref, scratch = rest
        else:
            (scratch,) = rest
        from .pallas_swar import swar_fold

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0] = 0
            if want_lines:
                scratch[2] = 0   # matched-line count
                scratch[3] = 0   # carry: open line already has a match

        true_len = tl_ref[0]
        # the 8-row halo block starts exactly at the segment following this
        # block (sps is a multiple of 8); only its row 0 is meaningful —
        # the rest may be block-overrun garbage past the array end
        hsel = halo_ref[0:1]
        buf = jnp.concatenate([main_ref[:], hsel], axis=0)
        if not case_sensitive:
            buf = swar_fold(buf)
        Gs = [g[:] for g in g_refs]
        nbs = [nb[:] for nb in nb_refs]
        lens = len_ref[:]
        bitmask = bm_ref[:]

        # mask output stays per-segment (its packed rows are segment-major);
        # want_lines consumes the same per-segment union rows in-kernel
        gseg = 1 if (want_mask or want_lines) else GROUP_SEGS
        while SPS % gseg:
            gseg //= 2
        gw = gseg * SEG_WORDS

        Kp = n_rows2 // 4
        if strict or has_limit:
            r2idx = jax.lax.broadcasted_iota(jnp.int32, (n_rows2, gw), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows2, gw), 1)
            phase = r2idx // Kp
            start_limit = tl_ref[1] if has_limit else None

        # phase-selector constants for the MXU-assisted D-stage reduction
        # (host-built, see scan_count: Mosaic rejects the in-kernel bool
        # iota construction with a mask relayout error): psel[ph, r] = 1
        # iff row r belongs to phase ph (rows 4..7 zero). One
        # (8, n_rows2) @ (n_rows2, gw) int8 dot replaces the VPU
        # cast-to-i32 + full-matrix row reduction of the hits block — the
        # kernel's measured bottleneck is this D stage, not the dots, so
        # moving the reduction onto the MXU (trivial extra MACs) removes
        # ~1 VPU op per hits element per segment. Row ph of the product
        # is the per-phase hit count per word (the mask path's anyp), and
        # its total is the match count. pconst[ph] = packed mask byte of
        # phase ph (1 << 8*ph; rows 4..7 zero).
        psel = psel_ref[:]
        pconst = pc_ref[:]

        # block-level word-shift arrays: E[q][r, l] = word r*SEG_WORDS+l+q
        # (aligned rolls/wheres only; row r borrows row r+1's first q words).
        # The two-window kernel extends to q<8: the second dot's W block
        # reads words w+4..w+7 (stream bytes 16..31 of the window).
        from .pallas_swar import _roll

        nrows_buf = buf.shape[0]
        lane_buf = jax.lax.broadcasted_iota(
            jnp.int32, (nrows_buf, SEG_WORDS), 1
        )
        E = [buf]
        max_shift = 4 if windows == 1 else 4 + nwords2
        for q in range(1, max_shift):
            Rq = _roll(buf, -q, axis=1)
            Sq = _roll(Rq, -1, axis=0)
            E.append(jnp.where(lane_buf < SEG_WORDS - q, Rq, Sq))

        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, SEG_WORDS), 0)

        def seg_row(Eq, s):
            # row s of Eq at sublane offset 0: aligned 8-row slice, then a
            # select-sum (Mosaic lacks misaligned single-row extracts)
            blk = jax.lax.bitcast_convert_type(
                Eq[8 * (s // 8) : 8 * (s // 8) + 8], jnp.int32
            )
            row = jnp.sum(
                jnp.where(iota8 == s % 8, blk, 0), axis=0, keepdims=True
            )
            return jax.lax.bitcast_convert_type(row, jnp.uint32)

        if whole_word:
            from .pallas_swar import swar_word_flags

            # per-byte is-word-char flags (0x01 per matching byte) over the
            # block + halo; fold leaves word-char-ness invariant so folded
            # buf is fine. strict: zero flags at/past true_len (the tail may
            # hold garbage there) so a match ending exactly at text end
            # stays word-bounded.
            wf = swar_word_flags(buf)
            rowb = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 0)
            if strict:
                bbase = ((i * SPS + rowb) * SEG_WORDS + lane_buf) * 4
                m01 = None
                for j in range(4):
                    bj = (bbase + j < true_len).astype(jnp.uint32) << _U(8 * j)
                    m01 = bj if m01 is None else (m01 | bj)
                wf = wf & m01

            # flag of the byte PRECEDING this block: carried across grid
            # steps in SMEM (TPU grid steps run in order); block 0 takes
            # the caller's prev_flag scalar (0 = start of text / non-word,
            # or the previous shard's last byte on the mesh path)
            @pl.when(i == 0)
            def _():
                scratch[1] = tl_ref[2]

            pb = scratch[1]
            # ONF[r, l] = is-word flag of the byte BEFORE word (r, l)
            # (top byte of the previous word; lane 0 borrows backward
            # across rows, [0, 0] from the carried scalar)
            B1 = _roll(wf, 1, axis=1)
            C1 = _roll(B1, 1, axis=0)
            PW = jnp.where(lane_buf == 0, C1, B1)
            ONF = (PW >> _U(24)) & _U(1)
            ONF = jnp.where(
                (rowb == 0) & (lane_buf == 0), pb.astype(jnp.uint32), ONF
            )
            WFs = {}
            for q in qs:
                if q == 0:
                    WFs[0] = wf
                else:
                    Rq = _roll(wf, -q, axis=1)
                    Sq = _roll(Rq, -1, axis=0)
                    WFs[q] = jnp.where(lane_buf < SEG_WORDS - q, Rq, Sq)
            BC = -(-(4 * len(qs) + 1) // 8) * 8

        dcount = jnp.int32(0)
        mrows = []
        wgrp = [[] for _ in range(windows)]
        for s in range(SPS):
            # rows 0..31 read word w, 32..63 word w+1, ... (concat of
            # aligned 32-row broadcasts — cheaper than 128-row selects);
            # window wi's rows read words w+4*wi..w+4*wi+3
            for wi in range(windows):
                nw = 4 if wi == 0 else nwords2
                parts = [
                    jnp.broadcast_to(
                        seg_row(E[4 * wi + q], s), (32, SEG_WORDS)
                    )
                    for q in range(nw)
                ]
                rows = 32 * nw
                if wi == 0 and whole_word:
                    # boundary feature rows ride window 0's W block: 4 per
                    # needed word shift q (bytes 0..3 of word w+q) + the
                    # o=-1 row, zero-padded to the G1 boundary columns
                    parts += [
                        jnp.broadcast_to(
                            seg_row(WFs[q], s), (4, SEG_WORDS)
                        )
                        for q in qs
                    ]
                    parts.append(seg_row(ONF, s))
                    padb = BC - (4 * len(qs) + 1)
                    if padb:
                        parts.append(
                            jnp.zeros((padb, SEG_WORDS), jnp.uint32)
                        )
                    rows += BC
                wsel = (
                    jnp.concatenate(parts, axis=0)
                    if len(parts) > 1
                    else parts[0]
                )
                bits = (wsel & bitmask[:rows]) != jnp.uint32(0)
                wgrp[wi].append(bits.astype(jnp.int8))
            if len(wgrp[0]) < gseg:
                continue
            # one dot per (window, gseg segments): lane-concat (no relayout
            # — W column c of the group is word (s0*1024 + c), contiguous).
            # Two-window: a 14..29-byte pattern hits iff BOTH half-window
            # Hamming tests pass (shifted AND at the same 128-contraction).
            # The second dot runs ONLY over the kp_l long rows per phase —
            # shorts-first row ordering keeps the long block 8-aligned, so
            # the extra MXU/compare cost scales with the long fraction
            # instead of doubling the whole pass.
            Ws = []
            for wi in range(windows):
                Ws.append(
                    wgrp[wi][0]
                    if gseg == 1
                    else jnp.concatenate(wgrp[wi], axis=1)
                )
            wgrp = [[] for _ in range(windows)]
            D = jax.lax.dot_general(
                Gs[0], Ws[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                            # (n_rows2, gw)
            hits = D == nbs[0]
            if windows == 2:
                D2 = jax.lax.dot_general(
                    Gs[1], Ws[1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                        # (4*kp_l, gw)
                hits2 = D2 == nbs[1]
                parts = []
                for ph in range(4):
                    h = hits[ph * (kp_s + kp_l) : (ph + 1) * (kp_s + kp_l)]
                    if kp_s:
                        parts.append(h[:kp_s])
                    parts.append(
                        h[kp_s:] & hits2[ph * kp_l : (ph + 1) * kp_l]
                    )
                hits = jnp.concatenate(parts, axis=0)
            if strict or has_limit:
                # strict: bound match STARTS to [0, true_len - len + 1)
                # explicitly (the default path skips this: staged padding
                # past true_len is zero and patterns are NUL-free, so
                # out-of-bounds windows can never reach distance 0 — see
                # scan_count). has_limit: bound starts to [0, start_limit)
                # — the shard's OWNED region; halo bytes past it belong to
                # the next shard (krep.c:2837-2846's chunk overlap).
                word = (i * SPS + (s + 1 - gseg)) * SEG_WORDS + lane
                start = word * 4 + phase
                if strict:
                    hits = hits & (start < true_len - lens + 1)
                if has_limit:
                    hits = hits & (start < start_limit)
            dstage_vpu = _DSTAGE == "vpu" or (
                _DSTAGE == "auto"
                and (windows == 2 or whole_word or want_mask or want_lines)
            )
            if dstage_vpu:
                # VPU D-stage: cast to i32 and row-reduce per phase (the
                # pre-r5 form, kept A/B-able — see _DSTAGE_VPU above)
                hi = hits.astype(jnp.int32)
                if want_mask or want_lines:
                    mrow = jnp.zeros((1, gw), jnp.uint32)
                    for ph in range(4):
                        anyp = jnp.sum(
                            hi[ph * Kp : (ph + 1) * Kp], axis=0,
                            keepdims=True,
                        )
                        mrow = mrow | (
                            (anyp > 0).astype(jnp.uint32) << _U(8 * ph)
                        )
                        dcount = dcount + jnp.sum(anyp)
                    mrows.append(mrow)
                else:
                    dcount = dcount + jnp.sum(hi)
            else:
                # D-stage reduction on the MXU: one cast-to-i8 per hits
                # element, then the phase-selector dot collapses the
                # (n_rows2, gw) block to per-phase hit counts (8, gw) — the
                # VPU never sweeps the hits block again (see psel above).
                # (.astype, not a where-select: Mosaic cannot relayout an i1
                # mask from i32 (8,128) tiling to i8 (32,128) tiling, but the
                # bool->i8 convert lowers fine — same idiom as the W build.)
                hits8 = hits.astype(jnp.int8)
                P4 = jax.lax.dot_general(
                    psel, hits8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                            # (8, gw) int32
                dcount = dcount + jnp.sum(P4)
                if want_mask or want_lines:
                    # union mask, v1 packed layout: byte p of word w = 1 iff
                    # some pattern starts at byte 4w+p — row ph of P4 is the
                    # per-phase hit count per word; each phase contributes a
                    # disjoint byte, so the packed word is the column SUM of
                    # the per-row selected phase bytes. (reductions stay in
                    # int32 — Mosaic lacks unsigned reduces; the packed flag
                    # bytes fit int32 losslessly)
                    pbit = jnp.where(P4 > 0, pconst, jnp.int32(0))
                    mrow = jnp.sum(
                        pbit, axis=0, keepdims=True
                    ).astype(jnp.uint32)
                    mrows.append(mrow)

        if want_mask:
            mask_ref[:] = jnp.concatenate(mrows, axis=0)
        if want_lines:
            # in-kernel matched-line accounting over this block's union
            # mask — multi-pattern -c without a mask write + chained
            # re-read (the reference's AC counts lines in-stream,
            # aho_corasick.c:390-403). The (SPS, 1024) block reshapes
            # row-major to the (sub_r, 128) tile _line_account expects;
            # flat word order (= byte order / 4) is preserved. The zero
            # tail past true_len holds neither '\n' nor mask flags, so no
            # bound compare is needed (want_lines asserts not strict).
            from .pallas_swar import _line_account

            mask_blk = jnp.concatenate(mrows, axis=0)   # (SPS, SEG_WORDS)
            sub_r = SPS * SEG_WORDS // LANES
            mw = mask_blk.reshape(sub_r, LANES)
            tw = buf[:SPS].reshape(sub_r, LANES)
            one_ = _U(0x01010101)
            v_nl = tw ^ _U(0x0A0A0A0A)
            k01 = (
                (((v_nl & _U(0x7F7F7F7F)) + _U(0x7F7F7F7F)) | v_nl)
                >> _U(7)
            ) & one_
            g = (mw & k01) if nl_start else mw
            dfirst, new_lcarry, _fw = _line_account(
                k01, g, mw, scratch[3], sub_r, use_v2=(sub_r % 256 == 0)
            )
            scratch[2] += dfirst
            scratch[3] = new_lcarry
        if whole_word:
            # carry this block's last-byte flag to the next grid step
            # (read as pb above before this write)
            w8 = wf[SPS - 8 : SPS]
            l8 = jax.lax.broadcasted_iota(jnp.int32, (8, SEG_WORDS), 1)
            lw = jnp.sum(
                jnp.where(
                    (iota8 == 7) & (l8 == SEG_WORDS - 1),
                    w8.astype(jnp.int32), 0,
                )
            )
            scratch[1] = (lw >> 24) & 1
        scratch[0] += dcount

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            count_ref[0] = scratch[0]
            if want_lines:
                count_ref[1] = scratch[2]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "patterns", "case_sensitive", "interpret", "strict", "want_mask",
        "whole_word", "want_lines",
    ),
)
def scan_count(
    text32: jax.Array,
    true_len: jax.Array,
    start_limit: jax.Array | None = None,
    prev_flag: jax.Array | int = 0,
    *,
    patterns: tuple[bytes, ...],
    case_sensitive: bool = True,
    interpret: bool = False,
    strict: bool = False,
    want_mask: bool = False,
    whole_word: bool = False,
    want_lines: bool = False,
):
    """Total ALL-overlap match count of K patterns over the staged u32 view
    (dispatch.StagedText.u32, shape (R4 + H4, 128)). Patterns must be
    1..MAX_LEN_LONG bytes. One int8 MXU matmul per 4 KiB segment when all
    patterns fit the 16-byte window (<= 13 bytes); a set with longer
    members (14..29 bytes) adds a SECOND, long-rows-only matmul per
    segment over stream bytes 16..31, and a long match requires both
    half-window Hamming tests — the extra cost scales with the long
    fraction of the set (the reference covers such sets via Aho-Corasick,
    aho_corasick.c:299-466; here long -f word sets stay on the MXU instead
    of falling to the K-linear VPU path).

    strict=False (default) relies on the staging contract: bytes at and
    beyond true_len in the staged buffer are ZERO, and patterns are
    NUL-free (CLI/-f patterns are C-string-like, as in the reference), so
    a window crossing true_len can never reach Hamming distance 0 and no
    explicit start-bound mask is needed. Pass strict=True when scanning a
    buffer whose tail past true_len may hold non-zero bytes
    (e.g. StagedText.with_len). start_limit (traced scalar) additionally
    bounds match STARTS to [0, start_limit) — the shard's owned region on
    the mesh path (halo bytes past it belong to the next shard).

    whole_word=True applies the reference's -w boundary test
    (krep.c:1389-1420) via the boundary dot (module docstring);
    prev_flag (traced scalar, 0/1) is the is-word-char flag of the byte
    preceding text32's first byte — 0 at start of text, the previous
    shard's last byte on the mesh path (mesh.build_shards_staged)."""
    if not patterns or any(
        len(p) == 0 or len(p) > MAX_LEN_LONG for p in patterns
    ):
        raise NotImplementedError("pattern length outside MXU kernel support")
    if want_lines:
        # in-kernel -c accounting relies on the fresh-staging zero-tail
        # contract (no '\n' and no match flags past true_len) and on
        # whole-block line ownership (mesh shards carry lead/trail stats
        # through the SWAR path instead)
        assert not strict and not want_mask and start_limit is None
    windows = 2 if any(len(p) > MAX_LEN for p in patterns) else 1
    rows_total, lanes = text32.shape
    assert lanes == LANES
    from .dispatch import HALO_ROWS

    R4 = rows_total - HALO_ROWS // 4
    # free row-major reshape: (rows, 128) words -> (segments, 1024)
    n_seg_total = rows_total * LANES // SEG_WORDS
    view = text32.reshape(n_seg_total, SEG_WORDS)
    n_seg_main = R4 * LANES // SEG_WORDS
    sps = SEG_PER_STEP if n_seg_main % SEG_PER_STEP == 0 else 16
    assert n_seg_main % sps == 0, "bucket too small for MXU scan"
    T = n_seg_main // sps

    G1, nb1, G2, nb2, lens, bitmask, kp_s, qs = build_tables(
        patterns, case_sensitive, whole_word
    )
    assert windows == (2 if G2 is not None else 1)
    Gs = [G1] if G2 is None else [G1, G2]
    nbs = [nb1] if nb2 is None else [nb1, nb2]
    n_rows2 = G1.shape[0]
    kp_l = 0 if G2 is None else G2.shape[0] // 4
    has_limit = start_limit is not None
    tl = jnp.stack(
        [
            true_len.astype(jnp.int32),
            (
                jnp.asarray(start_limit, jnp.int32)
                if has_limit
                else jnp.int32(0)
            ),
            jnp.asarray(prev_flag, jnp.int32),
        ]
    )

    # host-built D-stage reduction constants (see _make_kernel): the
    # phase-selector matrix and the per-phase packed mask byte column
    Kp_ = n_rows2 // 4
    psel = jnp.asarray(
        (np.arange(n_rows2)[None, :] // Kp_ == np.arange(8)[:, None])
        .astype(np.int8)
    )
    pconst = jnp.asarray(
        np.where(np.arange(8) < 4, 1 << (8 * np.minimum(np.arange(8), 3)), 0)
        .astype(np.int32)[:, None]
    )

    # constants load whole into VMEM; text = non-overlapping 32-segment
    # blocks + a 1-segment forward halo (the staged H4 zero rows are
    # exactly one extra segment, so the last halo block is in bounds)
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i, t: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            *[whole(g) for g in Gs],
            *[whole(nb) for nb in nbs],
            whole(lens),
            whole(bitmask),
            whole(psel),
            whole(pconst),
            pl.BlockSpec(
                (sps, SEG_WORDS),
                lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, SEG_WORDS),
                lambda i, t: (
                    # last block starts AT the zero segment and overruns
                    # the array by 7 rows — Pallas permits the overrun,
                    # and the kernel reads only row 0 of this block
                    (i + 1) * (sps // 8),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + (
                [
                    pl.BlockSpec(
                        (sps, SEG_WORDS),
                        lambda i, t: (i, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                if want_mask
                else []
            )
        ),
        scratch_shapes=[
            pltpu.SMEM((4 if want_lines else 2,), jnp.int32)
        ],
    )

    nwords2 = 0 if G2 is None else G2.shape[1] // 32
    kernel = _make_kernel(
        n_rows2, case_sensitive, strict, sps, want_mask, has_limit, windows,
        kp_s, kp_l, nwords2, whole_word, qs,
        want_lines=want_lines,
        nl_start=any(p[0:1] == b"\n" for p in patterns),
    )
    out_shape = [
        jax.ShapeDtypeStruct((2 if want_lines else 1,), jnp.int32)
    ]
    if want_mask:
        out_shape.append(
            jax.ShapeDtypeStruct((n_seg_main, SEG_WORDS), jnp.uint32)
        )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tl, *Gs, *nbs, lens, bitmask, psel, pconst, view, view)
    if want_mask:
        # same flat packed layout as pallas_swar's mask (word-major)
        return outs[0][0], outs[1].reshape(-1)
    if want_lines:
        # (total ALL match count, matched-line count of the union)
        return outs[0][0], outs[0][1]
    return outs[0][0]
