"""Fused literal-scan Pallas TPU kernel.

One pass over the text in (TILE_ROWS, 128) uint8 tiles through VMEM computes,
per tile:

  * the dense all-starts match mask (the union of what the reference's
    memchr/BMH/SSE4.2/AVX2/AVX-512/NEON kernels detect, krep.c:1210-5287):
    for each pattern offset j the tile is compared against pattern[j]
    shifted left by j bytes — the multi-byte generalization of the
    first/last-byte broadcast scheme at krep.c:4907-4976. Byte shifts are a
    lane roll + two row rolls + select (no gathers).
  * optional ASCII case fold (krep.c:124-134) fused into the compare,
  * optional whole-word boundary filter (krep.h:298-319) as two shifted
    word-char masks,
  * the matched-line count via a segmented boolean OR-scan with reset at
    newlines — the exact "-c" dedup of krep.c:1331-1351 — carried across
    tiles in SMEM (the TPU grid is sequential per core),
  * the total match count,
  * optionally the mask itself as uint8 for host-side position extraction.

The forward halo (HALO_ROWS rows) is delivered by a second BlockSpec over
the same array — the analogue of the chunk overlap at krep.c:2837-2846.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import HALO_ROWS, LANES, TILE_ROWS
from .literal import fold_bytes_host

NEWLINE = 10


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _fold_tile(x):
    return jnp.where((x >= 0x41) & (x <= 0x5A), x + jnp.uint8(32), x)


def _is_word(x):
    return (
        ((x >= 0x30) & (x <= 0x39))
        | ((x >= 0x41) & (x <= 0x5A))
        | ((x >= 0x61) & (x <= 0x7A))
        | (x == 0x5F)
    )


def _roll(x, shift, axis):
    """pltpu.roll with any-sign shift (kernel-time constant).

    Mosaic only implements vector rotates for 32-bit element types — callers
    keep roll operands in int32 (the byte tile is upcast once per grid step).
    """
    size = x.shape[axis]
    shift = shift % size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=axis)


def _shift_flat(buf32, j, lane_idx):
    """Flat left-shift by j bytes of a (TILE+HALO, 128) row-major int32
    buffer, returning the (TILE_ROWS, 128) view at offset j."""
    rs, ls = divmod(j, LANES)
    if ls == 0:
        if rs == 0:
            return buf32[:TILE_ROWS]
        return _roll(buf32, -rs, axis=0)[:TILE_ROWS]
    rolled = _roll(buf32, -ls, axis=1)
    v0 = _roll(rolled, -rs, axis=0)[:TILE_ROWS] if rs else rolled[:TILE_ROWS]
    v1 = _roll(rolled, -(rs + 1), axis=0)[:TILE_ROWS]
    return jnp.where(lane_idx < LANES - ls, v0, v1)


def _seg_scan_lane(A, B, lane_idx):
    """Inclusive scan along lanes of the affine-bool composition
    (A1,B1)∘(A2,B2) = (A1&A2, (B1&A2)|B2), elem1 earlier. A/B are int32 0/1."""
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
    """Inclusive scan along rows (axis 0) of (nrows, 1) int32 0/1 arrays."""
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


def _make_kernel(pattern: bytes, case_sensitive: bool, whole_word: bool, want_mask: bool):
    m = len(pattern)
    pat = pattern if case_sensitive else fold_bytes_host(pattern)

    def kernel(truelen_ref, main_ref, halo_ref, count_ref, *rest):
        if want_mask:
            mask_ref, scratch = rest
        else:
            (scratch,) = rest

        i = pl.program_id(0)
        nprog = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            scratch[0] = 0  # match count
            scratch[1] = 0  # matched-line count
            scratch[2] = 0  # carry: open line already has a match
            scratch[3] = 0  # carry: last byte of previous tile is word-char

        buf = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
        if not case_sensitive:
            buf = _fold_tile(buf)
        # Mosaic vector rotates require 32-bit elements: upcast once.
        buf32 = buf.astype(jnp.int32)
        tile32 = buf32[:TILE_ROWS]

        shape = (TILE_ROWS, LANES)
        lane_idx = _iota2(shape, 1)
        row_idx = _iota2(shape, 0)

        # --- all-starts mask (int32 0/1) ---
        acc = (tile32 == pat[0]).astype(jnp.int32)
        for j in range(1, m):
            acc &= (_shift_flat(buf32, j, lane_idx) == pat[j]).astype(jnp.int32)

        # valid starts: global index ≤ true_len - m
        true_len = truelen_ref[0]
        g = (i * TILE_ROWS + row_idx) * LANES + lane_idx
        acc &= (g <= true_len - m).astype(jnp.int32)

        if whole_word:
            wc = _is_word(buf32).astype(jnp.int32)
            wc_tile = wc[:TILE_ROWS]
            # after: byte at start+m must be non-word (padding is 0 → ok)
            after = _shift_flat(wc, m, lane_idx)
            # before: byte at start-1 (flat right shift by 1 with SMEM carry)
            L = _roll(wc_tile, 1, axis=1)
            U = _roll(L, 1, axis=0)
            before = jnp.where(lane_idx > 0, L, U)
            at00 = (row_idx == 0) & (lane_idx == 0)
            before = jnp.where(at00, scratch[3], before)
            acc &= (1 - before) & (1 - after)
            scratch[3] = jnp.max(
                jnp.where(
                    (row_idx == TILE_ROWS - 1) & (lane_idx == LANES - 1), wc_tile, 0
                )
            )

        scratch[0] += jnp.sum(acc)

        # --- matched-line count: segmented OR-scan, reset at newlines ---
        # state s_after = (s_before | match) & ~nl  ⇒  affine (A=~nl, B=match&~nl)
        A = (tile32 != NEWLINE).astype(jnp.int32)
        B = acc & A
        Ai, Bi = _seg_scan_lane(A, B, lane_idx)
        # exclusive within row
        LEA = _roll(Ai, 1, axis=1)
        LEB = _roll(Bi, 1, axis=1)
        first_lane = lane_idx == 0
        LEA = jnp.where(first_lane, 1, LEA)
        LEB = jnp.where(first_lane, 0, LEB)
        # row totals → exclusive row prefix
        RA = Ai[:, LANES - 1 :]
        RB = Bi[:, LANES - 1 :]
        ridx = _iota2((TILE_ROWS, 1), 0)
        RAi, RBi = _seg_scan_rows(RA, RB, ridx, TILE_ROWS)
        RPA = _roll(RAi, 1, axis=0)
        RPB = _roll(RBi, 1, axis=0)
        first_row = ridx == 0
        RPA = jnp.where(first_row, 1, RPA)
        RPB = jnp.where(first_row, 0, RPB)

        carry = scratch[2]
        row_state = (carry & RPA) | RPB          # (TILE_ROWS, 1)
        s_before = (row_state & LEA) | LEB       # broadcast along lanes
        first = acc & (1 - s_before)
        scratch[1] += jnp.sum(first)
        # carry' = (carry & A_tot) | B_tot  (tile totals = last row inclusive)
        last_row = ridx == TILE_ROWS - 1
        a_tot = jnp.max(jnp.where(last_row, RAi, 0))
        b_tot = jnp.max(jnp.where(last_row, RBi, 0))
        scratch[2] = (carry & a_tot) | b_tot

        if want_mask:
            mask_ref[:] = acc.astype(jnp.uint8)

        @pl.when(i == nprog - 1)
        def _():
            count_ref[0] = scratch[0]
            count_ref[1] = scratch[1]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("pattern", "case_sensitive", "whole_word", "want_mask", "interpret"),
)
def scan_literal(
    text: jax.Array,
    true_len: jax.Array,
    *,
    pattern: bytes,
    case_sensitive: bool = True,
    whole_word: bool = False,
    want_mask: bool = True,
    interpret: bool = False,
):
    """Fused literal scan. `text` must be in the staged layout
    (dispatch.stage_text): 128*(R+HALO_ROWS) bytes, R % TILE_ROWS == 0.

    Returns (match_count i32, matched_line_count i32, mask_u8 (R*128,)).
    When want_mask=False the mask output is a (128,) zero placeholder.
    """
    n = text.shape[0]
    assert n % LANES == 0, n
    rows_total = n // LANES
    R = rows_total - HALO_ROWS
    assert R > 0 and R % TILE_ROWS == 0, rows_total
    T = R // TILE_ROWS
    m = len(pattern)
    if m == 0 or m > HALO_ROWS * LANES:
        raise NotImplementedError("pattern length outside kernel support")

    text2d = text.reshape(rows_total, LANES)
    tl = jnp.reshape(true_len.astype(jnp.int32), (1,))

    kernel = _make_kernel(pattern, case_sensitive, whole_word, want_mask)

    out_shape = [jax.ShapeDtypeStruct((2,), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if want_mask:
        out_shape.append(jax.ShapeDtypeStruct((R, LANES), jnp.uint8))
        out_specs.append(
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i, tl_ref: (i, 0), memory_space=pltpu.VMEM
            )
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, tl_ref: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i, tl_ref: ((i + 1) * (TILE_ROWS // HALO_ROWS), 0),
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
    )(tl, text2d, text2d)

    counts = outs[0]
    if want_mask:
        mask = outs[1].reshape(-1)
    else:
        mask = jnp.zeros((LANES,), jnp.uint8)
    return counts[0], counts[1], mask
