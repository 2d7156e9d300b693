#!/usr/bin/env python
"""Dev tool: time Pallas kernel variants on the real chip to attribute cost.

Usage: python tools/bench_kernel.py [size_mb]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from krep_tpu.ops import dispatch  # noqa: E402
from krep_tpu.ops.dispatch import HALO_ROWS, LANES, TILE_ROWS  # noqa: E402
from krep_tpu.ops import pallas_scan as ps  # noqa: E402


def variant_kernel(mode: str, m: int, pat: bytes):
    """mode: count_only | compares_only | lines_only | full | passthrough"""

    def kernel(tl_ref, main_ref, halo_ref, count_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0] = 0
            scratch[1] = 0
            scratch[2] = 0
            scratch[3] = 0

        shape = (TILE_ROWS, LANES)
        lane_idx = ps._iota2(shape, 1)
        row_idx = ps._iota2(shape, 0)

        if mode == "passthrough":
            scratch[0] += jnp.sum(main_ref[:].astype(jnp.int32))
        else:
            buf = jnp.concatenate([main_ref[:], halo_ref[:]], axis=0)
            buf32 = buf.astype(jnp.int32)
            tile32 = buf32[:TILE_ROWS]
            acc = (tile32 == pat[0]).astype(jnp.int32)
            for j in range(1, m):
                acc &= (ps._shift_flat(buf32, j, lane_idx) == pat[j]).astype(jnp.int32)
            true_len = tl_ref[0]
            g = (i * TILE_ROWS + row_idx) * LANES + lane_idx
            acc &= (g <= true_len - m).astype(jnp.int32)
            scratch[0] += jnp.sum(acc)
            if mode in ("lines_only", "full"):
                A = (tile32 != 10).astype(jnp.int32)
                B = acc & A
                Ai, Bi = ps._seg_scan_lane(A, B, lane_idx)
                LEA = ps._roll(Ai, 1, axis=1)
                LEB = ps._roll(Bi, 1, axis=1)
                first_lane = lane_idx == 0
                LEA = jnp.where(first_lane, 1, LEA)
                LEB = jnp.where(first_lane, 0, LEB)
                RA = Ai[:, LANES - 1 :]
                RB = Bi[:, LANES - 1 :]
                ridx = ps._iota2((TILE_ROWS, 1), 0)
                RAi, RBi = ps._seg_scan_rows(RA, RB, ridx, TILE_ROWS)
                RPA = ps._roll(RAi, 1, axis=0)
                RPB = ps._roll(RBi, 1, axis=0)
                first_row = ridx == 0
                RPA = jnp.where(first_row, 1, RPA)
                RPB = jnp.where(first_row, 0, RPB)
                carry = scratch[2]
                row_state = (carry & RPA) | RPB
                s_before = (row_state & LEA) | LEB
                first = acc & (1 - s_before)
                scratch[1] += jnp.sum(first)
                last_row = ridx == TILE_ROWS - 1
                a_tot = jnp.max(jnp.where(last_row, RAi, 0))
                b_tot = jnp.max(jnp.where(last_row, RBi, 0))
                scratch[2] = (carry & a_tot) | b_tot

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            count_ref[0] = scratch[0]
            count_ref[1] = scratch[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "pattern"))
def run_variant(text, true_len, *, mode, pattern):
    n = text.shape[0]
    rows_total = n // LANES
    R = rows_total - HALO_ROWS
    T = R // TILE_ROWS
    text2d = text.reshape(rows_total, LANES)
    tl = jnp.reshape(true_len.astype(jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i, t: ((i + 1) * (TILE_ROWS // HALO_ROWS), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
    )
    out = pl.pallas_call(
        variant_kernel(mode, len(pattern), pattern),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2,), jnp.int32)],
    )(tl, text2d, text2d)
    return out[0]


def main():
    sz = int(sys.argv[1]) << 20 if len(sys.argv) > 1 else 1 << 28
    data = np.random.default_rng(0).integers(97, 123, sz, dtype=np.uint8)
    arr, n = dispatch.stage_text(data)
    for mode in ["passthrough", "compares_only", "full"]:
        t0 = time.time()
        c = run_variant(arr, n, mode=mode, pattern=b"the")
        print(f"{mode}: compile {time.time()-t0:.1f}s count={int(c[0])} lines={int(c[1])}")
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            c = run_variant(arr, n, mode=mode, pattern=b"the")
            _ = int(c[0])
        dt = (time.time() - t0) / iters
        print(f"  {dt*1000:.1f} ms -> {sz/dt/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
