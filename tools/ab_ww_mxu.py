"""On-chip A/B: whole-word K>=32 multi-pattern — MXU boundary-dot route
vs the fused SWAR (VPU) path. Decides whether routing -w sets to the MXU
(ops/multi._mxu_eligible no longer fences whole_word) is a win on real
hardware. Usage: python tools/ab_ww_mxu.py [size_bytes]."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 27)
    os.environ.setdefault("KREP_BENCH_BYTES", str(size))
    import bench

    bench.CORPUS_BYTES = size
    os.makedirs(bench.CORPUS_DIR, exist_ok=True)
    path = os.path.join(bench.CORPUS_DIR, f"bench_{size}.txt")
    bench.gen_corpus(path, size)
    data = np.fromfile(path, np.uint8)
    n = len(data)

    from krep_tpu.ops import dispatch, multi, mxu_multi, pallas_swar

    zdata = np.array(data[:n])
    zdata[-16:] = 0
    staged_z = dispatch.stage(zdata)
    del zdata

    # the config-3c/3w mixed-length set (4-20 byte corpus substrings)
    pats = []
    i = 1000
    while len(pats) < 64:
        ln = 4 + (i * 7) % 17
        p = bytes(data[i : i + ln])
        i += 131
        if b"\n" in p or b"\x00" in p or p in pats:
            continue
        pats.append(p)
    pats = tuple(pats)
    assert multi._mxu_eligible(pats, whole_word=True)

    import jax.numpy as jnp

    def run_mxu(j):
        total = None
        for k in range(0, len(pats), multi.MXU_MAX_PASS):
            g = pats[k : k + multi.MXU_MAX_PASS]
            c = mxu_multi.scan_count(
                staged_z.u32, jnp.int32(n - j), patterns=g,
                case_sensitive=True, whole_word=True, strict=False,
            )
            total = c if total is None else total + c
        return total

    def run_swar(j):
        total = None
        for k in range(0, len(pats), multi.FUSED_MAX):
            g = pats[k : k + multi.FUSED_MAX]
            c, _, _ = pallas_swar.scan_multi(
                staged_z.u32, jnp.int32(n - j), patterns=g,
                case_sensitive=True, whole_word=True,
                want_mask=False, want_lines=False, assume_zero_tail=True,
            )
            total = c if total is None else total + c
        return total

    c_mxu = int(run_mxu(0))
    c_swar = int(run_swar(0))
    print(f"counts: mxu={c_mxu} swar={c_swar} equal={c_mxu == c_swar}")
    g_mxu, r_mxu = bench.chained_gbps(run_mxu, n)
    g_swar, r_swar = bench.chained_gbps(run_swar, n)
    print(f"MXU  boundary-dot: {g_mxu:7.2f} GB/s  "
          f"(min {r_mxu['pair_gbps_min']}, med {r_mxu['pair_gbps_median']}, "
          f"max {r_mxu['pair_gbps_max']})")
    print(f"SWAR fused (VPU) : {g_swar:7.2f} GB/s  "
          f"(min {r_swar['pair_gbps_min']}, med {r_swar['pair_gbps_median']}, "
          f"max {r_swar['pair_gbps_max']})")


if __name__ == "__main__":
    main()
