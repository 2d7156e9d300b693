#!/usr/bin/env python
"""Dev A/B: config-1 TILE/BLOCKMUL combos in ONE process.

KREP_TPU_TILE and KREP_TPU_BLOCKMUL are read at call time (_pick_tile /
_scan_raw), so combos can be timed back-to-back against the SAME staged
1 GiB corpus — no per-combo restage, unlike tools/sweep_config1.py
(kept for end-to-end bench.py sweeps). Each combo pays one fresh kernel
compile (new tile shape) and then bench.chained_gbps' min-filtered
chained timing, so numbers are directly comparable to the artifact.

Usage: python tools/ab_config1.py [--combos "2048:2,1024:4,1024:2"]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", default="2048:2,1024:4,1024:2")
    a = ap.parse_args()

    os.makedirs(bench.CORPUS_DIR, exist_ok=True)
    path = os.path.join(bench.CORPUS_DIR, f"bench_{bench.CORPUS_BYTES}.txt")
    bench.gen_corpus(path, bench.CORPUS_BYTES)

    from krep_tpu.ops import dispatch

    data = np.memmap(path, dtype=np.uint8, mode="r")
    n = data.shape[0]
    staged = dispatch.stage(data)

    base = None
    for combo in a.combos.split(","):
        tile, mult = combo.strip().split(":")
        os.environ["KREP_TPU_TILE"] = tile
        os.environ["KREP_TPU_BLOCKMUL"] = mult

        def run_one(j):
            _, lines, _ = dispatch.scan_literal_staged(
                staged.with_len(n - j),
                pattern=bench.PATTERN, case_sensitive=True,
                whole_word=False, want_mask=False, want_lines=True,
                want_count=False, assume_zero_tail=True,
            )
            return lines

        try:
            gbps, reps = bench.chained_gbps(run_one, n)
        except Exception as e:
            print(json.dumps({"combo": combo,
                              "failed": f"{type(e).__name__}: {e}"}),
                  flush=True)
            continue
        # parity across combos: identical line counts (oracle checked by
        # bench.py's headline run; here combos must agree with each other)
        from krep_tpu.ops import dispatch as d2

        _, lines0, _ = d2.scan_literal_staged(
            staged, pattern=bench.PATTERN, case_sensitive=True,
            whole_word=False, want_mask=False, want_lines=True,
            want_count=False,
        )
        lines0 = int(lines0)
        if base is None:
            base = lines0
        print(json.dumps({
            "combo": combo, "gbps": round(gbps, 3),
            "median": reps["pair_gbps_median"],
            "max": reps["pair_gbps_max"],
            "lines": lines0, "agree": lines0 == base,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
