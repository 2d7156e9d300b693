#!/usr/bin/env python
"""Dev A/B: time the MXU multi-pattern routes (configs 3b/3c/3w/3L) under
the current KREP_TPU_MXU_DSTAGE setting ("mxu" phase-selector dot vs "vpu"
cast+row-reduce). Run once per setting:

    KREP_TPU_MXU_DSTAGE=mxu python tools/ab_dstage.py
    KREP_TPU_MXU_DSTAGE=vpu python tools/ab_dstage.py

Uses bench.py's corpus, pattern sets, and chained min-filtered timing so
numbers are directly comparable to the BENCH_ALL artifact.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    size = int(os.environ.get("KREP_BENCH_BYTES", 1 << 30))
    os.makedirs(bench.CORPUS_DIR, exist_ok=True)
    path = os.path.join(bench.CORPUS_DIR, f"bench_{size}.txt")
    bench.gen_corpus(path, size)

    from krep_tpu.ops import dispatch, multi as multi_mod

    data = np.memmap(path, dtype=np.uint8, mode="r")
    n = data.shape[0]
    zdata = np.array(data[:n])
    zdata[-16:] = 0
    staged_z = dispatch.stage(zdata)
    del zdata

    # bench.py config 3b set (64 fixed <=8B literals)
    pats64 = []
    i = 0
    while len(pats64) < 64:
        w = bench.PATTERNS_16[i % 16]
        r = i // 16
        p = (w[:5] + str(r).encode() if r else w)[:8]
        if p not in pats64:
            pats64.append(p)
        i += 1
    pats64 = tuple(pats64)

    # bench.py config 3c/3w set (64 mixed 4-20B)
    rng3c = np.random.default_rng(777)
    corpus_words = (
        b"the quick brown fox jumps over a lazy dog and then some more "
        b"words it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    pats_mixed = []
    while len(pats_mixed) < 64:
        k = int(rng3c.integers(1, 4))
        ws = [corpus_words[int(j)]
              for j in rng3c.integers(0, len(corpus_words), k)]
        p = b" ".join(ws)[: int(rng3c.integers(4, 21))]
        if len(p) >= 4 and p not in pats_mixed:
            pats_mixed.append(p)
    pats_mixed = tuple(pats_mixed)

    ds = os.environ.get("KREP_TPU_MXU_DSTAGE", "auto")
    configs = {
        "3b": lambda j: multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats64, True, False, strict=False),
        "3c": lambda j: multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats_mixed, True, False, strict=False),
        "3w": lambda j: multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats_mixed, True, True, strict=False),
        "3L": lambda j: multi_mod.fused_lines_device(
            staged_z.with_len(n - j, tail_zero=True), pats_mixed, True,
            False),
    }
    only = os.environ.get("AB_ONLY")
    for name, run_one in configs.items():
        if only and name not in only.split(","):
            continue
        try:
            gbps, reps = bench.chained_gbps(run_one, n)
        except Exception as e:
            print(json.dumps({"config": name, "dstage": ds,
                              "failed": f"{type(e).__name__}: {e}"}))
            continue
        print(json.dumps({
            "config": name, "dstage": ds, "gbps": round(gbps, 3),
            "median": reps["pair_gbps_median"], "reps": reps,
        }))


if __name__ == "__main__":
    main()
