"""Reproduce the K=64 filter-then-verify refutation (BENCH_NOTES.md,
VERDICT r2 item 4). Three measurements:

  1. density  — host-side: true match-start density + dirty-block
                fractions for the bench 64-set and a fully-selective
                64-set (numpy, no chip needed)
  2. lut      — chip: Teddy's nibble-LUT bucket filter, cheapest TPU
                lowering (elementwise variable shift), filter-only rate
  3. gate     — chip: the per-pattern sub-tile first-word gate route
                (the production SWAR path on a selective set)

Usage: python tools/bench_teddy_refutation.py [density|lut|gate|all]
Corpus size via KREP_BENCH_BYTES (default 256 MiB).

Reference capability being measured against: aho_corasick.c:299-466
(multi-pattern search at scale); the 20 GB/s target and the refutation
terms are VERDICT round-2 item 4.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("KREP_BENCH_BYTES", str(256 << 20))

import numpy as np

SELECTIVE_WORDS = (
    "zebra oxygen kernel matrix python flange grift vector tensor socket "
    "packet quorum wizard jungle velvet fabric copper nickel silver helium "
    "neon argon xenon quartz garnet marble granite basalt gneiss schist "
    "stream buffer handle mutexy signal thread fiber actor queuez stackx "
    "heapzz branch commit merged rebase squash cherry bisect blamez logger "
    "metric tracer gauges tickrz alarmz eventz stater moncur curses parser "
    "lexerz tokens syntax trees"
).split()


def corpus_path():
    from bench import gen_corpus, CORPUS_DIR, CORPUS_BYTES

    path = os.path.join(CORPUS_DIR, f"bench_{CORPUS_BYTES}.txt")
    gen_corpus(path, CORPUS_BYTES)
    return path


def bench64_patterns():
    from bench import PATTERNS_16

    pats = []
    i = 0
    while len(pats) < 64:
        w = PATTERNS_16[i % 16]
        r = i // 16
        p = (w[:5] + str(r).encode() if r else w)[:8]
        if p not in pats:
            pats.append(p)
        i += 1
    return pats


def selective64_patterns():
    return [w.encode()[:8] for w in SELECTIVE_WORDS[:64]]


def run_density():
    buf = np.fromfile(corpus_path(), dtype=np.uint8, count=64 << 20)
    b = buf.tobytes()
    freq = np.bincount(buf, minlength=256).astype(np.float64) / len(buf)

    def true_density(pats):
        tot = 0
        for p in pats:
            st = 0
            while True:
                j = b.find(p, st)
                if j < 0:
                    break
                tot += 1
                st = j + 1
        return tot / len(buf)

    def probe_density(pats, nprobe):
        # AND of the nprobe rarest (pos, byte) probes per pattern; union.
        # An upper bound on any real filter's selectivity at that probe
        # budget — a Teddy bucket filter is strictly less selective.
        cand = np.zeros(len(buf), dtype=bool)
        for p in pats:
            order = sorted(range(len(p)), key=lambda i: freq[p[i]])[:nprobe]
            m = None
            for pos in order:
                eq = np.zeros(len(buf), dtype=bool)
                end = len(buf) - pos if pos else None
                eq[:end] = buf[pos:] == p[pos] if pos else buf == p[0]
                m = eq if m is None else (m & eq)
            cand |= m
        out = {"density": float(cand.mean())}
        for S in (256, 512, 1024, 4096):
            nb = len(buf) // S
            blocks = cand[: nb * S].reshape(nb, S).any(axis=1)
            out[f"dirty@{S}"] = float(blocks.mean())
        return out

    for name, pats in (
        ("dense64(bench)", bench64_patterns()),
        ("selective64", selective64_patterns()),
    ):
        print(f"{name} true_density={true_density(pats):.5f}")
        for np_ in (2, 3):
            r = probe_density(pats, np_)
            print(f"  probes={np_}", {k: round(v, 5) for k, v in r.items()})


def run_lut():
    import jax
    import jax.numpy as jnp

    data = np.fromfile(corpus_path(), dtype=np.uint8)
    n = len(data)
    x = jax.device_put(data)
    pats = selective64_patterns()
    NOFF = 2

    def tables(nb):
        hiT = np.zeros((nb, NOFF), np.int32)
        loT = np.zeros((nb, NOFF), np.int32)
        for k, p in enumerate(pats):
            bkt = k % nb
            for f in range(NOFF):
                hiT[bkt, f] |= 1 << (p[f] >> 4)
                loT[bkt, f] |= 1 << (p[f] & 15)
        return hiT, loT

    def make(nb):
        hiT, loT = tables(nb)

        @jax.jit
        def f(x):
            xi = x.astype(jnp.int32)
            hi = xi >> 4
            lo = xi & 15
            cand = None
            for bkt in range(nb):
                m = None
                for f_ in range(NOFF):
                    hs = hi[f_ : n - NOFF + 1 + f_]
                    ls = lo[f_ : n - NOFF + 1 + f_]
                    mb = (
                        (jnp.int32(int(hiT[bkt, f_])) >> hs)
                        & (jnp.int32(int(loT[bkt, f_])) >> ls)
                        & 1
                    )
                    m = mb if m is None else (m & mb)
                cand = m if cand is None else (cand | m)
            return jnp.sum(cand)

        return f

    for nb in (1, 4, 8):
        f = make(nb)
        c = int(f(x))
        for _ in range(2):
            t0 = time.perf_counter()
            f(x).block_until_ready()
            dt = time.perf_counter() - t0
        print(
            f"lut buckets={nb} NOFF={NOFF} cand_density={c / n:.5f} "
            f"filter_only_GB/s={n / dt / 1e9:.2f}"
        )


def run_gate():
    import jax.numpy as jnp  # noqa: F401  (forces jax init before timing)

    from bench import chained_gbps
    from krep_tpu.ops import dispatch
    from krep_tpu.ops import multi as multi_mod

    data = np.fromfile(corpus_path(), dtype=np.uint8)
    n = len(data)
    staged = dispatch.stage(data)
    pats = tuple(selective64_patterns())

    os.environ["KREP_TPU_MXU"] = "0"  # force the gated SWAR route

    def run(j):
        return multi_mod.fused_count_device(
            staged.with_len(n - j), pats, True, False, strict=True
        )

    print("gate(selective64, SWAR route) count", int(run(0)))
    print("gate GB/s:", chained_gbps(run, n))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("density", "all"):
        run_density()
    if which in ("lut", "all"):
        run_lut()
    if which in ("gate", "all"):
        run_gate()
