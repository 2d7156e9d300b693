#!/usr/bin/env python
"""Benchmarks against the reference's headline numbers (BASELINE.md).

Default: prints ONE JSON line — config 1, the `krep -c -F the` scan
throughput over ~1 GiB of English-like text (subtitles2016 is not fetchable
offline; the corpus is deterministic and count-parity against the reference
binary is checked when it is available).

`python bench.py --all` additionally runs BASELINE configs 2-5, one JSON
line each.

Timing: chained launches with a single final sync and per-iteration
distinct true_len — the axon tunnel has ~25 ms RTT per sync, an unreliable
block_until_ready, and appears to cache identical dispatches.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_GBPS = 5.7  # reference `krep -c -F the`: ~1GB / 0.1757s (README.md:171-175)
CORPUS_BYTES = int(os.environ.get("KREP_BENCH_BYTES", 1 << 30))
# Generated corpora live outside the repo so they never pollute source-size
# accounting (the round-1 LoC diagnostic counted 679k generated lines).
CORPUS_DIR = os.environ.get("KREP_BENCH_CORPUS_DIR", "/tmp/krep_bench_corpus")
PATTERN = b"the"
PATTERNS_16 = [
    b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy", b"dog",
    b"Sherlock", b"time", b"words", b"some", b"then", b"deeply", b"was", b"more",
]


def gen_corpus(path: str, size: int):
    if os.path.exists(path) and os.path.getsize(path) == size:
        return
    rng = np.random.default_rng(12345)
    words = (
        b"the quick brown fox jumps over a lazy dog and then some more words "
        b"it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    block = []
    total = 0
    with open(path, "wb") as f:
        while total < size:
            k = int(rng.integers(3, 9))
            idx = rng.integers(0, len(words), k)
            line = b" ".join(words[i] for i in idx) + b"\n"
            block.append(line)
            total += len(line)
            if len(block) >= 65536:
                f.write(b"".join(block))
                block = []
        if block:
            f.write(b"".join(block))
        f.truncate(size)


def chained_gbps(run_one, n_bytes, K=17, reps=9):
    """run_one(j) must return a device scalar; chained timing, single sync.

    The tunnel-attached chip is shared and slows down by up to ~3.5x for
    seconds at a time (measured on identical dispatches), so each
    measurement is min-filtered over many interleaved reps — the min pair
    captures a quiet window; means would report tenant noise."""
    import jax.numpy as jnp

    def timed(k):
        t0 = time.perf_counter()
        outs = [run_one(j) for j in range(k)]
        _ = int(jnp.stack(outs).sum())
        return time.perf_counter() - t0

    _ = timed(1)  # warm/compile
    t1s, tKs = [], []
    for _ in range(reps):
        t1s.append(timed(1))
        tKs.append(timed(K))
        time.sleep(0.05)
    dt = max((min(tKs) - min(t1s)) / (K - 1), 1e-9)
    return n_bytes / dt / 1e9


def emit(metric, gbps, extra=None):
    rec = {
        "metric": metric,
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def config1(staged, n, data_path):
    """-c 'the': matched-line count (the reference's headline)."""
    import jax

    from krep_tpu.ops import dispatch

    def run_one(j):
        _, lines, _ = dispatch.scan_literal_staged(
            staged.with_len(n - j),
            pattern=PATTERN, case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=True,
        )
        return lines

    gbps = chained_gbps(run_one, n)
    _, lines0, _ = dispatch.scan_literal_staged(
        staged, pattern=PATTERN, case_sensitive=True, whole_word=False,
        want_mask=False, want_lines=True,
    )
    lines0 = int(lines0)
    parity = None
    oracle = "/tmp/krep_oracle/krep"
    if os.path.exists(oracle):
        out = subprocess.run(
            [oracle, "-c", "-t", "1", PATTERN.decode(), data_path],
            capture_output=True, timeout=600,
        )
        parity = bool(int(out.stdout.rsplit(b":", 1)[-1]) == lines0)
    emit(
        "fixed-string -c scan throughput (pattern 'the', 1GiB english-like corpus)",
        gbps,
        {
            "line_count": lines0,
            "count_parity_vs_reference": parity,
            "backend": jax.default_backend(),
        },
    )


def config2(staged, n):
    """-i -w short pattern (memchr-class path), count matches."""
    from krep_tpu.ops import dispatch

    def run_one(j):
        c, _, _ = dispatch.scan_literal_staged(
            staged.with_len(n - j),
            pattern=b"e", case_sensitive=False, whole_word=True,
            want_mask=False, want_lines=False,
        )
        return c

    emit("-i -w single-char match-count scan (config 2)", chained_gbps(run_one, n))


def config3(staged, n):
    """16 literals fused (Aho-Corasick capability), total match count."""
    from krep_tpu.ops import pallas_swar

    import jax.numpy as jnp

    pats = tuple(PATTERNS_16)

    def run_one(j):
        c, _, _ = pallas_swar.scan_multi(
            staged.u32, jnp.int32(n - j), patterns=pats,
            case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=False,
        )
        return c

    emit("16-literal multi-pattern fused scan (config 3)", chained_gbps(run_one, n))

    # 64 literals, single fused pass (FUSED_MAX) — the large -f regime
    pats64 = []
    i = 0
    while len(pats64) < 64:
        w = PATTERNS_16[i % 16]
        r = i // 16
        p = (w[:5] + str(r).encode() if r else w)[:8]
        if p not in pats64:
            pats64.append(p)
        i += 1
    pats64 = tuple(pats64)

    # the routed production path (MXU bit-matmul from K=32 up)
    from krep_tpu.ops import multi as multi_mod

    def run64(j):
        # strict: with_len buffers hold live text past true_len, so the
        # MXU kernel must mask start bounds explicitly
        return multi_mod.fused_count_device(
            staged.with_len(n - j), pats64, True, False, strict=True
        )

    emit("64-literal multi-pattern count (config 3b, MXU route)", chained_gbps(run64, n))


def config4(staged, n, data_path):
    """POSIX ERE via the TPU literal-factor prefilter: the device scans for
    the required factor ('ing'), glibc regexec visits only candidate lines
    (engine/regex_engine.py). Device scan timed HBM-resident + chained like
    configs 1-3; the host ranges-loop time is added from one full pass."""
    import jax.numpy as jnp

    from krep_tpu import SearchParams
    from krep_tpu.engine import ere_analyze, regex_engine
    from krep_tpu.ops import pallas_swar

    src = b"[A-Z][a-z]+ing"
    a = ere_analyze.analyze(src)
    assert a is not None and a.newline_safe and a.literals

    def run_one(j):
        # mirrors _union_literal_starts: count-only factor scan (the mask
        # pass only runs when a slab has hits — this corpus has none)
        c, _, _ = pallas_swar.scan_multi(
            staged.u32, jnp.int32(n - j), patterns=a.literals,
            case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=False,
        )
        return c

    gbps_scan = chained_gbps(run_one, n)

    # one full end-to-end pass for the exact match count + host-side cost
    p = SearchParams(patterns=(src,), use_regex=True, count_mode=True,
                     only_matching=True)
    sz = min(os.path.getsize(data_path), 256 << 20)
    data = open(data_path, "rb").read(sz)
    t0 = time.perf_counter()
    r = regex_engine.search_regex(p, data)
    dt = time.perf_counter() - t0
    emit("POSIX ERE '[A-Z][a-z]+ing' scan (config 4, TPU factor prefilter + "
         "glibc regexec on candidate lines)",
         gbps_scan,
         {"matches": r.count,
          "end_to_end_cold_gbps": round(sz / dt / 1e9, 3)})


def config5():
    """-r --gitignore over a synthetic source tree (batched small files)."""
    import io
    import shutil

    from krep_tpu import cli

    tree = os.path.join(CORPUS_DIR, "bench_tree")
    if not os.path.exists(tree):
        rng = np.random.default_rng(7)
        os.makedirs(tree, exist_ok=True)
        words = b"the quick brown fox def class import return self value".split()
        for d in range(20):
            sub = os.path.join(tree, f"pkg{d:02d}")
            os.makedirs(sub, exist_ok=True)
            for i in range(50):
                k = rng.integers(5_000, 40_000)
                lines = []
                t = 0
                while t < k:
                    ln = b" ".join(words[j] for j in rng.integers(0, len(words), 6))
                    lines.append(ln)
                    t += len(ln) + 1
                with open(os.path.join(sub, f"m{i:03d}.py"), "wb") as f:
                    f.write(b"\n".join(lines))
        with open(os.path.join(tree, ".gitignore"), "w") as f:
            f.write("pkg19/\n")
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(tree) for f in fs
    )
    cli.main(["-r", "--gitignore", "-c", "the", tree], out=io.BytesIO())  # warm
    out = io.BytesIO()
    t0 = time.perf_counter()
    cli.main(["-r", "--gitignore", "-c", "the", tree], out=out)
    dt = time.perf_counter() - t0
    emit("-r --gitignore source-tree scan (config 5, end-to-end warm)",
         total / dt / 1e9, {"files": out.getvalue().count(b"\n"), "seconds": round(dt, 3)})


def main():
    os.makedirs(CORPUS_DIR, exist_ok=True)
    path = os.path.join(CORPUS_DIR, f"bench_{CORPUS_BYTES}.txt")
    gen_corpus(path, CORPUS_BYTES)

    from krep_tpu.ops import dispatch

    data = np.memmap(path, dtype=np.uint8, mode="r")
    n = data.shape[0]
    staged = dispatch.stage(data)

    config1(staged, n, path)
    if "--all" in sys.argv:
        config2(staged, n)
        config3(staged, n)
        config4(staged, n, path)
        config5()


if __name__ == "__main__":
    main()
