#!/usr/bin/env python
"""Long-horizon differential soak against the reference binary.

CI pins fixed fuzz seeds for determinism (tests/test_fuzz_oracle.py,
tests/test_fuzz_regex.py); this tool drives the SAME generators through
fresh seed space for a wall-clock budget — an open-ended randomized
search for parity bugs on the literal CLI surface and the ERE surface
(the reference's loops at krep.c:1389-1579 / 4371-4503 and our whole
engine stack behind them).

Usage:
    python tools/soak_fuzz.py [--seconds 1800] [--seed-base N]

Runs on the CPU platform (chip-independent). Prints a progress line per
minute; on the first mismatch prints a standalone repro (seed + args +
corpus file kept in /tmp) and exits 1. Exit 0 = budget exhausted clean.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tests")]

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("KREP_TPU_STRICT", "1")

import numpy as np  # noqa: E402

import oracle  # noqa: E402
import test_fuzz_oracle as fo  # noqa: E402
import test_fuzz_regex as fr  # noqa: E402
from krep_tpu import cli  # noqa: E402


def fail(kind: int, seed: int, case: int, args, text: bytes,
         got: bytes, want: bytes, rc: int, wrc: int) -> None:
    keep = tempfile.NamedTemporaryFile(
        prefix="soak_repro_", suffix=".txt", delete=False
    )
    keep.write(text)
    keep.close()
    print(
        f"MISMATCH kind={kind} seed={seed} case={case}\n"
        f"  args: {args} + {keep.name}\n"
        f"  rc {rc} vs oracle {wrc}\n"
        f"  got[:300]:  {got[:300]!r}\n"
        f"  want[:300]: {want[:300]!r}",
        flush=True,
    )
    sys.exit(1)


def literal_batch(seed: int, cases: int) -> int:
    rng = np.random.default_rng(seed)
    for case in range(cases):
        text, args = fo.gen_case(rng)
        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
            f.write(text)
            path = f.name
        try:
            out = io.BytesIO()
            rc = cli.main([*args, path], out=out)
            want, wrc = oracle.run([*args, path])
            got_n = out.getvalue().replace(path.encode(), b"F")
            want_n = want.replace(path.encode(), b"F")
            if got_n != want_n or rc != wrc:
                fail(0, seed, case, args, text, got_n, want_n, rc, wrc)
        finally:
            os.unlink(path)
    return cases


def ere_batch(seed: int, cases: int) -> int:
    import subprocess

    rng = np.random.default_rng(seed)
    for case in range(cases):
        text = fr.gen_corpus(rng)
        pat = fr.gen_pattern(rng)
        flags = fr.gen_flags(rng)
        if fr.ref_would_hang(pat, flags):
            flags.append("-c")  # dodge the reference's print-mode hang
        args = ["-E", *flags, "-e", pat.decode("latin1")]
        try:
            got, rc, want, wrc = fr.run_cli_vs_oracle(text, args)
        except subprocess.TimeoutExpired:
            # an UNDODGED reference hang: report it (it's a finding about
            # the reference worth pinning) and keep soaking
            print(f"REF-HANG seed={seed} case={case} args={args}",
                  flush=True)
            continue
        if got != want or rc != wrc:
            fail(1, seed, case, args, text, got, want, rc, wrc)
    return cases


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=1800.0)
    ap.add_argument(
        "--seed-base", type=int, default=None,
        help="default: derived from the clock (printed for repro)",
    )
    a = ap.parse_args()
    if oracle.ensure_oracle() is None:
        print("reference oracle unavailable; nothing to diff", flush=True)
        return 2
    base = a.seed_base if a.seed_base is not None else int(time.time())
    print(f"soak: seed-base={base} budget={a.seconds:.0f}s", flush=True)
    t0 = time.time()
    last = t0
    total = 0
    rounds = 0
    while time.time() - t0 < a.seconds:
        total += literal_batch(base + 2 * rounds, 20)
        total += ere_batch(base + 2 * rounds + 1, 15)
        rounds += 1
        now = time.time()
        if now - last >= 60:
            print(
                f"  t+{now - t0:5.0f}s  {total} cases clean", flush=True
            )
            last = now
    print(f"soak clean: {total} cases in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
