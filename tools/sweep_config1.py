#!/usr/bin/env python
"""Config-1 (-c 'the', 1 GiB) knob sweep on the real chip.

Runs bench.py's headline config in a fresh subprocess per knob combo
(KREP_TPU_TILE x KREP_TPU_BLOCKMUL), parses the JSON line, and prints a
table sorted by rate. The chip is shared and its quiet-window variance
is +/-40%, so each combo is benched back-to-back and the whole sweep
should be repeated before concluding (BENCH_NOTES.md methodology).

Usage: python tools/sweep_config1.py [--combos "2048:1,1024:1,1024:2"]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_combo(tile: str, mult: str, timeout_s: float):
    env = dict(os.environ)
    env["KREP_TPU_TILE"] = tile
    env["KREP_TPU_BLOCKMUL"] = mult
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, "timeout"
    last = None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "value" in rec:
                last = rec
    if last is None:
        return None, (r.stderr or r.stdout)[-300:]
    return last, None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", default="2048:1,1024:1,1024:2,2048:2")
    ap.add_argument("--timeout", type=float, default=2400.0)
    a = ap.parse_args()
    rows = []
    for combo in a.combos.split(","):
        tile, mult = combo.strip().split(":")
        rec, err = run_combo(tile, mult, a.timeout)
        if rec is None:
            print(f"tile={tile} mult={mult}: FAILED {err}", flush=True)
            continue
        ok = rec.get("count_parity_vs_reference")
        backend = rec.get("backend", "?")
        rows.append((rec["value"], tile, mult, ok, backend))
        print(
            f"tile={tile} mult={mult}: {rec['value']} GB/s "
            f"parity={ok} backend={backend}",
            flush=True,
        )
    rows.sort(reverse=True)
    if rows:
        v, tile, mult, ok, backend = rows[0]
        print(
            f"best: {v} GB/s at tile={tile} mult={mult} "
            f"(parity={ok}, backend={backend})"
        )
        if backend != "tpu":
            print("NOTE: chip outage fallback — numbers are not chip rates")
    return 0


if __name__ == "__main__":
    sys.exit(main())
