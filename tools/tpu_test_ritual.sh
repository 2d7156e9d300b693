#!/usr/bin/env bash
# On-chip test ritual (VERDICT r4 item 5): run the compiled-kernel test
# files against the REAL TPU (Mosaic, not interpret mode) and record the
# summary as TESTS_TPU_r{N}.txt so a toolchain bump can't silently break
# compiled kernels between rounds. Run once per round:
#
#   bash tools/tpu_test_ritual.sh
#
# The kernel files are the ones whose behavior differs between interpret
# and Mosaic compilation; the rest of the suite is chip-independent.
set -u
cd "$(dirname "$0")/.."

ROUND=$(python -c "
import json
try:
    print(int(json.loads(open('PROGRESS.jsonl').readlines()[-1])['round']))
except Exception:
    print(0)")
OUT="TESTS_TPU_r$(printf '%02d' "$ROUND").txt"

FILES="tests/test_mxu.py tests/test_pallas_swar.py tests/test_slabbed.py tests/test_sharded.py"

{
  echo "# On-chip (Mosaic-compiled) kernel test run — round $ROUND"
  echo "# date: $(date -Is)"
  echo "# files: $FILES"
  python - <<'EOF'
import jax
print(f"# jax {jax.__version__}, backend {jax.default_backend()}, devices {jax.devices()}")
EOF
  echo
  KREP_TPU_TEST_TPU=1 python -m pytest $FILES -q -p no:cacheprovider 2>&1 | tail -5
  echo
  echo "exit: $?"
} | tee "$OUT"
