#!/usr/bin/env bash
# Head-to-head vs the reference binary (the analogue of the reference's
# test/benchmark_krep_vs_rg.sh): counts must agree before timing.
#
# Usage: tools/bench_vs_reference.sh [CORPUS] [PATTERN] [RUNS]
set -euo pipefail

CORPUS="${1:-${KREP_BENCH_CORPUS_DIR:-/tmp/krep_bench_corpus}/bench_1073741824.txt}"
PATTERN="${2:-the}"
RUNS="${3:-3}"
REF_BIN="${KREP_REF:-/tmp/krep_oracle/krep}"

if [[ ! -f "$CORPUS" ]]; then
  echo "corpus missing — run 'python bench.py' once to generate it" >&2
  exit 1
fi
if [[ ! -x "$REF_BIN" ]]; then
  echo "reference binary missing at $REF_BIN (make -C /tmp/krep_oracle)" >&2
  exit 1
fi

ours_count=$(python -m krep_tpu.cli -c "$PATTERN" "$CORPUS" 2>/dev/null | awk -F: '{print $NF}')
ref_count=$("$REF_BIN" -c -t 1 "$PATTERN" "$CORPUS" | awk -F: '{print $NF}')
if [[ "$ours_count" != "$ref_count" ]]; then
  echo "COUNT MISMATCH: ours=$ours_count reference=$ref_count" >&2
  exit 1
fi
echo "count parity OK ($ours_count matching lines)"

avg() {
  local cmd=("$@") total=0 t t0 t1
  for _ in $(seq "$RUNS"); do
    t0=$(date +%s.%N)
    "${cmd[@]}" >/dev/null 2>&1 || true
    t1=$(date +%s.%N)
    total=$(awk -v a="$total" -v s="$t0" -v e="$t1" 'BEGIN{print a+(e-s)}')
  done
  awk -v s="$total" -v r="$RUNS" 'BEGIN{printf "%.3f", s/r}'
}

ref_t=$(avg "$REF_BIN" -c "$PATTERN" "$CORPUS")
echo "reference (all cores, warm cache): ${ref_t}s"
ours_t=$(avg python -m krep_tpu.cli -c "$PATTERN" "$CORPUS")
echo "krep-tpu end-to-end (cold process, incl. jax import + host->device staging): ${ours_t}s"
echo "NOTE: krep-tpu's end-to-end time here is dominated by process start +"
echo "staging; the on-chip scan rate is reported by 'python bench.py'."
