#!/bin/bash
# Serialized on-chip measurement pass for every A/B lever that is still
# pending a decision (concurrent TPU processes corrupt each other's
# fori_loop timings — run nothing else against the chip while this runs).
#
# Levers decided by this pass:
#   1. ops.patch.FULLMAP_INVRES      (train-path invres; bench_invres_train)
#   2. ops.patch.FULLMAP_POINTWISE   (per-patch 1x1 transpose-free form)
#   3. ops.pallas.patch_invres.RANK4_DOT (kernel stage-1/3 batched-dot form)
#   3b. ops.pallas.stem.SEL_GATHER     (lane-gather vs one-hot matmul)
#   4. train.losses method sort/select  (bench_loss)
#   5. train.metrics matmul/bincount confmat (bench_metrics)
# then the full sweep + canary to refresh BENCHMARKS.md claims.
#
# Usage: bash tools/measure_pending.sh [logfile]   (default /tmp/measure_r3.log)
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/measure_r3.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1200 env -u JAX_PLATFORMS -u XLA_FLAGS "$@" 2>&1 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run python tools/bench_invres_train.py 8 16
run python tools/bench_pointwise.py 1 8
run python tools/bench_invres.py 1
run python tools/bench_invres.py 8
run python tools/bench_stem.py 1 8
run python tools/bench_loss.py
run python tools/bench_metrics.py
run python tools/bench_train.py 16
run python bench.py
run python tools/bench_check.py
echo "DONE $LOG"
