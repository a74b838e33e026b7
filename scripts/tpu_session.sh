#!/usr/bin/env bash
# Full on-hardware validation + benchmark session, in priority order.
# Designed to be fired automatically the moment the axon TPU service
# answers a probe (it has multi-hour outages): correctness first, then
# the benchmark matrix, then the long soak. Each stage has its own
# timeout so a mid-stage service drop cannot wedge the run; the log
# survives for later triage.
#
# Usage: bash scripts/tpu_session.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
note() { printf '\n===== %s [%s] =====\n' "$*" "$(date +%H:%M:%S)" | tee -a "$LOG"; }

note "stage 1: hardware bit-exactness + e2e gates (test_tpu.sh)"
timeout 3600 bash scripts/test_tpu.sh 2>&1 | tee -a "$LOG"

note "stage 2: bench K=512 (default)"
timeout 3600 python bench.py 2>&1 | tee -a "$LOG"

note "stage 3: bench K sweep (link-latency amortization)"
SIGFISH_BENCH_K=1024 timeout 3600 python bench.py 2>&1 | tee -a "$LOG"
SIGFISH_BENCH_K=2048 timeout 3600 python bench.py 2>&1 | tee -a "$LOG"

note "stage 4: clipped-read throughput (bench_clip)"
timeout 2400 python scripts/bench_clip.py 2>&1 | tee -a "$LOG"

note "stage 5: pallas-engine differential fuzz (10 seeds)"
SIGFISH_FUZZ_ENGINE=pallas timeout 5400 \
    python scripts/parity_fuzz.py 10 43000 2>&1 | tee -a "$LOG"

note "stage 6: 50k-read soak"
timeout 3600 python scripts/soak.py 50000 2>&1 | tee -a "$LOG"

note "done"
