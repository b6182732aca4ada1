#!/bin/bash
# Round-4 TPU queue, part A — verify drive + the round-3 unmeasured perf
# items (VERDICT r3 #1-#4):
# (1) user-surface verify drive (gen-mnist → train → evaluate → rollout →
#     resume → convert-checkpoint → overfit) per .claude/skills/verify;
# (2) headline bench COLD then WARM back-to-back — measures the new
#     persistent XLA compilation cache (utils/compile_cache.py);
# (3) gradient-accumulation sweep, BOTH families (cost_cloud.py accum);
# (4) int8 PTQ throughput, BOTH families (bench_int8.py both — the
#     resnet row is the family's named lever, docs/PERF.md);
# (5) serving latency p50/p95/p99 at production geometry, bf16 + int8.
#
#   usage: bash scripts/tpu_queue_r4a.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=R4A
tpu_queue_acquire

# budgets sized for a degraded tunnel (~400 s per fresh compile observed
# 2026-08-20; each step compiles several programs)
tpu_queue_step 1 verify_drive 5400 bash scripts/verify_drive_r4.sh
tpu_queue_step 2 bench_cold 1800 python bench.py
tpu_queue_step 3 bench_warm 1800 python bench.py
tpu_queue_step 4 accum 7200 python scripts/perf/cost_cloud.py accum
tpu_queue_step 5 int8_both 5400 python scripts/perf/bench_int8.py both
tpu_queue_step 6 serve_lat 5400 python scripts/perf/bench_serve_latency.py --int8

echo "QUEUE R4A COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
