#!/bin/bash
# Round-3 TPU queue, part E — follow-ups to the stacked-gather win:
# (1) breakdown re-run with the padded-dead-field + small-table macro
#     probes (can the grid-regime majorant gather be padded onto the
#     fast lowering, and is it worth it?);
# (2) rng_impl=rbg end-to-end re-measure — with gathers reduced 8.8x,
#     threefry (5.2 ms/iter) is now the LEADING class, so the 16x rbg
#     micro-win may finally reach the wall clock;
# (3) the model-width scaling sweep lost when the prior session died.
#
#   usage: bash scripts/tpu_queue_r3e.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=E
tpu_queue_acquire

tpu_queue_step 1 mc_breakdown2 900 python scripts/perf/bench_mc_breakdown.py
tpu_queue_step 2 mc_rng2 1200 python scripts/perf/bench_mc_rng.py 16
tpu_queue_step 3 width_sweep 3600 python scripts/perf/cost_cloud.py width

echo "QUEUE E COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
