#!/bin/bash
# Round-3 TPU queue, part D — measure the stacked 2-field gather fusion
# in the MC tracer (β+t_sun ride one gather; mc_reference.py). Steps:
# doctor probe, the micro-breakdown (now with a stacked-payload row),
# then the end-to-end production-view render for before/after vs the
# PERF.md numbers (2.98 s broad / 9.28 s dense, threefry).
#
#   usage: bash scripts/tpu_queue_r3d.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=D
tpu_queue_acquire

tpu_queue_step 1 doctor 420 python -m unet_convlstm_tpu doctor
tpu_queue_step 2 mc_breakdown 900 python scripts/perf/bench_mc_breakdown.py
tpu_queue_step 3 mc_e2e 1200 python scripts/perf/bench_mc.py

echo "QUEUE D COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
