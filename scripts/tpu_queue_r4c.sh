#!/bin/bash
# Round-4 TPU queue, part C — measure the fused multi-session serving
# dispatch (serve.predict_many, added this round after the part-A latency
# table showed B=1 requests are dispatch-bound): re-run the latency bench
# with the fused{2,4,8} configs + int8.
#
#   usage: bash scripts/tpu_queue_r4c.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=R4C
tpu_queue_acquire

tpu_queue_step 1 serve_fused 5400 python scripts/perf/bench_serve_latency.py --int8

echo "QUEUE R4C COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
