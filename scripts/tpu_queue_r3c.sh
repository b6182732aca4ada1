#!/bin/bash
# Round-3 TPU queue, part C — short follow-ups discovered while part B
# ran: the Mosaic dynamic-gather feasibility probe, the end-to-end
# rng_impl=rbg render measurement (bench_mc_breakdown showed the RBG HLO
# draws uniforms 16x faster than threefry), and the one-time live drive
# of evaluate/serve --int8. Waits for part B's marker file to clear so
# the tunnel only ever sees one client.
#
#   usage: bash scripts/tpu_queue_r3c.sh [start-step] [ckpt_dir] [npz]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
CKPT="${2:-/tmp/tmp.IjOfpZJTRN/ckpts/custom_best}"
NPZ="${3:-/tmp/tmp.IjOfpZJTRN/mm.npz}"
QUEUE_TAG=C
tpu_queue_acquire

tpu_queue_step 1 mc_rng 900 python scripts/perf/bench_mc_rng.py 16
tpu_queue_step 2 gather_probe 600 python scripts/perf/probe_pallas_gather.py
tpu_queue_step 3 int8_live 900 python scripts/perf/drive_int8_live.py "$CKPT" "$NPZ"

echo "QUEUE C COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
