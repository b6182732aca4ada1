#!/bin/bash
# Round-3 TPU measurement queue, part B — the steps the aborted part-A
# run (scripts/tpu_queue.sh) never reached, reordered cheap-first so the
# short measurements land even if the round clock runs out mid-gate.
# STRICTLY SERIAL (two concurrent axon clients wedge the tunnel).
#
#   usage: bash scripts/tpu_queue_r3b.sh [start-step]
#
# Logs: /tmp/q_<step>.log   Marker: /tmp/tpu_queue.running while active.

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
tpu_queue_acquire

# 1. Pallas MC sampler: PRNG validity + win/lose measurement (VERDICT #7)
tpu_queue_step 1 pallas_sampler 2400 python scripts/perf/bench_pallas_sampler.py 16

# 2. MC iteration cost classes (drives the Pallas verdict writeup)
tpu_queue_step 2 mc_breakdown 1500 python scripts/perf/bench_mc_breakdown.py

# 3. remat sweep incl. B=64/B=96 (VERDICT #8)
tpu_queue_step 3 cost_sweep 2700 python scripts/perf/cost_cloud.py sweep

# 4. pure-MC production gate golden (VERDICT #4)
tpu_queue_step 4 gate_mc 5400 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/cgate_mc --production \
    --mc-spp 24 --mc-majorant-cell 16 --mc-spp-chunk 8 \
    --out results/cloud_synth_golden_r3_mc.json

# 5. WVU variant of the T=12 contract gate (30 epochs up front — the
#    W-map run showed 10 is undertrained at this temporal depth)
tpu_queue_step 5 gate_T12_wvu 5400 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/cgate_T12_wvu --production --wvu \
    --seq-len 12 --n-folders 16 --n-samples 16 \
    --epochs 30 \
    --out results/cloud_wvu_golden_r3_T12.json

echo "QUEUE COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
