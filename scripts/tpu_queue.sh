#!/bin/bash
# Round-3 TPU measurement program — STRICTLY SERIAL (two concurrent axon
# clients wedge the tunnel permanently; see docs/PERF.md tunnel notes).
#
# Runs the VERDICT round-2 action items that need the live chip, highest
# value first, each bounded by a timeout. A TIMEOUT (rc=124) aborts the
# whole queue: a hung step means the tunnel is wedged again and further
# dispatches only aggravate it. Any other failure logs and continues.
#
#   usage: bash scripts/tpu_queue.sh [start-step]
#
# Logs: /tmp/q_<step>.log   Marker: /tmp/tpu_queue.running while active.

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
tpu_queue_acquire

# 1. official scoreboard number (VERDICT #1)
tpu_queue_step 1 bench 1200 python bench.py

# 2. cloud gate at the reference's temporal contract: T=12 (VERDICT #2).
#    First run (10 epochs) reached 0.30014 vs the 0.3 threshold with val
#    MAE still dropping 0.10/epoch — undertrained, not underpowered.
#    Retrain on the already-rendered corpus with more epochs.
tpu_queue_step 2 gate_T12 5400 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/cgate_T12 --production \
    --seq-len 12 --n-folders 16 --n-samples 16 \
    --epochs 40 --reuse-dataset \
    --out results/cloud_synth_golden_r3_T12.json

# 3. int8 measured, not claimed (VERDICT #3)
tpu_queue_step 3 int8 1800 python scripts/perf/bench_int8.py

# 4. pure-MC production gate golden (VERDICT #4)
tpu_queue_step 4 gate_mc 7200 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/cgate_mc --production \
    --mc-spp 24 --mc-majorant-cell 16 --mc-spp-chunk 8 \
    --out results/cloud_synth_golden_r3_mc.json

# 5. Pallas MC sampler: PRNG validity + win/lose measurement (VERDICT #7)
tpu_queue_step 5 pallas_sampler 2400 python scripts/perf/bench_pallas_sampler.py 16

# 6. MC iteration cost classes (drives the Pallas verdict writeup)
tpu_queue_step 6 mc_breakdown 1800 python scripts/perf/bench_mc_breakdown.py

# 7. remat sweep incl. B=64/B=96 (VERDICT #8)
tpu_queue_step 7 cost_sweep 3600 python scripts/perf/cost_cloud.py sweep

# 8. WVU variant of the T=12 contract gate (30 epochs up front — the
#    W-map run showed 10 is undertrained at this temporal depth)
tpu_queue_step 8 gate_T12_wvu 5400 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/cgate_T12_wvu --production --wvu \
    --seq-len 12 --n-folders 16 --n-samples 16 \
    --epochs 30 \
    --out results/cloud_wvu_golden_r3_T12.json

echo "QUEUE COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
