#!/bin/bash
# Round-3 TPU queue, part F — the reference DRIVER's default model family
# (PretrainedTemporalUNet, main.py:213 USE_PRETRAINED=True) measured and
# gated on the cloud domain, which every earlier cloud golden skipped:
# (1) tunnel health probe;
# (2) headline bench re-confirm (driver scoreboard parity);
# (3) resnet18 family production-geometry cost/knob sweep (cost_cloud.py
#     resnet — new BASELINE.md row);
# (4) resnet18 production cloud gate at the reference's temporal contract
#     (T=12, 16 folders x 16 samples, 30 epochs) ->
#     results/cloud_resnet_golden_r3_T12.json.
#
#   usage: bash scripts/tpu_queue_r3f.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=F
tpu_queue_acquire

tpu_queue_step 1 doctor 600 python -m unet_convlstm_tpu doctor
tpu_queue_step 2 bench 900 python bench.py
tpu_queue_step 3 resnet_cost 3600 python scripts/perf/cost_cloud.py resnet
tpu_queue_step 4 resnet_gate 9000 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/gate_resnet_T12 --production --model-family resnet18 \
    --seq-len 12 --n-folders 16 --n-samples 16 --epochs 30 \
    --out results/cloud_resnet_golden_r3_T12.json

echo "QUEUE F COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
