#!/bin/bash
# Round-4 TPU queue, part B — the long training runs (VERDICT r3 #6, #7):
# (1) local encoder pretraining on a held-out synthetic-cloud corpus
#     (seed 7, resnet18 family, 15 epochs) + torchvision-format encoder
#     export → /tmp/pretrained_encoder_seed7.pth;
# (2) the FROZEN-pretrained transfer gate on the standard seed-0 corpus
#     at the reference temporal contract (T=12, 16×16, 30 epochs) —
#     directly comparable to the r3 encoder-trained golden 0.131
#     (results/cloud_resnet_golden_r3_T12.json);
# (3) Moving-MNIST at the generator's production depth T=40
#     (reference build_moving_mnist.py:61) → results/mnist_golden_T40.json.
#
#   usage: bash scripts/tpu_queue_r4b.sh [start-step]

set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
. "$(dirname "$0")/tpu_queue_lib.sh"

START="${1:-1}"
QUEUE_TAG=R4B
tpu_queue_acquire

tpu_queue_step 1 pretrain_enc 9000 python scripts/pretrain_encoder.py \
    --epochs 15
tpu_queue_step 2 frozen_gate 9000 python -m unet_convlstm_tpu cloud-gate \
    --work-dir /tmp/gate_resnet_T12 --production --model-family resnet18 \
    --seq-len 12 --n-folders 16 --n-samples 16 --epochs 30 \
    --pretrained-path /tmp/pretrained_encoder_seed7.pth --freeze-encoder \
    --out results/cloud_resnet_frozen_r4_T12.json
tpu_queue_step 3 mnist_T40 9000 python scripts/run_mnist_T40.py

echo "QUEUE R4B COMPLETE $(date -u +%H:%M:%S)" | tee -a /tmp/q_queue.log
