#!/bin/bash
# End-to-end user-surface drive per .claude/skills/verify/SKILL.md:
# gen-mnist → train → evaluate (MAE must equal the final epoch's val MAE)
# → resume (exactly one more epoch) → rollout (mp4 > 50 KB) →
# convert-checkpoint from a real reference .pt → evaluate the converted
# dir → overfit. Fails loudly on any check.
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=$(mktemp -d /tmp/verify_r4.XXXX)
cd "$WORK"
echo "[verify] workdir $WORK"

python -m unet_convlstm_tpu gen-mnist --out mm.npz --seq-len 6 \
    --num-samples 64 --image-size 64 --num-digits 2 --seed 3 --xy
python -m unet_convlstm_tpu train --npz mm.npz epochs=2 batch_size=16 \
    model.base_ch=8 checkpoint_dir=ckpts mesh_data=1 | tee train.log
python -m unet_convlstm_tpu evaluate --checkpoint ckpts/custom_best \
    --npz mm.npz --out-dir eval_out --batch-size 16 | tee eval.log

python - <<'EOF'
import re
train = open("train.log").read()
ev = open("eval.log").read()
val_maes = re.findall(r"Val Loss=[-0-9.]+ MAE=([0-9.]+)", train)
ev_maes = re.findall(r"MAE=([0-9.]+)", ev)
assert val_maes and ev_maes, (val_maes, ev_maes)
tv, ee = float(val_maes[-1]), float(ev_maes[0])
assert abs(tv - ee) < 5e-4, (tv, ee)
print(f"[verify] evaluate MAE {ee} == final-epoch val MAE {tv} OK")
EOF

python -m unet_convlstm_tpu train --npz mm.npz epochs=3 batch_size=16 \
    model.base_ch=8 checkpoint_dir=ckpts mesh_data=1 \
    --resume ckpts/custom_last | tee resume.log
grep -q "resumed from" resume.log
n_ep=$(grep -c "Val Loss=" resume.log || true)
[ "$n_ep" -eq 1 ] || { echo "resume ran $n_ep epochs, want 1"; exit 1; }
echo "[verify] resume ran exactly one more epoch OK"

python -m unet_convlstm_tpu rollout --checkpoint ckpts/custom_best \
    --npz mm.npz --sequence-idx 2 --out roll.mp4
sz=$(stat -c%s roll.mp4)
[ "$sz" -gt 50000 ] || { echo "roll.mp4 too small: $sz"; exit 1; }
[ -f eval_out/metrics_summary_grid.png ] || { echo "no grid png"; exit 1; }
echo "[verify] rollout mp4 ${sz}B + metrics grid OK"

# reference .pt interop: build one from the reference model (black box)
python - <<'EOF'
import sys, torch
sys.path.insert(0, "/root/reference/train")
from unet import TemporalUNetDualView
cfg = {"type": "custom", "base_ch": 8, "use_attention": False,
       "use_skip_lstm": True, "lstm_layers": 1}
m = TemporalUNetDualView(in_channels_per_sat=1, out_channels=1,
                         base_ch=8, use_attention=False,
                         use_skip_lstm=True, lstm_layers=1)
torch.save({"model_state": m.state_dict(), "config": cfg}, "ref.pt")
print("[verify] wrote reference ref.pt")
EOF
python -m unet_convlstm_tpu convert-checkpoint --torch-ckpt ref.pt \
    --out-dir conv_ck
python -m unet_convlstm_tpu evaluate --checkpoint conv_ck/custom_converted \
    --npz mm.npz --out-dir conv_eval --batch-size 16 | tail -3
echo "[verify] converted-reference-checkpoint evaluate OK"

python -m unet_convlstm_tpu overfit --npz mm.npz --base-ch 4 \
    --num-samples 4 --max-iters 150 --out-dir of_ck | tail -2
echo "[verify] ALL CHECKS PASSED ($WORK)"
