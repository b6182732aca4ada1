"""Drive the int8 inference surfaces ONCE on the live TPU (VERDICT
round-2 #3's last sub-item): `evaluate --int8` through the CLI and an
int8 StreamingPredictor through the real HTTP server, asserting finite
physical-unit outputs and an evaluate-MAE within PTQ noise of bf16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/perf/drive_int8_live.py <ckpt_dir> <npz>
"""

import http.client
import json
import sys

import numpy as np

ckpt, npz = sys.argv[1], sys.argv[2]

# 1. evaluate via the CLI surface (same entry the user types), bf16 then
# --int8, and hold the quantized MAE to PTQ noise: 5% relative + a small
# absolute slack. (The suite-level contract,
# tests/test_quant.py::test_quantized_eval_metrics_close_to_float, uses
# 0.05*max(mae, 1.0) at tiny width — its max(.,1.0) floor is ~4x looser
# at the MAE this drive measures, so the rel+abs form here is stricter.)
from unet_convlstm_tpu.cli import main  # noqa: E402

print("== evaluate (bf16 baseline) ==", flush=True)
main(["evaluate", "--checkpoint", ckpt, "--npz", npz,
      "--out-dir", "/tmp/bf16_eval", "--batch-size", "16"])
mae_bf16 = json.load(open("/tmp/bf16_eval/report.json"))["mae"]

print("== evaluate --int8 ==", flush=True)
main(["evaluate", "--checkpoint", ckpt, "--npz", npz,
      "--out-dir", "/tmp/int8_eval", "--batch-size", "16", "--int8"])
rep = json.load(open("/tmp/int8_eval/report.json"))
mae_i8 = rep["mae"]
print(f"int8 evaluate report: {rep}", flush=True)
delta = abs(mae_i8 - mae_bf16)
bound = 0.05 * mae_bf16 + 0.005
print(f"MAE bf16={mae_bf16:.4f} int8={mae_i8:.4f} "
      f"|delta|={delta:.4f} (bound {bound:.4f})", flush=True)
assert delta < bound, (
    f"int8 evaluate MAE {mae_i8} strays beyond PTQ noise of bf16 "
    f"{mae_bf16} (|delta| {delta} >= {bound})")

# 1b. evaluate --int8 --int8-calib: static activation scales (round 5,
# VERDICT r4 #2) — same accuracy bound as dynamic quant, asserted on the
# live chip (the perf side is scripts/perf/bench_int8.py's int8-calib row)
print("== evaluate --int8 --int8-calib 4 ==", flush=True)
main(["evaluate", "--checkpoint", ckpt, "--npz", npz,
      "--out-dir", "/tmp/int8c_eval", "--batch-size", "16", "--int8",
      "--int8-calib", "4"])
mae_i8c = json.load(open("/tmp/int8c_eval/report.json"))["mae"]
delta_c = abs(mae_i8c - mae_bf16)
print(f"MAE bf16={mae_bf16:.4f} int8-calib={mae_i8c:.4f} "
      f"|delta|={delta_c:.4f} (bound {bound:.4f})", flush=True)
assert delta_c < bound, (
    f"calibrated int8 evaluate MAE {mae_i8c} strays beyond PTQ noise of "
    f"bf16 {mae_bf16} (|delta| {delta_c} >= {bound})")

# 2. serve --int8: real HTTP server + streamed frames
from unet_convlstm_tpu.serve import StreamingPredictor, serve_http  # noqa

print("== serve --int8 (HTTP round-trip) ==", flush=True)
pred = StreamingPredictor(ckpt, int8=True)
server = serve_http(pred, "127.0.0.1", 0)
try:
    port = server.server_address[1]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("GET", "/healthz")
    assert json.loads(conn.getresponse().read())["status"] == "ok"

    data = np.load(npz)
    H = int(data["X"].shape[-1])
    conn.request("POST", "/v1/session",
                 body=json.dumps({"batch": 1, "height": H, "width": H}))
    sid = json.loads(conn.getresponse().read())["session_id"]

    x = np.ascontiguousarray(
        np.moveaxis(data["X"][:1, :3], 2, -1)).astype("<f4")
    conn.request("POST", f"/v1/predict/{sid}", body=x.tobytes(),
                 headers={"X-Shape": ",".join(map(str, x.shape))})
    r = conn.getresponse()
    assert r.status == 200, r.read()
    shape = tuple(int(v) for v in r.getheader("X-Shape").split(","))
    y = np.frombuffer(r.read(), dtype="<f4").reshape(shape)
    assert np.isfinite(y).all()
    conn.request("DELETE", f"/v1/session/{sid}")
    assert json.loads(conn.getresponse().read())["closed"] is True
    print(f"serve --int8 OK: predicted {shape}, "
          f"y range [{y.min():.3f}, {y.max():.3f}] m/s", flush=True)
finally:
    server.shutdown()
print("INT8_LIVE_DRIVE_OK", flush=True)
