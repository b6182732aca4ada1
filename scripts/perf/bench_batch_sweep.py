"""Batch-size sweep of the headline bench (docs/PERF.md round-3).

The metric (frames/sec/chip, mnist64 seq-10 fwd+bwd) fixes model, task
and sequence length; batch size is a free throughput knob that was never
swept past B=64. The step's weight-read (~18%) and optimizer (~7%)
HBM-traffic classes are per-STEP costs, so their per-frame share halves
each time B doubles — until activations run the chip out of HBM.

Runs each B in a fresh child process (the benchmark module's own child
protocol) so an OOM at large B reports instead of killing the sweep.
STRICTLY SERIAL — run under the tpu_queue lock only.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/perf/bench_batch_sweep.py [B ...]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from unet_convlstm_tpu.benchmark import _parse_child_result  # noqa: E402

batches = [int(b) for b in sys.argv[1:]] or [64, 96, 128, 192, 256]

results = {}
for b in batches:
    env = dict(os.environ, BENCH_B=str(b))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "unet_convlstm_tpu.benchmark", "--child"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        results[b] = {"error": "timeout (HBM thrash or wedged dispatch)"}
        print(f"B={b:4d}  TIMEOUT after 900s", flush=True)
        continue
    r = _parse_child_result(proc.stdout) if proc.returncode == 0 else None
    if r is None:
        tail = proc.stderr.strip()[-300:]
        results[b] = {"error": f"rc={proc.returncode}: {tail}"}
        print(f"B={b:4d}  FAILED  {tail}", flush=True)
        continue
    results[b] = r
    print(f"B={b:4d}  {r['value']:9.2f} frames/s/chip", flush=True)

ok = {b: r["value"] for b, r in results.items() if "value" in r}
if ok:
    best = max(ok, key=ok.get)
    vs64 = f"  ({ok[best] / ok[64] - 1:+.1%} vs B=64)" if 64 in ok else ""
    print(f"\nbest: B={best} at {ok[best]:.2f} frames/s/chip{vs64}")
print("BATCH_SWEEP_DONE")
