"""XLA flag sweep of the headline bench (docs/PERF.md round-3).

The step is at a measured roofline under default flags; this sweeps the
handful of XLA:TPU knobs that plausibly move a bandwidth-bound conv/scan
workload (scoped-VMEM budget, latency-hiding scheduler reruns, fusion
cost model). Each trial runs in a fresh child process (flags bind at
backend init); an unknown-flag abort or OOM reports as a failed row
instead of killing the sweep. STRICTLY SERIAL — tpu_queue lock only.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/perf/bench_xla_flags.py [BENCH_B]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from unet_convlstm_tpu.benchmark import _parse_child_result  # noqa: E402

B = sys.argv[1] if len(sys.argv) > 1 else "64"

TRIALS = [
    ("baseline", ""),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs_rerun4", "--xla_latency_hiding_scheduler_rerun=4"),
    ("fusion_cost_model",
     "--xla_tpu_use_experimental_fusion_cost_model=true"),
    ("no_multi_level_fusion",
     "--xla_tpu_enable_multi_level_nested_loop_fusion=false"),
]

results = {}
for name, flags in TRIALS:
    env = dict(os.environ, BENCH_B=B)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "unet_convlstm_tpu.benchmark", "--child"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        results[name] = None
        print(f"{name:24s}  TIMEOUT after 900s", flush=True)
        continue
    r = _parse_child_result(proc.stdout) if proc.returncode == 0 else None
    if r is None:
        results[name] = None
        print(f"{name:24s}  FAILED  {proc.stderr.strip()[-200:]}",
              flush=True)
        continue
    v = r["value"]
    results[name] = v
    base = results.get("baseline")
    rel = f"  ({v / base - 1:+.1%} vs baseline)" if base else ""
    print(f"{name:24s}  {v:9.2f} frames/s/chip{rel}", flush=True)

print("XLA_FLAG_SWEEP_DONE")
