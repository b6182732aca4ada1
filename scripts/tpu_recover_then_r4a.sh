#!/bin/bash
# Tunnel-recovery watcher: probe the TPU with a bounded compile+execute
# every BACKOFF seconds; when one succeeds, run the r4a measurement queue.
# Dials at most once per backoff window (a wedged axon pool is aggravated
# by concurrent/rapid re-dials — round-3 notes).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1

BACKOFF="${BACKOFF:-600}"
# compile round-trips have been observed at ~400 s on a degraded day —
# the probe budget must clear that, or a merely-slow tunnel reads as down
PROBE_TIMEOUT="${PROBE_TIMEOUT:-900}"

attempt=0
while :; do
    attempt=$((attempt + 1))
    echo "[recover] probe attempt $attempt $(date -u +%H:%M:%S)" \
        | tee -a /tmp/q_recover.log
    timeout -k 30 "$PROBE_TIMEOUT" python - <<'EOF' >> /tmp/q_recover.log 2>&1
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((128, 128))
v = float((x @ x).sum())
print(f"probe OK value={v} wall={time.time()-t0:.1f}s", flush=True)
EOF
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[recover] tunnel OK after $attempt attempt(s); launching r4a" \
            | tee -a /tmp/q_recover.log
        exec bash scripts/tpu_queue_r4a.sh "${1:-1}"
    fi
    echo "[recover] probe rc=$rc; sleeping ${BACKOFF}s" \
        | tee -a /tmp/q_recover.log
    sleep "$BACKOFF"
done
