# Shared TPU-queue protocol — source this from queue scripts.
#
# The axon tunnel wedges permanently if two clients dial concurrently, so
# every live-TPU script serializes through one lock. This lib holds the
# one copy of the protocol:
#
#   tpu_queue_acquire          — blocking acquire via flock(1): the kernel
#                                owns the lock state, so it releases on ANY
#                                process death (SIGKILL/OOM included) with
#                                no stale files, no PID liveness checks,
#                                and no reclaim races (round-3 review: the
#                                previous marker-file protocol could let
#                                two reapers both "win"). The marker file
#                                content (holder PID) is informational.
#   tpu_queue_step <n> <name> <timeout-s> <cmd...>
#                              — run one bounded step, logging to
#                                /tmp/q_<name>.log; rc=124/137 (hang →
#                                timeout/SIGKILL) aborts the whole queue:
#                                a hung step means the tunnel is wedged
#                                and further dispatches only aggravate it.
#
# Callers set START (first step to run, default 1) and optionally
# QUEUE_TAG (log prefix, default empty).

TPU_QUEUE_LOCK=/tmp/tpu_queue.lock
TPU_QUEUE_LEGACY_MARKER=/tmp/tpu_queue.running

tpu_queue_acquire() {
    # fd 9 lives as long as the sourcing script; the kernel drops the
    # lock when the process exits, however it exits
    exec 9>"$TPU_QUEUE_LOCK"
    flock 9
    echo "$$" >&9   # informational: who holds it
    # transition guard: queues launched before the flock protocol hold
    # the legacy marker file — wait for a LIVE legacy holder to finish
    while [ -f "$TPU_QUEUE_LEGACY_MARKER" ]; do
        local holder
        holder=$(cat "$TPU_QUEUE_LEGACY_MARKER" 2>/dev/null)
        if [ -n "$holder" ] && kill -0 "$holder" 2>/dev/null; then
            sleep 15
        else
            rm -f "$TPU_QUEUE_LEGACY_MARKER"  # dead holder; we own flock
        fi
    done
}

tpu_queue_step() {  # <n> <name> <timeout-s> <cmd...>
    local n="$1" name="$2" tmo="$3"; shift 3
    local tag="${QUEUE_TAG:-}"
    [ "$n" -lt "${START:-1}" ] && return 0
    echo "=== step ${tag}${n}: $name ($(date -u +%H:%M:%S)) ===" \
        | tee -a /tmp/q_queue.log
    timeout -k 30 "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
    local rc=$?
    echo "=== step ${tag}${n}: $name rc=$rc ($(date -u +%H:%M:%S)) ===" \
        | tee -a /tmp/q_queue.log
    if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
        echo "QUEUE ABORTED: step ${tag}${n} ($name) hung — tunnel likely wedged" \
            | tee -a /tmp/q_queue.log
        exit 124
    fi
    return 0
}
