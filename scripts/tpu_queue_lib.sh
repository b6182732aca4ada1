# Shared TPU-queue protocol — source this from queue scripts.
#
# The axon tunnel wedges permanently if two clients dial concurrently, so
# every live-TPU script serializes through one lock file. This lib holds
# the one copy of the protocol (round-3 review: three scripts had drifted
# duplicates, and none noticed a dead lock-holder):
#
#   tpu_queue_acquire          — wait for the lock, skipping STALE holders
#                                (recorded PID no longer alive), then take
#                                it atomically (noclobber closes the
#                                check-then-create race); installs the
#                                EXIT trap that releases it.
#   tpu_queue_step <n> <name> <timeout-s> <cmd...>
#                              — run one bounded step, logging to
#                                /tmp/q_<name>.log; rc=124/137 (hang →
#                                timeout/SIGKILL) aborts the whole queue:
#                                a hung step means the tunnel is wedged
#                                and further dispatches only aggravate it.
#
# Callers set START (first step to run, default 1) and optionally
# QUEUE_TAG (log prefix, default empty).

TPU_QUEUE_LOCK=/tmp/tpu_queue.running

tpu_queue_acquire() {
    while :; do
        if [ -f "$TPU_QUEUE_LOCK" ]; then
            local holder
            holder=$(cat "$TPU_QUEUE_LOCK" 2>/dev/null)
            if [ -n "$holder" ] && kill -0 "$holder" 2>/dev/null; then
                sleep 15
                continue
            fi
            # holder died without its EXIT trap (SIGKILL/OOM) — reclaim
            rm -f "$TPU_QUEUE_LOCK"
        fi
        # noclobber write is atomic: exactly one contender wins
        if (set -C; echo "$$" > "$TPU_QUEUE_LOCK") 2>/dev/null; then
            trap 'rm -f "$TPU_QUEUE_LOCK"' EXIT
            return 0
        fi
        sleep 1
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
