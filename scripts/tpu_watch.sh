#!/usr/bin/env bash
# Persistent axon-recovery watcher. The device service has multi-hour
# outages where the first host<->device touch blocks indefinitely; this
# loop probes with a LONG timeout (a healthy first touch can itself
# take 400+ s, and SIGKILLing a blocked device touch can wedge the
# service further), and fires the full on-hardware validation+bench
# session (scripts/tpu_session.sh) on the first successful probe.
#
# Usage: bash scripts/tpu_watch.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_watch.log}
: > "$LOG"

probe() {
    timeout 1800 python -u -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.arange(8) + 1
assert np.asarray(x[:8]).sum() == 36
print('axon up:', d)
" >> "$LOG" 2>&1
}

relay_up() {
    # the axon client dials the local relay on :8082 (raw bincode);
    # a refused connect = relay process down, no point paying a long
    # jax probe. When the port accepts, run the real probe.
    timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null
}

n=0
while true; do
    n=$((n + 1))
    if ! relay_up; then
        if [ $((n % 30)) -eq 1 ]; then
            printf '[tpu_watch] relay :8082 refused (check %d) at %s\n' \
                "$n" "$(date +%H:%M:%S)" >> "$LOG"
        fi
        sleep 60
        continue
    fi
    printf '[tpu_watch] relay UP; jax probe at %s\n' "$(date +%H:%M:%S)" >> "$LOG"
    if probe; then
        printf '[tpu_watch] service is UP; firing tpu_session.sh\n' >> "$LOG"
        bash scripts/tpu_session.sh /tmp/tpu_session.log >> "$LOG" 2>&1
        printf '[tpu_watch] session done at %s\n' "$(date +%H:%M:%S)" >> "$LOG"
        exit 0
    fi
    sleep 120
done
