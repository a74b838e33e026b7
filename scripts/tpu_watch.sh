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

n=0
while true; do
    n=$((n + 1))
    printf '[tpu_watch] probe %d at %s\n' "$n" "$(date +%H:%M:%S)" >> "$LOG"
    if probe; then
        printf '[tpu_watch] service is UP; firing tpu_session.sh\n' >> "$LOG"
        bash scripts/tpu_session.sh /tmp/tpu_session.log >> "$LOG" 2>&1
        printf '[tpu_watch] session done at %s\n' "$(date +%H:%M:%S)" >> "$LOG"
        exit 0
    fi
    sleep 120
done
