#!/usr/bin/env bash
# Probe the axon tunnel until device compute AND D2H recover, then resume
# the round-4c quality campaign (tools/run_quality_r4c.sh — phase-resumable).
# Same outage pattern as round 2 (tools/wait_tunnel_then_quality.sh):
# multi-hour windows where device calls hang or D2H collapses to ~0.2 MB/s.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MIN_MBPS="${MIN_MBPS:-3}"
POLL_S="${POLL_S:-120}"
DEADLINE_S="${DEADLINE_S:-18000}"

probe() {
    MIN_MBPS="$MIN_MBPS" timeout 150 python - <<'EOF'
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
x = (jnp.ones((1024 * 1024,), jnp.float32) * 2.0)
float(x[0])  # sync: device compute answers
t0 = time.time(); _ = np.asarray(x); dt = time.time() - t0
mbps = 4.0 / max(dt, 1e-9)
print(f"D2H {mbps:.1f} MB/s", file=sys.stderr)
sys.exit(0 if mbps >= float(os.environ.get("MIN_MBPS", "3")) else 1)
EOF
}

t0=$SECONDS
ok_streak=0
while true; do
    if probe; then
        ok_streak=$((ok_streak + 1))
        echo "$(date -u +%H:%M:%S) probe ok (streak $ok_streak)"
        if [ "$ok_streak" -ge 2 ]; then break; fi
        sleep 20
    else
        ok_streak=0
        echo "$(date -u +%H:%M:%S) tunnel still degraded; sleeping ${POLL_S}s"
        sleep "$POLL_S"
    fi
    if [ $((SECONDS - t0)) -gt "$DEADLINE_S" ]; then
        echo "deadline exceeded; giving up" >&2
        exit 1
    fi
done

echo "tunnel recovered after $((SECONDS - t0))s; resuming campaign"
exec bash "$REPO/tools/run_quality_r4c.sh" "${1:-$REPO/runs/r4}"
