#!/usr/bin/env bash
# Wait for the axon tunnel's D2H bandwidth to recover, then launch the
# round-2 quality refresh.  The tunnel has multi-hour windows where device
# compute still answers but device->host transfers collapse to ~0.2 MB/s
# (measured 2026-08-19); corpus runs need both.  Probe: fetch 4 MB and
# require >= MIN_MBPS sustained, twice in a row, before launching.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/root/runs/r2}"
MIN_MBPS="${MIN_MBPS:-3}"
POLL_S="${POLL_S:-180}"
DEADLINE_S="${DEADLINE_S:-10800}"

probe() {
    timeout 120 python - <<'EOF'
import sys, time
import jax, jax.numpy as jnp, numpy as np
x = (jnp.ones((1024*1024,), jnp.float32) * 2.0)
float(x[0])  # sync
t0 = time.time(); _ = np.asarray(x); dt = time.time() - t0
mbps = 4.0 / dt
print(f"D2H {mbps:.1f} MB/s", file=sys.stderr)
sys.exit(0 if mbps >= float(__import__("os").environ.get("MIN_MBPS", "3")) else 1)
EOF
}

t0=$SECONDS
ok_streak=0
while true; do
    if MIN_MBPS="$MIN_MBPS" probe; then
        ok_streak=$((ok_streak + 1))
        echo "$(date -u +%H:%M:%S) probe ok (streak $ok_streak)"
        if [ "$ok_streak" -ge 2 ]; then break; fi
        sleep 30
        continue
    fi
    ok_streak=0
    if [ $((SECONDS - t0)) -ge "$DEADLINE_S" ]; then
        echo "$(date -u +%H:%M:%S) tunnel still degraded after ${DEADLINE_S}s; giving up"
        exit 1
    fi
    echo "$(date -u +%H:%M:%S) tunnel degraded; retry in ${POLL_S}s"
    sleep "$POLL_S"
done

echo "$(date -u +%H:%M:%S) tunnel recovered; launching quality runs"
exec bash "$REPO/tools/run_quality_r2.sh" "$WORK"
