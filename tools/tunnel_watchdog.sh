#!/bin/bash
# Health-gated TPU-tunnel watchdog (round-4 pattern, now a committed tool).
#
# The axon tunnel intermittently wedges: device init, device->host reads,
# or remote_compile responses hang for minutes to hours.  This loop probes
# `jax.devices()` under a hard timeout and, when the tunnel answers again,
# runs the command given on the command line ONCE.
#
# Usage:  tools/tunnel_watchdog.sh [--interval 120] -- CMD ARG...
set -u
cd "$(dirname "$0")/.."
INTERVAL=120
if [ "${1:-}" = "--interval" ]; then INTERVAL=$2; shift 2; fi
[ "${1:-}" = "--" ] && shift

while true; do
  if timeout 60 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
EOF
  then
    echo "[watchdog] tunnel healthy at $(date +%H:%M:%S); launching: $*"
    exec "$@"
  fi
  echo "[watchdog] tunnel unhealthy at $(date +%H:%M:%S); retry in ${INTERVAL}s"
  sleep "$INTERVAL"
done
