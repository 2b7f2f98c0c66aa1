#!/bin/bash
# Waits for the axon TPU relay to come back, then runs the queued
# round-2 measurements (tools/run_r2_queue.sh). Probes with a BOUNDED
# subprocess (jax.devices() hangs indefinitely while the relay is
# down — see docs/DESIGN.md "relay rules"), one probe at a time.
#
# Usage: tools/relay_watch.sh [max_hours]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS=${1:-10}
LOG=bench_results/relay_watch.log
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
echo "=== relay watch start $(date -u +%FT%TZ) (max ${MAX_HOURS}h) ===" >> "$LOG"

probe() {
  timeout 430 python - <<'EOF'
import subprocess, sys, os
env = dict(os.environ)
env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp; d = jax.devices();"
         "v = float(jnp.sum(jnp.ones((8,128))));"
         "print('PROBE_OK', d[0].platform, v)"],
        capture_output=True, text=True, timeout=420, env=env)
except subprocess.TimeoutExpired:
    print("PROBE_TIMEOUT")
    sys.exit(1)
out = r.stdout.strip()
print(out or r.stderr[-400:])
sys.exit(0 if ("PROBE_OK" in out and " cpu " not in " " + out + " ") else 1)
EOF
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe >> "$LOG" 2>&1; then
    echo "=== relay UP $(date -u +%FT%TZ) — running r2 queue ===" >> "$LOG"
    bash tools/run_r2_queue.sh
    echo "=== r2 queue finished $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  echo "[watch] relay still down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
echo "=== relay watch gave up $(date -u +%FT%TZ) ===" >> "$LOG"
exit 2
