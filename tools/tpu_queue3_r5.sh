#!/usr/bin/env bash
# Round-5 queue #3 (endgame): re-warm the compile cache over the final tree
# (only the eval programs' HLO changed since the first warm; everything else
# cache-hits), write the WARM stamp, regenerate the quality artifacts at 3k
# steps with the fixed runner, then a full driver-bench rehearsal.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_tpu
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_pcc}"

probe() {
  timeout 50 python -c "
import jax, jax.numpy as jnp
print('alive', float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1
}
wait_alive() {
  until probe; do sleep 120; done
}

step() {
  local name="$1" to="$2"; shift 2
  echo "$(date -u +%H:%M:%S) == $name (cap ${to}s) =="
  sleep 75
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%H:%M:%S) == $name rc=$rc =="
  tail -2 "$LOG/$name.log" | sed 's/^/    /'
  if ! probe; then
    echo "$(date -u +%H:%M:%S) tunnel wedged after $name; waiting"
    wait_alive
    echo "$(date -u +%H:%M:%S) tunnel recovered"
  fi
}

echo "$(date -u +%H:%M:%S) waiting for tunnel"
wait_alive
echo "$(date -u +%H:%M:%S) tunnel ALIVE"

step 20_rewarm 14400 bash tools/warm_bench_cache.sh
step 21_stamp_check 120 python -c "import bench; print('warm:', bench._cache_is_warm())"
step 22_quality_runs 7200 python tools/quality_runs_r5.py --steps 3000
step 23_bench_full 1300 python bench.py

echo "$(date -u +%H:%M:%S) queue3 complete"
