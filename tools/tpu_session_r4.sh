#!/usr/bin/env bash
# Round-4 TPU session orchestrator: wait for the axon tunnel to come back,
# then run the whole CLAUDE.md TPU checklist unattended, scoreboard-critical
# steps first (the tunnel has died mid-session twice; front-load what the
# driver's end-of-round bench depends on). Logs to /tmp/r4_tpu/.
#
# Usage: bash tools/tpu_session_r4.sh [max_wait_minutes (default 480)]
#
# Never kills by pattern; every child is timeout-bounded; children are given
# generous timeouts so none is SIGKILLed mid-compile (wedges the tunnel).
set -u
cd "$(dirname "$0")/.."
MAX_WAIT_MIN="${1:-480}"
LOG=/tmp/r4_tpu
mkdir -p "$LOG"

probe() {
  timeout 50 python -c "
import jax, jax.numpy as jnp
print('alive', float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for tunnel (max ${MAX_WAIT_MIN}m)"
deadline=$(( $(date +%s) + MAX_WAIT_MIN * 60 ))
until probe; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "$(date -u +%H:%M:%S) tunnel never came back; giving up"
    exit 1
  fi
  sleep 60
done
echo "$(date -u +%H:%M:%S) tunnel ALIVE — running checklist"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "$(date -u +%H:%M:%S) == $name (cap ${to}s) =="
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?  # capture BEFORE the next command substitution clobbers $?
  echo "$(date -u +%H:%M:%S) == $name rc=$rc =="
  tail -3 "$LOG/$name.log" | sed 's/^/    /'
  # a step may have wedged the tunnel; if so, wait for recovery before the
  # next step rather than burning its timeout on a dead device
  if ! probe; then
    echo "$(date -u +%H:%M:%S) tunnel wedged after $name; waiting"
    until probe; do
      if [ "$(date +%s)" -ge "$deadline" ]; then
        echo "tunnel gone for good; stopping checklist"; exit 1
      fi
      sleep 60
    done
    echo "$(date -u +%H:%M:%S) tunnel recovered"
  fi
}

# 1. Warm the persistent compile cache for every program bench.py runs —
#    what lets the driver's end-of-round bench fit its ~10 min budget.
step 01_warm_cache 7200 bash tools/warm_bench_cache.sh

# 2. Full bench end-to-end on the warm cache: verifies the driver run and
#    records the round's numbers.
step 02_bench 1500 python bench.py

# 3. Splat rasterizer A/B (decision: flip config.rasterizer to "tiles" if
#    tiles wins — CLAUDE.md checklist item 3).
step 03_splat_ab 1800 python tools/bench_splat_raster.py

# 4. Flagship quality spot-check, 3 seeds (VERDICT missing #3: re-confirm
#    the validated synthetic story on-device post-precision-pin).
step 04_quality_s0 2400 python tools/tpu_quality_spotcheck.py --steps 700 --seed 42
step 05_quality_s1 2400 python tools/tpu_quality_spotcheck.py --steps 700 --seed 43
step 06_quality_s2 2400 python tools/tpu_quality_spotcheck.py --steps 700 --seed 44

# 5. Microbench sweep (fused ray-march variants + prop/base kernels).
step 07_sweep 5400 bash tools/tpu_sweep_r3.sh

echo "$(date -u +%H:%M:%S) checklist complete; logs in $LOG"
