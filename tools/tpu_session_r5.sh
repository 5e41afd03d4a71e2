#!/usr/bin/env bash
# Round-5 TPU session queue: ONE patient process, scoreboard-critical steps
# first, 75 s lease-release spacing between children, no watchdog ever
# SIGTERMs a child mid-compile (caps are sized to let cold compiles finish;
# r5 protocol in CLAUDE.md — every mid-compile kill extends the outage).
#
#   Phase 1  warm the persistent compile cache + write the WARM stamp
#   Phase 2  full bench.py rehearsal (what the driver will run)
#   Phase 3  measurements: kernel-variant microbench (incl. interleave),
#            resample-lever flagship A/Bs, render + parity traces
#
# Usage: bash tools/tpu_session_r5.sh [max_wait_minutes (default 480)]
# Logs to /tmp/r5_tpu/. Decisions (candidate-env promotions) are made by a
# human reading the logs; after any bench.py/source edit re-run phase 1
# (incremental: unchanged programs hit the HLO-keyed cache).
set -u
cd "$(dirname "$0")/.."
MAX_WAIT_MIN="${1:-480}"
LOG=/tmp/r5_tpu
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_pcc}"

probe() {
  timeout 50 python -c "
import jax, jax.numpy as jnp
print('alive', float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for tunnel (max ${MAX_WAIT_MIN}m)"
deadline=$(( $(date +%s) + MAX_WAIT_MIN * 60 ))
until probe; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "$(date -u +%H:%M:%S) tunnel never came back; giving up"; exit 1
  fi
  sleep 120
done
echo "$(date -u +%H:%M:%S) tunnel ALIVE"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "$(date -u +%H:%M:%S) == $name (cap ${to}s) =="
  sleep 75  # lease-release lag between TPU processes
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%H:%M:%S) == $name rc=$rc =="
  tail -3 "$LOG/$name.log" | sed 's/^/    /'
  if ! probe; then
    echo "$(date -u +%H:%M:%S) tunnel wedged after $name; waiting"
    until probe; do
      if [ "$(date +%s)" -ge "$deadline" ]; then
        echo "tunnel gone for good; stopping queue"; exit 1
      fi
      sleep 120
    done
    echo "$(date -u +%H:%M:%S) tunnel recovered"
  fi
}

# ---- Phase 1: scoreboard (warm cache + stamp) -----------------------------
step 01_warm_cache 14400 bash tools/warm_bench_cache.sh
step 02_stamp_check 60 python -c "import bench; print('warm:', bench._cache_is_warm())"

# ---- Phase 2: driver-bench rehearsal --------------------------------------
step 03_bench_full 1300 python bench.py

# ---- Phase 3: measurements ------------------------------------------------
# kernel-variant microbench at flagship base shapes (6 variants, subprocessed)
step 04_kernel_variants 3600 python tools/bench_kernel_variants.py

# resample-lever flagship A/Bs: each env changes the program HLO, so each
# first run is a cold compile — caps must cover it (~190-600 s observed)
step 05_flagship_onehot 1400 env NS_RESAMPLE_ONEHOT=1 NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
  python bench.py --candidate kernel-tuned --method thermal-nerfacto-tpu --steps 30
step 06_flagship_onehot_bf16 1400 env NS_RESAMPLE_ONEHOT=1 NS_PROP_BF16=1 NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
  python bench.py --candidate kernel-tuned --method thermal-nerfacto-tpu --steps 30

# render-path trace (program warm from the eval warm in phase 1)
step 07_trace_render 1400 python tools/xla_trace_render.py

# parity trace at the shipped winner env (updates docs/ROOFLINE_parity.md)
step 08_trace_parity 1400 env NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
  python tools/xla_trace_parity.py

echo "$(date -u +%H:%M:%S) queue complete — read $LOG/*.log and decide promotions"
