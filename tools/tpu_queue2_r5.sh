#!/usr/bin/env bash
# Round-5 queue #2: equal-conditions flagship A/B (plain kernel-tuned vs
# +interleave-4 vs +onehot already measured) and the post-removal-fix eval
# measurement. Same patient protocol as tpu_session_r5.sh.
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

step() {  # step <name> <timeout_s> <cmd...>
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

# equal-conditions flagship baselines (program cached -> short)
step 10_flagship_ktuned_base 900 env NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
  python bench.py --candidate kernel-tuned --method thermal-nerfacto-tpu --steps 30

# interleave-4 on top (cold compile of the il4 program)
step 11_flagship_ktuned_il4 1400 env NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 NS_FMLP_INTERLEAVE=4 \
  python bench.py --candidate kernel-tuned --method thermal-nerfacto-tpu --steps 30

# post-removal-fix eval (program recompiles; also the ROOFLINE_render number)
step 12_eval_postfix 1400 python bench.py --eval-candidate default --method thermal-nerfacto-tpu

echo "$(date -u +%H:%M:%S) queue2 complete"
