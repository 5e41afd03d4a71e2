#!/usr/bin/env bash
# Warm the persistent XLA compilation cache (JAX_COMPILATION_CACHE_DIR) for
# every program bench.py runs, each child sequential with a generous timeout
# so nothing is ever killed mid-compile (a SIGKILL mid-sync can wedge the
# axon tunnel — CLAUDE.md). Run this on a live TPU AFTER the last model-code
# change of the round: any HLO-affecting edit invalidates the entries, and a
# warm cache is what lets the driver's end-of-round `python bench.py` fit
# every row inside its ~10-minute budget.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_pcc}"

CRITICAL_FAILED=0
run() {
  echo "== $* =="
  timeout 1200 python bench.py "$@" 2>&1 | tail -2
  local rc=${PIPESTATUS[0]}
  echo "rc=$rc"  # bench.py's status, not tail's
  return "$rc"
}
critical() {  # programs whose warmth bench.py's WARM-mode caps rely on
  run "$@" || CRITICAL_FAILED=1
}

# candidates and winners must mirror bench.py's _FLAGSHIP_CANDIDATES (the
# only names main() can pass as --winner); fray-props is excluded there and
# would warm a program the driver can never request
critical --candidate default    --method thermal-nerfacto-tpu --steps 3
NS_FMLP_SAVE_ACTS=1 \
critical --candidate default-sa --method thermal-nerfacto-tpu --steps 3
critical --candidate fray-base  --method thermal-nerfacto-tpu --steps 3
critical --candidate fray-field --method thermal-nerfacto-tpu --steps 3
critical --row parity --winner default
NS_FMLP_SAVE_ACTS=1 \
critical --row parity --winner default-sa
critical --row parity --winner fray-base
critical --row parity --winner fray-field
critical --eval-candidate default   --method thermal-nerfacto-tpu
critical --eval-candidate fray-base --method thermal-nerfacto-tpu
run --row hash
run --row datapath
echo "cache entries: $(ls "$JAX_COMPILATION_CACHE_DIR" | wc -l)"

# The WARM stamp switches bench.py into warm-mode scheduling (short caps,
# fused candidates enabled). Only write it when every cap-relevant program
# actually compiled into the cache — a stamp over a half-warm cache would
# re-create the r4 SIGTERM-mid-compile wedge.
if [ "$CRITICAL_FAILED" -eq 0 ]; then
  python bench.py --write-stamp
else
  echo "NOT writing WARM stamp: a critical warm run failed (bench stays in cold mode)"
fi
