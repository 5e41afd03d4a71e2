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

run() {
  echo "== $* =="
  timeout 1200 python bench.py "$@" 2>&1 | tail -2
  echo "rc=${PIPESTATUS[0]}"  # bench.py's status, not tail's
}

# candidates and winners must mirror bench.py's _FLAGSHIP_CANDIDATES (the
# only names main() can pass as --winner); fray-props is excluded there and
# would warm a program the driver can never request
run --candidate default    --method thermal-nerfacto-tpu --steps 3
run --candidate fray-base  --method thermal-nerfacto-tpu --steps 3
run --candidate fray-field --method thermal-nerfacto-tpu --steps 3
run --row parity --winner default
run --row parity --winner fray-base
run --row parity --winner fray-field
run --eval-candidate default   --method thermal-nerfacto-tpu
run --eval-candidate fray-base --method thermal-nerfacto-tpu
run --row hash
run --row datapath
echo "cache entries: $(ls "$JAX_COMPILATION_CACHE_DIR" | wc -l)"
