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
FIRST_RUN=1
# Lease-release lag: the tunnel's far side releases a dead client's lease
# 60-90 s late; starting the next TPU process inside that window is what
# made the r5 session's back-to-back children flaky. Spacing is skippable
# for incremental re-warms on an already-warm cache (NS_WARM_SPACING=0).
SPACING="${NS_WARM_SPACING:-75}"
run() {  # run <timeout_s> <bench args...>
  local to="$1"; shift
  if [ "$FIRST_RUN" -eq 0 ] && [ "$SPACING" -gt 0 ]; then
    echo "   (sleeping ${SPACING}s for lease release)"
    sleep "$SPACING"
  fi
  FIRST_RUN=0
  echo "== $* (cap ${to}s) =="
  timeout "$to" python bench.py "$@" 2>&1 | tail -2
  local rc=${PIPESTATUS[0]}
  echo "rc=$rc"  # bench.py's status, not tail's
  return "$rc"
}
critical() {  # programs whose warmth bench.py's WARM-mode caps rely on
  run "$@" || CRITICAL_FAILED=1
}

# candidates and winners must mirror bench.py's _FLAGSHIP_CANDIDATES (the
# only names main() can pass as --winner); fray-props/fray-field are
# excluded there and would warm programs the driver can never request.
# Fused-raymarch (fray-*) programs cold-compile in >20 min on this terminal
# (measured 2026-08-19: rc=124 at a 1200 s cap) — give them caps they can
# finish inside; a SIGTERM mid-compile is the known tunnel wedge.
critical 1200 --candidate default    --method thermal-nerfacto-tpu --steps 3
NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
critical 1200 --candidate kernel-tuned --method thermal-nerfacto-tpu --steps 3
critical 3000 --candidate fray-base  --method thermal-nerfacto-tpu --steps 3
critical 1200 --row parity --winner default
NS_FMLP_SAVE_ACTS=1 NS_FMLP_SPLIT_SKIP=1 \
critical 1200 --row parity --winner kernel-tuned
critical 3000 --row parity --winner fray-base
critical 1200 --eval-candidate default   --method thermal-nerfacto-tpu
critical 3000 --eval-candidate fray-base --method thermal-nerfacto-tpu
run 1200 --row hash
run 1200 --row datapath
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
