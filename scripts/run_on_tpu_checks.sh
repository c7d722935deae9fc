#!/bin/bash
# On-TPU check lane (VERDICT r2 weak #7): run the kernel-equivalence test
# subset on the REAL chip so Mosaic-only regressions (iota dtypes, layout
# rules, dynamic-slice lowering) cannot ship silently. The CPU suite runs
# every kernel in interpret mode; this lane compiles them.
#
# Usage: bash scripts/run_on_tpu_checks.sh
# Record the tail of the output in BASELINE.md each round.
#
# ONE TPU process at a time (see ARCHITECTURE.md "Environment quirks") —
# do not run while a bench/training process owns the chip.
set -uo pipefail
cd "$(dirname "$0")/.."

export LOG_TPU_TEST_PLATFORM=axon   # conftest: run on the tunneled chip
export JAX_PLATFORMS=
# kernel-equivalence + boundary subset: tiled-vs-oracle forward and grads,
# Pallas expansion vs jnp, pack kernel, compaction-by-sort layout
TESTS=(
  tests/test_rasterize_tiled.py
  tests/test_expand_pallas.py
  tests/test_compact_sort.py
  tests/test_block_render.py
  tests/test_flat_slice.py
)
echo "=== on-TPU check lane: $(date -u +%FT%TZ) ==="
rc=0
# one pytest per file: progress is visible between files, and a wedged
# remote compile only stalls its own file
for t in "${TESTS[@]}"; do
  echo "--- $t $(date -u +%T)"
  stdbuf -oL python -m pytest "$t" -q -x 2>&1 \
    | grep --line-buffered -v "cpu_aot_loader\|Compile machine\|SIGILL"
  r=${PIPESTATUS[0]}
  [ "$r" -ne 0 ] && rc=$r
done
echo "=== on-TPU check lane rc=$rc ==="
exit $rc
