#!/usr/bin/env bash
# Full DEFAULT-MODE (parity-floor) suite, split into the two tranches the
# round-4 gate recipe documents (SUITE_r04.md):
#   tranche A: everything but the e2e tail (fast; unit/oracle/equivalence)
#   tranche B: the parity-gate e2e trainings (pytest -m e2e; the slow tail)
# Each tranche fits the reference's own <=120-min CI budget on this 1-core
# host; run them sequentially (or on two hosts) for the full gate.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/suite
order="${1:-BA}"

# OPT-IN persistent XLA compilation cache (OT_VAE_SUITE_CACHE=1): dedupes
# the suite's repeated tiny-program compiles across tests and runs
# (measured 17.8 s -> 7.9 s on a representative compile-bound probe).
# Opt-in rather than default because XLA:CPU's AOT loader warns about
# pseudo machine features (+prefer-no-scatter/-gather) on reload — benign
# on the same host (outputs verified bit-identical) but noisy, and the
# parity gate should not depend on executable reuse.
if [ "${OT_VAE_SUITE_CACHE:-0}" = "1" ]; then
    export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/suite/jax_cache}"
    mkdir -p "$JAX_COMPILATION_CACHE_DIR"
fi

run_tranche() {
    name="$1"; marker="$2"
    echo "=== tranche $name (pytest -m \"$marker\") start: $(date -u +%H:%M:%SZ)"
    start=$(date +%s)
    python -m pytest tests -m "$marker" -q --durations=15 \
        2>&1 | tee "/tmp/suite/tranche_$name.log" | tail -4
    rc=${PIPESTATUS[0]}
    echo "=== tranche $name done rc=$rc in $(( $(date +%s) - start ))s"
    return "$rc"
}

rc=0
if [ "$order" = "BA" ]; then
    run_tranche B "e2e" || rc=1
    run_tranche A "not e2e" || rc=1
else
    run_tranche A "not e2e" || rc=1
    run_tranche B "e2e" || rc=1
fi
echo "FULL SUITE rc=$rc"
exit "$rc"
