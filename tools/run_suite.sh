#!/bin/bash
# Suite runner: one pytest process per test file, persistent JAX cache ON.
#
# Why not one big `pytest tests/`: (a) on this host, jax 0.9.0's XLA:CPU
# AOT cache loader has segfaulted inside long-lived many-executable
# processes (see tests/conftest.py) — per-file processes shrink the blast
# radius and make a crash attributable; (b) with the cache shared across
# processes, the expensive trial-pipeline compiles are paid once.
#
# Usage: tools/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export ASTC_SUITE_CACHE=${ASTC_SUITE_CACHE:-/tmp/jax_cache_suite}
mkdir -p "$ASTC_SUITE_CACHE"
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    ASTC_TPU_TEST_REAL= ASTC_FORCE_CPU_CACHE="$ASTC_SUITE_CACHE" \
        timeout 5400 python -m pytest "$f" -q "$@" 2>&1 \
        | grep -vE "cpu_aot_loader|^E[0-9]{4}" | tail -4
    rc=${PIPESTATUS[0]}
    if [ "$rc" != "0" ]; then
        echo "FAILED: $f (rc=$rc)"
        fail=1
    fi
done
exit $fail
