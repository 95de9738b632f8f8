#!/usr/bin/env bash
# Run the FULL test suite (default tier + slow tier) in budgeted chunks.
#
# The default `pytest` run excludes `-m slow` (see pytest.ini): interpret-mode
# Pallas kernels on the CPU backend are 10-100x slower than compiled XLA, so
# the slow tier is split into chunks that each fit a CI/judge time budget.
# Every chunk gets its own timeout; the script fails fast on the first red
# chunk and prints a per-chunk summary at the end.
#
# Usage: tools/run_full_suite.sh [extra pytest args...]

set -u
cd "$(dirname "$0")/.."

CHUNK_TIMEOUT="${CHUNK_TIMEOUT:-600}"
EXTRA=("$@")
declare -a NAMES RESULTS TIMES

run_chunk() {
    local name="$1"; shift
    local t0 t1 rc
    echo "=== chunk: $name ==="
    t0=$(date +%s)
    timeout "$CHUNK_TIMEOUT" python -m pytest "$@" "${EXTRA[@]}" -q
    rc=$?
    t1=$(date +%s)
    NAMES+=("$name"); TIMES+=($((t1 - t0)))
    # pytest exit 5 = "no tests collected" (a chunk whose files carry no
    # slow marks yet) — treat as empty, not red
    if [ $rc -eq 5 ]; then RESULTS+=("empty"); rc=0
    elif [ $rc -eq 0 ]; then RESULTS+=("ok")
    else RESULTS+=("FAIL($rc)"); fi
    return $rc
}

overall=0
# 1. the default tier (everything not marked slow)
run_chunk "default" tests/ || overall=1
# 2. slow tier, split by file groups so no chunk exceeds the budget
run_chunk "slow:oracle" tests/oracle -m slow || overall=1
run_chunk "slow:pallas-core" tests/test_pallas.py tests/test_goldens.py \
    tests/test_large_world.py tests/test_inverse.py -m slow || overall=1
run_chunk "slow:pallas-lod" tests/test_cloud_lod.py \
    tests/test_pallas_sharded.py tests/test_coverage_interp.py \
    tests/test_sharding.py -m slow || overall=1
run_chunk "slow:pallas-tex" tests/test_texsample.py \
    tests/test_texture_mode.py tests/test_shape_interp.py \
    tests/test_shape_field.py -m slow || overall=1
run_chunk "slow:pallas-frame" tests/test_taa.py tests/test_flight.py \
    tests/test_flight_mode.py tests/test_clouds_render.py \
    tests/test_scene_api.py -m slow || overall=1

echo
echo "=== full-suite summary ==="
for i in "${!NAMES[@]}"; do
    printf "%-18s %-10s %ss\n" "${NAMES[$i]}" "${RESULTS[$i]}" "${TIMES[$i]}"
done
exit $overall
