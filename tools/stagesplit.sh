#!/bin/bash
# Sweep the stage-bisection configurations. Each run is a fresh process so
# import-time env vars take effect.
cd "$(dirname "$0")/.."
export SS_WIDTH=${SS_WIDTH:-1920} SS_HEIGHT=${SS_HEIGHT:-1080} SS_SPP=${SS_SPP:-4}

run() { SS_LABEL="$1" MPT_TRAVERSE_DEBUG="$2" MPT_RAY_SORT="$3" \
    timeout 600 python tools/stagesplit.py 2>&1 | grep -E "STAGE|Error" ; }

run full            ""     "2"
run kernel-stubbed  "all"  "2"   # kernel writes miss immediately: shade+glue cost
run no-sort         ""     "0"   # partition_dead permutations removed
run stub-no-sort    "all"  "0"   # pure integrator glue (no kernel, no sort)
