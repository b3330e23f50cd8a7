#!/usr/bin/env bash
# Batch driver: run every ICP baseline on the given scenarios
# (reference scripts/run_icp.sh contract).
set -e

if [ "$#" -lt 1 ]; then
    echo "Usage: $0 OUTPUT_BASE [SCENARIO ...]" >&2
    exit 1
fi

OUTPUT_BASE="$1"
shift
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
SCENARIO_DIR="$SCRIPT_DIR/../configs/scenarios"

SCENARIOS=("$@")
if [ "${#SCENARIOS[@]}" -eq 0 ]; then
    SCENARIOS=(kitti_04_10 kitti_pairs)
fi

ALGOS=(icp_po2po icp_po2pl gicp)

for scenario in "${SCENARIOS[@]}"; do
    for algo in "${ALGOS[@]}"; do
        echo "=== scenario=$scenario algorithm=$algo ==="
        python "$SCRIPT_DIR/icp.py" \
            "$SCENARIO_DIR/$scenario.yaml" "$algo" "$OUTPUT_BASE" \
            --max-distance 1.0
    done
done
