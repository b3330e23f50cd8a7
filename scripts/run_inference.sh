#!/usr/bin/env bash
# Batch driver: run inference for a scenario x model matrix
# (reference scripts/run_inference.sh contract).
set -e

if [ -z "$MODEL_PATH" ]; then
    echo "Environment variable MODEL_PATH not defined." >&2
    exit 1
fi
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
    SCENARIOS=(kitti_04_10 kitti_pairs modelnet40_seen modelnet40_unseen)
fi

MODELS=(kitti_00-03_05-09 kitti_00-06 kitti_00-10 kitti_pairs modelnet40)

for scenario in "${SCENARIOS[@]}"; do
    for model in "${MODELS[@]}"; do
        if [ ! -d "$MODEL_PATH/$model" ]; then
            continue
        fi
        echo "=== scenario=$scenario model=$model ==="
        python "$SCRIPT_DIR/inference.py" \
            "$SCENARIO_DIR/$scenario.yaml" "$model" "$OUTPUT_BASE"
    done
done
