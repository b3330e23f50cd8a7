#!/bin/bash
# Run a python entry point inside the converted Singularity image
# (reference parity: docker/python_singularity.sh). Binds the repo and the
# data/model dirs given via env vars into the container.
#
# Usage: SIF=deepclr-tpu.sif ./python_singularity.sh SCRIPT [ARGS...]
set -euo pipefail

SIF="${SIF:-deepclr-tpu.sif}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

BINDS=(--bind "${REPO_DIR}:/workspace")
[[ -n "${KITTI_PATH:-}" ]] && BINDS+=(--bind "${KITTI_PATH}:${KITTI_PATH}")
[[ -n "${MODELNET40_PATH:-}" ]] && BINDS+=(--bind "${MODELNET40_PATH}:${MODELNET40_PATH}")
[[ -n "${MODEL_PATH:-}" ]] && BINDS+=(--bind "${MODEL_PATH}:${MODEL_PATH}")

exec singularity exec --nv "${BINDS[@]}" "${SIF}" \
  python "$@"
