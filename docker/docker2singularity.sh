#!/bin/bash
# Convert the deepclr_tpu docker image into a Singularity image for HPC
# clusters that don't run docker (reference parity:
# docker/docker2singularity.sh).
#
# Usage: ./docker2singularity.sh OUTPUT_DIR [IMAGE] [CONVERTER_VERSION]
set -euo pipefail

if [[ $# -lt 1 || $# -gt 3 ]]; then
  echo "Usage: $0 OUTPUT_DIR [IMAGE] [CONVERTER_VERSION]" >&2
  exit 1
fi

OUTPUT_DIR="$1"
IMAGE="${2:-deepclr-tpu}"
VERSION="${3:-v3.6.0}"

mkdir -p "${OUTPUT_DIR}"
exec docker run \
  -v /var/run/docker.sock:/var/run/docker.sock \
  -v "$(realpath "${OUTPUT_DIR}")":/output \
  --privileged -t --rm \
  "quay.io/singularity/docker2singularity:${VERSION}" \
  "${IMAGE}"
