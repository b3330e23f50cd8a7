#!/usr/bin/env bash
# Run a command in the deepclr_tpu container with data mounts
# (counterpart of the reference's docker/run.sh).
set -e

IMAGE=${IMAGE:-deepclr-tpu}
DATA_DIR=${DATA_DIR:-$HOME/data}

docker run --rm -it \
    --privileged --network host \
    -v "$DATA_DIR":/data \
    -v "$(pwd)":/workspace \
    -w /workspace \
    "$IMAGE" "$@"
