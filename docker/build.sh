#!/usr/bin/env bash
# Build the deepclr_tpu image (counterpart of the reference's docker/build.sh).
set -e
cd "$(dirname "$0")/.."
docker build -t deepclr-tpu -f docker/Dockerfile .
