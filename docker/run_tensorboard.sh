#!/bin/bash
# TensorBoard launcher for deepclr_tpu experiment directories
# (reference parity: docker/run_tensorboard.sh).
#
# Usage: ./run_tensorboard.sh LOGDIR [options] [-- TENSORBOARD_ARGS...]
#   -d|--detach   run the container in the background
#   -n|--name     container name (default: tensorboard)
#   -s|--stop     stop a detached tensorboard container
#   -i|--image    docker image (default: tensorflow/tensorflow)
#
# LOGDIR is an experiment base dir; deepclr_tpu writes tensorboard event
# files (or scalars.jsonl fallbacks) into each experiment's output dir.
set -euo pipefail

IMAGE="tensorflow/tensorflow"
NAME="tensorboard"
DETACH=0
STOP=0
LOGDIR=""
EXTRA=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    -d|--detach) DETACH=1; shift ;;
    -n|--name)   NAME="$2"; shift 2 ;;
    -i|--image)  IMAGE="$2"; shift 2 ;;
    -s|--stop)   STOP=1; shift ;;
    -h|--help)
      grep '^#' "$0" | sed 's/^# \{0,1\}//' | tail -n +2
      exit 0 ;;
    --) shift; EXTRA+=("$@"); break ;;
    *)
      if [[ -z "${LOGDIR}" ]]; then LOGDIR="$1"; else EXTRA+=("$1"); fi
      shift ;;
  esac
done

if [[ "${STOP}" == 1 ]]; then
  echo "Stopping TensorBoard container '${NAME}'"
  exec docker stop "${NAME}"
fi

if [[ -z "${LOGDIR}" ]]; then
  echo "error: missing LOGDIR (see --help)" >&2
  exit 1
fi

RUN_ARGS=(
  -v "$(realpath "${LOGDIR}"):/logs:ro"
  --name "${NAME}" -h "${NAME}"
  --network=host
  --rm
)
[[ "${DETACH}" == 1 ]] && RUN_ARGS+=(-d)

echo "Starting TensorBoard container '${NAME}' on ${LOGDIR}"
exec docker run "${RUN_ARGS[@]}" "${IMAGE}" \
  tensorboard --logdir /logs "${EXTRA[@]}"
