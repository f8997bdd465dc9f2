#!/usr/bin/env bash
set -euo pipefail

# create a Docker image (run from the repo root)
NAME=friendly-stable-audio-tools-tpu
docker build -t ${NAME} -f ./container/${NAME}.Dockerfile .

# convert a Docker image to a Singularity container (HPC TPU pods)
singularity build ${NAME}.sif docker-daemon://${NAME}
