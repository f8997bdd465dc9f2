## Dockerfile for friendly-stable-audio-tools-tpu (TPU VMs)
## Parity target: reference container/friendly-stable-audio-tools.Dockerfile
## (CUDA base image) — here the accelerator stack is jax[tpu] over libtpu,
## so a slim Python base suffices; no CUDA runtime, no transformer-engine.
## Build from the repo root:  docker build -f container/<this file> .

FROM python:3.12-slim

RUN python -m pip install --upgrade pip

# JAX with the TPU runtime (libtpu via the Google releases index)
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# this repository (build context = repo root)
COPY . /opt/friendly-stable-audio-tools-tpu
RUN pip install /opt/friendly-stable-audio-tools-tpu

# Persistent XLA compilation cache across container restarts (first compile
# of the sampler scan is ~20-40 s; cached restarts are seconds)
ENV JAX_COMPILATION_CACHE_DIR=/cache/jax
VOLUME ["/cache"]
