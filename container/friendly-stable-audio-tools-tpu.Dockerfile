## Dockerfile for friendly-stable-audio-tools-tpu (TPU VMs)
## Parity target: reference container/friendly-stable-audio-tools.Dockerfile
## (CUDA base image) — here the accelerator stack is jax[tpu] over libtpu,
## so a slim Python base suffices; no CUDA runtime, no transformer-engine.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        git \
    && rm -rf /var/lib/apt/lists/*

RUN python -m pip install --upgrade pip

# JAX with the TPU runtime (libtpu via the Google releases index)
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# friendly-stable-audio-tools-tpu (latest main)
RUN git clone https://github.com/<your-fork>/friendly-stable-audio-tools-tpu.git
RUN cd friendly-stable-audio-tools-tpu && pip install .

# Persistent XLA compilation cache across container restarts (first compile
# of the sampler scan is ~20-40 s; cached restarts are seconds)
ENV JAX_COMPILATION_CACHE_DIR=/cache/jax
VOLUME ["/cache"]
