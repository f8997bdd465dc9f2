"""Trace-time environment toggles and their jit-cache key.

Several FSAT_* env vars are read at *trace* time and select between
compiled program variants (Pallas vs XLA kernels, int8 vs bf16 matmuls,
CFG cross-attention skip, padded-sequence handling). Every long-lived jit
cache in the package must fold `trace_env_key()` into its key, or flipping
a flag between calls silently serves the previously-compiled program.
"""

from __future__ import annotations

import os

TRACE_TIME_ENV_FLAGS = (
    "FSAT_INT8_MATMUL",
    "FSAT_INT8_SCOPE",
    "FSAT_INT8_BF16_TAIL",
    "FSAT_INT8_BF16_HEAD",
    "FSAT_FUSED_ATTN",
    "FSAT_FUSED_BWD",
    "FSAT_PAIR_BWD",
    "FSAT_FUSED_MLP",
    "FSAT_DISABLE_FUSED_MLP",
    "FSAT_FUSED_EW",
    "FSAT_PALLAS_CROSS",
    "FSAT_PALLAS_INTERPRET",
    "FSAT_DISABLE_PALLAS_ATTN",
    "FSAT_DISABLE_PALLAS_CONV",
    "FSAT_DISABLE_CFG_CROSS_SKIP",
    "FSAT_DISABLE_SEQ_PAD",
    "FSAT_FORCE_SEQ_PAD",
    "FSAT_FORCE_HOST_CALLBACKS",
)


def trace_env_key() -> tuple:
    return tuple(os.environ.get(f) for f in TRACE_TIME_ENV_FLAGS)
