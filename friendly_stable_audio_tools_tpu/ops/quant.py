"""Opt-in int8 dynamic-quantized matmul for inference.

The v5e MXU runs int8xint8->int32 at ~1.25x the achievable bf16 rate at
SAO GEMM shapes (measured 138-149 TOP/s vs ~139-153 TFLOP/s bf16; see
docs/performance.md).  This module provides a drop-in `QuantDense` that the
transformer's hot projections route through: with `FSAT_INT8_MATMUL=1` the
matmul runs as

    x_q  = round(x / s_x)    per-token  (row)    scale, symmetric int8
    w_q  = round(w / s_w)    per-output-channel  scale, symmetric int8
    y    = (x_q @ w_q) * s_x * s_w       int32 accumulation

Weight quantization is loop-invariant inside the sampler scan, so XLA's
while-loop LICM hoists it out of the 100-step loop; only the per-token
activation quantization (one |max| reduce + multiply + cast per GEMM) runs
per step. Verified on compiled HLO: the while carry holds the s8 kernels +
f32 scales (quantized once, pre-loop), and no weight-shaped
round/clamp/convert remains in the loop body.

Off (the default) it is bit-identical to `flax.linen.Dense`: same parameter
names ("kernel"/"bias"), same shape convention, same dtype-promotion rule,
so checkpoints and module trees are unchanged.

This changes outputs vs the bf16 reference recipe, so it is NEVER enabled
implicitly; bench.py reports bf16 numbers unless asked otherwise.  Fidelity
bounds are pinned in tests/test_quant.py.
"""

from __future__ import annotations

import contextlib
import os
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes

# Trace-time override used by the hybrid int8/bf16 sampler schedule
# (inference/sampling.py): both `lax.cond` branches of the hybrid denoiser
# trace the same model, one under quant_override(True) and one under
# quant_override(False). None = defer to the FSAT_INT8_MATMUL env flag.
_QUANT_OVERRIDE: tp.Optional[bool] = None


@contextlib.contextmanager
def quant_override(enabled: tp.Optional[bool]):
    """Force int8 matmuls on/off for code traced inside this context,
    regardless of FSAT_INT8_MATMUL. Trace-time only (like the env flag)."""
    global _QUANT_OVERRIDE
    prev = _QUANT_OVERRIDE
    _QUANT_OVERRIDE = enabled
    try:
        yield
    finally:
        _QUANT_OVERRIDE = prev


def int8_matmul_enabled(tag: str = "") -> bool:
    """Whether a projection tagged `tag` ("mlp" / "attn" / "") quantizes.

    FSAT_INT8_SCOPE limits quantization to one projection family:
    "mlp" (GLU in-proj + MLP out — ~3/4 of the transformer GEMM FLOPs) or
    "attn" (qkv / kv / out). Empty/unset = all tagged projections.
    """
    if _QUANT_OVERRIDE is not None:
        enabled = _QUANT_OVERRIDE
    else:
        enabled = os.environ.get("FSAT_INT8_MATMUL") == "1"
    if not enabled:
        return False
    scope = os.environ.get("FSAT_INT8_SCOPE", "")
    if scope not in ("", "mlp", "attn"):
        # An unrecognized scope (e.g. a typo like "att") would otherwise match
        # no tag and silently disable ALL quantization while FSAT_INT8_MATMUL=1
        # suggests it is on.
        raise ValueError(
            f"FSAT_INT8_SCOPE={scope!r} is not one of '', 'mlp', 'attn'")
    return scope in ("", tag)


def quantize_weight_int8(w: jnp.ndarray) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 weight quantization.

    w: [K, N] -> (w_q int8 [K, N], scale f32 [N])
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation_int8(x: jnp.ndarray) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-token (last-axis-reduced) int8 activation quantization.

    x: [..., K] -> (x_q int8 [..., K], scale f32 [..., 1])

    All-zero rows (the CFG null conditioning embedding is exactly zero) get
    scale eps/127 and quantize to zeros — no NaN/Inf.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def dynamic_int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ w [K, N] via int8 MXU dots with int32 accumulation."""
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    x_q, s_x = quantize_activation_int8(x)
    w_q, s_w = quantize_weight_int8(w)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s_x * s_w).astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in `nn.Dense`: identical param tree; int8 path when enabled.

    Only used on inference-hot projections (attention qkv/out, MLP in/out).
    The int8 branch is selected at trace time from the environment, so the
    jit cache key does not change; re-jit after flipping the env var.
    """

    features: int
    use_bias: bool = True
    kernel_init: tp.Callable = nn.initializers.lecun_normal()
    bias_init: tp.Callable = nn.initializers.zeros
    param_dtype: tp.Any = jnp.float32
    dtype: tp.Optional[tp.Any] = None
    quant_tag: str = ""  # "mlp" | "attn" — FSAT_INT8_SCOPE selector

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype) if self.use_bias else None
        x, kernel, bias = flax_dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        if return_kernel:
            # fusion hook (ops/pallas/mlp.py): hand the promoted weights to a
            # caller that runs the GEMM inside a fused kernel instead
            return kernel, bias
        if int8_matmul_enabled(self.quant_tag):
            y = dynamic_int8_matmul(x, kernel)
        else:
            y = jax.lax.dot_general(
                x, kernel,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            )
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y
