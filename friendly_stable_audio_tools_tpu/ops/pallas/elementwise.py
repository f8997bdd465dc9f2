"""Fused adaLN elementwise Pallas kernels for the DiT block.

The adaLN TransformerBlock (reference transformer.py:595-703) runs four
bandwidth-bound elementwise sites per layer around its GEMMs:

  1. pre_norm LN  -> x * (1 + scale_self) + shift_self
  2. attn_out * sigmoid(1 - gate_self) + residual
  3. ff_norm LN   -> x * (1 + scale_ff) + shift_ff
  4. ff_out * sigmoid(1 - gate_ff) + residual

XLA compiles each site as 2-3 separate HBM passes (the LN reduction
refetches its input, and the modulate/gate consumers land in separate loop
fusions) — measured ~395 GB/s effective at SA-2.0 long-form shapes
([2, 6272, 1536]: 1.442 ms/layer for LN+adaLN+gates, docs/performance.md
"Long-form" decomposition) against an ~800 GB/s chip. These kernels do each
site in ONE read + ONE write:

  ln_modulate(x, gamma, scale, shift):  LN (fp32 stats, eps 1e-5, biasless,
      gamma scale) -> cast to x.dtype -> * (1 + scale) + shift
  gated_residual(y, gate, residual):    y * sigmoid(1 - gate) + residual

Numerics: the LN math (fp32 mean/var, rsqrt(var+eps), gamma in fp32, cast
to input dtype BEFORE the modulate) follows models/transformer.py LayerNorm
exactly; the sigmoid runs in fp32 where the eager chain computes it in the
gate's dtype — divergence is bounded in tests/test_pallas_kernels.py.
Backward: custom_vjp recomputes through the plain-XLA reference chain
(same pattern as ops/pallas/conv1d.py), so autodiff is exact w.r.t. the
XLA forward.

Opt-in via FSAT_FUSED_EW=1 (trace-time flag, in utils/trace_flags); per
CLAUDE.md kernels are only flipped on by default after an END-TO-END A/B
on the composed step probe.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return os.environ.get("FSAT_PALLAS_INTERPRET") == "1"


def fused_ew_enabled() -> bool:
    if os.environ.get("FSAT_FUSED_EW") != "1":
        return False
    return jax.default_backend() != "cpu" or _interpret()


def _eligible(x, scale) -> bool:
    if x.ndim != 3 or x.shape[-1] % 128 or x.shape[-1] > 4096:
        return False
    # single-dtype hot path only: bf16 activations with bf16 adaLN vectors
    # (mixed dtypes would change the output dtype vs the eager chain)
    return x.dtype == jnp.bfloat16 and scale.dtype == jnp.bfloat16


def _pick_bt(t: int, d: int) -> int:
    # fp32 intermediates + in/out blocks + double buffering must fit the
    # ~16 MB scoped-vmem stack; 8 bytes/elem of headroom keeps us well under
    for bt in (1024, 512, 256, 128):
        if bt * d * 8 <= 8 * 2**20:
            return min(bt, t)
    return 128


# ---------------------------------------------------------------------------
# ln_modulate


def _lnmod_xla(x, gamma, scale, shift):
    """Reference chain: models/transformer.py LayerNorm + adaLN modulate."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    if gamma is not None:
        y = y * gamma
    y = y.astype(x.dtype)
    return y * (1 + scale) + shift


def _lnmod_kernel(x_ref, g_ref, s_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # [bt, D]
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + 1e-5)
    y = (y * g_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[0] = y * (1 + s_ref[0]) + b_ref[0]


def _lnmod_forward(x, gamma, scale, shift):
    bsz, t, d = x.shape
    bt = _pick_bt(t, d)
    grid = (bsz, pl.cdiv(t, bt))
    return pl.pallas_call(
        _lnmod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0)),
            # vectors stay 3-D: Mosaic needs the block's last-two dims to be
            # (8,128)-divisible or equal to the array dims
            pl.BlockSpec((1, 1, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
        interpret=_interpret(),
    )(x, gamma, scale, shift)


@jax.custom_vjp
def _lnmod(x, gamma, scale, shift):
    return _lnmod_forward(x, gamma, scale, shift)


def _lnmod_fwd(x, gamma, scale, shift):
    return _lnmod(x, gamma, scale, shift), (x, gamma, scale, shift)


def _lnmod_bwd(res, g):
    x, gamma, scale, shift = res
    # saved scale/shift are already [B, 1, D] (and gamma [1, 1, D])
    _, vjp = jax.vjp(_lnmod_xla, x, gamma, scale, shift)
    return vjp(g)


_lnmod.defvjp(_lnmod_fwd, _lnmod_bwd)


def ln_modulate(x, gamma, scale, shift):
    """LayerNorm(x; gamma) * (1 + scale) + shift in one HBM pass.

    x [B, T, D]; gamma [D] or None (fix_scale LN); scale/shift [B, 1, D]
    (adaLN vectors, broadcast over T). Falls back to the plain XLA chain for
    ineligible shapes/dtypes or when FSAT_FUSED_EW is off.
    """
    scale2 = jnp.squeeze(scale, axis=1)
    shift2 = jnp.squeeze(shift, axis=1)
    if not (fused_ew_enabled() and _eligible(x, scale2) and shift2.dtype == x.dtype):
        return _lnmod_xla(x, gamma, scale, shift)
    g = jnp.ones((x.shape[-1],), jnp.float32) if gamma is None else gamma.astype(jnp.float32)
    return _lnmod(x, g[None, None, :], scale2[:, None, :], shift2[:, None, :])


# ---------------------------------------------------------------------------
# gated_residual


def _gres_xla(y, gate, residual):
    return y * jax.nn.sigmoid(1 - gate) + residual


def _gres_kernel(y_ref, g_ref, r_ref, o_ref):
    y = y_ref[0].astype(jnp.float32)
    g = jax.nn.sigmoid(1.0 - g_ref[0].astype(jnp.float32))
    o_ref[0] = (y * g).astype(o_ref.dtype) + r_ref[0]


def _gres_forward(y, gate, residual):
    bsz, t, d = y.shape
    bt = _pick_bt(t, d)
    grid = (bsz, pl.cdiv(t, bt))
    return pl.pallas_call(
        _gres_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), y.dtype),
        interpret=_interpret(),
    )(y, gate, residual)


@jax.custom_vjp
def _gres(y, gate, residual):
    return _gres_forward(y, gate, residual)


def _gres_fwd(y, gate, residual):
    return _gres(y, gate, residual), (y, gate, residual)


def _gres_bwd(res, g):
    y, gate, residual = res
    # saved gate is already [B, 1, D]
    _, vjp = jax.vjp(_gres_xla, y, gate, residual)
    return vjp(g)


_gres.defvjp(_gres_fwd, _gres_bwd)


def gated_residual(y, gate, residual):
    """y * sigmoid(1 - gate) + residual in one HBM pass.

    y/residual [B, T, D]; gate [B, 1, D] (adaLN gate vector). Falls back to
    the plain XLA chain when ineligible or FSAT_FUSED_EW is off.
    """
    gate2 = jnp.squeeze(gate, axis=1)
    if not (fused_ew_enabled() and _eligible(y, gate2)
            and residual.dtype == y.dtype):
        return _gres_xla(y, gate, residual)
    return _gres(y, gate2[:, None, :], residual)
