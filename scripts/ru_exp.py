"""Residual-unit kernel experiments at the decode hot shape (T=2M, C=128 —
60% of the 72 ms VAE decode runs here at only ~58 TFLOP/s, probe_decode).

Hypothesis: the xcat VMEM scratch (7x data duplication: [bt, k*cin] stacked
windows) plus the small 2048-row blocks (1024-program grid) dominate, not
the MXU dots. Variants:

  base        production fused_residual_unit (xcat, block_t from VMEM budget)
  sepdot@bt   k separate K=cin dots, accumulated in fp32 — no xcat scratch,
              so block_t can grow (fewer programs, less VMEM traffic)

Run on the real chip: python scripts/ru_exp.py
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_probe import emit, timeit_loop

from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import (
    _snake, fused_residual_unit, _halo_rows,
)


def _ru_kernel_sepdot(x_cur, x_nxt, w1_ref, b1_ref, ab1_ref, w2_ref, b2_ref,
                      ab2_ref, o_ref, *, k: int, dilation: int, block_t: int):
    halo = (k - 1) * dilation
    padding = halo // 2
    cur = x_cur[:].astype(jnp.float32)
    x = jnp.concatenate([cur, x_nxt[:].astype(jnp.float32)], axis=0) if halo else cur
    res = x[padding : padding + block_t]
    x = _snake(x, ab1_ref[0, :], ab1_ref[1, :])
    x = x.astype(o_ref.dtype)
    acc = None
    for j in range(k):
        xj = x[j * dilation : j * dilation + block_t]
        d = jax.lax.dot_general(xj, w1_ref[j].astype(o_ref.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    h = acc + b1_ref[0, :]
    h = _snake(h, ab2_ref[0, :], ab2_ref[1, :]).astype(o_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[:].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2_ref[0, :]
    o_ref[:] = (y + res).astype(o_ref.dtype)


def ru_sepdot(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    b, t, cin = x.shape
    k = w1.shape[0]
    cout = w2.shape[1]
    halo = (k - 1) * dilation
    padding = halo // 2
    pad_t = (block_t - t % block_t) % block_t
    n_t = (t + pad_t) // block_t
    right = (n_t + 1) * block_t - t - padding
    xp = jnp.pad(x, ((0, 0), (padding, right), (0, 0)))
    kernel = functools.partial(_ru_kernel_sepdot, k=k, dilation=dilation, block_t=block_t)
    halo_rows = _halo_rows(halo)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, halo_rows, cin),
                         lambda bb, i, r=block_t // _halo_rows(halo): (bb, (i + 1) * r, 0)),
            pl.BlockSpec((k, cin, cin), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((cin, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cout), x.dtype),
    )(xp, xp, w1, b1.reshape(1, -1), ab1, w2, b2.reshape(1, -1), ab2)
    return out[:, :t, :]


def main():
    rng = jax.random.PRNGKey(0)
    for (t, c) in ((1048576, 128), (2097152, 128), (262144, 256)):
        x = jax.random.normal(rng, (1, t, c), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(rng, (7, c, c), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.02
        b = jnp.zeros((c,), jnp.float32)
        a = jnp.ones((c,), jnp.float32)
        flops = 2.0 * t * c * c * 8
        d = 9

        dt = timeit_loop(lambda x, w1, w2: fused_residual_unit(
            x, w1, b, a, a, w2, b, a, a, dilation=d), x, w1, w2)
        emit(exp="base", t=t, c=c, ms=round(dt * 1e3, 3),
             tflops=round(flops / dt / 1e12, 1))

        ab = jnp.stack([a, a])
        for bt in (2048, 4096, 8192, 16384):
            try:
                fn = lambda x, w1, w2, _bt=bt: ru_sepdot(x, w1, b, ab, w2, b, ab, d, _bt)
                ref = fused_residual_unit(x[:, :bt * 2], w1, b, a, a, w2, b, a, a, dilation=d)
                got = fn(x[:, :bt * 2], w1, w2)
                import numpy as np
                rel = float(jnp.linalg.norm((got - ref).astype(jnp.float32)) /
                            jnp.linalg.norm(ref.astype(jnp.float32)))
                dt = timeit_loop(fn, x, w1, w2)
                emit(exp=f"sepdot_bt{bt}", t=t, c=c, ms=round(dt * 1e3, 3),
                     tflops=round(flops / dt / 1e12, 1), rel_vs_base=round(rel, 6))
            except Exception as e:  # noqa: BLE001 — VMEM overflow expected at large bt
                emit(exp=f"sepdot_bt{bt}", t=t, c=c, error=str(e)[:120])


if __name__ == "__main__":
    main()
