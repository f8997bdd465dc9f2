"""Residual-unit wide-N experiment at the decode hot shape (c=128, 74
TFLOP/s after sepdot — scripts/ru_exp.py). Hypothesis: the 7 separate
K=cin dots are capped by their N=128 output width (one lane tile); a single
[bt_ext, cin] x [cin, k*cin] dot (N=896 = 7 lane tiles) followed by k
row-shifted column-block adds should run nearer the wide-N MXU rate
(c=512 RUs measure 150 TFLOP/s).

  sepdot    production kernel (k separate dots, fp32 accumulate)
  widen     one wide dot + k shifted adds (fp32 D tile in VMEM)

Run on the real chip: python scripts/ru_exp2.py
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

from tpu_probe import emit, timeit_loop

from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import (
    _snake, fused_residual_unit, _halo_rows,
)


def _ru_kernel_widen(x_cur, x_nxt, w1_ref, b1_ref, ab1_ref, w2_ref, b2_ref,
                     ab2_ref, o_ref, *, k: int, dilation: int, block_t: int):
    halo = (k - 1) * dilation
    padding = halo // 2
    cur = x_cur[:].astype(jnp.float32)
    x = jnp.concatenate([cur, x_nxt[:].astype(jnp.float32)], axis=0) if halo else cur
    res = x[padding : padding + block_t]
    x = _snake(x, ab1_ref[0, :], ab1_ref[1, :])
    x = x.astype(o_ref.dtype)
    cin = w1_ref.shape[1]
    # ONE wide dot over the extended rows: D[r, j*cin:(j+1)*cin] = x[r] @ w1[j]
    wwide = w1_ref[:].transpose(1, 0, 2).reshape(cin, k * cin).astype(o_ref.dtype)
    dmat = jax.lax.dot_general(x, wwide, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc = None
    for j in range(k):
        dj = dmat[j * dilation : j * dilation + block_t, j * cin : (j + 1) * cin]
        acc = dj if acc is None else acc + dj
    h = acc + b1_ref[0, :]
    h = _snake(h, ab2_ref[0, :], ab2_ref[1, :]).astype(o_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[:].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2_ref[0, :]
    o_ref[:] = (y + res).astype(o_ref.dtype)


def ru_widen(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    b, t, cin = x.shape
    k = w1.shape[0]
    cout = w2.shape[1]
    halo = (k - 1) * dilation
    padding = halo // 2
    pad_t = (block_t - t % block_t) % block_t
    n_t = (t + pad_t) // block_t
    right = (n_t + 1) * block_t - t - padding
    xp = jnp.pad(x, ((0, 0), (padding, right), (0, 0)))
    kernel = functools.partial(_ru_kernel_widen, k=k, dilation=dilation, block_t=block_t)
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
    for (t, c) in ((2097152, 128), (262144, 256)):
        x = jax.random.normal(rng, (1, t, c), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(rng, (7, c, c), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.02
        b = jnp.zeros((c,), jnp.float32)
        a = jnp.ones((c,), jnp.float32)
        flops = 2.0 * t * c * c * 8
        d = 9

        dt = timeit_loop(lambda x, w1, w2: fused_residual_unit(
            x, w1, b, a, a, w2, b, a, a, dilation=d), x, w1, w2)
        emit(exp="sepdot", t=t, c=c, ms=round(dt * 1e3, 3),
             tflops=round(flops / dt / 1e12, 1))

        ab = jnp.stack([a, a])
        for bt in (1024, 2048, 4096):
            try:
                fn = lambda x, w1, w2, _bt=bt: ru_widen(x, w1, b, ab, w2, b, ab, d, _bt)
                ref = fused_residual_unit(x[:, :bt * 2], w1, b, a, a, w2, b, a, a, dilation=d)
                got = fn(x[:, :bt * 2], w1, w2)
                rel = float(jnp.linalg.norm((got - ref).astype(jnp.float32)) /
                            jnp.linalg.norm(ref.astype(jnp.float32)))
                dt = timeit_loop(fn, x, w1, w2)
                emit(exp=f"widen_bt{bt}", t=t, c=c, ms=round(dt * 1e3, 3),
                     tflops=round(flops / dt / 1e12, 1), rel_vs_sepdot=round(rel, 6))
            except Exception as e:  # noqa: BLE001 — VMEM overflow expected at large bt
                emit(exp=f"widen_bt{bt}", t=t, c=c, error=str(e)[:100])


if __name__ == "__main__":
    main()
