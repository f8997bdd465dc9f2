"""Residual-unit kernel variants at the slow low-channel decoder stages.

The decode probe shows the c=128 stages running at 19-26 TFLOP/s vs ~100 at
c=1024 — per-element (VPU/layout/program) costs dominate once T is huge and
channels are narrow. Variants measured here, all output-equivalent:

  ru_cur    : production fused_residual_unit (xcat-scratch unfold, bt<=2048)
  ru_dots   : k accumulated [bt, cin] x [cin, cout] dots, NO unfold scratch
              (frees 1792 B/row of VMEM -> bt 4096; skips 7 scratch copies)
  ru_dots8k : same with bt 8192
  up_cur    : production snake_conv_transpose1d at the last upsample
  up_wide   : same with a wider block
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpu_probe import emit, timeit_loop

from friendly_stable_audio_tools_tpu.ops.pallas import conv1d as c1


def _ru_dots_kernel(x_cur, x_nxt, w1_ref, b1_ref, ab1_ref, w2_ref, b2_ref,
                    ab2_ref, o_ref, *, k, dilation, block_t):
    halo = (k - 1) * dilation
    padding = halo // 2
    cur = x_cur[:].astype(jnp.float32)
    x = jnp.concatenate([cur, x_nxt[:].astype(jnp.float32)], axis=0) if halo else cur
    res = x[padding: padding + block_t]
    a1, ib1 = ab1_ref[0, :], ab1_ref[1, :]
    x = x + 0.5 * ib1 * (1.0 - jnp.cos(2.0 * a1 * x))
    x = x.astype(o_ref.dtype)
    h = jnp.zeros((block_t, w1_ref.shape[2]), jnp.float32)
    for j in range(k):
        h = h + jax.lax.dot_general(
            x[j * dilation: j * dilation + block_t],
            w1_ref[j].astype(o_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = h + b1_ref[0, :]
    a2, ib2 = ab2_ref[0, :], ab2_ref[1, :]
    h = h + 0.5 * ib2 * (1.0 - jnp.cos(2.0 * a2 * h))
    h = h.astype(o_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[:].astype(o_ref.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2_ref[0, :]
    o_ref[:] = (y + res).astype(o_ref.dtype)


def ru_dots(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    b, t, cin = x.shape
    k = w1.shape[0]
    halo = (k - 1) * dilation
    padding = halo // 2
    pad_t = (block_t - t % block_t) % block_t
    n_t = (t + pad_t) // block_t
    right = (n_t + 1) * block_t - t - padding
    xp = jnp.pad(x, ((0, 0), (padding, right), (0, 0)))
    halo_rows = c1._halo_rows(halo)
    kernel = functools.partial(_ru_dots_kernel, k=k, dilation=dilation,
                               block_t=block_t)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, halo_rows, cin),
                         lambda bb, i, r=block_t // halo_rows: (bb, (i + 1) * r, 0)),
            pl.BlockSpec((k, cin, cin), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((cin, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cin), x.dtype),
    )(xp, xp, w1, b1.reshape(1, -1), ab1, w2, b2.reshape(1, -1), ab2)
    return out[:, :t, :]


def main():
    emit(probe="env", platform=jax.default_backend(),
         device=str(jax.devices()[0].device_kind))
    rng = jax.random.PRNGKey(0)
    k = 7
    for t, c in ((1048576, 128), (262144, 256)):
        x = jax.random.normal(rng, (1, t, c), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(jax.random.fold_in(rng, 1), (k, c, c), jnp.float32) * 0.05
        b1 = jnp.zeros((c,), jnp.float32)
        w2 = jax.random.normal(jax.random.fold_in(rng, 2), (c, c), jnp.float32) * 0.05
        b2 = jnp.zeros((c,), jnp.float32)
        al = jnp.ones((c,), jnp.float32) * 0.5
        ib = jnp.ones((c,), jnp.float32) * 2.0
        ab = jnp.stack([al, ib])
        flops = 2.0 * t * c * c * (k + 1)

        for dil in (1, 9):
            fn_cur = lambda x: c1.fused_residual_unit(
                x, w1, b1, al, ib, w2, b2, al, ib, dilation=dil)
            ref = np.asarray(fn_cur(x), np.float32)
            dt = timeit_loop(fn_cur, x, n=3)
            emit(probe="ru_cur", t=t, c=c, dil=dil, ms=round(dt * 1e3, 3),
                 tflops=round(flops / dt / 1e12, 1))

            for bt in (2048, 4096, 8192):
                try:
                    fn = lambda x, bt=bt, dil=dil: ru_dots(
                        x, w1, b1, ab, w2, b2, ab, dil, bt)
                    got = np.asarray(fn(x), np.float32)
                    rel = float(np.linalg.norm(got - ref) /
                                (np.linalg.norm(ref) + 1e-12))
                    dt = timeit_loop(fn, x, n=3)
                    emit(probe="ru_dots", t=t, c=c, dil=dil, bt=bt,
                         ms=round(dt * 1e3, 3),
                         tflops=round(flops / dt / 1e12, 1),
                         rel_l2=round(rel, 6))
                except Exception as e:
                    emit(probe="ru_dots", t=t, c=c, dil=dil, bt=bt,
                         error=str(e)[:140])


if __name__ == "__main__":
    main()
