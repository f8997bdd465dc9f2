"""Transcendental-rate probe: what does the snake activation's cos cost?

Measures elementwise variants on a [T, C] = [1048576, 128] block (the VAE
decoder's c=128 stage shape) in pure XLA, to locate the VPU floor of the
fused residual-unit kernel (ru_cur ~10.4 ms; MXU floor ~1.5 ms, HBM ~1.3 ms).

Variants:
  copy      : x * 1.0000001 (pure bandwidth)
  snake_f32 : x + 0.5*ib*(1 - cos(2a x)) in fp32 (production numerics)
  snake_bf16: same computed in bf16
  cos_f32   : cos(x) alone fp32
  sin_f32   : sin(x) fp32
  exp_f32   : exp(x) fp32
  exp2_f32  : exp2(x) fp32
  tanh_f32  : tanh(x)
  poly_f32  : 9th-order odd polynomial (mults/adds only, ~10 flops)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_probe import emit, timeit_loop

T, C = 1048576, 128


def main():
    emit(probe="env", platform=jax.devices()[0].platform,
         device=jax.devices()[0].device_kind)
    key = jax.random.PRNGKey(0)
    x32 = jax.random.normal(key, (T, C), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    a = jnp.float32(0.7)
    ib = jnp.float32(1.3)

    def copy(x):
        return x * 1.0000001

    def snake_f32(x):
        return x + 0.5 * ib * (1.0 - jnp.cos(2.0 * a * x))

    def snake_bf16(x):
        ab = a.astype(jnp.bfloat16)
        ibb = ib.astype(jnp.bfloat16)
        one = jnp.bfloat16(1.0)
        return x + jnp.bfloat16(0.5) * ibb * (one - jnp.cos(jnp.bfloat16(2.0) * ab * x))

    def cos_f32(x):
        return jnp.cos(x)

    def sin_f32(x):
        return jnp.sin(x)

    def exp_f32(x):
        return jnp.exp(x)

    def exp2_f32(x):
        return jnp.exp2(x)

    def tanh_f32(x):
        return jnp.tanh(x)

    def poly_f32(x):
        x2 = x * x
        return x * (1.0 + x2 * (0.5 + x2 * (0.25 + x2 * (0.125 + x2 * 0.0625))))

    cases = [
        ("copy_f32", copy, x32),
        ("copy_bf16", copy, x16),
        ("snake_f32", snake_f32, x32),
        ("snake_bf16", snake_bf16, x16),
        ("cos_f32", cos_f32, x32),
        ("sin_f32", sin_f32, x32),
        ("exp_f32", exp_f32, x32),
        ("exp2_f32", exp2_f32, x32),
        ("tanh_f32", tanh_f32, x32),
        ("poly_f32", poly_f32, x32),
    ]
    n = T * C
    for name, fn, x in cases:
        try:
            ms = timeit_loop(fn, x) * 1e3
        except Exception as e:  # noqa: BLE001
            emit(probe=name, error=str(e)[:160])
            continue
        emit(probe=name, ms=round(ms, 3), gelem_s=round(n / ms / 1e6, 1))


if __name__ == "__main__":
    main()
