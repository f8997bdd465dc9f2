"""Decoder upsample block_t experiments at the two weak stages
(decode probe: cin 256 s4 @ 56.5 TFLOP/s, cin 128 s2 @ 32.0 TFLOP/s).
Times `_upk` at forced block_t values, plus the GEMM form for reference.

Run on the real chip: python scripts/up_exp.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_probe import emit, timeit_loop

from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import _upk, _upk_gemm


def main():
    rng = jax.random.PRNGKey(0)
    for (t_in, cin, cout, s) in ((262144, 256, 128, 4), (1048576, 128, 128, 2)):
        x = jax.random.normal(rng, (1, t_in, cin), jnp.bfloat16) * 0.1
        w = jax.random.normal(rng, (2 * s, cin, cout), jnp.bfloat16) * 0.02
        b = jnp.zeros((cout,), jnp.float32)
        a = jnp.ones((cin,), jnp.float32)
        flops = 2.0 * t_in * s * cin * cout * 2

        for bt in (1024, 2048, 4096):
            try:
                fn = lambda x, w, _bt=bt: _upk(x, w, b, a, a, s, _bt)
                dt = timeit_loop(fn, x, w)
                emit(exp=f"upk_bt{bt}", t_in=t_in, cin=cin, stride=s,
                     ms=round(dt * 1e3, 3), tflops=round(flops / dt / 1e12, 1))
            except Exception as e:  # noqa: BLE001 — VMEM overflow expected
                emit(exp=f"upk_bt{bt}", t_in=t_in, cin=cin, stride=s,
                     error=str(e)[:100])

        dt = timeit_loop(lambda x, w: _upk_gemm(x, w, b, a, a, s), x, w)
        emit(exp="gemm", t_in=t_in, cin=cin, stride=s,
             ms=round(dt * 1e3, 3), tflops=round(flops / dt / 1e12, 1))


if __name__ == "__main__":
    main()
