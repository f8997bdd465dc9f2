"""Batch-scaling probe: per-sample cost of the attention pair kernel and of
one full TransformerBlock at CFG batches 2/4/8/16 (SAO shape: T=1026,
dim 1536, 24 heads x 64). Localizes the batch-8 per-sample regression
(docs/performance.md "Batch scaling") to the kernel vs the rest of the block.

Run on the real chip: python scripts/batch_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_probe import emit, timeit_loop

T, DIM, HEADS, DH = 1026, 1536, 24, 64


def probe_pair_kernel():
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        _fused_pair_forward,
    )
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rot = rotary_freqs(T, 32)
    for b in (2, 4, 8, 16):
        qkv = jax.random.normal(jax.random.PRNGKey(b), (b, T, 3 * DIM),
                                jnp.bfloat16) * 0.1
        dt = timeit_loop(lambda q: _fused_pair_forward(q, rot, HEADS), qkv)
        emit(probe="pair_kernel", batch=b, ms=round(dt * 1e3, 3),
             ms_per_sample=round(dt * 1e3 / b, 4))


def probe_full_block():
    from friendly_stable_audio_tools_tpu.models.transformer import TransformerBlock
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = jax.random.PRNGKey(0)
    rot = rotary_freqs(T, 32)
    block = TransformerBlock(dim=DIM, dim_heads=DH, cross_attend=True,
                             dim_context=768)
    params = block.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, T, DIM), jnp.bfloat16),
        context=jnp.zeros((2, 130, 768), jnp.bfloat16),
        rotary_pos_emb=rot)["params"]
    params = jax.tree_util.tree_map(lambda l: l.astype(jnp.bfloat16), params)
    for b in (2, 16):
        x = jax.random.normal(rng, (b, T, DIM), jnp.bfloat16) * 0.1
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (b, 130, 768),
                                jnp.bfloat16) * 0.1
        dt = timeit_loop(
            lambda x, p: block.apply({"params": p}, x, context=ctx,
                                     rotary_pos_emb=rot, cross_half_batch=True),
            x, params)
        emit(probe="block_full", batch=b, ms=round(dt * 1e3, 3),
             ms_per_sample=round(dt * 1e3 / b, 4))


if __name__ == "__main__":
    emit(probe="env", platform=jax.default_backend())
    probe_pair_kernel()
    probe_full_block()
