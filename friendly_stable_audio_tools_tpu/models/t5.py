"""Native JAX T5 text encoder.

The reference conditions on a frozen HF `T5EncoderModel`
(reference models/conditioners.py:261-346). This is a from-scratch flax
implementation of the T5 encoder stack (RMSNorm, relative position bias on
layer 0 shared to all layers, unscaled attention, ReLU or gated-GELU FF),
weight-convertible from HF torch checkpoints via
`utils/torch_import.py::convert_t5_encoder`.

Runs in bf16 on TPU (the reference casts to fp16 on CUDA).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # or "gated-gelu" (flan-t5)


T5_CONFIGS: tp.Dict[str, T5Config] = {
    "t5-small": T5Config(d_model=512, d_ff=2048, num_layers=6, num_heads=8),
    "t5-base": T5Config(),
    "t5-large": T5Config(d_model=1024, d_ff=4096, num_layers=24, num_heads=16),
    "t5-3b": T5Config(d_model=1024, d_kv=128, d_ff=16384, num_layers=24, num_heads=32),
    "t5-11b": T5Config(d_model=1024, d_kv=128, d_ff=65536, num_layers=24, num_heads=128),
    "google/flan-t5-small": T5Config(d_model=512, d_kv=64, d_ff=1024, num_layers=8, num_heads=6, feed_forward_proj="gated-gelu"),
    "google/flan-t5-base": T5Config(d_ff=2048, feed_forward_proj="gated-gelu"),
    "google/flan-t5-large": T5Config(d_model=1024, d_ff=2816, num_layers=24, num_heads=16, feed_forward_proj="gated-gelu"),
    "google/flan-t5-xl": T5Config(d_model=2048, d_ff=5120, num_layers=24, num_heads=32, feed_forward_proj="gated-gelu"),
    "google/flan-t5-xxl": T5Config(d_model=4096, d_ff=10240, num_layers=24, num_heads=64, feed_forward_proj="gated-gelu"),
}

# output dims used by the reference for cond_dim plumbing (conditioners.py:267-283)
T5_MODEL_DIMS = {name: cfg.d_model for name, cfg in T5_CONFIGS.items()}


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (weight * y).astype(x.dtype)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, name="q")(x)
        k = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, name="k")(x)
        v = nn.Dense(inner, use_bias=False, param_dtype=jnp.float32, name="v")(x)
        b, t, _ = x.shape

        def heads(a):
            return a.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        if self.has_relative_bias:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
                jnp.float32,
            )
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            position_bias = rel_emb[buckets].transpose(2, 0, 1)[None]  # [1, H, T, T]

        # T5 attention is UNscaled
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        if position_bias is not None:
            logits = logits + position_bias
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(cfg.d_model, use_bias=False, param_dtype=jnp.float32, name="o")(out)
        return out, position_bias


class T5FF(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.feed_forward_proj == "gated-gelu":
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, param_dtype=jnp.float32, name="wi_0")(x)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, param_dtype=jnp.float32, name="wi_1")(x)
            h = jax.nn.gelu(wi0, approximate=True) * wi1
        else:
            h = nn.Dense(cfg.d_ff, use_bias=False, param_dtype=jnp.float32, name="wi")(x)
            h = jax.nn.relu(h)
        return nn.Dense(cfg.d_model, use_bias=False, param_dtype=jnp.float32, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        h = T5LayerNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, name="ln1")(x)
        attn, position_bias = T5Attention(self.cfg, self.has_relative_bias, name="attn")(
            h, mask=mask, position_bias=position_bias
        )
        x = x + attn
        h = T5LayerNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, name="ln2")(x)
        x = x + T5FF(self.cfg, name="ff")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        emb = nn.Embed(self.cfg.vocab_size, self.cfg.d_model, param_dtype=jnp.float32, name="shared")
        x = emb(input_ids)
        position_bias = None
        for i in range(self.cfg.num_layers):
            x, position_bias = T5Block(self.cfg, has_relative_bias=(i == 0), name=f"block{i}")(
                x, mask=attention_mask, position_bias=position_bias
            )
        x = T5LayerNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, name="final_layer_norm")(x)
        return x
