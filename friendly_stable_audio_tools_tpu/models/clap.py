"""CLAP text encoder (RoBERTa branch + projection), native JAX.

The reference conditions on `laion_clap.CLAP_Module` text embeddings
(reference models/conditioners.py:105-192). LAION music CLAP checkpoints
(`music_audioset_epoch_15_esc_90.14.pt` etc.) pair an HTSAT audio branch with
a RoBERTa-base text branch and 2-layer MLP projections; the text path is what
`CLAPTextConditioner` uses:

  * get_text_embedding  -> projected, L2-normalized [B, 512]
  * use_text_features   -> per-token hidden states of layer -2 [B, N, 768]
    (reference conditioners.py:155-171)

This module implements the RoBERTa encoder + text projection natively; the
(much larger) HTSAT audio branch is converted separately when needed by
CLAPAudioConditioner (round-2 scope).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


class RobertaSelfAttention(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.cfg
        d = cfg.hidden_size
        h = cfg.num_heads
        q = nn.Dense(d, param_dtype=jnp.float32, name="query")(x)
        k = nn.Dense(d, param_dtype=jnp.float32, name="key")(x)
        v = nn.Dense(d, param_dtype=jnp.float32, name="value")(x)
        b, t, _ = x.shape

        def heads(a):
            return a.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(d // h)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(b, t, d)


class RobertaLayer(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.cfg
        attn = RobertaSelfAttention(cfg, name="attention")(x, mask)
        attn = nn.Dense(cfg.hidden_size, param_dtype=jnp.float32, name="attention_output")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                         name="attention_layernorm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, param_dtype=jnp.float32, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, param_dtype=jnp.float32, name="output")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                         name="output_layernorm")(x + h)
        return x


class RobertaModel(nn.Module):
    cfg: RobertaConfig = RobertaConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, return_hidden_states: bool = False):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids, bool)
        mask = attention_mask.astype(bool)

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                       name="word_embeddings")(input_ids)
        # RoBERTa position ids: pad_id+1 + cumulative position over non-pad
        positions = (jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask + cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, param_dtype=jnp.float32,
                       name="position_embeddings")(positions)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                       name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                         name="embeddings_layernorm")(tok + pos + typ)

        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = RobertaLayer(cfg, name=f"layer{i}")(x, mask)
            hidden_states.append(x)
        if return_hidden_states:
            return x, hidden_states
        return x


class CLAPTextBranch(nn.Module):
    """RoBERTa + laion-clap text projection (Linear-ReLU-Linear to 512)."""

    cfg: RobertaConfig = RobertaConfig()
    joint_embed_dim: int = 512

    def setup(self):
        self.text_branch = RobertaModel(self.cfg)
        self.projection_0 = nn.Dense(self.joint_embed_dim, param_dtype=jnp.float32)
        self.projection_2 = nn.Dense(self.joint_embed_dim, param_dtype=jnp.float32)

    def __call__(self, input_ids, attention_mask=None):
        """-> L2-normalized joint text embedding [B, 512]
        (laion-clap get_text_embedding semantics: mean... RoBERTa pools via
        the first token's hidden state through the projection)."""
        x = self.text_branch(input_ids, attention_mask)
        pooled = x[:, 0]  # CLS-equivalent (<s>) pooling used by laion-clap
        h = self.projection_0(pooled)
        h = jax.nn.relu(h)
        h = self.projection_2(h)
        return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    def text_features(self, input_ids, attention_mask=None, layer_ix: int = -1):
        """Per-token features from hidden layer `layer_ix` (reference
        conditioners.py:155-171 uses -2 relative to hidden_states list)."""
        _, hs = self.text_branch(input_ids, attention_mask, return_hidden_states=True)
        return hs[layer_ix]


def convert_clap_text_branch(sd: dict) -> dict:
    """Map a laion-clap torch checkpoint's text branch onto CLAPTextBranch.

    Accepts keys with or without the 'module.' DataParallel prefix."""
    def g(k):
        for prefix in ("module.", ""):
            kk = prefix + k
            if kk in sd:
                return np.asarray(sd[kk])
        raise KeyError(k)

    def lin(dst, src, out):
        _tree_set(out, dst + "/kernel", g(src + ".weight").T)
        _tree_set(out, dst + "/bias", g(src + ".bias"))

    out: dict = {}
    emb = "text_branch.embeddings"
    _tree_set(out, "text_branch/word_embeddings/embedding", g(emb + ".word_embeddings.weight"))
    _tree_set(out, "text_branch/position_embeddings/embedding", g(emb + ".position_embeddings.weight"))
    _tree_set(out, "text_branch/token_type_embeddings/embedding", g(emb + ".token_type_embeddings.weight"))
    _tree_set(out, "text_branch/embeddings_layernorm/scale", g(emb + ".LayerNorm.weight"))
    _tree_set(out, "text_branch/embeddings_layernorm/bias", g(emb + ".LayerNorm.bias"))

    i = 0
    while any(f"text_branch.encoder.layer.{i}." in k for k in sd):
        b = f"text_branch.encoder.layer.{i}"
        jb = f"text_branch/layer{i}"
        lin(jb + "/attention/query", b + ".attention.self.query", out)
        lin(jb + "/attention/key", b + ".attention.self.key", out)
        lin(jb + "/attention/value", b + ".attention.self.value", out)
        lin(jb + "/attention_output", b + ".attention.output.dense", out)
        _tree_set(out, jb + "/attention_layernorm/scale", g(b + ".attention.output.LayerNorm.weight"))
        _tree_set(out, jb + "/attention_layernorm/bias", g(b + ".attention.output.LayerNorm.bias"))
        lin(jb + "/intermediate", b + ".intermediate.dense", out)
        lin(jb + "/output", b + ".output.dense", out)
        _tree_set(out, jb + "/output_layernorm/scale", g(b + ".output.LayerNorm.weight"))
        _tree_set(out, jb + "/output_layernorm/bias", g(b + ".output.LayerNorm.bias"))
        i += 1

    lin("projection_0", "text_projection.0", out)
    lin("projection_2", "text_projection.2", out)
    return out


def _tree_set(tree: dict, path: str, value):
    parts = path.split("/")
    cur = tree
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = np.asarray(value)
