"""Cross-implementation parity: ContinuousTransformer vs a torch reference.

The torch model below reimplements the reference's math exactly
(transformer.py: biasless F.layer_norm LN 188-206, SwiGLU GLU chunk order
211-238, fused-QKV attention with partial rotary 310-553, pre-norm block
order 595-703, j=2-unbind rotate_half 158-183) with the reference's module
attribute names, so utils/torch_import.convert_continuous_transformer maps
its state dict onto the flax tree. The JAX forward must reproduce the torch
forward on the same weights — the real guarantee behind loading released
Stable Audio checkpoints.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

DIM, DEPTH, DIM_HEADS, COND_DIM, SEQ, CTX = 128, 2, 64, 64, 24, 7
ROT_DIM = 32  # max(dim_heads // 2, 32)


def rotate_half(x):
    # reference transformer.py:158-162: split as (2, d/2) and swap-negate
    x1, x2 = x.reshape(*x.shape[:-1], 2, -1).unbind(dim=-2)
    return torch.cat((-x2, x1), dim=-1)


def apply_rope(t, freqs):
    rot = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot], t[..., rot:]
    t_rot = t_rot * freqs.cos() + rotate_half(t_rot) * freqs.sin()
    return torch.cat((t_rot, t_pass), dim=-1)


class TLayerNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))
        self.register_buffer("beta", torch.zeros(dim))

    def forward(self, x):
        return F.layer_norm(x, x.shape[-1:], weight=self.gamma, bias=self.beta)


class TGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.silu(gate)


class TFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = int(dim * mult)
        out = nn.Linear(inner, dim)
        nn.init.normal_(out.weight, std=0.05)  # non-zero so the test is strict
        nn.init.normal_(out.bias, std=0.05)
        self.ff = nn.Sequential(TGLU(dim, inner), nn.Identity(), out)

    def forward(self, x):
        return self.ff(x)


class TAttention(nn.Module):
    def __init__(self, dim, dim_heads, dim_context=None):
        super().__init__()
        self.dim_heads = dim_heads
        self.num_heads = dim // dim_heads
        if dim_context is not None:
            self.to_q = nn.Linear(dim, dim, bias=False)
            self.to_kv = nn.Linear(dim_context, dim_context * 2, bias=False)
        else:
            self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
        self.to_out = nn.Linear(dim, dim, bias=False)
        nn.init.normal_(self.to_out.weight, std=0.05)
        self.dim_context = dim_context

    def _heads(self, t, heads):
        b, n, _ = t.shape
        return t.reshape(b, n, heads, self.dim_heads).transpose(1, 2)

    def forward(self, x, context=None, freqs=None):
        if self.dim_context is not None:
            kv_heads = self.dim_context // self.dim_heads
            q = self._heads(self.to_q(x), self.num_heads)
            k, v = self.to_kv(context).chunk(2, dim=-1)
            k = self._heads(k, kv_heads)
            v = self._heads(v, kv_heads)
            if kv_heads != self.num_heads:  # GQA repeat
                rep = self.num_heads // kv_heads
                k = k.repeat_interleave(rep, dim=1)
                v = v.repeat_interleave(rep, dim=1)
        else:
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)
            q, k, v = (self._heads(t, self.num_heads) for t in (q, k, v))
        if freqs is not None:
            q = apply_rope(q, freqs)
            k = apply_rope(k, freqs)
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, n, d = out.shape
        return self.to_out(out.transpose(1, 2).reshape(b, n, h * d))


class TBlock(nn.Module):
    def __init__(self, dim, dim_heads, cond_dim):
        super().__init__()
        self.pre_norm = TLayerNorm(dim)
        self.self_attn = TAttention(dim, dim_heads)
        self.cross_attend_norm = TLayerNorm(dim)
        self.cross_attn = TAttention(dim, dim_heads, dim_context=cond_dim)
        self.ff_norm = TLayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context, freqs):
        x = x + self.self_attn(self.pre_norm(x), freqs=freqs)
        x = x + self.cross_attn(self.cross_attend_norm(x), context=context)
        x = x + self.ff(self.ff_norm(x))
        return x


class TContinuousTransformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.project_in = nn.Linear(DIM, DIM, bias=False)
        self.project_out = nn.Linear(DIM, DIM, bias=False)
        nn.init.normal_(self.project_out.weight, std=0.05)
        self.layers = nn.ModuleList(
            [TBlock(DIM, DIM_HEADS, COND_DIM) for _ in range(DEPTH)])

    def forward(self, x, context):
        n = x.shape[1]
        inv_freq = 1.0 / (10000 ** (torch.arange(0, ROT_DIM, 2).float() / ROT_DIM))
        t = torch.arange(n).float()
        freqs = torch.einsum("i,j->ij", t, inv_freq)
        freqs = torch.cat((freqs, freqs), dim=-1)
        x = self.project_in(x)
        for layer in self.layers:
            x = layer(x, context, freqs)
        return self.project_out(x)


def test_continuous_transformer_matches_torch_reference():
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer
    from friendly_stable_audio_tools_tpu.utils.torch_import import (
        convert_continuous_transformer,
    )

    torch.manual_seed(0)
    tmodel = TContinuousTransformer().eval()
    x = torch.randn(2, SEQ, DIM) * 0.5
    ctx = torch.randn(2, CTX, COND_DIM) * 0.5
    with torch.no_grad():
        ref = tmodel(x, ctx).numpy()

    # beta buffers of biasless LNs appear in torch state dicts; real loads
    # skip them via copy_state_dict's shape-checked partial copy — drop here
    # for the strict structural comparison
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith(".beta")}
    params = convert_continuous_transformer(sd, "")

    jmodel = ContinuousTransformer(
        dim=DIM, depth=DEPTH, dim_heads=DIM_HEADS, dim_in=DIM, dim_out=DIM,
        cross_attend=True, cond_token_dim=COND_DIM,
    )
    init = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((2, SEQ, DIM)),
                       context=jnp.zeros((2, CTX, COND_DIM)))["params"]
    flat = lambda t: {
        "/".join(map(str, p)): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    fi, fc = flat(init), flat(params)
    assert fi.keys() == fc.keys(), (
        sorted(set(fi) - set(fc))[:6], sorted(set(fc) - set(fi))[:6])

    got = jmodel.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jnp.asarray(x.numpy()), context=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_rope_matches_torch_reference():
    """apply_rotary_pos_emb == the reference's partial-rotary torch math."""
    from friendly_stable_audio_tools_tpu.ops.embeddings import (
        apply_rotary_pos_emb, rotary_freqs,
    )

    torch.manual_seed(1)
    t = torch.randn(1, 2, 10, 64)
    inv_freq = 1.0 / (10000 ** (torch.arange(0, ROT_DIM, 2).float() / ROT_DIM))
    pos = torch.arange(10).float()
    freqs = torch.einsum("i,j->ij", pos, inv_freq)
    freqs = torch.cat((freqs, freqs), dim=-1)
    ref = apply_rope(t, freqs).numpy()

    jfreqs = rotary_freqs(10, ROT_DIM)
    np.testing.assert_allclose(np.asarray(jfreqs), freqs.numpy(), rtol=1e-5, atol=1e-5)
    got = apply_rotary_pos_emb(jnp.asarray(t.numpy()), jfreqs)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# DiT end-to-end: reference-shaped torch DiffusionTransformer ->
# convert_dit_state_dict -> flax DiffusionTransformer, numerically
# ---------------------------------------------------------------------------

IO, GLOBAL_DIM = 8, 96


class TFourier(nn.Module):
    """reference dit.py FourierFeatures: f = 2*pi*x@W^T -> [cos, sin]."""

    def __init__(self, in_f, out_f):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_f // 2, in_f))

    def forward(self, x):
        f = 2 * math.pi * x @ self.weight.T
        return torch.cat([f.cos(), f.sin()], dim=-1)


class TDiTTransformer(nn.Module):
    """ContinuousTransformer as the DiT drives it: project_in on x, prepend
    token(s) BEFORE the layers, rotary over the full (prepend+seq) length."""

    def __init__(self, dim, depth, dim_heads, dim_in, dim_out, cond_dim):
        super().__init__()
        self.project_in = nn.Linear(dim_in, dim, bias=False)
        self.project_out = nn.Linear(dim, dim_out, bias=False)
        nn.init.normal_(self.project_out.weight, std=0.05)  # de-zeroed
        self.layers = nn.ModuleList(
            [TBlock(dim, dim_heads, cond_dim) for _ in range(depth)])

    def forward(self, x, prepend, context):
        x = self.project_in(x)
        x = torch.cat([prepend, x], dim=1)
        n = x.shape[1]
        inv_freq = 1.0 / (10000 ** (torch.arange(0, ROT_DIM, 2).float() / ROT_DIM))
        t = torch.arange(n).float()
        freqs = torch.einsum("i,j->ij", t, inv_freq)
        freqs = torch.cat((freqs, freqs), dim=-1)
        for layer in self.layers:
            x = layer(x, context, freqs)
        return self.project_out(x)


class TDiT(nn.Module):
    """Reference-shaped DiffusionTransformer (reference dit.py:14-365):
    Fourier timestep -> MLP embed, cond/global projection MLPs,
    global_cond_type='prepend', zero-init(-here-randomized) 1x1 conv
    residuals, patch 1, CFG off. State-dict names follow the reference so
    utils/torch_import.convert_dit_state_dict maps them."""

    def __init__(self, io=IO, embed=DIM, depth=DEPTH, cond_dim=COND_DIM,
                 global_dim=GLOBAL_DIM):
        super().__init__()
        self.timestep_features = TFourier(1, 256)
        self.to_timestep_embed = nn.Sequential(
            nn.Linear(256, embed), nn.SiLU(), nn.Linear(embed, embed))
        self.to_cond_embed = nn.Sequential(
            nn.Linear(cond_dim, embed, bias=False), nn.SiLU(),
            nn.Linear(embed, embed, bias=False))
        self.to_global_embed = nn.Sequential(
            nn.Linear(global_dim, embed, bias=False), nn.SiLU(),
            nn.Linear(embed, embed, bias=False))
        self.preprocess_conv = nn.Conv1d(io, io, 1, bias=False)
        self.postprocess_conv = nn.Conv1d(io, io, 1, bias=False)
        nn.init.normal_(self.preprocess_conv.weight, std=0.05)
        nn.init.normal_(self.postprocess_conv.weight, std=0.05)
        self.transformer = TDiTTransformer(embed, depth, DIM_HEADS, io, io, embed)

    def forward(self, x, t, cond, glob):  # x [B, C, T]
        cond_e = self.to_cond_embed(cond)
        ge = self.to_global_embed(glob) + self.to_timestep_embed(
            self.timestep_features(t[:, None]))
        x = self.preprocess_conv(x) + x
        out = self.transformer(x.permute(0, 2, 1), ge[:, None, :], cond_e)
        out = out[:, 1:, :].permute(0, 2, 1)
        return self.postprocess_conv(out) + out


def test_dit_matches_torch_reference():
    """convert_dit_state_dict end-to-end numeric parity (retires the old
    structure-only check): torch DiT forward == flax DiT forward on the same
    weights, including the Fourier/MLP conditioning head and prepend token."""
    from friendly_stable_audio_tools_tpu.models.dit import DiffusionTransformer
    from friendly_stable_audio_tools_tpu.utils.torch_import import convert_dit_state_dict

    torch.manual_seed(3)
    tmodel = TDiT().eval()
    x = torch.randn(2, IO, SEQ) * 0.5
    t = torch.rand(2)
    cond = torch.randn(2, CTX, COND_DIM) * 0.5
    glob = torch.randn(2, GLOBAL_DIM) * 0.5
    with torch.no_grad():
        ref = tmodel(x, t, cond, glob).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith(".beta")}
    params = convert_dit_state_dict(sd, prefix="")

    jmodel = DiffusionTransformer(
        io_channels=IO, embed_dim=DIM, depth=DEPTH, num_heads=DIM // DIM_HEADS,
        cond_token_dim=COND_DIM, global_cond_dim=GLOBAL_DIM,
        transformer_type="continuous_transformer", global_cond_type="prepend",
    )
    init = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((2, SEQ, IO)),
                       jnp.zeros((2,)), cross_attn_cond=jnp.zeros((2, CTX, COND_DIM)),
                       global_embed=jnp.zeros((2, GLOBAL_DIM)))["params"]
    flat = lambda tree: {
        "/".join(map(str, p)): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    fi, fc = flat(init), flat(params)
    assert fi.keys() == fc.keys(), (
        sorted(set(fi) - set(fc))[:6], sorted(set(fc) - set(fi))[:6])
    for k in fi:
        assert fi[k] == fc[k], (k, fi[k], fc[k])

    got = jmodel.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(t.numpy()),
        cross_attn_cond=jnp.asarray(cond.numpy()),
        global_embed=jnp.asarray(glob.numpy()))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                               rtol=3e-4, atol=3e-4)
