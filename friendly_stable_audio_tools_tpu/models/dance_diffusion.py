"""Dance Diffusion U-Net (DiffusionAttnUnet1D) and its blocks.

Parity target: reference `models/diffusion.py:376-479` (DiffusionAttnUnet1D:
recursive SkipBlock U-Net with cubic antialiased resampling and
self-attention on deep layers) and `models/blocks.py` (ResConvBlock 24-34,
SelfAttention1d 37-76, SkipBlock 79-85, antialiased Downsample1d/Upsample1d
104-159, learned Downsample1d_2/Upsample1d_2 162-203).

Layout: channels-last [B, T, C].
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention
from ..ops.convs import Conv1d, ConvTranspose1d, conv1d
from ..ops.embeddings import FourierFeatures

_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
    "lanczos3": [0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
                 -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
                 0.44638532400131226, 0.13550527393817902, -0.066637322306633,
                 -0.03399861603975296, 0.015056144446134567, 0.003689131001010537],
}


class AADownsample1d(nn.Module):
    """Fixed antialiasing kernel, stride 2, depthwise (blocks.py:118-137)."""

    kernel: str = "cubic"

    @nn.compact
    def __call__(self, x):
        k = jnp.asarray(_KERNELS[self.kernel], jnp.float32)
        pad = len(_KERNELS[self.kernel]) // 2 - 1
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        w = jnp.zeros((len(_KERNELS[self.kernel]), 1, c), x.dtype)
        w = w + k[:, None, None].astype(x.dtype)  # depthwise: same kernel per channel
        return conv1d(x, w, stride=2, padding=0, groups=c)


class AAUpsample1d(nn.Module):
    """Fixed antialiasing transposed conv, stride 2 (blocks.py:140-159)."""

    kernel: str = "cubic"

    @nn.compact
    def __call__(self, x):
        kvals = np.asarray(_KERNELS[self.kernel]) * 2
        pad = len(kvals) // 2 - 1
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), ((pad + 1) // 2,) * 2, (0, 0)), mode="reflect")
        k = jnp.asarray(kvals, jnp.float32).astype(x.dtype)
        # depthwise transposed conv: build [k, c, c] diag kernel is wasteful;
        # use per-channel transposed conv via feature grouping trick: dilate
        # input and correlate with flipped kernel
        K = len(kvals)
        w = jnp.zeros((K, 1, c), x.dtype) + k[::-1][:, None, None]
        # depthwise transposed conv via input dilation:
        # out_len = (Tp-1)*2 + K, then trim pad*2+1 each side -> exactly 2T
        full = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(K - 1, K - 1)],
            lhs_dilation=(2,), dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c,
        )
        trim = pad * 2 + 1
        return full[:, trim : full.shape[1] - trim, :]


class ResConvBlock(nn.Module):
    """conv-GN-act x2 with skip (blocks.py:24-34)."""

    c_in: int
    c_mid: int
    c_out: int
    is_last: bool = False
    kernel_size: int = 5
    conv_bias: bool = True
    use_snake: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        if self.c_in != self.c_out:
            res = Conv1d(self.c_in, self.c_out, 1, use_bias=False, name="skip")(x)
        h = Conv1d(self.c_in, self.c_mid, self.kernel_size, padding=self.kernel_size // 2,
                   use_bias=self.conv_bias, name="conv1")(x)
        h = nn.GroupNorm(num_groups=1, param_dtype=jnp.float32, name="gn1")(h)
        h = self._act(h, self.c_mid, "act1")
        h = Conv1d(self.c_mid, self.c_out, self.kernel_size, padding=self.kernel_size // 2,
                   use_bias=self.conv_bias, name="conv2")(h)
        if not self.is_last:
            h = nn.GroupNorm(num_groups=1, param_dtype=jnp.float32, name="gn2")(h)
            h = self._act(h, self.c_out, "act2")
        return h + res

    def _act(self, x, c, name):
        if self.use_snake:
            from ..ops.activations import Snake

            return Snake(c, name=name)(x)
        return jax.nn.gelu(x)


class SelfAttention1d(nn.Module):
    """GN -> qkv conv -> SDPA -> out conv, residual (blocks.py:37-76)."""

    c_in: int
    n_head: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=1, param_dtype=jnp.float32, name="norm")(x)
        qkv = Conv1d(self.c_in, self.c_in * 3, 1, name="qkv_proj")(h)
        b, t, _ = qkv.shape
        qkv = qkv.reshape(b, t, 3, self.n_head, self.c_in // self.n_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        y = scaled_dot_product_attention(q, k, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, self.c_in)
        y = Conv1d(self.c_in, self.c_in, 1, name="out_proj")(y)
        return x + y


class DiffusionAttnUnet1D(nn.Module):
    """reference models/diffusion.py:376-479."""

    io_channels: int = 2
    depth: int = 14
    n_attn_layers: int = 6
    channels: tp.Sequence[int] = (128, 128, 256, 256) + (512,) * 10
    cond_dim: int = 0
    cond_noise_aug: bool = False
    kernel_size: int = 5
    learned_resample: bool = False
    strides: tp.Sequence[int] = (2,) * 13
    conv_bias: bool = True
    use_snake: bool = False

    @nn.compact
    def __call__(self, x, t, cond=None, cond_aug_scale=None):
        tfe = FourierFeatures(1, 16, name="timestep_embed")
        timestep_embed = tfe(t[:, None])
        te = jnp.broadcast_to(timestep_embed[:, None, :], (x.shape[0], x.shape[1], 16))
        inputs = [x, te.astype(x.dtype)]

        if cond is not None:
            if cond.shape[1] != x.shape[1]:
                # linear interpolation over time (reference uses F.interpolate linear)
                src = jnp.linspace(0, cond.shape[1] - 1, x.shape[1])
                lo = jnp.floor(src).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, cond.shape[1] - 1)
                w = (src - lo)[None, :, None]
                cond = cond[:, lo, :] * (1 - w) + cond[:, hi, :] * w
            if self.cond_noise_aug:
                if cond_aug_scale is None:
                    aug_level = jax.random.uniform(self.make_rng("sample"), (cond.shape[0],))
                else:
                    aug_level = jnp.full((cond.shape[0],), cond_aug_scale, jnp.float32)
                cond = cond + jax.random.normal(self.make_rng("sample"), cond.shape) * aug_level[:, None, None]
                # the reference reuses timestep_embed's weights for the aug level
                aug_embed = tfe(aug_level[:, None])
                ae = jnp.broadcast_to(aug_embed[:, None, :], (x.shape[0], x.shape[1], 16))
                inputs.append(ae.astype(x.dtype))
            inputs.append(cond.astype(x.dtype))

        h = jnp.concatenate(inputs, axis=-1)

        strides = [1] + list(self.strides)
        attn_layer = self.depth - self.n_attn_layers

        def _inner_chain(h, i):
            if i > self.depth:
                return h
            c = self.channels[i - 1]
            stride = strides[i - 1]
            scope = f"level{i}"
            c_prev = self.channels[i - 2]
            add_attn = i >= attn_layer and self.n_attn_layers > 0
            if self.learned_resample or stride == 1:
                k = stride * 2 + 1 if stride > 1 else 3
                h = Conv1d(c_prev, c_prev, k, stride=stride,
                           padding=k // 2, name=f"{scope}_down")(h)
            else:
                h = AADownsample1d("cubic", name=f"{scope}_down")(h)
            h = ResConvBlock(c_prev, c, c, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_in0")(h)
            if add_attn:
                h = SelfAttention1d(c, c // 32, name=f"{scope}_attn0")(h)
            h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_in1")(h)
            if add_attn:
                h = SelfAttention1d(c, c // 32, name=f"{scope}_attn1")(h)
            h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_in2")(h)
            if add_attn:
                h = SelfAttention1d(c, c // 32, name=f"{scope}_attn2")(h)
            skip = h
            h = _inner_chain(h, i + 1)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResConvBlock(c * 2, c, c, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_out0")(h)
            if add_attn:
                h = SelfAttention1d(c, c // 32, name=f"{scope}_attn3")(h)
            h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_out1")(h)
            if add_attn:
                h = SelfAttention1d(c, c // 32, name=f"{scope}_attn4")(h)
            h = ResConvBlock(c, c, c_prev, kernel_size=self.kernel_size,
                             conv_bias=self.conv_bias, use_snake=self.use_snake,
                             name=f"{scope}_out2")(h)
            if add_attn:
                h = SelfAttention1d(c_prev, c_prev // 32, name=f"{scope}_attn5")(h)
            if self.learned_resample:
                h = ConvTranspose1d(c_prev, c_prev, stride * 2, stride=stride,
                                    padding=stride // 2 + stride % 2, name=f"{scope}_up")(h)
            else:
                h = AAUpsample1d("cubic", name=f"{scope}_up")(h)
            return h

        # outer level (i=1)
        c = self.channels[0]
        cond_embed_dim = 16 if not self.cond_noise_aug else 32
        in_c = self.io_channels + self.cond_dim + cond_embed_dim
        h = ResConvBlock(in_c, c, c, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_in0")(h)
        h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_in1")(h)
        h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_in2")(h)
        skip = h
        if self.depth > 1:
            h = _inner_chain(h, 2)
        h = jnp.concatenate([h, skip], axis=-1)
        h = ResConvBlock(c * 2, c, c, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_out0")(h)
        h = ResConvBlock(c, c, c, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_out1")(h)
        h = ResConvBlock(c, c, self.io_channels, is_last=True, kernel_size=self.kernel_size,
                         conv_bias=self.conv_bias, use_snake=self.use_snake, name="level1_out2")(h)
        return h
