"""ADP-style diffusion U-Nets (UNet1d / UNetCFG1d / UNetNCCA1d).

Parity target: reference `models/adp.py` (vendored audio-diffusion-pytorch
0.0.94): causal-capable auto-padded Conv1d/ConvTranspose1d (133-181),
ConvBlock1d/ResnetBlock1d with FiLM MappingToScaleShift (222-350),
Patcher/Unpatcher (351-411), attention + Transformer1d (439-666),
Downsample/Upsample/Bottleneck blocks with injected context channels and
skip concat (709-1017), UNet1d (1018-1274) with optional STFT wrapping,
UNetCFG1d with learned FixedEmbedding null conditioning + batch/two-pass CFG
+ rescale (1300-1421), UNetNCCA1d (1424-1473), XUNet1d selector (1482-1492),
NumberEmbedder (1495-1514), STFT helper (1522-1602).

Layout: channels-last [B, T, C]; conditioning embedding [B, M, E]; the FiLM
mapping vector is [B, F].
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention
from ..ops.convs import conv1d as raw_conv1d
from ..ops.convs import conv_transpose1d as raw_conv_transpose1d
from .conditioners import LearnedPositionalEmbedding, NumberEmbedder


def _auto_pad(x, k: int, stride: int, dilation: int, causal: bool):
    """encodec-style auto padding (reference adp.py:100-152): pad so every
    input frame is covered; causal pads left only."""
    length = x.shape[1]
    keff = (k - 1) * dilation + 1
    padding_total = keff - stride
    n_frames = (length - keff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - padding_total)
    extra = max(ideal - length, 0)
    if causal:
        lo, hi = padding_total, extra
    else:
        hi = padding_total // 2
        lo = padding_total - hi
        hi = hi + extra
    return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))


class Conv1d(nn.Module):
    """Auto-padded (optionally causal) conv (reference adp.py:133-152)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, causal: bool = False):
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                       (self.kernel_size, self.in_channels, self.out_channels))
        b = self.param("bias", lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                       (self.out_channels,))
        x = _auto_pad(x, self.kernel_size, self.stride, self.dilation, causal)
        y = raw_conv1d(x, w.astype(x.dtype), self.stride, 0, self.dilation)
        return y + b.astype(y.dtype)


class ConvTranspose1d(nn.Module):
    """Transposed conv with trim-to-stride semantics (reference adp.py:155-181)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, causal: bool = False):
        fan_in = self.out_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                       (self.kernel_size, self.in_channels, self.out_channels))
        b = self.param("bias", lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
                       (self.out_channels,))
        y = raw_conv_transpose1d(x, w.astype(x.dtype), self.stride, 0)
        y = y + b.astype(y.dtype)
        padding_total = self.kernel_size - self.stride
        if causal:
            hi = math.ceil(padding_total)
            lo = padding_total - hi
        else:
            hi = padding_total // 2
            lo = padding_total - hi
        end = y.shape[1] - hi
        return y[:, lo:end, :]


def Downsample1d(in_channels, out_channels, factor, kernel_multiplier=2, name=None):
    assert kernel_multiplier % 2 == 0, "Kernel multiplier must be even"
    return Conv1d(in_channels, out_channels, factor * kernel_multiplier + 1, stride=factor, name=name)


class _NearestUpsample(nn.Module):
    in_channels: int
    out_channels: int
    factor: int

    @nn.compact
    def __call__(self, x, causal: bool = False):
        x = jnp.repeat(x, self.factor, axis=1)
        return Conv1d(self.in_channels, self.out_channels, 3, name="conv")(x, causal=causal)


def Upsample1d(in_channels, out_channels, factor, use_nearest=False, name=None):
    if factor == 1:
        return Conv1d(in_channels, out_channels, 3, name=name)
    if use_nearest:
        return _NearestUpsample(in_channels, out_channels, factor, name=name)
    return ConvTranspose1d(in_channels, out_channels, factor * 2, stride=factor, name=name)


class ConvBlock1d(nn.Module):
    """GroupNorm -> (FiLM) -> act -> conv (reference adp.py:222-265)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    use_snake: bool = False

    @nn.compact
    def __call__(self, x, scale_shift=None, causal: bool = False):
        if self.use_norm:
            x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, param_dtype=jnp.float32, name="groupnorm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        if self.use_snake:
            from ..ops.activations import Snake

            x = Snake(self.in_channels, name="snake")(x)
        else:
            x = jax.nn.silu(x)
        return Conv1d(self.in_channels, self.out_channels, self.kernel_size,
                      stride=self.stride, dilation=self.dilation, name="project")(x, causal=causal)


class MappingToScaleShift(nn.Module):
    """FiLM from the time/features mapping (reference adp.py:267-285)."""

    features: int
    channels: int

    @nn.compact
    def __call__(self, mapping):
        ss = nn.Dense(self.channels * 2, param_dtype=jnp.float32, name="1")(jax.nn.silu(mapping))
        ss = ss[:, None, :]  # [B, 1, 2C] channels-last
        scale, shift = jnp.split(ss, 2, axis=-1)
        return scale, shift


class ResnetBlock1d(nn.Module):
    """reference adp.py:287-350."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_norm: bool = True
    use_snake: bool = False
    num_groups: int = 8
    context_mapping_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, causal: bool = False):
        use_mapping = self.context_mapping_features is not None
        assert not (use_mapping ^ (mapping is not None))
        h = ConvBlock1d(self.in_channels, self.out_channels, self.kernel_size,
                        self.stride, self.dilation, self.num_groups,
                        self.use_norm, self.use_snake, name="block1")(x, causal=causal)
        scale_shift = None
        if use_mapping:
            scale_shift = MappingToScaleShift(self.context_mapping_features, self.out_channels,
                                              name="to_scale_shift")(mapping)
        h = ConvBlock1d(self.out_channels, self.out_channels, num_groups=self.num_groups,
                        use_norm=self.use_norm, use_snake=self.use_snake, name="block2")(
            h, scale_shift=scale_shift, causal=causal)
        if self.in_channels != self.out_channels:
            x = Conv1d(self.in_channels, self.out_channels, 1, name="to_out")(x)
        return h + x


class Patcher(nn.Module):
    """reference adp.py:351-380."""

    in_channels: int
    out_channels: int
    patch_size: int
    context_mapping_features: tp.Optional[int] = None
    use_snake: bool = False

    @nn.compact
    def __call__(self, x, mapping=None, causal: bool = False):
        assert self.out_channels % self.patch_size == 0
        x = ResnetBlock1d(self.in_channels, self.out_channels // self.patch_size, num_groups=1,
                          context_mapping_features=self.context_mapping_features,
                          use_snake=self.use_snake, name="block")(x, mapping, causal=causal)
        b, t, c = x.shape
        p = self.patch_size
        # "b c (l p) -> b (c p) l" in BCT == time-major patch packing
        return x.reshape(b, t // p, p, c).transpose(0, 1, 3, 2).reshape(b, t // p, c * p)


class Unpatcher(nn.Module):
    """reference adp.py:383-411."""

    in_channels: int
    out_channels: int
    patch_size: int
    context_mapping_features: tp.Optional[int] = None
    use_snake: bool = False

    @nn.compact
    def __call__(self, x, mapping=None, causal: bool = False):
        assert self.in_channels % self.patch_size == 0
        b, t, cp = x.shape
        p = self.patch_size
        x = x.reshape(b, t, cp // p, p).transpose(0, 1, 3, 2).reshape(b, t * p, cp // p)
        return ResnetBlock1d(self.in_channels // self.patch_size, self.out_channels, num_groups=1,
                             context_mapping_features=self.context_mapping_features,
                             use_snake=self.use_snake, name="block")(x, mapping, causal=causal)


class ADPAttention(nn.Module):
    """Pre-norm attention (reference adp.py:500-556)."""

    features: int
    head_features: int
    num_heads: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal: bool = False):
        mid = self.head_features * self.num_heads
        ctx_features = self.context_features or self.features
        context = context if context is not None else x
        xn = nn.LayerNorm(param_dtype=jnp.float32, name="norm")(x)
        cn = nn.LayerNorm(param_dtype=jnp.float32, name="norm_context")(context)
        q = nn.Dense(mid, use_bias=False, param_dtype=jnp.float32, name="to_q")(xn)
        kv = nn.Dense(mid * 2, use_bias=False, param_dtype=jnp.float32, name="to_kv")(cn)
        k, v = jnp.split(kv, 2, axis=-1)
        if context_mask is not None:
            m = context_mask[..., None].astype(k.dtype)
            k, v = k * m, v * m

        def heads(a):
            b, n, _ = a.shape
            return a.reshape(b, n, self.num_heads, self.head_features).transpose(0, 2, 1, 3)

        out = scaled_dot_product_attention(heads(q), heads(k), heads(v), causal=causal)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, mid)
        return nn.Dense(self.features, param_dtype=jnp.float32, name="to_out")(out)


class ADPTransformerBlock(nn.Module):
    """reference adp.py:562-607."""

    features: int
    num_heads: int
    head_features: int
    multiplier: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal: bool = False):
        x = ADPAttention(self.features, self.head_features, self.num_heads, name="attention")(
            x, causal=causal) + x
        if self.context_features is not None and self.context_features > 0:
            x = ADPAttention(self.features, self.head_features, self.num_heads,
                             context_features=self.context_features, name="cross_attention")(
                x, context=context, context_mask=context_mask) + x
        h = nn.Dense(self.features * self.multiplier, param_dtype=jnp.float32, name="ff0")(x)
        h = jax.nn.gelu(h)
        h = nn.Dense(self.features, param_dtype=jnp.float32, name="ff2")(h)
        return h + x


class Transformer1d(nn.Module):
    """reference adp.py:610-666 (channels-last: no rearranges needed)."""

    num_layers: int
    channels: int
    num_heads: int
    head_features: int
    multiplier: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal: bool = False):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, param_dtype=jnp.float32, name="norm_in")(x)
        h = Conv1d(self.channels, self.channels, 1, name="conv_in")(h)
        for i in range(self.num_layers):
            h = ADPTransformerBlock(self.channels, self.num_heads, self.head_features,
                                    self.multiplier, self.context_features, name=f"block{i}")(
                h, context=context, context_mask=context_mask, causal=causal)
        h = Conv1d(self.channels, self.channels, 1, name="conv_out")(h)
        return h + x


def _make_transformer(channels, num_transformer_blocks, attention_heads, attention_features,
                      attention_multiplier, context_embedding_features, name):
    if attention_features is None and attention_heads is not None:
        attention_features = channels // attention_heads
    if attention_heads is None and attention_features is not None:
        attention_heads = channels // attention_features
    return Transformer1d(
        num_layers=num_transformer_blocks, channels=channels, num_heads=attention_heads,
        head_features=attention_features, multiplier=attention_multiplier,
        context_features=context_embedding_features, name=name,
    )


class DownsampleBlock1d(nn.Module):
    """reference adp.py:709-825."""

    in_channels: int
    out_channels: int
    factor: int
    num_groups: int
    num_layers: int
    kernel_multiplier: int = 2
    use_pre_downsample: bool = True
    use_skip: bool = False
    use_snake: bool = False
    extract_channels: int = 0
    context_channels: int = 0
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, channels=None, embedding=None, embedding_mask=None,
                 causal: bool = False):
        ch = self.out_channels if self.use_pre_downsample else self.in_channels
        if self.use_pre_downsample:
            x = Downsample1d(self.in_channels, self.out_channels, self.factor,
                             self.kernel_multiplier, name="downsample")(x, causal=causal)
        if self.context_channels > 0 and channels is not None:
            x = jnp.concatenate([x, channels.astype(x.dtype)], axis=-1)
        skips = []
        for i in range(self.num_layers):
            in_ch = ch + self.context_channels if i == 0 else ch
            x = ResnetBlock1d(in_ch, ch, num_groups=self.num_groups,
                              context_mapping_features=self.context_mapping_features,
                              use_snake=self.use_snake, name=f"block{i}")(x, mapping, causal=causal)
            if self.use_skip:
                skips.append(x)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(ch, self.num_transformer_blocks, self.attention_heads,
                                  self.attention_features, self.attention_multiplier,
                                  self.context_embedding_features, "transformer")(
                x, context=embedding, context_mask=embedding_mask, causal=causal)
            if self.use_skip:
                skips.append(x)
        if not self.use_pre_downsample:
            x = Downsample1d(self.in_channels, self.out_channels, self.factor,
                             self.kernel_multiplier, name="downsample")(x, causal=causal)
        return (x, skips) if self.use_skip else x


class UpsampleBlock1d(nn.Module):
    """reference adp.py:826-943."""

    in_channels: int
    out_channels: int
    factor: int
    num_layers: int
    num_groups: int
    use_nearest: bool = False
    use_pre_upsample: bool = False
    use_skip: bool = False
    use_snake: bool = False
    skip_channels: int = 0
    use_skip_scale: bool = False
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, skips=None, mapping=None, embedding=None, embedding_mask=None,
                 causal: bool = False):
        ch = self.out_channels if self.use_pre_upsample else self.in_channels
        skip_scale = 2**-0.5 if self.use_skip_scale else 1.0
        if self.use_pre_upsample:
            x = Upsample1d(self.in_channels, self.out_channels, self.factor,
                           self.use_nearest, name="upsample")(x, causal=causal)
        skips = list(skips) if skips is not None else None
        for i in range(self.num_layers):
            if skips is not None:
                x = jnp.concatenate([x, skips.pop() * skip_scale], axis=-1)
            x = ResnetBlock1d(ch + self.skip_channels, ch, num_groups=self.num_groups,
                              context_mapping_features=self.context_mapping_features,
                              use_snake=self.use_snake, name=f"block{i}")(x, mapping, causal=causal)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(ch, self.num_transformer_blocks, self.attention_heads,
                                  self.attention_features, self.attention_multiplier,
                                  self.context_embedding_features, "transformer")(
                x, context=embedding, context_mask=embedding_mask, causal=causal)
        if not self.use_pre_upsample:
            x = Upsample1d(self.in_channels, self.out_channels, self.factor,
                           self.use_nearest, name="upsample")(x, causal=causal)
        return x


class BottleneckBlock1d(nn.Module):
    """reference adp.py:944-1016."""

    channels: int
    num_groups: int
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None
    use_snake: bool = False

    @nn.compact
    def __call__(self, x, mapping=None, embedding=None, embedding_mask=None, causal: bool = False):
        x = ResnetBlock1d(self.channels, self.channels, num_groups=self.num_groups,
                          context_mapping_features=self.context_mapping_features,
                          use_snake=self.use_snake, name="pre_block")(x, mapping, causal=causal)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(self.channels, self.num_transformer_blocks, self.attention_heads,
                                  self.attention_features, self.attention_multiplier,
                                  self.context_embedding_features, "transformer")(
                x, context=embedding, context_mask=embedding_mask, causal=causal)
        x = ResnetBlock1d(self.channels, self.channels, num_groups=self.num_groups,
                          context_mapping_features=self.context_mapping_features,
                          use_snake=self.use_snake, name="post_block")(x, mapping, causal=causal)
        return x


class FixedEmbedding(nn.Module):
    """Learned null embedding over positions (reference adp.py:1276-1297)."""

    max_length: int
    features: int

    @nn.compact
    def __call__(self, x):  # x [B, N, F] -> [B, N, features]
        b, n = x.shape[0], x.shape[1]
        assert n <= self.max_length, "Input sequence length must be <= max_length"
        emb = nn.Embed(self.max_length, self.features, param_dtype=jnp.float32, name="embedding")
        return jnp.broadcast_to(emb(jnp.arange(n))[None], (b, n, self.features))


class UNet1d(nn.Module):
    """reference adp.py:1018-1274."""

    in_channels: int
    channels: int
    multipliers: tp.Sequence[int]
    factors: tp.Sequence[int]
    num_blocks: tp.Sequence[int]
    attentions: tp.Sequence[int]
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_snake: bool = False
    out_channels: tp.Optional[int] = None
    context_features: tp.Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: tp.Optional[tp.Sequence[int]] = None
    context_embedding_features: tp.Optional[int] = None
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    # STFT-domain wrapping (reference adp.py:1105-1113,1244,1267): the U-Net
    # runs over stacked mag/phase (or real/imag) STFT planes instead of raw
    # waveform; in/out (and optionally context) channels multiply by
    # 2 * (num_fft//2 + 1).
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: tp.Optional[int] = None
    stft_hop_length: tp.Optional[int] = 256
    stft_window_length: tp.Optional[int] = None
    stft_length: tp.Optional[int] = None
    stft_use_complex: bool = False

    @property
    def io_channels(self):
        return self.in_channels

    def _stft(self):
        from ..ops.stft import STFT

        assert self.stft_num_fft is not None, "stft_num_fft required if use_stft=True"
        return STFT(num_fft=self.stft_num_fft, hop_length=self.stft_hop_length,
                    window_length=self.stft_window_length, length=self.stft_length,
                    use_complex=self.stft_use_complex)

    def _stft_channels(self):
        return (self.stft_num_fft // 2 + 1) * 2

    def _ctx_channels(self):
        num_layers = len(self.multipliers) - 1
        cc = list(self.context_channels or [])
        cc = cc + [0] * (num_layers + 1 - len(cc))
        if self.use_stft and self.use_stft_context:
            cc[0] *= self._stft_channels()
        return cc

    @nn.compact
    def __call__(self, x, time=None, features=None, channels_list=None,
                 embedding=None, embedding_mask=None, causal: bool = False):
        num_layers = len(self.multipliers) - 1
        context_channels = self._ctx_channels()
        stft = self._stft() if self.use_stft else None
        if stft is not None:
            x = stft.encode1d(x)
        use_context_features = self.context_features is not None
        use_context_channels = len([c for c in context_channels if c > 0]) > 0
        context_mapping_features = None
        if self.use_context_time or use_context_features:
            context_mapping_features = self.channels * self.context_features_multiplier

        # mapping from time/features (reference :1213-1231)
        items = []
        if self.use_context_time:
            assert time is not None
            f = LearnedPositionalEmbedding(self.channels, name="to_time_pos")(time)
            f = nn.Dense(context_mapping_features, param_dtype=jnp.float32, name="to_time_lin")(f)
            items.append(jax.nn.gelu(f))
        if use_context_features:
            assert features is not None
            f = nn.Dense(context_mapping_features, param_dtype=jnp.float32, name="to_features")(features)
            items.append(jax.nn.gelu(f))
        mapping = None
        if items:
            mapping = sum(items)
            mapping = nn.Dense(context_mapping_features, param_dtype=jnp.float32, name="to_mapping_0")(mapping)
            mapping = jax.nn.gelu(mapping)
            mapping = nn.Dense(context_mapping_features, param_dtype=jnp.float32, name="to_mapping_2")(mapping)
            mapping = jax.nn.gelu(mapping)

        # context channels at layer 0
        has_context = [c > 0 for c in context_channels]
        channels_ids = [sum(has_context[:i]) for i in range(len(has_context))]

        def get_channels(layer):
            if not (use_context_channels and has_context[layer]):
                return None
            assert channels_list is not None, "Missing context"
            ch = channels_list[channels_ids[layer]]
            # reference stft-encodes context channels at EVERY layer when
            # use_stft_context (adp.py:1207) while only scaling the DECLARED
            # channel count for layer 0 (adp.py:1111) — deeper stft-context
            # layers are inconsistent in the reference too; matched bug-for-bug
            if stft is not None and self.use_stft_context:
                ch = stft.encode1d(ch)
            return ch

        ctx0 = get_channels(0)
        if ctx0 is not None:
            x = jnp.concatenate([x, ctx0.astype(x.dtype)], axis=-1)

        eff_in = self.in_channels * (self._stft_channels() if self.use_stft else 1)
        x = Patcher(eff_in + context_channels[0], self.channels * self.multipliers[0],
                    self.patch_size, context_mapping_features, self.use_snake, name="to_in")(
            x, mapping, causal=causal)

        skips_list = [x]
        attn_kwargs = dict(
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            context_mapping_features=context_mapping_features,
            context_embedding_features=self.context_embedding_features,
        )
        for i in range(num_layers):
            x, skips = DownsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i],
                kernel_multiplier=self.kernel_multiplier_downsample,
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i],
                context_channels=context_channels[i + 1],
                use_pre_downsample=True,
                use_skip=True,
                use_snake=self.use_snake,
                num_transformer_blocks=self.attentions[i],
                name=f"down{i}",
                **attn_kwargs,
            )(x, mapping=mapping, channels=get_channels(i + 1),
              embedding=embedding, embedding_mask=embedding_mask, causal=causal)
            skips_list.append(skips)

        x = BottleneckBlock1d(
            channels=self.channels * self.multipliers[-1],
            num_groups=self.resnet_groups,
            num_transformer_blocks=self.attentions[-1],
            use_snake=self.use_snake,
            name="bottleneck",
            **attn_kwargs,
        )(x, mapping=mapping, embedding=embedding, embedding_mask=embedding_mask, causal=causal)

        for j, i in enumerate(reversed(range(num_layers))):
            skips = skips_list.pop()
            x = UpsampleBlock1d(
                in_channels=self.channels * self.multipliers[i + 1],
                out_channels=self.channels * self.multipliers[i],
                factor=self.factors[i],
                use_nearest=self.use_nearest_upsample,
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i] + (1 if self.attentions[i] else 0),
                use_skip_scale=self.use_skip_scale,
                use_pre_upsample=False,
                use_skip=True,
                use_snake=self.use_snake,
                skip_channels=self.channels * self.multipliers[i + 1],
                num_transformer_blocks=self.attentions[i],
                name=f"up{j}",
                **attn_kwargs,
            )(x, skips=skips, mapping=mapping, embedding=embedding,
              embedding_mask=embedding_mask, causal=causal)

        x = x + skips_list.pop()
        out_ch = self.out_channels or self.in_channels
        if stft is not None:
            out_ch = out_ch * self._stft_channels()
        x = Unpatcher(self.channels * self.multipliers[0], out_ch, self.patch_size,
                      context_mapping_features, self.use_snake, name="to_out")(x, mapping, causal=causal)
        if stft is not None:
            x = stft.decode1d(x)
        return x


class UNetCFG1d(nn.Module):
    """UNet1d + classifier-free guidance with a learned null embedding
    (reference adp.py:1300-1421)."""

    context_embedding_max_length: int
    context_embedding_features: int
    in_channels: int
    channels: int
    multipliers: tp.Sequence[int]
    factors: tp.Sequence[int]
    num_blocks: tp.Sequence[int]
    attentions: tp.Sequence[int]
    use_xattn_time: bool = False
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_snake: bool = False
    out_channels: tp.Optional[int] = None
    context_features: tp.Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: tp.Optional[tp.Sequence[int]] = None
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: tp.Optional[int] = None
    stft_hop_length: tp.Optional[int] = 256
    stft_window_length: tp.Optional[int] = None
    stft_length: tp.Optional[int] = None
    stft_use_complex: bool = False

    @property
    def io_channels(self):
        return self.in_channels

    def setup(self):
        max_len = self.context_embedding_max_length + (1 if self.use_xattn_time else 0)
        self.fixed_embedding = FixedEmbedding(max_len, self.context_embedding_features)
        if self.use_xattn_time:
            self.to_time_embedding_pos = LearnedPositionalEmbedding(self.channels)
            self.to_time_embedding_lin = nn.Dense(self.context_embedding_features, param_dtype=jnp.float32)
        self.unet = UNet1d(
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            patch_size=self.patch_size,
            resnet_groups=self.resnet_groups,
            use_context_time=self.use_context_time,
            kernel_multiplier_downsample=self.kernel_multiplier_downsample,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            use_snake=self.use_snake,
            out_channels=self.out_channels,
            context_features=self.context_features,
            context_features_multiplier=self.context_features_multiplier,
            context_channels=self.context_channels,
            context_embedding_features=self.context_embedding_features,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            use_stft=self.use_stft,
            use_stft_context=self.use_stft_context,
            stft_num_fft=self.stft_num_fft,
            stft_hop_length=self.stft_hop_length,
            stft_window_length=self.stft_window_length,
            stft_length=self.stft_length,
            stft_use_complex=self.stft_use_complex,
        )

    def __call__(self, x, time, embedding, embedding_mask=None, embedding_scale: float = 1.0,
                 embedding_mask_proba: float = 0.0, batch_cfg: bool = True,
                 rescale_cfg: bool = False, scale_phi: float = 0.4,
                 negative_embedding=None, negative_embedding_mask=None,
                 features=None, channels_list=None, causal: bool = False, train: bool = False):
        b = embedding.shape[0]
        if self.use_xattn_time:
            t_emb = jax.nn.gelu(self.to_time_embedding_lin(self.to_time_embedding_pos(time)))
            embedding = jnp.concatenate([embedding, t_emb[:, None, :]], axis=1)
            if embedding_mask is not None:
                embedding_mask = jnp.concatenate(
                    [embedding_mask, jnp.ones((b, 1), embedding_mask.dtype)], axis=1)

        fixed = self.fixed_embedding(embedding)

        if embedding_mask_proba > 0.0 and train:
            key = self.make_rng("cfg")
            mask = jax.random.bernoulli(key, embedding_mask_proba, (b, 1, 1))
            embedding = jnp.where(mask, fixed, embedding)

        if embedding_scale != 1.0:
            if batch_cfg:
                batch_x = jnp.concatenate([x, x], axis=0)
                batch_time = jnp.concatenate([time, time], axis=0)
                if negative_embedding is not None:
                    if negative_embedding_mask is not None:
                        nm = negative_embedding_mask.astype(bool)[:, :, None]
                        negative_embedding = jnp.where(nm, negative_embedding, fixed)
                    batch_embed = jnp.concatenate([embedding, negative_embedding], axis=0)
                else:
                    batch_embed = jnp.concatenate([embedding, fixed], axis=0)
                batch_mask = None
                if embedding_mask is not None:
                    batch_mask = jnp.concatenate([embedding_mask, embedding_mask], axis=0)
                batch_features = jnp.concatenate([features, features], axis=0) if features is not None else None
                batch_channels = None
                if channels_list is not None:
                    batch_channels = [jnp.concatenate([c, c], axis=0) for c in channels_list]
                batch_out = self.unet(batch_x, batch_time, features=batch_features,
                                      channels_list=batch_channels, embedding=batch_embed,
                                      embedding_mask=batch_mask, causal=causal)
                out, out_masked = jnp.split(batch_out, 2, axis=0)
            else:
                out = self.unet(x, time, features=features, channels_list=channels_list,
                                embedding=embedding, embedding_mask=embedding_mask, causal=causal)
                out_masked = self.unet(x, time, features=features, channels_list=channels_list,
                                       embedding=fixed, embedding_mask=embedding_mask, causal=causal)
            out_cfg = out_masked + (out - out_masked) * embedding_scale
            if rescale_cfg:
                out_std = out.astype(jnp.float32).std(axis=-1, keepdims=True)
                out_cfg_std = out_cfg.astype(jnp.float32).std(axis=-1, keepdims=True)
                return scale_phi * (out_cfg * (out_std / out_cfg_std)) + (1 - scale_phi) * out_cfg
            return out_cfg
        return self.unet(x, time, features=features, channels_list=channels_list,
                         embedding=embedding, embedding_mask=embedding_mask, causal=causal)


class UNetNCCA1d(nn.Module):
    """Noise Channel Conditioning Augmentation (reference adp.py:1424-1473):
    context features are NumberEmbedder-embedded scalars."""

    context_features: int
    in_channels: int
    channels: int
    multipliers: tp.Sequence[int]
    factors: tp.Sequence[int]
    num_blocks: tp.Sequence[int]
    attentions: tp.Sequence[int]
    # passthrough
    patch_size: int = 1
    resnet_groups: int = 8
    context_channels: tp.Optional[tp.Sequence[int]] = None

    def setup(self):
        self.embedder = NumberEmbedder(features=self.context_features)
        self.unet = UNet1d(
            in_channels=self.in_channels, channels=self.channels,
            multipliers=self.multipliers, factors=self.factors,
            num_blocks=self.num_blocks, attentions=self.attentions,
            patch_size=self.patch_size, resnet_groups=self.resnet_groups,
            context_features=self.context_features, context_channels=self.context_channels,
        )

    def __call__(self, x, time, channels_scale=None, **kwargs):
        if channels_scale is None:
            channels_scale = jnp.zeros((x.shape[0],), jnp.float32)
        features = self.embedder(channels_scale)
        return self.unet(x, time, features=features, **kwargs)


def XUNet1d(type: str = "base", **kwargs):
    """reference adp.py:1482-1492."""
    if type == "base":
        return UNet1d(**kwargs)
    if type == "all":
        return UNetCFG1d(**kwargs)
    if type == "cfg":
        return UNetCFG1d(**kwargs)
    if type == "ncca":
        return UNetNCCA1d(**kwargs)
    raise ValueError(f"Unknown XUNet1d type: {type}")
