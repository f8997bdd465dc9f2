"""1-D convolutions with (optional) weight normalization, channels-last.

These are the workhorses of the Oobleck VAE and discriminators. The reference
uses `dac.nn.layers.WNConv1d` / `WNConvTranspose1d` (torch `weight_norm`);
here the same parameterization (direction `v`, magnitude `g`) is kept so that
training dynamics match and PyTorch checkpoints convert losslessly
(reference: models/autoencoders.py:11, SURVEY §7 "weight-norm conv parity").

Layout: inputs/outputs are [B, T, C] (NWC). XLA on TPU maps the channel dim
onto lanes and lowers these to MXU convolutions; strided convs over 44.1 kHz
waveforms are the VAE's FLOP budget, so keeping them as single
`lax.conv_general_dilated` calls (no im2col in Python) is the perf-critical
property.

Torch parity notes:
  * torch Conv1d weight has shape (out, in/groups, k); here `kernel`/`v` is
    (k, in/groups, out) — converters transpose (2, 1, 0).
  * torch weight_norm(dim=0): per-OUTPUT-channel norm for Conv1d, but
    per-INPUT-channel norm for ConvTranspose1d (its dim 0 is in_channels).
    Both behaviors are reproduced exactly.
  * torch ConvTranspose1d(stride s, padding p): out_len = (T-1)*s - 2p + k.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

Padding = tp.Union[int, tp.Tuple[int, int], str]


def _norm_padding(padding: Padding) -> tp.Union[str, tp.Sequence[tp.Tuple[int, int]]]:
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding)]
    return [tuple(padding)]


def _use_gemm_conv(x, w, groups: int) -> bool:
    """XLA's 1-D conv lowering on TPU runs far below MXU peak for audio-scale
    shapes (long T, modest C); a sum of k shifted GEMMs is ~10x faster. Use it
    whenever the contraction is MXU-worthy and ungrouped."""
    if groups != 1 or jax.default_backend() == "cpu":
        return False
    k, cin, cout = w.shape
    return k > 1 and cin * cout >= 32 * 32


def conv1d_gemm(x, w, stride: int = 1, padding: Padding = 0, dilation: int = 1):
    """conv as sum of k (strided-)shifted GEMMs; exact same math as conv1d."""
    k, cin, cout = w.shape
    if isinstance(padding, str):
        raise ValueError("gemm path needs explicit padding")
    pad = (padding, padding) if isinstance(padding, int) else tuple(padding)
    b, t, _ = x.shape
    t_out = (t + pad[0] + pad[1] - dilation * (k - 1) - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad[0], pad[1] + stride * t_out), (0, 0)))
    acc = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t_out * stride, 1, axis=1)
        if stride > 1:
            xs = xs[:, ::stride, :]
        term = jnp.einsum("btc,cd->btd", xs, w[j], preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: Padding = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """[B, T, Cin] x [k, Cin/groups, Cout] -> [B, T', Cout]."""
    if _use_gemm_conv(x, w, groups) and not isinstance(padding, str):
        return conv1d_gemm(x, w, stride, padding, dilation)
    # no preferred_element_type upcast: the conv transpose rule rejects
    # bf16 operands with fp32 cotangents (and TPU accumulates bf16 convs in
    # fp32 internally regardless)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=_norm_padding(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def conv_transpose1d_gemm(x, w, stride: int, padding: int):
    """Transposed conv via output-phase decomposition: each of the `stride`
    output phases is a sum of ceil(k/s) GEMMs, then phases interleave — all
    FLOPs land on the MXU.

    y[n] = sum_{m,j : m*s + j - p == n} x[m] @ w[j]
    phase r = n mod s: j == (n - m*s + p), j ≡ (r + p) (mod s).
    """
    k, cin, cout = w.shape
    b, t, _ = x.shape
    s = stride
    t_out = (t - 1) * s - 2 * padding + k
    n_phases = s
    # max taps per phase
    phase_outs = []
    t_phase = t_out // s + 2  # generous per-phase length, trimmed at the end
    for r in range(n_phases):
        acc = jnp.zeros((b, t_phase, cout), jnp.float32)
        # output index n = q*s + r (q in [0, t_phase)); n + p = m*s + j
        for j in range(k):
            if (r + padding - j) % s != 0:
                continue
            # m = (n + p - j)/s = q + (r + p - j)/s
            off = (r + padding - j) // s
            # x[m] valid when 0 <= q + off < t
            lo = max(0, -off)
            hi = min(t_phase, t - off)
            if lo >= hi:
                continue
            xs = jax.lax.slice_in_dim(x, lo + off, hi + off, 1, axis=1)
            term = jnp.einsum("btc,cd->btd", xs, w[j], preferred_element_type=jnp.float32)
            acc = acc.at[:, lo:hi, :].add(term)
        phase_outs.append(acc)
    y = jnp.stack(phase_outs, axis=2).reshape(b, t_phase * s, cout)
    return y[:, :t_out, :].astype(x.dtype)


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch-semantics transposed conv: [B,T,Cin] x [k,Cin,Cout] -> [B,(T-1)s-2p+k,Cout].

    Default path decomposes into per-output-phase GEMMs (MXU-bound); the
    input-dilated XLA conv is the fallback (exact adjoint of conv1d).
    """
    if _use_gemm_conv(x, w, 1) and stride > 1:
        return conv_transpose1d_gemm(x, w, stride, padding)
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _fan_in_uniform(fan_in: int):
    """torch Conv1d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """Plain 1-D conv, torch-default init (overridable), channels-last."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: tp.Optional[tp.Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        w = self.param(
            "kernel",
            self.kernel_init or _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels // self.groups, self.out_channels),
            jnp.float32,
        )
        y = conv1d(x, w.astype(x.dtype), self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d: w = g * v / ||v||_(k,in) per output channel.

    `__call__(x, snake=(alpha, inv_beta))` fuses a preceding snake activation
    into the conv via the Pallas kernel (ops/pallas/conv1d.py) on TPU — the
    VAE hot path (SURVEY.md §7 "snake + weight-norm conv fusion")."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    def setup(self):
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        self.v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels // self.groups, self.out_channels),
            jnp.float32,
        )
        # torch weight_norm initializes g = ||v|| so the initial weight equals v.
        self.g = self.param("g", lambda key, *_: _vnorm_oc(self.v), (self.out_channels,), jnp.float32)
        if self.use_bias:
            self.bias = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)

    def weight(self) -> jnp.ndarray:
        return self.v * (self.g / (_vnorm_oc(self.v) + 1e-12))

    def bias_value(self) -> tp.Optional[jnp.ndarray]:
        return self.bias if self.use_bias else None

    def __call__(self, x: jnp.ndarray, snake: tp.Optional[tp.Tuple] = None) -> jnp.ndarray:
        w = self.weight()
        fusable = (
            self.stride == 1
            and self.groups == 1
            and isinstance(self.padding, int)
            and self.padding == (self.dilation * (self.kernel_size - 1)) // 2
        )
        if fusable:
            from .pallas.conv1d import snake_conv1d

            alpha, inv_beta = snake if snake is not None else (None, None)
            return snake_conv1d(
                x, w, self.bias if self.use_bias else None, alpha, inv_beta,
                dilation=self.dilation, padding=self.padding,
            )
        # encoder downsample (k = 2*stride, torch padding ceil(s/2)): the
        # s-phase reshape-GEMM form (ops/pallas/conv1d.py) instead of XLA's
        # generic strided-conv lowering; FSAT_DISABLE_PALLAS_CONV=1 A/Bs it
        import os as _os

        if (
            _os.environ.get("FSAT_DISABLE_PALLAS_CONV") != "1"
            and self.groups == 1
            and self.dilation == 1
            and self.stride > 1
            and self.stride % 2 == 0
            and self.kernel_size == 2 * self.stride
            and isinstance(self.padding, int)
            and self.padding == self.stride // 2
            and x.shape[1] % self.stride == 0
        ):
            from .pallas.conv1d import snake_downsample_conv1d

            alpha, inv_beta = snake if snake is not None else (None, None)
            return snake_downsample_conv1d(
                x, w, self.bias if self.use_bias else None, alpha, inv_beta,
                self.stride)
        if snake is not None:
            alpha, inv_beta = snake
            x32 = x.astype(jnp.float32)
            x = (x32 + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x32))).astype(x.dtype)
        y = conv1d(x, w.astype(x.dtype), self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            y = y + self.bias.astype(y.dtype)
        return y


def _vnorm_oc(v: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over (k, in) for each output channel -> shape (out,)."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))


def _vnorm_ic(v: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over (k, out) for each INPUT channel -> shape (in,); this is
    what torch weight_norm(dim=0) computes on ConvTranspose1d's (in,out,k)."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2)))


class ConvTranspose1d(nn.Module):
    """Plain transposed conv with torch output-length semantics."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.out_channels * self.kernel_size  # torch: in_ch of fwd conv view
        w = self.param(
            "kernel",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        y = conv_transpose1d(x, w.astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv; norm per input channel (torch dim=0).

    `__call__(x, snake=(alpha, inv_beta))` fuses a preceding snake activation
    into the upsample via the polyphase Pallas kernel on TPU (the decoder's
    per-stage hot op; ops/pallas/conv1d.py snake_conv_transpose1d)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    def setup(self):
        fan_in = self.out_channels * self.kernel_size
        self.v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        self.g = self.param("g", lambda key, *_: _vnorm_ic(self.v), (self.in_channels,), jnp.float32)
        if self.use_bias:
            self.bias = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)

    def weight(self) -> jnp.ndarray:
        return self.v * (self.g / (_vnorm_ic(self.v) + 1e-12))[None, :, None]

    def __call__(self, x: jnp.ndarray, snake: tp.Optional[tp.Tuple] = None) -> jnp.ndarray:
        w = self.weight()
        fusable = (
            self.stride % 2 == 0
            and self.kernel_size == 2 * self.stride
            and self.padding == self.stride // 2
        )
        if fusable:
            from .pallas.conv1d import snake_conv_transpose1d

            alpha, inv_beta = snake if snake is not None else (None, None)
            return snake_conv_transpose1d(
                x, w, self.bias if self.use_bias else None, alpha, inv_beta,
                stride=self.stride, padding=self.padding,
            )
        if snake is not None:
            alpha, inv_beta = snake
            x32 = x.astype(jnp.float32)
            x = (x32 + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x32))).astype(x.dtype)
        y = conv_transpose1d(x, w.astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            y = y + self.bias.astype(y.dtype)
        return y
