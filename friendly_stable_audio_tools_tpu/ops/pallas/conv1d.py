"""Fused (snake ->) conv1d Pallas kernel for the waveform conv stacks.

The Oobleck VAE decode is HBM-bound under XLA's 1-D conv lowering (~2% MFU):
every k-tap conv re-streams multi-hundred-MB activations and the snake
activation adds separate transcendental passes. This kernel is the
"snake+weight-norm conv fusion" called out as the main custom-kernel win in
SURVEY.md §7: one pass loads an activation tile into VMEM once, applies the
snake pointwise op in-register, and accumulates the k shifted [Tb, Cin] x
[Cin, Cout] products on the MXU in fp32 — one read of x, one write of y.

Supports stride-1 convs with dilation (the residual-unit hot path).
Backward: recomputation via the XLA reference (custom_vjp), so training
works; inference is the perf-critical direction.
"""

from __future__ import annotations

import functools
import os
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """FSAT_PALLAS_INTERPRET=1 runs the kernels in Pallas interpret mode
    (pure Python/XLA emulation) so the CPU test suite exercises kernel logic
    without TPU hardware."""
    import os

    return os.environ.get("FSAT_PALLAS_INTERPRET") == "1"


# snake(x) = x + inv_beta * sin^2(alpha x). The v5e VPU runs fp32 cos at only
# ~40 Gelem/s (scripts/cos_probe.py) — ~6.7 ms of every c=128 residual unit's
# 10.4 ms was pure transcendental time. In-kernel we evaluate sin^2 via range
# reduction + a degree-5 minimax polynomial in s^2 (s = frac-centered a*x/pi):
# 13 mul/adds, bandwidth-bound, max abs error 2.3e-7 in fp32 — three orders
# of magnitude below the bf16 resolution the activation is cast to. The XLA
# fallback (`FSAT_DISABLE_PALLAS_CONV=1`) keeps the exact-cos form.
_INV_PI = 0.3183098861837907
_SIN2_C = (9.869603239633658, -32.469601846083854, 42.72581061829601,
           -30.089709323462305, 13.005597445194748, -3.2946440864775366)


def _snake(x, alpha, inv_beta):
    """x + inv_beta * sin^2(alpha * x), fp32, polynomial sin^2 (see above)."""
    v = x * (alpha * _INV_PI)
    s = v - jnp.round(v)
    w = s * s
    p = _SIN2_C[5]
    for c in (_SIN2_C[4], _SIN2_C[3], _SIN2_C[2], _SIN2_C[1], _SIN2_C[0]):
        p = p * w + c
    return x + inv_beta * (w * p)


def _kernel(x_cur, x_nxt, w_ref, b_ref, ab_ref, o_ref, xcat_ref, *, k: int, dilation: int,
            block_t: int, use_snake: bool):
    halo = (k - 1) * dilation
    x = jnp.concatenate([x_cur[:], x_nxt[:halo]], axis=0) if halo else x_cur[:]
    x = x.astype(jnp.float32)
    if use_snake:
        x = _snake(x, ab_ref[0, :], ab_ref[1, :])
    # compute the conv in the model dtype like the XLA reference (which casts
    # w to x.dtype): bf16 operands keep the MXU in single-pass mode — fp32
    # dots drop it to multi-pass and measured 3-6x slower at decoder shapes
    x = x.astype(o_ref.dtype)
    cin = w_ref.shape[1]
    if k > 1:
        # stack the k shifted windows on the feature axis via VMEM scratch:
        # ONE [bt, k*cin] x [k*cin, cout] dot (K = k*cin keeps the MXU busy;
        # k separate K=cin dots run far below peak for small channel counts)
        for j in range(k):
            xcat_ref[:, j * cin : (j + 1) * cin] = x[j * dilation : j * dilation + block_t]
        wcat = w_ref[:].reshape(k * cin, w_ref.shape[2]).astype(o_ref.dtype)
        acc = jax.lax.dot_general(
            xcat_ref[:], wcat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        acc = jax.lax.dot_general(
            x[:block_t], w_ref[0].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        )
    acc = acc + b_ref[0, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def _forward(x, w, bias, alpha, inv_beta, dilation: int, padding: int, block_t: int):
    """x [B, T, Cin]; w [k, Cin, Cout]; same-length output (stride 1)."""
    b, t, cin = x.shape
    k, _, cout = w.shape
    halo = (k - 1) * dilation
    # left pad + right pad so every tile's halo read stays in bounds
    pad_t = (block_t - t % block_t) % block_t
    xp = jnp.pad(x, ((0, 0), (padding, halo - padding + pad_t + block_t), (0, 0)))
    n_t = (t + pad_t) // block_t

    if alpha is None:
        ab = jnp.zeros((2, cin), jnp.float32)
        use_snake = False
    else:
        ab = jnp.stack([alpha, inv_beta]).astype(jnp.float32)
        use_snake = True

    kernel = functools.partial(
        _kernel, k=k, dilation=dilation, block_t=block_t, use_snake=use_snake
    )
    # halo ref: a 64-row-aligned window at the tile boundary, NOT the whole
    # next tile — halves input DMA traffic (the halo is <= 64 rows)
    halo_rows = _halo_rows(halo)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, halo_rows, cin),
                         lambda bb, i, r=block_t // _halo_rows(halo): (bb, (i + 1) * r, 0)),
            pl.BlockSpec((k, cin, cout), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, k * cin), x.dtype)],
    )(xp, xp, w, bias.reshape(1, -1), ab)
    return out[:, :t, :]


def _halo_rows(halo: int) -> int:
    """Smallest 64-multiple covering the halo (sublane-aligned block)."""
    return max(64, ((halo + 63) // 64) * 64)


def _xla_reference(x, w, bias, alpha, inv_beta, dilation, padding):
    xin = x
    if alpha is not None:
        x32 = x.astype(jnp.float32)
        xin = (x32 + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x32))).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xin, w.astype(x.dtype), (1,), [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, w, bias, alpha, inv_beta, dilation, padding, block_t):
    return _forward(x, w, bias, alpha, inv_beta, dilation, padding, block_t)


def _fused_fwd(x, w, bias, alpha, inv_beta, dilation, padding, block_t):
    return _forward(x, w, bias, alpha, inv_beta, dilation, padding, block_t), (x, w, bias, alpha, inv_beta)


def _fused_bwd(dilation, padding, block_t, res, g):
    x, w, bias, alpha, inv_beta = res
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a, dilation, padding), x, w, bias, alpha, inv_beta)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def snake_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: tp.Optional[jnp.ndarray],
    alpha: tp.Optional[jnp.ndarray] = None,
    inv_beta: tp.Optional[jnp.ndarray] = None,
    dilation: int = 1,
    padding: tp.Optional[int] = None,
    block_t: int = 4096,
) -> jnp.ndarray:
    """Fused snake(x) -> conv (stride 1, 'same'-style padding).

    alpha/inv_beta are the EFFECTIVE per-channel snake parameters
    (already exponentiated for log-scale SnakeBeta); None skips the snake.
    """
    k, cin, cout = w.shape
    if padding is None:
        padding = (dilation * (k - 1)) // 2
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)

    # pick the largest block_t whose working set fits in VMEM: input tiles
    # (fp32 after the snake), the [bt, k*cin] stacked window (model dtype —
    # 2 B for bf16, 4 B for f32 runs), fp32 accumulator + output tile, weights
    w_bytes = k * cin * cout * 4
    xdt_bytes = jnp.dtype(x.dtype).itemsize
    budget = 10 * 2**20 - w_bytes
    bt = block_t
    while bt > 128 and bt * ((4 * 3 + xdt_bytes * k) * cin + 8 * cout) > budget:
        bt //= 2

    use_pallas = (
        os.environ.get("FSAT_DISABLE_PALLAS_CONV") != "1"
        and (jax.default_backend() != "cpu" or _interpret())
        and x.shape[1] >= bt
        and bt >= 128
        and w_bytes < 6 * 2**20
        and (k - 1) * dilation <= 128  # halo block is one 64/128-row tile
        and (k - 1) * dilation < bt
    )
    if not use_pallas:
        return _xla_reference(x, w, bias, alpha, inv_beta, dilation, padding)
    return _fused(x, w, bias, alpha, inv_beta, dilation, padding, bt)


# ---------------------------------------------------------------------------
# fused snake -> transposed conv (polyphase): the decoder upsample hot path
# ---------------------------------------------------------------------------
#
# torch ConvTranspose1d(k=2s, stride=s, padding=s/2) decomposes into s output
# phases, each a 2-tap stride-1 conv over x:
#   y[q*s + r] = x[q0]   @ w[r+p]        with q0 = q, q1 = q-1  for r <  s/2
#              + x[q1]   @ w[r+p +- s]        q0 = q, q1 = q+1  for r >= s/2
# Grouping phases by their (q0, q1) pattern yields exactly TWO MXU dots per
# input tile: [bt, 2*Cin] x [2*Cin, (s/2)*Cout] — one HBM read of x (with the
# preceding snake fused in-register), one interleaved write of y. XLA's
# lowering of the same math (conv_transpose1d_gemm) round-trips every phase
# through HBM and measures ~4x slower at decoder shapes.


def _upk_kernel(x_cur, x_halo, wa_ref, wb_ref, b_ref, ab_ref, o_ref, *,
                stride: int, block_t: int, cout: int, use_snake: bool):
    xt = jnp.concatenate([x_cur[:], x_halo[:2]], axis=0).astype(jnp.float32)
    # xt rows map to x[q-1 .. q+block_t]: x_cur starts at q-1 (input shifted
    # left by one), so row i corresponds to x[tile_start - 1 + i]
    if use_snake:
        xt = _snake(xt, ab_ref[0, :], ab_ref[1, :])
    xt = xt.astype(wa_ref.dtype)
    x_m1 = xt[0:block_t]          # x[q-1]
    x_0 = xt[1 : block_t + 1]     # x[q]
    x_p1 = xt[2 : block_t + 2]    # x[q+1]
    half = stride // 2
    cin = x_cur.shape[1]

    def dd(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # group A: phases r < s/2 use (x[q], x[q-1]); group B: (x[q], x[q+1]).
    # Two K=Cin dots per group (Mosaic cannot lane-concat offset slices).
    a = dd(x_0, wa_ref[:cin]) + dd(x_m1, wa_ref[cin:])
    bq = dd(x_0, wb_ref[:cin]) + dd(x_p1, wb_ref[cin:])
    # NOTE: a phase-major [bt, s*cout] output (in-kernel interleave-free,
    # "free" row-major reshape outside) was tried and REVERTED: the isolated
    # kernel improved ~17% (scripts/up_exp.py) but the downstream
    # [T, s*cout] -> [T*s, cout] view is a genuine TILED-layout relayout on
    # TPU (+2 ms on the composed decode) that XLA elides when the kernel is
    # benchmarked alone.
    y = jnp.concatenate([a.reshape(block_t, half, cout),
                         bq.reshape(block_t, half, cout)], axis=1)
    y = y + b_ref[0, :]
    o_ref[:] = y.reshape(block_t * stride, cout).astype(o_ref.dtype)


def _upk_forward(x, wa, wb, bias, ab, stride, block_t, use_snake):
    b, t, cin = x.shape
    cout = wa.shape[1] // (stride // 2)
    pad_t = (block_t - t % block_t) % block_t
    n_t = (t + pad_t) // block_t
    # shift left by 1 (x[q-1] halo) and pad right so the +1 halo ref tiles
    xp = jnp.pad(x, ((0, 0), (1, (n_t + 1) * block_t - t - 1), (0, 0)))

    halo_rows = 64  # smallest sublane-aligned halo block; only 2 rows used
    kernel = functools.partial(_upk_kernel, stride=stride, block_t=block_t,
                               cout=cout, use_snake=use_snake)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, halo_rows, cin),
                         lambda bb, i, bt=block_t: (bb, (i + 1) * (bt // halo_rows), 0)),
            pl.BlockSpec(wa.shape, lambda bb, i: (0, 0)),
            pl.BlockSpec(wb.shape, lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t * stride, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t * stride, cout), x.dtype),
    )(xp, xp, wa, wb, bias.reshape(1, -1), ab)
    return out[:, : t * stride, :]


def _upk_weights(w: jnp.ndarray, stride: int):
    """[k=2s, Cin, Cout] -> (W_A, W_B) [2*Cin, (s/2)*Cout] phase-grouped."""
    k, cin, cout = w.shape
    s = stride
    p = s // 2
    wa_cols, wb_cols = [], []
    for r in range(0, s // 2):
        wa_cols.append(jnp.concatenate([w[r + p], w[r + p + s]], axis=0))  # (x0, xm1)
    for r in range(s // 2, s):
        wb_cols.append(jnp.concatenate([w[r + p], w[r + p - s]], axis=0))  # (x0, xp1)
    return jnp.concatenate(wa_cols, axis=1), jnp.concatenate(wb_cols, axis=1)


def _upk_xla(x, w, bias, alpha, inv_beta, stride):
    from ..convs import conv_transpose1d

    if alpha is not None:
        x32 = x.astype(jnp.float32)
        x = (x32 + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x32))).astype(x.dtype)
    y = conv_transpose1d(x, w.astype(x.dtype), stride, stride // 2)
    return (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def snake_downsample_conv1d(x, w, bias, alpha, inv_beta, stride):
    """Strided downsample conv (k = 2s, stride s, torch padding s/2) as two
    [T/s, s*Cin] x [s*Cin, Cout] GEMMs over a FREE s-phase row reshape —
    the encoder-side mirror of _upk_gemm. XLA's generic strided-conv
    lowering left the encoder ~3x slower per audio-second than the decoder
    (round-5 scripts/train_probe.py: the frozen-VAE encode was 366.5 ms of
    a 501 ms SAO raw-audio train step at batch 2); this form turns every
    downsample into MXU-shaped GEMMs. Polynomial sin^2 snake like the
    Pallas kernels; pure XLA, so autodiff needs no custom_vjp.

    out[q] = b + sum_r w[r] . xpad[q*s + r], xpad = pad(x, (s/2, s/2)):
    with k = 2s the window is exactly two consecutive rows of the
    [T/s + 1, s*Cin] reshape (row-major view, no data movement), and the
    [tap, channel] flatten order of each row matches w's [k, Cin] flatten.

    Reference semantics: autoencoders.py:71-87 (WNConv1d(k=2*stride,
    stride=stride, padding=ceil(stride/2)))."""
    b, t, cin = x.shape
    k, _, cout = w.shape
    s = stride
    p = s // 2
    if alpha is not None:
        # snake(0) == 0, so padding AFTER the snake is exact
        x = _snake(x.astype(jnp.float32), alpha, inv_beta).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (p, s - p), (0, 0)))
    xr = xp.reshape(b, t // s + 1, s * cin)
    wf = w.astype(x.dtype).reshape(k * cin, cout)

    def dd(a, wm):
        return jax.lax.dot_general(a, wm, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    y = dd(xr[:, :-1], wf[: s * cin]) + dd(xr[:, 1:], wf[s * cin:])
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _upk_gemm(x, w, bias, alpha, inv_beta, stride):
    """Phase-grouped GEMM form of the upsample in plain XLA: the same
    (x[q], x[q-+1]) two-tap decomposition as _upk_kernel, but as four
    [T, Cin] x [Cin, (s/2)*Cout] dots + one interleave. Carries the decoder
    stages whose phase-grouped weights exceed the Pallas kernel's VMEM gate
    (SAO cin 2048/1024): large-K GEMMs XLA tiles well, vs its generic
    conv_transpose lowering. Polynomial snake like the kernel; plain
    autodiff (no custom_vjp needed — everything is XLA)."""
    b, t, cin = x.shape
    k, _, cout = w.shape
    s = stride
    p = s // 2
    if alpha is not None:
        x = _snake(x.astype(jnp.float32), alpha, inv_beta).astype(x.dtype)
    # snake(0) == 0, so zero-padding the shifted operands AFTER the snake
    # matches the kernel's pad-then-snake ordering exactly
    xm1 = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :t]
    xp1 = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    wd = w.astype(x.dtype)

    def grp(lo, hi):  # [Cin, (hi-lo)*Cout] phase-concatenated weights
        return jnp.concatenate([wd[i] for i in range(lo, hi)], axis=1)

    def dd(a, wmat):
        return jax.lax.dot_general(a, wmat, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # group A: phases r < s/2 use (x[q], x[q-1]); group B: (x[q], x[q+1])
    a = dd(x, grp(p, s)) + dd(xm1, grp(p + s, 2 * s))
    bq = dd(x, grp(s, s + p)) + dd(xp1, grp(0, p))
    y = jnp.concatenate([a.reshape(b, t, p, cout), bq.reshape(b, t, p, cout)],
                        axis=2)
    y = y + bias.astype(jnp.float32)
    return y.reshape(b, t * s, cout).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _upk(x, w, bias, alpha, inv_beta, stride, block_t):
    ab = (jnp.stack([alpha, inv_beta]).astype(jnp.float32) if alpha is not None
          else jnp.zeros((2, x.shape[-1]), jnp.float32))
    wa, wb = _upk_weights(w.astype(x.dtype), stride)
    return _upk_forward(x, wa, wb, bias, ab, stride, block_t, alpha is not None)


def _upk_fwd(x, w, bias, alpha, inv_beta, stride, block_t):
    return _upk(x, w, bias, alpha, inv_beta, stride, block_t), (x, w, bias, alpha, inv_beta)


def _upk_bwd(stride, block_t, res, g):
    x, w, bias, alpha, inv_beta = res
    if alpha is None:
        _, vjp = jax.vjp(lambda x_, w_, b_: _upk_xla(x_, w_, b_, None, None, stride), x, w, bias)
        return vjp(g) + (None, None)
    _, vjp = jax.vjp(lambda *a: _upk_xla(*a, stride), x, w, bias, alpha, inv_beta)
    return vjp(g)


_upk.defvjp(_upk_fwd, _upk_bwd)


def snake_conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: tp.Optional[jnp.ndarray],
    alpha: tp.Optional[jnp.ndarray] = None,
    inv_beta: tp.Optional[jnp.ndarray] = None,
    stride: int = 2,
    padding: tp.Optional[int] = None,
    block_t: int = 1024,
) -> jnp.ndarray:
    """Fused snake(x) -> ConvTranspose1d(k=2s, stride=s, padding=s/2) — the
    Oobleck decoder upsample. Requires even stride, k == 2*stride and torch
    padding s/2 (all shipped configs); other shapes fall back to XLA."""
    k, cin, cout = w.shape
    if padding is None:
        padding = stride // 2
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)

    # VMEM working set: x tile fp32, 2 stacked operands, W_A/W_B, out tile
    w_bytes = 2 * 2 * cin * (stride // 2) * cout * 4
    bt = block_t
    while bt > 128 and 4 * bt * (7 * cin + 2 * stride * cout) > 10 * 2**20 - w_bytes:
        bt //= 2
    use_pallas = (
        os.environ.get("FSAT_DISABLE_PALLAS_CONV") != "1"
        and (jax.default_backend() != "cpu" or _interpret())
        and stride % 2 == 0
        and k == 2 * stride
        and padding == stride // 2
        and x.shape[1] >= bt
        and bt >= 128
        and bt % 64 == 0
        and w_bytes < 6 * 2**20
        # the in-kernel [bt, half*cout] -> [bt, half, cout] shape cast needs
        # a lane-aligned cout: Mosaic rejects it for cout < 128 (hit by the
        # SEANet/encodec decoder, cout 64 at stride 8 — "infer-vector-layout:
        # unsupported shape cast"); those shapes take the GEMM form below
        and cout % 128 == 0
    )
    if not use_pallas:
        if (
            os.environ.get("FSAT_DISABLE_PALLAS_CONV") != "1"
            and jax.default_backend() != "cpu"
            and stride % 2 == 0
            and k == 2 * stride
            and padding == stride // 2
        ):
            # eligible structure but weights too large for the kernel's VMEM
            # gate: phase-grouped GEMM form instead of XLA conv_transpose
            return _upk_gemm(x, w, bias, alpha, inv_beta, stride)
        return _upk_xla(x, w, bias, alpha, inv_beta, stride)
    return _upk(x, w, bias, alpha, inv_beta, stride, bt)


# ---------------------------------------------------------------------------
# whole-residual-unit fusion: snake -> conv(k, d) -> snake -> conv(1) -> + x
# ---------------------------------------------------------------------------


def _ru_kernel(x_cur, x_nxt, w1_ref, b1_ref, ab1_ref, w2_ref, b2_ref, ab2_ref,
               o_ref, *, k: int, dilation: int, block_t: int):
    halo = (k - 1) * dilation
    padding = halo // 2
    cur = x_cur[:].astype(jnp.float32)
    x = jnp.concatenate([cur, x_nxt[:].astype(jnp.float32)], axis=0) if halo else cur
    # x_cur starts `padding` rows BEFORE the tile (conv window alignment);
    # the residual must be the unshifted tile rows
    res = x[padding : padding + block_t]
    x = _snake(x, ab1_ref[0, :], ab1_ref[1, :])
    # cast to the model dtype BEFORE the dots, exactly like the XLA reference
    # (_ru_xla casts snake output to x.dtype before each conv): fp32 MXU
    # operands run multi-pass, measured 2-3x slower at decoder shapes
    x = x.astype(o_ref.dtype)
    # k separate K=cin dots accumulated in fp32: no [bt, k*cin] stacked-window
    # VMEM scratch (that 7x duplication write/re-read dominated at c=128), and
    # the freed VMEM doubles block_t. Measured at the decode hot shapes
    # (scripts/ru_exp.py): c=128 57.3 -> 74.5 TFLOP/s bit-exact; c=256
    # 96 -> 105.
    acc = None
    for j in range(k):
        xj = x[j * dilation : j * dilation + block_t]
        d = jax.lax.dot_general(xj, w1_ref[j].astype(o_ref.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    h = acc + b1_ref[0, :]
    h = _snake(h, ab2_ref[0, :], ab2_ref[1, :])
    h = h.astype(o_ref.dtype)
    y = jax.lax.dot_general(h, w2_ref[:].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2_ref[0, :]
    o_ref[:] = (y + res).astype(o_ref.dtype)


def _ru_forward(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    b, t, cin = x.shape
    k = w1.shape[0]
    cout = w2.shape[1]
    halo = (k - 1) * dilation
    padding = halo // 2
    pad_t = (block_t - t % block_t) % block_t
    n_t = (t + pad_t) // block_t
    right = (n_t + 1) * block_t - t - padding
    xp = jnp.pad(x, ((0, 0), (padding, right), (0, 0)))

    kernel = functools.partial(_ru_kernel, k=k, dilation=dilation, block_t=block_t)
    halo_rows = _halo_rows(halo)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, halo_rows, cin),
                         lambda bb, i, r=block_t // halo_rows: (bb, (i + 1) * r, 0)),
            pl.BlockSpec((k, cin, cin), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((cin, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cout), x.dtype),
    )(xp, xp, w1, b1.reshape(1, -1), ab1, w2, b2.reshape(1, -1), ab2)
    return out[:, :t, :]


def _ru_xla(x, w1, b1, ab1, w2, b2, ab2, dilation):
    padding = (dilation * (w1.shape[0] - 1)) // 2
    h = _xla_reference(x, w1, b1, ab1[0], ab1[1], dilation, padding)
    h = _xla_reference(h, w2[None], b2, ab2[0], ab2[1], 1, 0)
    return h + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ru(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    return _ru_forward(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t)


def _ru_fwd(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t):
    return _ru_forward(x, w1, b1, ab1, w2, b2, ab2, dilation, block_t), (x, w1, b1, ab1, w2, b2, ab2)


def _ru_bwd(dilation, block_t, res, g):
    x, w1, b1, ab1, w2, b2, ab2 = res
    _, vjp = jax.vjp(lambda *a: _ru_xla(*a, dilation), x, w1, b1, ab1, w2, b2, ab2)
    return vjp(g)


_ru.defvjp(_ru_fwd, _ru_bwd)


def fused_residual_unit(x, w1, b1, alpha1, inv_beta1, w2, b2, alpha2, inv_beta2,
                        dilation: int = 1, block_t: int = 4096):
    """Whole Oobleck ResidualUnit in one HBM pass:
    y = x + conv1x1(snake2(conv_k(snake1(x)))). Requires cin == cout."""
    k, cin, cout = w1.shape
    assert cin == cout == w2.shape[0] == w2.shape[1]
    ab1 = jnp.stack([alpha1, inv_beta1]).astype(jnp.float32)
    ab2 = jnp.stack([alpha2, inv_beta2]).astype(jnp.float32)
    wdt = jnp.dtype(w1.dtype).itemsize
    xdt = jnp.dtype(x.dtype).itemsize
    w_bytes = (k * cin * cin + cin * cin) * wdt
    budget = 13 * 2**20 - w_bytes
    # per-row VMEM: x block (double-buffered) + fp32 snake temp + cast copy on
    # the cin side; out block + fp32 acc/h on the cout side. No stacked-window
    # scratch (sepdot kernel): c=128 picks bt 4096, c=256 bt 2048 — the
    # largest that compile (bt 8192 / 4096 respectively overflow VMEM,
    # scripts/ru_exp.py).
    bt = block_t
    while bt > 128 and bt * ((4 + 3 * xdt) * cin + 14 * cout) > budget:
        bt //= 2
    use_pallas = (
        os.environ.get("FSAT_DISABLE_PALLAS_CONV") != "1"
        and (jax.default_backend() != "cpu" or _interpret())
        and x.shape[1] >= bt
        and bt >= 128
        and w_bytes < 6 * 2**20
        and (k - 1) * dilation <= 128  # halo block is one 64/128-row tile
        and (k - 1) * dilation < bt
    )
    if not use_pallas:
        return _ru_xla(x, w1, b1, ab1, w2, b2, ab2, dilation)
    return _ru(x, w1, b1, ab1, w2, b2, ab2, dilation, bt)
