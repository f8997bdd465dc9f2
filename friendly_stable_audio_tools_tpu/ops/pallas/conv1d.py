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
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_cur, x_nxt, w_ref, b_ref, ab_ref, o_ref, xcat_ref, *, k: int, dilation: int,
            block_t: int, use_snake: bool):
    halo = (k - 1) * dilation
    x = jnp.concatenate([x_cur[:], x_nxt[: halo if halo else 1]], axis=0) if halo else x_cur[:]
    x = x.astype(jnp.float32)
    if use_snake:
        alpha = ab_ref[0, :]
        inv_beta = ab_ref[1, :]
        x = x + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x))
    cin = w_ref.shape[1]
    if k > 1:
        # stack the k shifted windows on the feature axis via VMEM scratch:
        # ONE [bt, k*cin] x [k*cin, cout] dot (K = k*cin keeps the MXU busy;
        # k separate K=cin dots run far below peak for small channel counts)
        for j in range(k):
            xcat_ref[:, j * cin : (j + 1) * cin] = x[j * dilation : j * dilation + block_t]
        wcat = w_ref[:].reshape(k * cin, w_ref.shape[2])
        acc = jax.lax.dot_general(
            xcat_ref[:], wcat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        acc = jax.lax.dot_general(
            x[:block_t], w_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
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
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i + 1, 0)),
            pl.BlockSpec((k, cin, cout), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, k * cin), jnp.float32)],
    )(xp, xp, w, bias.reshape(1, -1), ab)
    return out[:, :t, :]


def _xla_reference(x, w, bias, alpha, inv_beta, dilation, padding):
    xin = x
    if alpha is not None:
        x32 = x.astype(jnp.float32)
        xin = (x32 + 0.5 * inv_beta * (1.0 - jnp.cos(2.0 * alpha * x32))).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xin, w.astype(x.dtype), (1,), [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=jnp.float32,
    )
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


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
    block_t: int = 2048,
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

    # pick the largest block_t whose working set fits in VMEM: input tiles,
    # the [bt, k*cin] stacked window, fp32 accumulator, output tile, weights
    w_bytes = k * cin * cout * 4
    budget = 10 * 2**20 - w_bytes
    bt = block_t
    while bt > 128 and 4 * bt * ((3 + k) * cin + 2 * cout) > budget:
        bt //= 2

    use_pallas = (
        jax.default_backend() != "cpu"
        and x.shape[1] >= bt
        and bt >= 128
        and w_bytes < 6 * 2**20
        and (k - 1) * dilation < bt
    )
    if not use_pallas:
        return _xla_reference(x, w, bias, alpha, inv_beta, dilation, padding)
    return _fused(x, w, bias, alpha, inv_beta, dilation, padding, bt)


# ---------------------------------------------------------------------------
# whole-residual-unit fusion: snake -> conv(k, d) -> snake -> conv(1) -> + x
# ---------------------------------------------------------------------------


def _ru_kernel(x_cur, x_nxt, w1_ref, b1_ref, ab1_ref, w2_ref, b2_ref, ab2_ref,
               o_ref, xcat_ref, *, k: int, dilation: int, block_t: int):
    halo = (k - 1) * dilation
    res = x_cur[:].astype(jnp.float32)
    x = jnp.concatenate([res, x_nxt[:halo].astype(jnp.float32)], axis=0) if halo else res
    a1, ib1 = ab1_ref[0, :], ab1_ref[1, :]
    x = x + 0.5 * ib1 * (1.0 - jnp.cos(2.0 * a1 * x))
    cin = w1_ref.shape[1]
    for j in range(k):
        xcat_ref[:, j * cin : (j + 1) * cin] = x[j * dilation : j * dilation + block_t]
    w1 = w1_ref[:].reshape(k * cin, w1_ref.shape[2])
    h = jax.lax.dot_general(xcat_ref[:], w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1_ref[0, :]
    a2, ib2 = ab2_ref[0, :], ab2_ref[1, :]
    h = h + 0.5 * ib2 * (1.0 - jnp.cos(2.0 * a2 * h))
    y = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
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
    out = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((None, block_t, cin), lambda bb, i: (bb, i + 1, 0)),
            pl.BlockSpec((k, cin, cin), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
            pl.BlockSpec((cin, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((2, cin), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, cout), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * block_t, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, k * cin), jnp.float32)],
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
                        dilation: int = 1, block_t: int = 2048):
    """Whole Oobleck ResidualUnit in one HBM pass:
    y = x + conv1x1(snake2(conv_k(snake1(x)))). Requires cin == cout."""
    k, cin, cout = w1.shape
    assert cin == cout == w2.shape[0] == w2.shape[1]
    ab1 = jnp.stack([alpha1, inv_beta1]).astype(jnp.float32)
    ab2 = jnp.stack([alpha2, inv_beta2]).astype(jnp.float32)
    w_bytes = (k * cin * cin + cin * cin) * 4
    budget = 10 * 2**20 - w_bytes
    bt = block_t
    while bt > 128 and 4 * bt * ((4 + k) * cin + 2 * cout) > budget:
        bt //= 2
    use_pallas = (
        jax.default_backend() != "cpu"
        and x.shape[1] >= bt
        and bt >= 128
        and w_bytes < 6 * 2**20
        and (k - 1) * dilation < bt
    )
    if not use_pallas:
        return _ru_xla(x, w1, b1, ab1, w2, b2, ab2, dilation)
    return _ru(x, w1, b1, ab1, w2, b2, ab2, dilation, bt)
