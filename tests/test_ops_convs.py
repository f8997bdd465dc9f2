"""Parity of conv ops against torch (CPU) — the ground truth the reference's
checkpoints were trained under."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from friendly_stable_audio_tools_tpu.ops.convs import (
    conv1d,
    conv_transpose1d,
    WNConv1d,
    WNConvTranspose1d,
)
from friendly_stable_audio_tools_tpu.ops.activations import SnakeBeta, snake_beta


@pytest.mark.parametrize("stride,padding,dilation,k", [(1, 3, 1, 7), (2, 1, 1, 4), (1, 9, 3, 7), (8, 4, 1, 16)])
def test_conv1d_matches_torch(rng, stride, padding, dilation, k):
    B, Cin, Cout, T = 2, 6, 10, 64
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin, k)).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.tensor(x), torch.tensor(w), stride=stride, padding=padding, dilation=dilation
    ).numpy()

    w_jax = jnp.asarray(w.transpose(2, 1, 0))  # (k, in, out)
    got = conv1d(jnp.asarray(x.transpose(0, 2, 1)), w_jax, stride, padding, dilation)
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,k", [(2, 1, 4), (4, 2, 8), (8, 4, 16), (1, 0, 3)])
def test_conv_transpose1d_matches_torch(rng, stride, padding, k):
    B, Cin, Cout, T = 2, 6, 5, 32
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout, k)).astype(np.float32)  # torch layout

    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), stride=stride, padding=padding
    ).numpy()

    w_jax = jnp.asarray(w.transpose(2, 0, 1))  # (k, in, out)
    got = conv_transpose1d(jnp.asarray(x.transpose(0, 2, 1)), w_jax, stride, padding)
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_wnconv_init_matches_plain_v(rng):
    """At init g=||v|| so weight == v; output must equal a plain conv with v."""
    m = WNConv1d(in_channels=4, out_channels=8, kernel_size=7, padding=3)
    x = jnp.asarray(rng.standard_normal((2, 32, 4)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    v = params["params"]["v"]
    b = params["params"]["bias"]
    ref = conv1d(x, v, 1, 3, 1) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_wnconv_weight_norm_semantics(rng):
    """Scaling g by c scales output (minus bias) by c — per output channel."""
    m = WNConv1d(in_channels=4, out_channels=8, kernel_size=3, padding=1, use_bias=False)
    x = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(params, x)
    params2 = jax.tree_util.tree_map(lambda a: a, params)
    params2["params"]["g"] = params["params"]["g"] * 2.0
    y2 = m.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5, atol=1e-5)


def test_wnconv_transpose_matches_torch_weight_norm(rng):
    """Full parity: torch weight_norm(ConvTranspose1d) vs WNConvTranspose1d with converted params."""
    Cin, Cout, k, s, p = 6, 4, 8, 4, 2
    tm = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p))
    x = rng.standard_normal((2, Cin, 20)).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy()

    v = tm.weight_v.detach().numpy()  # (in, out, k)
    g = tm.weight_g.detach().numpy()  # (in, 1, 1)
    b = tm.bias.detach().numpy()
    params = {
        "params": {
            "v": jnp.asarray(v.transpose(2, 0, 1)),
            "g": jnp.asarray(g.reshape(-1)),
            "bias": jnp.asarray(b),
        }
    }
    m = WNConvTranspose1d(in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s, padding=p)
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-4)


def test_snake_beta_matches_reference_formula(rng):
    x = rng.standard_normal((2, 8, 5)).astype(np.float32)
    alpha = rng.uniform(0.5, 2.0, (5,)).astype(np.float32)
    beta = rng.uniform(0.5, 2.0, (5,)).astype(np.float32)
    ref = x + (1.0 / (beta + 1e-9)) * np.sin(x * alpha) ** 2
    got = snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_snake_beta_module_logscale_init_is_identityish(rng):
    m = SnakeBeta(features=3)
    x = jnp.asarray(rng.standard_normal((1, 4, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    # log-scale zeros -> alpha=beta=1 -> y = x + sin^2(x)
    ref = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
