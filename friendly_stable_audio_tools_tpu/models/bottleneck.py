"""Latent-space bottlenecks.

Behavioral parity targets: reference `models/bottleneck.py:10-268`. All nine
config-selectable types are provided: tanh, vae, wasserstein, l2, rvq,
rvq_vae, dac_rvq, dac_rvq_vae, fsq.

Layout: latents are [B, T, C] (channels-last; the reference is [B, C, T]).
"mean/scale" splits therefore happen on the LAST axis.

Vector quantization is implemented natively in JAX (the reference imports
`vector_quantize_pytorch.ResidualVQ/FSQ` and `dac.nn.quantize`): codebooks are
trained with commitment + codebook losses and straight-through gradients.
(The lucidrains default of EMA codebook updates is replaced by the loss-based
update — equivalent objective, stateless and jit-friendly; documented
divergence.) Distance computation is a single [BT, C] x [C, K] matmul per
quantizer -> MXU-friendly.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """Base. Subclasses define encode(x, return_info) / decode(x).

    `is_discrete` mirrors reference bottleneck.py:10-30.
    """

    is_discrete: tp.ClassVar[bool] = False

    def encode(self, x, return_info: bool = False, **kwargs):
        raise NotImplementedError

    def decode(self, x):
        return x

    def __call__(self, x):  # for init: touch both paths
        z, info = self.encode(x, return_info=True)
        return self.decode(z)


class DiscreteBottleneck(Bottleneck):
    is_discrete: tp.ClassVar[bool] = True
    # subclasses set: num_quantizers, codebook_size, tokens_id

    def decode_tokens(self, codes, **kwargs):
        raise NotImplementedError


class TanhBottleneck(Bottleneck):
    """reference bottleneck.py:33-43"""

    def encode(self, x, return_info: bool = False):
        x = jnp.tanh(x)
        return (x, {}) if return_info else x


def vae_sample(mean: jnp.ndarray, scale: jnp.ndarray, rng: tp.Optional[jax.Array]):
    """Reparameterized sample + analytic KL (reference bottleneck.py:46-53).

    stdev = softplus(scale) + 1e-4; KL summed over channels, averaged over
    batch/time. `rng=None` returns the mean (deterministic eval).
    """
    mean32 = mean.astype(jnp.float32)
    stdev = jax.nn.softplus(scale.astype(jnp.float32)) + 1e-4
    var = stdev * stdev
    logvar = jnp.log(var)
    if rng is None:
        latents = mean32
    else:
        latents = mean32 + stdev * jax.random.normal(rng, mean.shape, jnp.float32)
    kl = (mean32 * mean32 + var - logvar - 1).sum(axis=-1).mean()
    return latents.astype(mean.dtype), kl


class VAEBottleneck(Bottleneck):
    """reference bottleneck.py:56-65; input has 2*latent_dim channels."""

    def encode(self, x, return_info: bool = False, sample: bool = True):
        mean, scale = jnp.split(x, 2, axis=-1)
        rng = self.make_rng("sample") if sample and self.has_rng("sample") else None
        z, kl = vae_sample(mean, scale, rng)
        return (z, {"kl": kl}) if return_info else z


def _mean_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    # reference bottleneck.py:68-70
    d = jnp.mean((x[:, None] - y[None]) ** 2, axis=2) / x.shape[-1]
    return jnp.exp(-d).mean()


def compute_mmd(latents: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """MMD to a standard normal (reference bottleneck.py:73-82). [B,T,C] input."""
    flat = latents.reshape(-1, latents.shape[-1])
    noise = jax.random.normal(rng, flat.shape, flat.dtype)
    return (
        _mean_kernel(flat, flat) + _mean_kernel(noise, noise) - 2 * _mean_kernel(flat, noise)
    )


class WassersteinBottleneck(Bottleneck):
    """reference bottleneck.py:85-103"""

    noise_augment_dim: int = 0

    def encode(self, x, return_info: bool = False, train: bool = False):
        info = {}
        if train and return_info and self.has_rng("sample"):
            info["mmd"] = compute_mmd(x, self.make_rng("sample"))
        return (x, info) if return_info else x

    def decode(self, x):
        if self.noise_augment_dim > 0:
            noise = jax.random.normal(
                self.make_rng("sample"), x.shape[:-1] + (self.noise_augment_dim,), x.dtype
            )
            x = jnp.concatenate([x, noise], axis=-1)
        return x


class L2Bottleneck(Bottleneck):
    """Unit-normalize channels (reference bottleneck.py:106-115)."""

    def encode(self, x, return_info: bool = False):
        x = _l2_normalize(x)
        return (x, {}) if return_info else x

    def decode(self, x):
        return _l2_normalize(x)


def _l2_normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


# --------------------------------------------------------------------------
# Vector quantization (native JAX)
# --------------------------------------------------------------------------


class VectorQuantizer(nn.Module):
    """Single codebook VQ with optional in/out projections (DAC-style).

    Nearest-neighbor assignment on the MXU (one matmul), straight-through
    gradients, commitment + codebook losses.
    """

    input_dim: int
    codebook_size: int
    codebook_dim: int
    # DAC-style cosine assignment (dac.nn.quantize.VectorQuantize.decode_latents):
    # nearest neighbor computed between L2-NORMALIZED z_e and codebook, but the
    # dequantized value is the RAW codebook entry. Needed for pretrained DAC
    # weight parity (reference pretransforms.py:136-195 wraps that quantizer).
    normalize: bool = False

    def setup(self):
        self.needs_proj = self.input_dim != self.codebook_dim
        if self.needs_proj:
            self.proj_in = nn.Dense(self.codebook_dim, param_dtype=jnp.float32)
            self.proj_out = nn.Dense(self.input_dim, param_dtype=jnp.float32)
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
            jnp.float32,
        )

    def __call__(self, x):  # x: [B, T, C_in]
        z_e = self.proj_in(x) if self.needs_proj else x
        ze32 = z_e.astype(jnp.float32)
        codebook = self.codebook
        if self.normalize:
            ze_a = _l2_normalize(ze32)
            cb_a = _l2_normalize(codebook)
        else:
            ze_a, cb_a = ze32, codebook
        # L2 distance via expansion; argmin over codebook (one [BT,C]x[C,K] matmul)
        dots = jnp.einsum("btc,kc->btk", ze_a, cb_a)
        d = jnp.sum(ze_a**2, -1, keepdims=True) - 2 * dots + jnp.sum(cb_a**2, -1)
        codes = jnp.argmin(d, axis=-1)  # [B, T]
        z_q = codebook[codes]  # [B, T, Cd]

        commitment = jnp.mean((ze32 - jax.lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(ze32) - z_q) ** 2)
        # straight-through
        z_q = ze32 + jax.lax.stop_gradient(z_q - ze32)
        z_q = z_q.astype(x.dtype)
        out = self.proj_out(z_q) if self.needs_proj else z_q
        return out, codes, commitment, codebook_loss

    def lookup(self, codes):  # codes: [B, T] -> [B, T, C_in]
        z_q = self.codebook[codes].astype(jnp.float32)
        return self.proj_out(z_q) if self.needs_proj else z_q


class ResidualVQ(nn.Module):
    """Residual VQ over `num_quantizers` codebooks (lucidrains/DAC semantics:
    each stage quantizes the residual of the previous)."""

    input_dim: int
    num_quantizers: int
    codebook_size: int
    codebook_dim: tp.Optional[int] = None
    quantizer_dropout: float = 0.0
    normalize: bool = False

    def setup(self):
        cd = self.codebook_dim or self.input_dim
        self.quantizers = [
            VectorQuantizer(self.input_dim, self.codebook_size, cd,
                            normalize=self.normalize, name=f"quantizer_{i}")
            for i in range(self.num_quantizers)
        ]

    def __call__(self, x, n_quantizers: tp.Optional[int] = None):
        """Returns (z_q, codes[B,T,Q], commitment_loss, codebook_loss)."""
        residual = x
        z_q = jnp.zeros_like(x)
        codes = []
        commit, cbl = 0.0, 0.0
        nq = self.num_quantizers if n_quantizers is None else n_quantizers
        for i, q in enumerate(self.quantizers):
            out_i, codes_i, c_i, cb_i = q(residual)
            use = 1.0 if n_quantizers is None else jnp.asarray(i < nq, x.dtype)
            z_q = z_q + use * out_i
            residual = residual - use * out_i
            codes.append(codes_i)
            commit = commit + c_i
            cbl = cbl + cb_i
        return z_q, jnp.stack(codes, axis=-1), commit, cbl

    def from_codes(self, codes):
        """codes: [B, T, Q] -> latents [B, T, C]."""
        z = 0.0
        for i, q in enumerate(self.quantizers):
            z = z + q.lookup(codes[..., i])
        return z


class RVQBottleneck(DiscreteBottleneck):
    """reference bottleneck.py:118-137.

    `decay`/`threshold_ema_dead_code`/`kmeans_init` are lucidrains EMA-update
    options accepted for config parity; codebooks here train via the
    commitment/codebook losses instead (stateless, jit-native)."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    codebook_dim: tp.Optional[int] = None
    dim: tp.Optional[int] = None  # latent dim (lucidrains kwarg name)
    decay: float = 0.99
    threshold_ema_dead_code: int = 2
    kmeans_init: bool = False
    kmeans_iters: int = 10
    tokens_id: tp.ClassVar[str] = "quantizer_indices"

    def setup(self):
        self.quantizer = ResidualVQ(
            input_dim=self.dim,
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, return_info: bool = False, **kwargs):
        z, indices, commit, cbl = self.quantizer(x)
        info = {"quantizer_indices": indices, "quantizer_loss": commit + cbl}
        return (z, info) if return_info else z

    def decode_tokens(self, codes, **kwargs):
        return self.decode(self.quantizer.from_codes(codes))


class RVQVAEBottleneck(DiscreteBottleneck):
    """VAE sample then RVQ (reference bottleneck.py:140-163)."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    codebook_dim: tp.Optional[int] = None
    dim: tp.Optional[int] = None
    tokens_id: tp.ClassVar[str] = "quantizer_indices"

    def setup(self):
        self.quantizer = ResidualVQ(
            input_dim=self.dim,
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, return_info: bool = False, sample: bool = True):
        mean, scale = jnp.split(x, 2, axis=-1)
        rng = self.make_rng("sample") if sample and self.has_rng("sample") else None
        z, kl = vae_sample(mean, scale, rng)
        z, indices, commit, cbl = self.quantizer(z)
        info = {"kl": kl, "quantizer_indices": indices, "quantizer_loss": commit + cbl}
        return (z, info) if return_info else z

    def decode_tokens(self, codes, **kwargs):
        return self.decode(self.quantizer.from_codes(codes))


class DACRVQBottleneck(DiscreteBottleneck):
    """DAC residual VQ with projections (reference bottleneck.py:166-205)."""

    input_dim: int = 64
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    tokens_id: tp.ClassVar[str] = "codes"

    def setup(self):
        self.quantizer = ResidualVQ(
            input_dim=self.input_dim,
            num_quantizers=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            normalize=True,
        )

    @property
    def num_quantizers(self):
        return self.n_codebooks

    def encode(self, x, return_info: bool = False, n_quantizers: tp.Optional[int] = None):
        info = {"pre_quantizer": x}
        if self.quantize_on_decode:
            return (x, info) if return_info else x
        z, codes, commit, cbl = self.quantizer(x, n_quantizers=n_quantizers)
        info.update(
            {
                "z": z,
                "codes": codes,
                "vq/commitment_loss": commit / self.n_codebooks,
                "vq/codebook_loss": cbl / self.n_codebooks,
            }
        )
        return (z, info) if return_info else z

    def decode(self, x):
        if self.quantize_on_decode:
            x = self.quantizer(x)[0]
        return x

    def decode_tokens(self, codes, **kwargs):
        return self.decode(self.quantizer.from_codes(codes))


class DACRVQVAEBottleneck(DiscreteBottleneck):
    """VAE sample then DAC RVQ (reference bottleneck.py:208-247)."""

    input_dim: int = 64
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    tokens_id: tp.ClassVar[str] = "codes"

    def setup(self):
        self.quantizer = ResidualVQ(
            input_dim=self.input_dim,
            num_quantizers=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            normalize=True,
        )

    @property
    def num_quantizers(self):
        return self.n_codebooks

    def encode(self, x, return_info: bool = False, n_quantizers: tp.Optional[int] = None, sample: bool = True):
        mean, scale = jnp.split(x, 2, axis=-1)
        rng = self.make_rng("sample") if sample and self.has_rng("sample") else None
        zv, kl = vae_sample(mean, scale, rng)
        info = {"pre_quantizer": zv, "kl": kl}
        if self.quantize_on_decode:
            return (zv, info) if return_info else zv
        z, codes, commit, cbl = self.quantizer(zv, n_quantizers=n_quantizers)
        info.update(
            {
                "z": z,
                "codes": codes,
                "vq/commitment_loss": commit / self.n_codebooks,
                "vq/codebook_loss": cbl / self.n_codebooks,
            }
        )
        return (z, info) if return_info else z

    def decode(self, x):
        if self.quantize_on_decode:
            x = self.quantizer(x)[0]
        return x

    def decode_tokens(self, codes, **kwargs):
        return self.decode(self.quantizer.from_codes(codes))


class FSQBottleneck(DiscreteBottleneck):
    """Finite Scalar Quantization (reference bottleneck.py:250-268).

    Each of `dim` channels is bounded with tanh and rounded to `levels`
    values; the joint index is the mixed-radix code.
    """

    dim: int = 6
    levels: int = 5
    tokens_id: tp.ClassVar[str] = "quantizer_indices"

    @property
    def num_quantizers(self):
        return 1

    @property
    def codebook_size(self):
        return self.levels**self.dim

    def _bound(self, x):
        # map to [-(L-1)/2, (L-1)/2] then round (FSQ paper formulation)
        half = (self.levels - 1) / 2.0
        return jnp.tanh(x) * half

    def encode(self, x, return_info: bool = False):
        assert x.shape[-1] == self.dim, f"FSQ expects {self.dim} channels, got {x.shape[-1]}"
        z = self._bound(x.astype(jnp.float32))
        zq = jnp.round(z)
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        half = (self.levels - 1) / 2.0
        digits = (zq + half).astype(jnp.int32)  # in [0, levels)
        radix = self.levels ** jnp.arange(self.dim)
        indices = jnp.sum(digits * radix, axis=-1)
        out = (zq / half).astype(x.dtype)  # normalized to [-1, 1]
        info = {"quantizer_indices": indices}
        return (out, info) if return_info else out

    def decode_tokens(self, tokens, **kwargs):
        half = (self.levels - 1) / 2.0
        digits = (tokens[..., None] // (self.levels ** jnp.arange(self.dim))) % self.levels
        zq = digits.astype(jnp.float32) - half
        return self.decode(zq / half)
