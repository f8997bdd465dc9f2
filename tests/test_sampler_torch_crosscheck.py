"""Independent cross-check of the scan samplers against torch transcriptions
of k-diffusion 0.1.1 (the reference's sampler dependency, used at reference
inference/sampling.py:144-228).

Unlike tests/test_sampler_golden.py (numpy pins written from the same
source), these are line-by-line torch ports of the ORIGINAL k-diffusion
algorithms (external.VDenoiser.forward, sampling.sample_dpmpp_3m_sde /
sample_dpmpp_2m_sde / sample_heun / sample_euler), run on an identical toy
denoiser with the SAME per-step noise values the scan consumes (jax.random
keys are split exactly as inference/sampling.py does, and the resulting
arrays are fed to the torch loops in place of the Brownian sampler — PRNG
parity across frameworks is impossible, value-injection parity is exact).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from friendly_stable_audio_tools_tpu.inference.sampling import (
    get_sigmas_polyexponential,
    sample_k,
)

SHAPE = (2, 16, 4)
STEPS = 12
SIGMA_MIN, SIGMA_MAX, RHO = 0.3, 50.0, 1.0


def toy_model_jax(x, t, **kw):
    return 0.3 * jnp.sin(x) + 0.2 * t[:, None, None]


def toy_model_torch(x, t):
    return 0.3 * torch.sin(x) + 0.2 * t[:, None, None]


class VDenoiserTorch:
    """k-diffusion external.VDenoiser (v-objective wrapper)."""

    def __init__(self, inner):
        self.inner = inner

    def sigma_to_t(self, sigma):
        return sigma.atan() / math.pi * 2

    def __call__(self, x, sigma):
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / (sigma**2 + 1.0) ** 0.5
        c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
        t = self.sigma_to_t(sigma)
        ts = t.expand(x.shape[0]).clone()
        return self.inner(x * c_in, ts) * c_out + x * c_skip


def _sigmas_torch():
    s = get_sigmas_polyexponential(STEPS, SIGMA_MIN, SIGMA_MAX, RHO)
    return torch.tensor(np.asarray(s, np.float32))


def _scan_noise_values(rng, steps, shape):
    """Replicate inference/sampling.py's key consumption: split(rng, steps),
    then per step (k_merge, k_noise) = split(key); noise from k_noise."""
    keys = jax.random.split(rng, steps)
    out = []
    for i in range(steps):
        _, k_noise = jax.random.split(keys[i])
        out.append(np.asarray(jax.random.normal(k_noise, shape, jnp.float32)))
    return out


def _run_ours(sampler_type, rng):
    noise = jax.random.normal(jax.random.PRNGKey(7), SHAPE, jnp.float32)
    out = sample_k(toy_model_jax, noise, steps=STEPS, sampler_type=sampler_type,
                   sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX, rho=RHO, rng=rng)
    x0 = np.asarray(noise, np.float32) * float(np.asarray(
        get_sigmas_polyexponential(STEPS, SIGMA_MIN, SIGMA_MAX, RHO))[0])
    return np.asarray(out), torch.tensor(x0)


def sample_dpmpp_3m_sde_torch(model, x, sigmas, noises, eta=1.0, s_noise=1.0):
    """k-diffusion sampling.sample_dpmpp_3m_sde (0.1.1), noise injected."""
    denoised_1, denoised_2 = None, None
    h_1, h_2 = None, None
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -sigmas[i].log(), -sigmas[i + 1].log()
            h = s - t
            h_eta = h * (eta + 1)
            x = torch.exp(-h_eta) * x + (-h_eta).expm1().neg() * denoised
            if h_2 is not None:
                r0 = h_1 / h
                r1 = h_2 / h
                d1_0 = (denoised - denoised_1) / r0
                d1_1 = (denoised_1 - denoised_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                d = (denoised - denoised_1) / r
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                x = x + phi_2 * d
            if eta:
                x = x + noises[i] * sigmas[i + 1] * (-2 * h * eta).expm1().neg().sqrt() * s_noise
            h_1, h_2 = h, h_1
        denoised_1, denoised_2 = denoised, denoised_1
    return x


def sample_dpmpp_2m_sde_torch(model, x, sigmas, noises, eta=1.0, s_noise=1.0):
    """k-diffusion sampling.sample_dpmpp_2m_sde, solver_type='midpoint'."""
    old_denoised = None
    h_last = None
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -sigmas[i].log(), -sigmas[i + 1].log()
            h = s - t
            eta_h = eta * h
            x = sigmas[i + 1] / sigmas[i] * (-eta_h).exp() * x + (-h - eta_h).expm1().neg() * denoised
            if old_denoised is not None:
                r = h_last / h
                x = x + 0.5 * (-h - eta_h).expm1().neg() * (1 / r) * (denoised - old_denoised)
            if eta:
                x = x + noises[i] * sigmas[i + 1] * (-2 * eta_h).expm1().neg().sqrt() * s_noise
            h_last = h
        old_denoised = denoised
    return x


def sample_dpmpp_2s_ancestral_torch(model, x, sigmas, noises, eta=1.0, s_noise=1.0):
    """k-diffusion sampling.sample_dpmpp_2s_ancestral."""
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_up = torch.minimum(
            sigma_next,
            eta * (sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2) ** 0.5)
        sigma_down = (sigma_next**2 - sigma_up**2) ** 0.5
        if sigma_down == 0:
            d = (x - denoised) / sigma
            x = x + d * (sigma_down - sigma)
        else:
            t, t_next = -sigma.log(), -sigma_down.log()
            r = 1 / 2
            h = t_next - t
            s = t + r * h
            x_2 = ((-s).exp() / (-t).exp()) * x - (-r * h).expm1() * denoised
            denoised_2 = model(x_2, (-s).exp())
            x = ((-t_next).exp() / (-t).exp()) * x - (-h).expm1() * denoised_2
        if sigma_next > 0:
            x = x + noises[i] * s_noise * sigma_up
    return x


def sample_dpm_2_torch(model, x, sigmas):
    """k-diffusion sampling.sample_dpm_2, s_churn=0."""
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = (x - denoised) / sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * (sigmas[i + 1] - sigmas[i])
        else:
            sigma_mid = (sigmas[i].log() * 0.5 + sigmas[i + 1].log() * 0.5).exp()
            dt_1 = sigma_mid - sigmas[i]
            dt_2 = sigmas[i + 1] - sigmas[i]
            x_2 = x + d * dt_1
            denoised_2 = model(x_2, sigma_mid)
            d_2 = (x_2 - denoised_2) / sigma_mid
            x = x + d_2 * dt_2
    return x


def sample_heun_torch(model, x, sigmas):
    """k-diffusion sampling.sample_heun, s_churn=0."""
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = (x - denoised) / sigmas[i]
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = model(x_2, sigmas[i + 1])
            d_2 = (x_2 - denoised_2) / sigmas[i + 1]
            x = x + (d + d_2) / 2 * dt
    return x


def sample_euler_torch(model, x, sigmas):
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = (x - denoised) / sigmas[i]
        x = x + d * (sigmas[i + 1] - sigmas[i])
    return x


def _compare(ours, theirs, tol=2e-4):
    ours = np.asarray(ours, np.float32)
    theirs = theirs.numpy().astype(np.float32)
    scale = max(np.abs(theirs).max(), 1e-6)
    err = np.abs(ours - theirs).max() / scale
    assert err < tol, f"trajectory divergence: rel err {err:.2e}"


def test_dpmpp_3m_sde_matches_kdiffusion():
    rng = jax.random.PRNGKey(3)
    ours, x0 = _run_ours("dpmpp-3m-sde", rng)
    noises = [torch.tensor(n) for n in _scan_noise_values(rng, STEPS, SHAPE)]
    theirs = sample_dpmpp_3m_sde_torch(VDenoiserTorch(toy_model_torch), x0, _sigmas_torch(), noises)
    _compare(ours, theirs)


def test_dpmpp_2m_sde_matches_kdiffusion():
    rng = jax.random.PRNGKey(4)
    ours, x0 = _run_ours("dpmpp-2m-sde", rng)
    noises = [torch.tensor(n) for n in _scan_noise_values(rng, STEPS, SHAPE)]
    theirs = sample_dpmpp_2m_sde_torch(VDenoiserTorch(toy_model_torch), x0, _sigmas_torch(), noises)
    _compare(ours, theirs)


def test_heun_matches_kdiffusion():
    rng = jax.random.PRNGKey(5)
    ours, x0 = _run_ours("k-heun", rng)
    theirs = sample_heun_torch(VDenoiserTorch(toy_model_torch), x0, _sigmas_torch())
    _compare(ours, theirs)


def test_euler_matches_kdiffusion():
    rng = jax.random.PRNGKey(6)
    ours, x0 = _run_ours("k-euler", rng)
    theirs = sample_euler_torch(VDenoiserTorch(toy_model_torch), x0, _sigmas_torch())
    _compare(ours, theirs)


def test_dpmpp_2s_ancestral_matches_kdiffusion():
    rng = jax.random.PRNGKey(8)
    ours, x0 = _run_ours("k-dpmpp-2s-ancestral", rng)
    noises = [torch.tensor(n) for n in _scan_noise_values(rng, STEPS, SHAPE)]
    theirs = sample_dpmpp_2s_ancestral_torch(VDenoiserTorch(toy_model_torch), x0,
                                             _sigmas_torch(), noises)
    _compare(ours, theirs)


def test_dpm_2_matches_kdiffusion():
    rng = jax.random.PRNGKey(9)
    ours, x0 = _run_ours("k-dpm-2", rng)
    theirs = sample_dpm_2_torch(VDenoiserTorch(toy_model_torch), x0, _sigmas_torch())
    _compare(ours, theirs)
