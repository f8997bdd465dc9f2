"""Golden math tests for the SDE multistep samplers.

Independent numpy transcriptions of the k-diffusion algorithms (the
reference's samplers, inference/sampling.py:210-228: DPM-Solver++(2M/3M) SDE
in t = -log(sigma) parameterization) are run with the EXACT noise sequence
the jitted scans consume (replicating their key-split pattern), and the
trajectories must agree. This validates the multistep history handling,
phi-coefficients, and SDE noise scaling independently of the scan plumbing —
SURVEY.md §7 'k-diffusion sampler fidelity'.
"""

import jax
import jax.numpy as jnp
import numpy as np

from friendly_stable_audio_tools_tpu.inference.sampling import (
    get_sigmas_polyexponential, sample_dpmpp_2m_sde, sample_dpmpp_3m_sde,
)

SHAPE = (2, 8, 4)


def _denoiser(x, sigma):
    # deterministic pseudo-model: contraction toward a fixed target
    return x * (1.0 / (1.0 + sigma)) + 0.1 * sigma / (1.0 + sigma)


def _extract_noises(rng, steps, shape):
    """Replicate the scans' key usage: split(rng, steps) -> per step
    split -> (k_merge, k_noise); noise = normal(k_noise, shape)."""
    keys = jax.random.split(rng, steps)
    noises = []
    for i in range(steps):
        _, k_noise = jax.random.split(keys[i])
        noises.append(np.asarray(jax.random.normal(k_noise, shape, jnp.float32)))
    return noises


def np_dpmpp_3m_sde(denoiser, x, sigmas, noises, eta=1.0, s_noise=1.0):
    x = x.astype(np.float64)
    d1 = d2 = None
    h1 = h2 = None
    for i in range(len(sigmas) - 1):
        denoised = denoiser(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
            h = s - t
            h_eta = h * (eta + 1.0)
            x = np.exp(-h_eta) * x + (-np.expm1(-h_eta)) * denoised
            if h2 is not None:
                r0, r1 = h1 / h, h2 / h
                d1_0 = (denoised - d1) / r0
                d1_1 = (d1 - d2) / r1
                d = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                dd = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = np.expm1(-h_eta) / h_eta + 1.0
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d - phi_3 * dd
            elif h1 is not None:
                r = h1 / h
                d = (denoised - d1) / r
                phi_2 = np.expm1(-h_eta) / h_eta + 1.0
                x = x + phi_2 * d
            if eta:
                x = x + noises[i] * sigmas[i + 1] * np.sqrt(-np.expm1(-2.0 * h * eta)) * s_noise
            h2, h1 = h1, h
        d2, d1 = d1, denoised
    return x


def np_dpmpp_2m_sde(denoiser, x, sigmas, noises, eta=1.0, s_noise=1.0):
    """solver_type='midpoint' variant (the k-diffusion default used by the
    reference)."""
    x = x.astype(np.float64)
    old_denoised = None
    h_last = None
    for i in range(len(sigmas) - 1):
        denoised = denoiser(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
            h = s - t
            eta_h = eta * h
            x = (sigmas[i + 1] / sigmas[i]) * np.exp(-eta_h) * x \
                + (-np.expm1(-h - eta_h)) * denoised
            if old_denoised is not None:
                r = h_last / h
                x = x + 0.5 * (-np.expm1(-h - eta_h)) * (1.0 / r) * (denoised - old_denoised)
            x = x + noises[i] * sigmas[i + 1] * np.sqrt(-np.expm1(-2.0 * eta_h)) * s_noise
            h_last = h
        old_denoised = denoised
    return x


def test_dpmpp_3m_sde_matches_numpy_reference():
    rng = jax.random.PRNGKey(42)
    steps = 12
    sigmas = np.asarray(get_sigmas_polyexponential(steps, 0.3, 50.0, 1.0), np.float64)
    x0 = np.random.RandomState(0).randn(*SHAPE).astype(np.float32)
    noises = _extract_noises(rng, steps, SHAPE)

    ref = np_dpmpp_3m_sde(_denoiser, x0.copy(), sigmas, noises)

    got = sample_dpmpp_3m_sde(
        lambda x, s: _denoiser(x, s), jnp.asarray(x0), jnp.asarray(sigmas, jnp.float32), rng)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_dpmpp_2m_sde_matches_numpy_reference():
    rng = jax.random.PRNGKey(7)
    steps = 10
    sigmas = np.asarray(get_sigmas_polyexponential(steps, 0.5, 80.0, 1.0), np.float64)
    x0 = np.random.RandomState(1).randn(*SHAPE).astype(np.float32)
    noises = _extract_noises(rng, steps, SHAPE)

    ref = np_dpmpp_2m_sde(_denoiser, x0.copy(), sigmas, noises)

    got = sample_dpmpp_2m_sde(
        lambda x, s: _denoiser(x, s), jnp.asarray(x0), jnp.asarray(sigmas, jnp.float32), rng)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_v_denoiser_matches_k_diffusion_formula():
    """make_v_denoiser == k-diffusion VDenoiser: c_skip = 1/(s^2+1),
    c_out = -s/sqrt(s^2+1), c_in = 1/sqrt(s^2+1), t = atan(s)/(pi/2)."""
    from friendly_stable_audio_tools_tpu.inference.sampling import make_v_denoiser

    calls = []

    def model(x, t):
        calls.append((np.asarray(x), np.asarray(t)))
        return 2.0 * x

    den = make_v_denoiser(model, {})
    x = np.random.RandomState(3).randn(3, 5, 2).astype(np.float32)
    for s in (0.3, 1.0, 57.0):
        got = np.asarray(den(jnp.asarray(x), s))
        c_skip = 1.0 / (s**2 + 1.0)
        c_out = -s / np.sqrt(s**2 + 1.0)
        c_in = 1.0 / np.sqrt(s**2 + 1.0)
        ref = (2.0 * c_in * x) * c_out + x * c_skip
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(calls[-1][1],
                                   np.full((3,), np.arctan(s) / np.pi * 2, np.float32),
                                   rtol=1e-6)


def test_inverse_lr_matches_reference_closed_form():
    """inverse_lr_schedule == the reference's InverseLR._get_closed_form_lr
    (training/scheduler.py:40-44): warmup * max(final_lr, base * mult),
    checked at the SAO config hyperparameters."""
    from friendly_stable_audio_tools_tpu.training.scheduler import inverse_lr_schedule

    base, inv_gamma, power, warmup, final = 5e-5, 200000.0, 0.5, 0.999, 1e-7
    sched = inverse_lr_schedule(base, inv_gamma=inv_gamma, power=power,
                                warmup=warmup, final_lr=final)
    for step in (0, 1, 10, 999, 200000, 5_000_000):
        w = 1 - warmup ** (step + 1)
        mult = (1 + step / inv_gamma) ** -power
        ref = w * max(final, base * mult)
        np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-6)


def test_ema_decay_matches_ema_pytorch_schedule():
    """ema_decay == ema_pytorch.EMA.get_current_decay: clamp(1 - (1 +
    epoch/inv_gamma)^-power, min_value, beta), epoch = clamp(step -
    update_after_step - 1, 0), 0 while epoch <= 0 (the reference trains with
    beta=0.9999, power=3/4, training/diffusion.py:53-59)."""
    from friendly_stable_audio_tools_tpu.training.ema import ema_decay

    beta, power, inv_gamma, after = 0.9999, 0.75, 1.0, 1
    for step in (0, 1, 2, 3, 10, 100, 10_000, 1_000_000):
        epoch = max(step - after - 1, 0)
        if epoch <= 0:
            ref = 0.0
        else:
            ref = min(max(1 - (1 + epoch / inv_gamma) ** -power, 0.0), beta)
        np.testing.assert_allclose(float(ema_decay(step, beta=beta, power=power,
                                                   inv_gamma=inv_gamma,
                                                   update_after_step=after)),
                                   ref, rtol=1e-6, atol=1e-9)
