"""Per-step sampler hooks: verbose iters/sec printing and the k-diffusion
callback convention (reference sampling.py:33-56; gradio.py:143-153)."""

import jax
import jax.numpy as jnp
import numpy as np

from friendly_stable_audio_tools_tpu.inference.sampling import sample_k, sample_rf


def _toy_model(x, t, **kw):
    return -0.1 * x


def test_sample_k_callback_fires_per_step():
    infos = []
    noise = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 4)), jnp.float32)
    out = sample_k(_toy_model, noise, steps=8, sampler_type="dpmpp-3m-sde",
                   sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(0),
                   callback=infos.append)
    jax.block_until_ready(out)
    assert len(infos) == 8
    assert [i["i"] for i in infos] == list(range(8))
    # sigmas decrease along the schedule
    sig = [i["sigma"] for i in infos]
    assert all(a > b for a, b in zip(sig, sig[1:]))
    assert infos[0]["denoised"].shape == (1, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_k_callback_counter_resets_between_runs():
    infos = []
    noise = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 2)), jnp.float32)

    @jax.jit
    def gen(noise, key):
        return sample_k(_toy_model, noise, steps=4, sampler_type="dpmpp-2m-sde",
                        sigma_min=0.3, sigma_max=10.0, rng=key, callback=infos.append)

    jax.block_until_ready(gen(noise, jax.random.PRNGKey(0)))
    jax.block_until_ready(gen(noise, jax.random.PRNGKey(1)))
    assert [i["i"] for i in infos] == [0, 1, 2, 3, 0, 1, 2, 3]


def test_sample_k_verbose_prints(capfd):
    noise = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 2)), jnp.float32)
    out = sample_k(_toy_model, noise, steps=21, sampler_type="k-euler",
                   sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(0),
                   verbose=True)
    jax.block_until_ready(out)
    captured = capfd.readouterr()
    assert "iters/sec" in captured.out


def test_sample_k_no_hooks_unchanged():
    noise = jnp.asarray(np.random.default_rng(3).standard_normal((1, 8, 2)), jnp.float32)
    a = sample_k(_toy_model, noise, steps=4, sampler_type="dpmpp-3m-sde",
                 sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(0))
    infos = []
    b = sample_k(_toy_model, noise, steps=4, sampler_type="dpmpp-3m-sde",
                 sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(0),
                 callback=infos.append)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sample_rf_callback():
    infos = []
    noise = jnp.asarray(np.random.default_rng(4).standard_normal((1, 8, 2)), jnp.float32)
    out = sample_rf(_toy_model, noise, steps=5, rng=jax.random.PRNGKey(0),
                    callback=infos.append)
    jax.block_until_ready(out)
    assert len(infos) == 5


def test_sample_rf_callback_denoised_is_x0_not_velocity():
    """k-diffusion convention: info['denoised'] is the clean prediction.
    For rectified flow that is x - t*v (regression: the hook used to emit
    the raw velocity as both 'x' and 'denoised')."""
    infos = []
    noise = jnp.asarray(np.random.default_rng(7).standard_normal((1, 8, 2)), jnp.float32)
    out = sample_rf(_toy_model, noise, steps=4, rng=jax.random.PRNGKey(0),
                    callback=infos.append)
    jax.block_until_ready(out)
    for info in infos:
        x = np.asarray(info["x"], np.float64)
        t = info["sigma"]
        v = -0.1 * x  # the toy model's velocity
        np.testing.assert_allclose(np.asarray(info["denoised"], np.float64),
                                   x - t * v, rtol=1e-5, atol=1e-6)
        # x and denoised must be distinct arrays (t > 0 and v != 0)
        assert np.abs(np.asarray(info["denoised"]) - x).max() > 0


def test_multi_eval_sampler_counter_monotonic_across_runs():
    """Multi-eval samplers (heun: 2 NFEs/step) must produce strictly
    increasing i within a run and reset between runs (the counter used to
    wrap at total_steps mid-run)."""
    noise = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 4)), jnp.float32)
    for run in range(2):
        infos = []
        out = sample_k(_toy_model, noise, steps=4, sampler_type="k-heun",
                       sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(run),
                       callback=infos.append)
        jax.block_until_ready(out)
        idx = [i["i"] for i in infos]
        assert idx[0] == 0, f"run {run}: counter did not reset ({idx[:3]}...)"
        assert idx == sorted(idx) and len(set(idx)) == len(idx), idx
