"""Diffusion samplers as single jitted `lax.scan` loops.

Parity targets:
  * cosine alpha/sigma schedule helpers + v-diffusion DDIM `sample`
    (reference inference/sampling.py:10-114)
  * rectified-flow `sample_discrete_euler` / `sample_rf` (28-60, 236-269)
  * `sample_k`: k-diffusion VDenoiser wrapping + polyexponential sigmas +
    sampler dispatch (k-heun / k-lms / k-dpmpp-2s-ancestral / k-dpm-2 /
    k-dpm-fast / k-dpm-adaptive / dpmpp-2m-sde / dpmpp-3m-sde) with
    variation & inpainting modes (127-233). The k-diffusion algorithms are
    re-derived natively as scans (k-diffusion==0.1.1 semantics).

Design: the model function is traced ONCE; the entire step loop compiles to
one XLA program (scan), so per-step Python/host overhead is zero — this is
the main structural speedup over the reference's Python step loops.

Divergences (documented):
  * SDE/ancestral noise comes from `jax.random` splits, not torchsde Brownian
    trees; fixed seeds reproduce within this framework, not across frameworks.
  * Progress printing (reference prints iter/sec every 10 steps via CUDA
    events, sampling.py:33-56) and per-step callbacks run through
    `jax.debug.callback` from inside the compiled scan — enabled only when
    `verbose=True` / `callback` is given, so the hot path stays host-free.
"""

from __future__ import annotations

import contextlib
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# schedules (reference sampling.py:10-25)
# --------------------------------------------------------------------------


def get_alphas_sigmas(t):
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha, sigma):
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def t_to_alpha_sigma(t):
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def get_sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float, rho: float = 1.0) -> np.ndarray:
    """k-diffusion polyexponential schedule + terminal zero (host-side)."""
    ramp = np.linspace(1, 0, n) ** rho
    sigmas = np.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
    return np.append(sigmas, 0.0).astype(np.float64)


# --------------------------------------------------------------------------
# hybrid int8/bf16 schedule (TPU-only; no reference counterpart)
# --------------------------------------------------------------------------


def make_hybrid_quant_denoiser(denoiser, sigmas: np.ndarray, steps: int,
                               scale=None):
    """Run part of the trajectory in bf16 when int8 matmuls are active.

    With FSAT_INT8_MATMUL=1, FSAT_INT8_BF16_TAIL=N runs the sigma range
    covered by the LAST N steps of the polyexponential grid in bf16 (the
    low-sigma refinement steps, where quantization error lands directly in
    the output), and FSAT_INT8_BF16_HEAD=M the FIRST M steps (the largest
    denoising moves). The rest of the trajectory keeps int8's speed.

    Execution: samplers whose step loop is a plain scan split it into up to
    three UNCONDITIONAL segment scans (head bf16 / middle int8 / tail bf16,
    `SegmentedDenoiser.segments` + `_seg_scan`). This matters for speed, not
    just tidiness: with the two variants traced as branches of a per-step
    `lax.cond`, XLA cannot hoist the loop-invariant int8 WEIGHT quantization
    out of the scan (LICM stops at the conditional), so every int8 step
    re-quantized the full DiT — measured ~0.7-0.9 ms/step against plain
    int8 in the round-4 frontier (19.35x at tail-5 vs an ideal composition
    of ~19.8). Per-segment scans restore plain-int8 LICM. Samplers that
    build their own step grids (k-dpm-fast / k-dpm-adaptive, a while_loop)
    still use the per-step `lax.cond` via `SegmentedDenoiser.__call__`,
    whose thresholds compare sigma so mid-grid evaluations follow their
    step's regime. Error/speed frontier: docs/performance.md.
    """
    import os

    from ..ops.quant import quant_override

    if os.environ.get("FSAT_INT8_MATMUL") != "1":
        return denoiser
    tail = int(os.environ.get("FSAT_INT8_BF16_TAIL", "0") or 0)
    head = int(os.environ.get("FSAT_INT8_BF16_HEAD", "0") or 0)
    if tail <= 0 and head <= 0:
        return denoiser
    if tail + head >= steps:
        def all_bf16(x, sigma):
            with quant_override(False):
                return denoiser(x, sigma)

        return all_bf16

    # sigmas is a strictly decreasing HOST-side grid; step i uses sigmas[i].
    # Last N steps are sigma <= sigmas[steps-N]; first M steps are sigma >=
    # sigmas[M-1]. Thresholds sit at the MIDPOINT between adjacent grid
    # entries, so any sub-half-spacing numeric drift between this grid and
    # the values the loop actually compares (e.g. fp64 np.linspace here vs
    # the fp32 jnp grid in the scan, which can exceed a fixed 1e-6 relative
    # slack near t -> 0) cannot flip a boundary step's regime. `scale`
    # multiplies the thresholds at run time — it may be a TRACED scalar
    # (rectified-flow variation mode passes sigma_max = init_noise_level
    # inside the jitted generation program, where nothing is concretizable).
    sig = np.asarray(sigmas, np.float64)
    lo = float((sig[steps - tail] + sig[steps - tail - 1]) / 2) if tail > 0 else -np.inf
    hi = float((sig[head - 1] + sig[head]) / 2) if head > 0 else np.inf
    if scale is not None:
        lo = lo * scale if tail > 0 else -np.inf
        hi = hi * scale if head > 0 else np.inf

    def bf16_fn(x, sigma):
        with quant_override(False):
            return denoiser(x, sigma)

    def int8_fn(x, sigma):
        with quant_override(True):
            return denoiser(x, sigma)

    segments = [(bf16_fn, 0, head), (int8_fn, head, steps - tail),
                (bf16_fn, steps - tail, steps)]
    return SegmentedDenoiser(bf16_fn, int8_fn, lo, hi, segments)


class SegmentedDenoiser:
    """Hybrid int8/bf16 denoiser: callable like a plain denoiser (per-step
    `lax.cond` keyed on sigma), plus `.segments` — [(fn, start, stop)] step
    ranges — that `_seg_scan` uses to run each regime as its own
    unconditional scan (see make_hybrid_quant_denoiser)."""

    def __init__(self, bf16_fn, int8_fn, lo: float, hi: float, segments):
        self._bf16 = bf16_fn
        self._int8 = int8_fn
        self._lo = lo
        self._hi = hi
        self.segments = [(fn, a, b) for fn, a, b in segments if b > a]
        self._active = None

    def __call__(self, x, sigma):
        if self._active is not None:
            return self._active(x, sigma)
        s = jnp.asarray(sigma, jnp.float32)
        return jax.lax.cond(
            jnp.logical_or(s <= self._lo, s >= self._hi),
            lambda x: self._bf16(x, sigma), lambda x: self._int8(x, sigma), x)

    @contextlib.contextmanager
    def activate(self, fn):
        """Trace-time pin: while active, __call__ dispatches to `fn`
        unconditionally (used by _seg_scan so sampler bodies — which close
        over THIS object — trace the segment's branch without a cond)."""
        self._active = fn
        try:
            yield
        finally:
            self._active = None


def _seg_scan(denoiser, body, carry0, xs):
    """`jax.lax.scan(body, carry0, xs)`, split into per-segment scans when
    `denoiser` carries a hybrid int8/bf16 schedule. The xs arrays are sliced
    per segment, so step indices and PRNG keys are identical to the single
    scan — for single-model-call-per-step samplers the math is exactly the
    cond version's; multi-eval samplers (heun / dpm-2) key their mid-step
    evaluations on the step index rather than the mid-eval sigma."""
    segs = getattr(denoiser, "segments", None)
    if not segs:
        return jax.lax.scan(body, carry0, xs)
    carry = carry0
    for fn, a, b in segs:
        # a FRESH function object per segment: lax.scan caches traced jaxprs
        # keyed on the body's identity + avals, and the segment branch is
        # selected by trace-time state (denoiser._active) the cache cannot
        # see — reusing `body` itself would replay the first segment's trace
        # for every segment.
        def seg_body(carry, x, _body=body):
            return _body(carry, x)

        with denoiser.activate(fn):
            carry, _ = jax.lax.scan(
                seg_body, carry, jax.tree_util.tree_map(lambda t: t[a:b], xs))
    return carry, None


# --------------------------------------------------------------------------
# v-objective denoiser (k-diffusion external.VDenoiser)
# --------------------------------------------------------------------------


def make_v_denoiser(model_fn, extra_args: dict):
    """D(x, sigma) = c_out * model(c_in * x, t(sigma)) + c_skip * x."""

    def denoiser(x, sigma):
        sigma = jnp.asarray(sigma, jnp.float32)
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = jnp.arctan(sigma) / math.pi * 2
        ts = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32)
        v = model_fn((c_in * x).astype(x.dtype), ts, **extra_args).astype(jnp.float32)
        return v * c_out + x.astype(jnp.float32) * c_skip

    return denoiser


def host_callbacks_supported() -> bool:
    """Some PJRT backends (e.g. the tunneled dev 'axon' plugin) lack host
    send/recv callbacks entirely (`UNIMPLEMENTED: ... does not support host
    send/recv callbacks`) — and the ordered variant deadlocks rather than
    raising, so this is an allowlist of the standard platforms instead of a
    runtime probe (which also couldn't run under an outer jit trace).
    `FSAT_FORCE_HOST_CALLBACKS=1` overrides for new backends."""
    import os

    if os.environ.get("FSAT_FORCE_HOST_CALLBACKS") == "1":
        return True
    if jax.default_backend() not in ("cpu", "tpu", "gpu", "cuda", "rocm"):
        return False
    # the axon tunnel masquerades as platform "tpu"; its PJRT version string
    # is the only reliable discriminator
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        version = ""
    return "axon" not in version


def make_step_emitter(verbose: bool = False, callback=None,
                      total_steps: tp.Optional[int] = None):
    """Host-side per-step hook emitter (reference sampling.py:33-56 progress
    printing; k-diffusion callback convention {'x','i','sigma','denoised'}).
    Returns `emit(x, sigma, denoised)` built on ordered `jax.debug.callback`
    so it works inside the compiled scan, or None when no hook is requested
    or the backend lacks host callbacks."""
    if not verbose and callback is None:
        return None
    if not host_callbacks_supported():
        import logging

        logging.warning(
            "This JAX backend does not support host callbacks; sampler "
            "verbose/callback hooks are disabled for this run."
        )
        return None

    import time as _time

    state = {"i": 0, "t0": None, "max_sigma": None}

    def on_step(sigma, x, denoised):
        # Every run STARTS at its largest sigma and no later eval reaches it
        # again (multi-eval samplers evaluate at intermediate, smaller
        # sigmas; the adaptive solver's eval sigmas are non-monotonic but
        # bounded by sigma_max) — so an eval AT the max sigma seen marks a
        # new run of the same cached jitted program: reset the counter.
        # Counting evals (NFEs) keeps i strictly monotonic within a run.
        sig = float(np.asarray(sigma))
        if state["max_sigma"] is not None and sig >= state["max_sigma"]:
            state["i"] = 0
            state["t0"] = None
        state["max_sigma"] = sig if state["max_sigma"] is None else max(state["max_sigma"], sig)
        i = state["i"]
        state["i"] += 1
        if callback is not None:
            callback({"i": i, "sigma": float(np.asarray(sigma)),
                      "x": np.asarray(x), "denoised": np.asarray(denoised)})
        if verbose and i % 10 == 0:
            now = _time.perf_counter()
            if state["t0"] is not None:
                ips = 10.0 / max(now - state["t0"], 1e-9)
                total = f" (target {total_steps} steps)" if total_steps else ""
                print(f"sampling eval {i}{total}: {ips:.2f} iters/sec")
            state["t0"] = now

    def emit(x, sigma, denoised):
        jax.debug.callback(on_step, sigma, x, denoised, ordered=True)

    return emit


def make_step_hooked_denoiser(denoiser, verbose: bool = False, callback=None,
                              total_steps: tp.Optional[int] = None):
    """Wrap a denoiser so each call emits the step hook; identity (zero cost)
    when no hook is requested."""
    emit = make_step_emitter(verbose=verbose, callback=callback, total_steps=total_steps)
    if emit is None:
        return denoiser

    def wrapped(x, sigma):
        denoised = denoiser(x, sigma)
        emit(x, sigma, denoised)
        return denoised

    return wrapped


def make_cond_model_fn(denoiser, cond_fn):
    """Gradient guidance hook (reference sampling.py:127-135): the user's
    cond_fn(x, sigma, denoised=...) returns a gradient-like correction that is
    added as denoised + grad * sigma^2."""

    def guided(x, sigma):
        denoised = denoiser(x, sigma)
        grad = cond_fn(x, sigma, denoised=denoised)
        return denoised + grad * (jnp.asarray(sigma, jnp.float32) ** 2)

    return guided


# --------------------------------------------------------------------------
# inpainting (reference sampling.py:120-124, 175-204)
# --------------------------------------------------------------------------


def get_bmask(i, steps, mask):
    strength = (i + 1) / steps
    return jnp.where(mask <= strength, 1.0, 0.0)


def _make_inpaint_merge(init_data, mask, steps):
    """Returns merge(x, i, sigma, key) replicating the reference's mutating
    callback: x <- (init + noise*sigma) * bmask + x * (1 - bmask), applied
    after each denoise, before the integrator update."""
    if init_data is None or mask is None:
        return None

    def merge(x, i, sigma, key):
        bmask = get_bmask(i, steps, mask).astype(jnp.float32)
        input_noised = init_data + jax.random.normal(key, init_data.shape, jnp.float32) * sigma
        return input_noised * bmask + x * (1.0 - bmask)

    return merge


# --------------------------------------------------------------------------
# k-diffusion samplers as scans
# --------------------------------------------------------------------------


def _to_d(x, sigma, denoised):
    return (x - denoised) / sigma


def sample_euler(denoiser, x, sigmas, rng, merge=None):
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(x, ix):
        i, key = ix
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        # k-diffusion order: d from the PRE-merge x (the inpaint callback
        # mutates x after to_d), the integrator update from the merged x
        d = _to_d(x, sigma, denoised)
        if merge is not None:
            x = merge(x, i, sigma, key)
        x = x + d * (sigma_next - sigma)
        return x, None

    x, _ = _seg_scan(denoiser, body, x.astype(jnp.float32), (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_heun(denoiser, x, sigmas, rng, merge=None):
    """k-diffusion sample_heun with s_churn=0 (reference default)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(x, ix):
        i, key = ix
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        d = _to_d(x, sigma, denoised)  # pre-merge x, like k-diffusion
        if merge is not None:
            x = merge(x, i, sigma, key)
        dt = sigma_next - sigma
        x_euler = x + d * dt
        # second order correction unless sigma_next == 0
        x_2 = x_euler
        sigma_next_safe = jnp.maximum(sigma_next, 1e-12)
        denoised_2 = denoiser(x_2, sigma_next_safe)
        d_2 = (x_2 - denoised_2) / sigma_next_safe
        d_prime = (d + d_2) / 2
        x_heun = x + d_prime * dt
        x = jnp.where(sigma_next == 0, x_euler, x_heun)
        return x, None

    x, _ = _seg_scan(denoiser, body, x.astype(jnp.float32), (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_dpm_2(denoiser, x, sigmas, rng, merge=None):
    """k-diffusion sample_dpm_2 (midpoint in log-sigma), s_churn=0."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(x, ix):
        i, key = ix
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        d = _to_d(x, sigma, denoised)  # pre-merge x, like k-diffusion
        if merge is not None:
            x = merge(x, i, sigma, key)
        x_euler = x + d * (sigma_next - sigma)
        sigma_next_safe = jnp.maximum(sigma_next, 1e-12)
        sigma_mid = jnp.exp(jnp.log(sigma) * 0.5 + jnp.log(sigma_next_safe) * 0.5)
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_next - sigma
        x_2 = x + d * dt_1
        denoised_2 = denoiser(x_2, sigma_mid)
        d_2 = (x_2 - denoised_2) / sigma_mid
        x_mid = x + d_2 * dt_2
        x = jnp.where(sigma_next == 0, x_euler, x_mid)
        return x, None

    x, _ = _seg_scan(denoiser, body, x.astype(jnp.float32), (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_dpmpp_2s_ancestral(denoiser, x, sigmas, rng, merge=None, eta: float = 1.0, s_noise: float = 1.0):
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(x, ix):
        i, key = ix
        k_merge, k_up = jax.random.split(key)
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        if merge is not None:
            x = merge(x, i, sigma, k_merge)
        # ancestral split
        sigma_up = jnp.minimum(
            sigma_next,
            eta * jnp.sqrt(jnp.maximum(sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-20), 0.0)),
        )
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))

        # Euler branch (sigma_down == 0)
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_down - sigma)

        # DPM-Solver++(2S) branch
        sd_safe = jnp.maximum(sigma_down, 1e-12)
        t, t_next = -jnp.log(sigma), -jnp.log(sd_safe)
        r = 0.5
        h = t_next - t
        s = t + r * h
        x_2 = (jnp.exp(-s) / jnp.exp(-t)) * x - jnp.expm1(-r * h) * denoised
        denoised_2 = denoiser(x_2, jnp.exp(-s))
        x_2s = (sd_safe / sigma) * x - jnp.expm1(-h) * denoised_2

        x = jnp.where(sigma_down == 0, x_euler, x_2s)
        x = x + jax.random.normal(k_up, x.shape, jnp.float32) * s_noise * sigma_up
        return x, None

    x, _ = _seg_scan(denoiser, body, x.astype(jnp.float32), (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_lms(denoiser, x, sigmas, rng, merge=None, order: int = 4):
    """k-diffusion sample_lms; Adams-Bashforth coefficients are integrated
    host-side (the sigma grid is static) and fed to the scan as a table."""
    from scipy import integrate

    sig = np.asarray(sigmas, np.float64)
    steps = len(sig) - 1

    def lms_coeff(ord_, t, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(ord_):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod

        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    coeffs = np.zeros((steps, order), np.float32)
    for i in range(steps):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeffs[i, j] = lms_coeff(cur_order, sig, i, j)

    sigmas = jnp.asarray(sig, jnp.float32)
    coeffs_j = jnp.asarray(coeffs)

    def body(carry, ix):
        x, ds = carry  # ds: [order, ...] newest first
        i, key = ix
        sigma = sigmas[i]
        denoised = denoiser(x, sigma)
        d = _to_d(x, sigma, denoised)  # pre-merge x, like k-diffusion
        if merge is not None:
            x = merge(x, i, sigma, key)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.einsum("j,j...->...", coeffs_j[i], ds)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, jnp.float32)
    (x, _), _ = _seg_scan(denoiser, body, (x.astype(jnp.float32), ds0), (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_dpmpp_2m_sde(denoiser, x, sigmas, rng, merge=None, eta: float = 1.0, s_noise: float = 1.0):
    """k-diffusion sample_dpmpp_2m_sde, solver_type='midpoint'."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(carry, ix):
        x, old_denoised, h_last, has_old = carry
        i, key = ix
        k_merge, k_noise = jax.random.split(key)
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        if merge is not None:
            x = merge(x, i, sigma, k_merge)

        sn_safe = jnp.maximum(sigma_next, 1e-12)
        t, s = -jnp.log(sigma), -jnp.log(sn_safe)
        h = s - t
        eta_h = eta * h

        x_new = (sn_safe / sigma) * jnp.exp(-eta_h) * x + (-jnp.expm1(-h - eta_h)) * denoised
        r = h_last / h
        corr = 0.5 * (-jnp.expm1(-h - eta_h)) * (1.0 / jnp.maximum(r, 1e-12)) * (denoised - old_denoised)
        x_new = x_new + jnp.where(has_old, corr, 0.0)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        x_new = x_new + noise * sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0)) * s_noise

        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, h, jnp.asarray(True)), None

    carry0 = (x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32), jnp.asarray(1.0), jnp.asarray(False))
    (x, *_), _ = _seg_scan(denoiser, body, carry0, (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


def sample_dpmpp_3m_sde(denoiser, x, sigmas, rng, merge=None, eta: float = 1.0, s_noise: float = 1.0):
    """k-diffusion sample_dpmpp_3m_sde — the reference default for SAO
    generation (generate.py:28-31)."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    steps = len(sigmas) - 1

    def body(carry, ix):
        x, d1, d2, h1, h2, n_hist = carry
        i, key = ix
        k_merge, k_noise = jax.random.split(key)
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = denoiser(x, sigma)
        if merge is not None:
            x = merge(x, i, sigma, k_merge)

        sn_safe = jnp.maximum(sigma_next, 1e-12)
        t, s = -jnp.log(sigma), -jnp.log(sn_safe)
        h = s - t
        h_eta = h * (eta + 1.0)

        x_new = jnp.exp(-h_eta) * x + (-jnp.expm1(-h_eta)) * denoised

        # 2nd/3rd-order corrections keyed on history length
        h1_safe = jnp.where(n_hist >= 1, h1, 1.0)
        h2_safe = jnp.where(n_hist >= 2, h2, 1.0)
        r0 = h1_safe / h
        r1 = h2_safe / h
        d1_0 = (denoised - d1) / jnp.maximum(r0, 1e-12)
        d1_1 = (d1 - d2) / jnp.maximum(r1, 1e-12)
        dd1 = d1_0 + (d1_0 - d1_1) * r0 / jnp.maximum(r0 + r1, 1e-12)
        dd2 = (d1_0 - d1_1) / jnp.maximum(r0 + r1, 1e-12)
        phi_2 = jnp.expm1(-h_eta) / h_eta + 1.0
        phi_3 = phi_2 / h_eta - 0.5

        third = x_new + phi_2 * dd1 - phi_3 * dd2
        second = x_new + phi_2 * d1_0
        x_new = jnp.where(n_hist >= 2, third, jnp.where(n_hist >= 1, second, x_new))

        if eta > 0:
            noise = jax.random.normal(k_noise, x.shape, jnp.float32)
            x_new = x_new + noise * sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h * eta), 0.0)) * s_noise

        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, d1, h, h1, jnp.minimum(n_hist + 1, 3)), None

    carry0 = (
        x.astype(jnp.float32),
        jnp.zeros_like(x, jnp.float32),
        jnp.zeros_like(x, jnp.float32),
        jnp.asarray(1.0),
        jnp.asarray(1.0),
        jnp.asarray(0),
    )
    (x, *_), _ = _seg_scan(denoiser, body, carry0, (jnp.arange(steps), jax.random.split(rng, steps)))
    return x


# --------------------------------------------------------------------------
# DPM-Solver fast / adaptive (k-diffusion DPMSolver semantics)
# --------------------------------------------------------------------------


def _dpm_solver_steps(denoiser):
    """DPM-Solver in t = -log(sigma) parameterization (k-diffusion)."""

    def sigma(t):
        return jnp.exp(-t)

    def eps_at(x, t):
        return (x - denoiser(x, sigma(t))) / sigma(t)

    def step1(x, t, t_next, eps):
        h = t_next - t
        return x - sigma(t_next) * jnp.expm1(h) * eps

    def step2(x, t, t_next, eps, r1=0.5, eps_r1=None):
        h = t_next - t
        s1 = t + r1 * h
        if eps_r1 is None:
            u1 = x - sigma(s1) * jnp.expm1(r1 * h) * eps
            eps_r1 = eps_at(u1, s1)
        x2 = x - sigma(t_next) * jnp.expm1(h) * eps \
            - sigma(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)
        return x2

    def step3(x, t, t_next, eps, r1=1 / 3, r2=2 / 3, eps_r1=None):
        h = t_next - t
        s1 = t + r1 * h
        s2 = t + r2 * h
        if eps_r1 is None:
            u1 = x - sigma(s1) * jnp.expm1(r1 * h) * eps
            eps_r1 = eps_at(u1, s1)
        u2 = x - sigma(s2) * jnp.expm1(r2 * h) * eps \
            - sigma(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps)
        eps_r2 = eps_at(u2, s2)
        x3 = x - sigma(t_next) * jnp.expm1(h) * eps \
            - sigma(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps)
        return x3

    return sigma, eps_at, step1, step2, step3


def sample_dpm_fast(denoiser, x, rng, sigma_min: float, sigma_max: float, n: int, merge=None):
    """k-diffusion sample_dpm_fast: fixed-NFE DPM-Solver with order-3 segments
    (+ a lower-order tail), t = -log(sigma) grid. eta=0 (reference default)."""
    import math as _math

    sigma_fn, eps_at, step1, step2, step3 = _dpm_solver_steps(denoiser)
    t_start = -_math.log(sigma_max)
    t_end = -_math.log(sigma_min)
    m = _math.floor(n / 3) + 1
    ts = np.linspace(t_start, t_end, m + 1)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    x = x.astype(jnp.float32)
    keys = jax.random.split(rng, m)
    # scan over the uniform order-3 prefix, unroll the short tail
    n3 = sum(1 for o in orders if o == 3)
    if n3 > 0:
        t3 = jnp.asarray(np.stack([ts[:n3], ts[1 : n3 + 1]], 1), jnp.float32)

        def body(x, ix):
            t_pair, i, key = ix
            t, t_next = t_pair[0], t_pair[1]
            eps = eps_at(x, t)
            if merge is not None:
                # reference: the inpaint callback mutates x after the eps
                # eval, before the solver step (k-diffusion info_callback)
                x = merge(x, i, sigma_fn(t), key)
            return step3(x, t, t_next, eps), None

        x, _ = jax.lax.scan(body, x, (t3, jnp.arange(n3), keys[:n3]))
    for i in range(n3, m):
        t, t_next = float(ts[i]), float(ts[i + 1])
        eps = eps_at(x, jnp.asarray(t))
        if merge is not None:
            x = merge(x, jnp.asarray(i), sigma_fn(jnp.asarray(t)), keys[i])
        if orders[i] == 1:
            x = step1(x, jnp.asarray(t), jnp.asarray(t_next), eps)
        elif orders[i] == 2:
            x = step2(x, jnp.asarray(t), jnp.asarray(t_next), eps)
        else:
            x = step3(x, jnp.asarray(t), jnp.asarray(t_next), eps)
    # final denoise at sigma_min like the reference grid's endpoint
    return x


def sample_dpm_adaptive(denoiser, x, rng, sigma_min: float, sigma_max: float,
                        rtol: float = 0.01, atol: float = 0.01, h_init: float = 0.05,
                        pcoeff: float = 0.0, icoeff: float = 1.0, dcoeff: float = 0.0,
                        accept_safety: float = 0.81, max_steps: int = 200, merge=None):
    """k-diffusion sample_dpm_adaptive: embedded DPM-Solver-(2,3) with a PID
    step-size controller, as a lax.while_loop.

    Like k-diffusion, integration stops after max_steps iterations even if
    t_end was not reached (a static bound is required for the compiled
    while_loop); with pathologically tight tolerances the result is then
    under-integrated — raise max_steps or loosen rtol/atol."""
    import math as _math

    merge_rng = rng

    sigma_fn, eps_at, step1, step2, step3 = _dpm_solver_steps(denoiser)
    t_start = -_math.log(sigma_max)
    t_end = -_math.log(sigma_min)
    order = 3

    def norm(a):
        return jnp.sqrt(jnp.mean(jnp.square(a)))

    # PID coefficients (k-diffusion PIDStepSizeController)
    b1 = (pcoeff + icoeff + dcoeff) / order
    b2 = -(pcoeff + 2 * dcoeff) / order
    b3 = dcoeff / order

    def cond(carry):
        x, x_prev, s, h, e1, e2, e3, steps = carry
        return (s < t_end - 1e-5) & (steps < max_steps)

    def body(carry):
        x, x_prev, s, h, e1, e2, e3, steps = carry
        t = jnp.minimum(t_end, s + h)
        eps = eps_at(x, s)
        # k-diffusion's embedded (2,3) pair: the low-order solution uses
        # r1=1/3 so its midpoint eval is SHARED with the order-3 solution
        # (3 NFE per iteration, not 4)
        h_cur = t - s
        s1 = s + h_cur / 3.0
        u1 = x - sigma_fn(s1) * jnp.expm1(h_cur / 3.0) * eps
        eps_r1 = eps_at(u1, s1)
        x_low = step2(x, s, t, eps, r1=1.0 / 3.0, eps_r1=eps_r1)
        x_high = step3(x, s, t, eps, eps_r1=eps_r1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = norm((x_low - x_high) / delta)
        inv_err = 1.0 / (1e-8 + error)
        # first iteration: seed history with the current error
        first = steps == 0
        h1 = jnp.where(first, inv_err, e1)
        h2 = jnp.where(first, inv_err, e2)
        factor = inv_err**b1 * h1**b2 * h2**b3
        factor = 1 + jnp.arctan(factor - 1)  # the controller's soft limiter
        accept = factor >= accept_safety
        x_acc = x_high
        if merge is not None:
            # reference applies the inpaint callback after each ACCEPTED step
            x_acc = merge(x_high, steps, sigma_fn(t), jax.random.fold_in(merge_rng, steps))
        new_x = jnp.where(accept, x_acc, x)
        new_x_prev = jnp.where(accept, x_low, x_prev)
        new_s = jnp.where(accept, t, s)
        # error history rotates only on accept
        ne1 = jnp.where(accept, inv_err, e1)
        ne2 = jnp.where(accept, h1, e2)
        ne3 = jnp.where(accept, h2, e3)
        new_h = jnp.clip(h * factor, 1e-4, abs(t_end - t_start))
        return (new_x, new_x_prev, new_s, new_h, ne1, ne2, ne3, steps + 1)

    carry0 = (x.astype(jnp.float32), x.astype(jnp.float32),
              jnp.asarray(t_start, jnp.float32), jnp.asarray(h_init, jnp.float32),
              jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
              jnp.asarray(1.0, jnp.float32), jnp.asarray(0, jnp.int32))
    x, *_ = jax.lax.while_loop(cond, body, carry0)
    return x


_K_SAMPLERS = {
    "k-euler": sample_euler,
    "k-heun": sample_heun,
    "k-lms": sample_lms,
    "k-dpmpp-2s-ancestral": sample_dpmpp_2s_ancestral,
    "k-dpm-2": sample_dpm_2,
    "dpmpp-2m-sde": sample_dpmpp_2m_sde,
    "dpmpp-3m-sde": sample_dpmpp_3m_sde,
}


def sample_k(
    model_fn,
    noise,
    init_data=None,
    mask=None,
    steps: int = 100,
    sampler_type: str = "dpmpp-2m-sde",
    sigma_min: float = 0.5,
    sigma_max: float = 50.0,
    rho: float = 1.0,
    rng: tp.Optional[jax.Array] = None,
    cond_fn=None,
    callback=None,
    verbose: bool = False,
    disable_tqdm: bool = False,
    device=None,
    **extra_args,
):
    """reference inference/sampling.py:144-233. `rng` replaces torch's global
    generator; `device`/`disable_tqdm` accepted for API parity. `verbose`
    prints iters/sec every 10 steps; `callback` is invoked per step with
    {'x','i','sigma','denoised'} (host-side, via jax.debug.callback)."""
    if sampler_type not in _K_SAMPLERS and sampler_type not in ("k-dpm-fast", "k-dpm-adaptive"):
        raise ValueError(f"Unknown sampler type {sampler_type}")
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    sigmas = get_sigmas_polyexponential(steps, sigma_min, sigma_max, rho)

    denoiser = make_v_denoiser(model_fn, extra_args)
    if cond_fn is not None:
        denoiser = make_cond_model_fn(denoiser, cond_fn)
    denoiser = make_step_hooked_denoiser(denoiser, verbose=verbose, callback=callback,
                                         total_steps=steps)
    # hybrid int8/bf16 schedule, applied OUTERMOST so its `.segments`
    # metadata reaches the sampler's _seg_scan (each segment branch wraps
    # the hooked/cond denoiser). For k-dpm-fast/-adaptive (which build their
    # own step grids) the per-step cond thresholds still come from this
    # polyexponential grid — "last N steps" means that grid's sigma range.
    denoiser = make_hybrid_quant_denoiser(denoiser, sigmas, steps)
    noise = noise.astype(jnp.float32) * float(sigmas[0])

    merge = None
    if mask is None and init_data is not None:
        x = init_data.astype(jnp.float32) + noise  # VARIATION
    elif mask is not None and init_data is not None:
        bmask = get_bmask(0, steps, mask).astype(jnp.float32)  # INPAINTING
        input_noised = init_data.astype(jnp.float32) + noise
        x = input_noised * bmask + noise * (1.0 - bmask)
        merge = _make_inpaint_merge(init_data.astype(jnp.float32), mask, steps)
    else:
        x = noise

    if sampler_type == "k-dpm-fast":
        # the reference passes (sigma_min, sigma_max, n) rather than a grid
        return sample_dpm_fast(denoiser, x, rng, sigma_min, sigma_max, steps, merge=merge)
    if sampler_type == "k-dpm-adaptive":
        return sample_dpm_adaptive(denoiser, x, rng, sigma_min, sigma_max,
                                   rtol=0.01, atol=0.01, merge=merge)

    return _K_SAMPLERS[sampler_type](denoiser, x, sigmas, rng, merge=merge)


# --------------------------------------------------------------------------
# v-diffusion DDIM and rectified flow (reference sampling.py:28-114, 236-269)
# --------------------------------------------------------------------------


def sample(model_fn, x, steps: int, eta: float = 0.0, rng: tp.Optional[jax.Array] = None,
           verbose: bool = False, callback=None, **extra_args):
    """DDIM for v-objective models (reference sampling.py:63-114)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    t_grid = jnp.linspace(1, 0, steps + 1)
    t = t_grid[:-1]
    alphas, sigmas = get_alphas_sigmas(t)

    emit = make_step_emitter(verbose=verbose, callback=callback, total_steps=steps)

    # hybrid int8/bf16 schedule applies to every sampler family, keyed on the
    # step's (decreasing) scalar t — not just sample_k's sigma grid. The
    # host-side grid only anchors MIDPOINT thresholds (see
    # make_hybrid_quant_denoiser), so fp64-vs-fp32 linspace drift is
    # harmless; under jit the jnp grid is a tracer and unusable here.
    model_call = make_hybrid_quant_denoiser(
        lambda xx, tc: model_fn(
            xx, jnp.full((xx.shape[0],), tc, jnp.float32), **extra_args),
        np.linspace(1.0, 0.0, steps + 1), steps)

    def body(carry, ix):
        x, _ = carry
        i, key = ix
        v = model_call(x.astype(jnp.float32), t[i]).astype(jnp.float32)
        pred = x * alphas[i] - v * sigmas[i]
        if emit is not None:
            emit(x, sigmas[i], pred)
        eps = x * sigmas[i] + v * alphas[i]

        # next-step recombination (skipped on the final step)
        a_next = jnp.where(i < steps - 1, alphas[i + 1], alphas[i])
        s_next = jnp.where(i < steps - 1, sigmas[i + 1], sigmas[i])
        ddim_sigma = eta * jnp.sqrt(s_next**2 / jnp.maximum(sigmas[i] ** 2, 1e-20)) * jnp.sqrt(
            jnp.maximum(1 - alphas[i] ** 2 / jnp.maximum(a_next**2, 1e-20), 0.0)
        )
        adjusted_sigma = jnp.sqrt(jnp.maximum(s_next**2 - ddim_sigma**2, 0.0))
        x_next = pred * a_next + eps * adjusted_sigma
        if eta:
            x_next = x_next + jax.random.normal(key, x.shape, jnp.float32) * ddim_sigma
        x = jnp.where(i < steps - 1, x_next, x)
        return (x, pred), None

    x0 = x.astype(jnp.float32)
    (_, pred), _ = _seg_scan(
        model_call, body, (x0, jnp.zeros_like(x0)),
        (jnp.arange(steps), jax.random.split(rng, steps)),
    )
    return pred


def sample_discrete_euler(model_fn, x, steps: int, sigma_max: float = 1.0, verbose: bool = False,
                          callback=None, **extra_args):
    """Euler for rectified flow (reference sampling.py:28-60): linspace
    sigma_max -> 0, x += dt * model(x, t)."""
    t = jnp.linspace(sigma_max, 0, steps + 1)

    emit = make_step_emitter(verbose=verbose, callback=callback, total_steps=steps)

    # hybrid int8/bf16 schedule (FSAT_INT8_BF16_TAIL/HEAD) keyed on the
    # decreasing rectified-flow t grid, same mechanism as sample_k. The
    # grid is RELATIVE (linspace 1 -> 0) with thresholds scaled by
    # sigma_max at run time: in variation mode sigma_max is a traced value
    # inside the jitted generation program and cannot be concretized.
    model_call = make_hybrid_quant_denoiser(
        lambda xx, tc: model_fn(
            xx, jnp.full((xx.shape[0],), tc, jnp.float32), **extra_args),
        np.linspace(1.0, 0.0, steps + 1), steps, scale=sigma_max)

    def body(x, i):
        t_curr, t_prev = t[i], t[i + 1]
        dt = t_prev - t_curr
        v = model_call(x.astype(jnp.float32), t_curr).astype(jnp.float32)
        if emit is not None:
            # k-diffusion convention: 'denoised' is the clean prediction.
            # For rectified flow x_t = (1-t)x0 + t*noise, v = noise - x0,
            # so x0 = x - t*v (NOT the raw velocity).
            emit(x, t_curr, x - t_curr * v)
        x = x + dt * v
        return x, None

    x, _ = _seg_scan(model_call, body, x.astype(jnp.float32), jnp.arange(steps))
    return x


def sample_rf(model_fn, noise, init_data=None, steps: int = 100, sigma_max: float = 1.0,
              rng: tp.Optional[jax.Array] = None, cond_fn=None, callback=None,
              verbose: bool = False, disable_tqdm: bool = False, device=None, **extra_args):
    """reference sampling.py:236-269."""
    if sigma_max > 1:
        sigma_max = 1
    if init_data is not None:
        x = init_data.astype(jnp.float32) * (1 - sigma_max) + noise.astype(jnp.float32) * sigma_max
    else:
        x = noise
    return sample_discrete_euler(model_fn, x, steps, sigma_max, verbose=verbose,
                                 callback=callback, **extra_args)
