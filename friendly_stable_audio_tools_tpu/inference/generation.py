"""Generation drivers.

Parity target: reference `inference/generation.py:12-290` —
`generate_diffusion_uncond`, `generate_diffusion_cond` (conditioner eval,
seeded noise, init-audio prep + encode, outpaint cut-and-paste + soft mask,
variation mode via sigma_max=init_noise_level, sampler dispatch, pretransform
decode), and the Hann-softened `build_mask`.

TPU notes: the conditioner tokenization happens host-side; everything from
noise to decoded audio runs as compiled XLA (the sampler is one scan). The
reference disables TF32 for determinism (generation.py:165-168); here fp32
math inside the sampler is the default and results are deterministic per
(seed, shapes, chip count).

Public array layout is [B, C, T] to match the reference API.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import sample_k, sample_rf
from .utils import prepare_audio
from ..utils.trace_flags import trace_env_key as _trace_env_key


def _resolve_seed(seed: int) -> int:
    return int(seed) if seed != -1 else int(np.random.randint(0, 2**31 - 1))


def _static_sampler_key(sampler_kwargs: dict):
    """Hashable cache key for sampler kwargs, or None if any value is not a
    plain static (callbacks, guidance fns) — those run the eager path."""
    items = []
    for k, v in sorted(sampler_kwargs.items()):
        if not isinstance(v, (int, float, str, bool, type(None))):
            return None
        items.append((k, v))
    return tuple(items)



def _jit_cached(model, key, build):
    """One cached jitted callable per (model, static config). The sampler
    scan MUST run under jit: eager lax.scan dispatches the whole DiT body
    op-by-op per step (measured ~400x slower over the TPU dispatch path for
    the chunked VAE scan; the 100-step denoise scan is the same shape of
    problem). Params are jit arguments, never closed-over constants."""
    key = (key, _trace_env_key())
    cache = getattr(model, "_gen_jit_cache", None)
    if cache is None:
        cache = {}
        try:
            model._gen_jit_cache = cache
        except Exception:
            return jax.jit(build())
    if key not in cache:
        cache[key] = jax.jit(build())
    return cache[key]


def _pretransform_in_jit(model):
    """AutoencoderPretransform decodes inside the jitted program with its
    params passed explicitly; other pretransforms decode outside."""
    from ..models.pretransforms import AutoencoderPretransform

    return isinstance(model.pretransform, AutoencoderPretransform)


def generate_diffusion_uncond(
    model,
    steps: int = 250,
    batch_size: int = 1,
    sample_size: int = 2097152,
    seed: int = -1,
    device=None,
    init_audio: tp.Optional[tp.Tuple[int, np.ndarray]] = None,
    init_noise_level: float = 1.0,
    return_latents: bool = False,
    disable_tqdm: bool = False,
    callback=None,
    verbose: bool = False,
    **sampler_kwargs,
):
    """reference generation.py:12-91. Returns [B, C, T]."""
    audio_sample_size = sample_size
    if model.pretransform is not None:
        sample_size //= model.pretransform.downsampling_ratio

    seed = _resolve_seed(seed)
    key = jax.random.PRNGKey(seed)
    k_noise, k_sampler = jax.random.split(key)

    # noise drawn immediately after seeding (parity: generation.py:158-163)
    noise = jax.random.normal(k_noise, (batch_size, sample_size, model.io_channels), jnp.float32)

    init_latent = None
    if init_audio is not None:
        in_sr, init_audio_arr = init_audio
        io_channels = model.io_channels
        if model.pretransform is not None:
            io_channels = model.pretransform.io_channels
        prepared = prepare_audio(
            init_audio_arr, in_sr=in_sr, target_sr=model.sample_rate,
            target_length=audio_sample_size, target_channels=io_channels,
        )
        prepared = jnp.asarray(prepared).transpose(0, 2, 1)  # -> [1, T, C]
        if model.pretransform is not None:
            prepared = model.pretransform.encode_nwc(prepared)
        init_latent = jnp.repeat(prepared, batch_size, axis=0)
        sampler_kwargs["sigma_max"] = init_noise_level

    if model.diffusion_objective == "rectified_flow":
        # sample_rf consumes only sigma_max; k-sampler kwargs would leak into
        # model_fn via **extra_args and crash (same pop as the cond path)
        for k_ in ("sigma_min", "sampler_type", "rho"):
            sampler_kwargs.pop(k_, None)

    skey = _static_sampler_key(sampler_kwargs)
    pt_in_jit = _pretransform_in_jit(model) and not return_latents

    hooks = {}
    if callback is not None or verbose:
        model._gen_step_callback = callback
        hooks = {
            "verbose": verbose,
            "callback": (lambda info: model._gen_step_callback(info)) if callback is not None else None,
        }

    def build():
        def run(params, pt_params, noise, init_latent, key):
            def model_fn(x, t):
                return model.forward(params, x, t)

            if model.diffusion_objective == "v":
                out = sample_k(model_fn, noise, init_latent, None, steps, rng=key,
                               **hooks, **sampler_kwargs)
            elif model.diffusion_objective == "rectified_flow":
                out = sample_rf(model_fn, noise, init_data=init_latent, steps=steps, rng=key,
                                **hooks, **sampler_kwargs)
            else:
                raise RuntimeError(f"No such sampling mode: '{model.diffusion_objective}'")
            if pt_in_jit:
                out = model.pretransform.decode_nwc(out, params=pt_params)
            return out

        return run

    if skey is None:
        sampled = build()(model.params, None if not pt_in_jit else model.pretransform.model.params,
                          noise, init_latent, k_sampler)
    else:
        fn = _jit_cached(model, ("uncond", steps, bool(return_latents), bool(verbose),
                                 callback is not None, skey), build)
        pt_params = model.pretransform.model.params if pt_in_jit else None
        sampled = fn(model.params, pt_params, noise, init_latent, k_sampler)

    if model.pretransform is not None and not return_latents and not pt_in_jit:
        sampled = model.pretransform.decode_nwc(sampled)
    return sampled.transpose(0, 2, 1)


def generate_diffusion_cond(
    model,
    steps: int = 250,
    cfg_scale: float = 6.0,
    conditioning: tp.Optional[tp.List[tp.Dict[str, tp.Any]]] = None,
    conditioning_tensors: tp.Optional[dict] = None,
    negative_conditioning: tp.Optional[tp.List[tp.Dict[str, tp.Any]]] = None,
    negative_conditioning_tensors: tp.Optional[dict] = None,
    sample_size: int = 2097152,
    seed: int = -1,
    device=None,
    init_audio: tp.Optional[tp.Tuple[int, np.ndarray]] = None,
    init_noise_level: float = 1.0,
    mask_args: tp.Optional[dict] = None,
    return_latents: bool = False,
    disable_tqdm: bool = False,
    scale_phi: float = 0.0,
    callback=None,
    verbose: bool = False,
    **sampler_kwargs,
):
    """Text(-and-more)-to-audio (reference generation.py:94-261).

    Returns [B, C, T] audio (or latents if return_latents). `callback` is
    invoked per sampler step with {'x','i','sigma','denoised'} (latent-space
    arrays, host-side — reference gradio.py:143-153 preview path); `verbose`
    prints iters/sec every 10 steps (reference sampling.py:33-56).
    """
    audio_sample_size = sample_size
    if model.pretransform is not None:
        sample_size //= model.pretransform.downsampling_ratio

    assert conditioning is not None or conditioning_tensors is not None, \
        "Must provide either conditioning or conditioning_tensors"
    if conditioning_tensors is None:
        conditioning_tensors = model.conditioner(conditioning)
    conditioning_inputs = model.get_conditioning_inputs(conditioning_tensors)

    negative_inputs = {}
    if negative_conditioning is not None or negative_conditioning_tensors is not None:
        if negative_conditioning_tensors is None:
            negative_conditioning_tensors = model.conditioner(negative_conditioning)
        negative_inputs = model.get_conditioning_inputs(negative_conditioning_tensors, negative=True)

    num_sample = list(conditioning_tensors.values())[0][0].shape[0]

    seed = _resolve_seed(seed)
    key = jax.random.PRNGKey(seed)
    k_noise, k_sampler = jax.random.split(key)
    noise = jax.random.normal(k_noise, (num_sample, sample_size, model.io_channels), jnp.float32)

    init_latent = None
    init_prepared = None  # raw prepared audio, encoded INSIDE the jitted program
    mask = None
    cutpaste_idx = None
    if init_audio is not None:
        in_sr, init_audio_arr = init_audio
        io_channels = model.io_channels
        if model.pretransform is not None:
            io_channels = model.pretransform.io_channels
        prepared = prepare_audio(
            init_audio_arr, in_sr=in_sr, target_sr=model.sample_rate,
            target_length=audio_sample_size, target_channels=io_channels,
        )
        prepared = jnp.asarray(prepared).transpose(0, 2, 1)
        if model.pretransform is not None and _pretransform_in_jit(model):
            # AutoencoderPretransform: fuse encode + repeat + cut-paste into
            # the jitted program (one compiled call instead of a separate
            # encode jit + ~4 eager device ops over the tunnel)
            init_prepared = prepared
        else:
            if model.pretransform is not None:
                prepared = model.pretransform.encode_nwc(prepared)
            init_latent = jnp.repeat(prepared, num_sample, axis=0)  # [B, L, C]

        if mask_args is not None:
            # outpaint cut-and-paste (reference generation.py:195-213)
            cropfrom = math.floor(mask_args["cropfrom"] / 100.0 * sample_size)
            pastefrom = math.floor(mask_args["pastefrom"] / 100.0 * sample_size)
            pasteto = math.ceil(mask_args["pasteto"] / 100.0 * sample_size)
            assert pastefrom < pasteto, "Paste From should be less than Paste To"
            croplen = pasteto - pastefrom
            if cropfrom + croplen > sample_size:
                croplen = sample_size - cropfrom
            cropto = cropfrom + croplen
            pasteto = pastefrom + croplen
            cutpaste_idx = (cropfrom, cropto, pastefrom, pasteto)
            if init_latent is not None:
                cutpaste = jnp.zeros_like(init_latent)
                cutpaste = cutpaste.at[:, pastefrom:pasteto, :].set(init_latent[:, cropfrom:cropto, :])
                init_latent = cutpaste
            mask = build_mask(sample_size, mask_args)[None, :, None]  # [1, L, 1]
        else:
            sampler_kwargs["sigma_max"] = init_noise_level

    common = dict(conditioning_inputs)
    common.update(negative_inputs)

    if model.diffusion_objective == "rectified_flow":
        # reference deletes only sigma_min/sampler_type (generation.py:236-239)
        # — sigma_max MUST survive: it carries init_noise_level for variation
        # mode (sample_rf starts at x = init*(1-s) + noise*s with s=sigma_max)
        for k_ in ("sigma_min", "sampler_type", "rho"):
            sampler_kwargs.pop(k_, None)

    skey = _static_sampler_key(sampler_kwargs)
    pt_in_jit = _pretransform_in_jit(model) and not return_latents

    # step hooks: the jitted program embeds a STABLE trampoline that reads the
    # current callback from the model object, so swapping callbacks (gradio
    # builds a fresh closure per generation) reuses the compiled program
    hooks = {}
    if callback is not None or verbose:
        model._gen_step_callback = callback
        hooks = {
            "verbose": verbose,
            "callback": (lambda info: model._gen_step_callback(info)) if callback is not None else None,
        }

    def build():
        def run(params, pt_params, noise, init_latent, init_prepared, mask, common, key):
            def model_fn(x, t, **cond_kwargs):
                return model.model_fn(params, x, t, **cond_kwargs)

            if init_prepared is not None:
                lat = model.pretransform.encode_nwc(init_prepared, params=pt_params)
                lat = jnp.repeat(lat, num_sample, axis=0)
                if cutpaste_idx is not None:
                    cf, ct, pf, pt = cutpaste_idx
                    lat = jnp.zeros_like(lat).at[:, pf:pt, :].set(lat[:, cf:ct, :])
                init_latent = lat

            if model.diffusion_objective == "v":
                out = sample_k(
                    model_fn, noise, init_latent, mask, steps,
                    rng=key, cfg_scale=cfg_scale, batch_cfg=True, rescale_cfg=True,
                    scale_phi=scale_phi, **hooks, **sampler_kwargs, **common,
                )
            else:
                out = sample_rf(
                    model_fn, noise, init_data=init_latent, steps=steps,
                    rng=key, cfg_scale=cfg_scale, batch_cfg=True, rescale_cfg=True,
                    scale_phi=scale_phi, **hooks, **sampler_kwargs, **common,
                )
            if pt_in_jit:
                out = model.pretransform.decode_nwc(out, params=pt_params)
            return out

        return run

    pt_params = (model.pretransform.model.params
                 if (pt_in_jit or init_prepared is not None) else None)
    if skey is None:
        sampled = build()(model.params, pt_params, noise, init_latent, init_prepared,
                          mask, common, k_sampler)
    else:
        fn = _jit_cached(
            model, ("cond", steps, float(cfg_scale), float(scale_phi),
                    bool(return_latents), bool(verbose), callback is not None,
                    init_prepared is not None, cutpaste_idx, skey), build)
        sampled = fn(model.params, pt_params, noise, init_latent, init_prepared,
                     mask, common, k_sampler)

    if model.pretransform is not None and not return_latents and not pt_in_jit:
        sampled = model.pretransform.decode_nwc(sampled)
    return sampled.transpose(0, 2, 1)


def build_mask(sample_size: int, mask_args: dict) -> jnp.ndarray:
    """Hann-softened [maskstart, maskend] soft mask with `marination`
    (reference generation.py:269-290). 0 = fresh generation, 1 = keep input."""
    maskstart = math.floor(mask_args["maskstart"] / 100.0 * sample_size)
    maskend = math.ceil(mask_args["maskend"] / 100.0 * sample_size)
    softnessL = round(mask_args["softnessL"] / 100.0 * sample_size)
    softnessR = round(mask_args["softnessR"] / 100.0 * sample_size)
    # clamp the soft edges to the masked span: softness larger than the span
    # (reachable from the UI sliders) produced an empty slice assignment and
    # crashed (the reference has the same defect)
    span = max(maskend - maskstart, 0)
    softnessL = min(softnessL, span)
    softnessR = min(softnessR, span - softnessL if softnessL else span)
    marination = mask_args["marination"]

    def hann(n):
        if n == 0:
            return np.zeros((0,))
        i = np.arange(2 * n)
        w = 0.5 * (1 - np.cos(2 * np.pi * i / (2 * n - 1)))  # symmetric
        return w

    mask = np.zeros((sample_size,), np.float32)
    mask[maskstart:maskend] = 1
    if softnessL > 0:
        mask[maskstart : maskstart + softnessL] = hann(softnessL)[:softnessL]
    if softnessR > 0:
        mask[maskend - softnessR : maskend] = hann(softnessR)[softnessR:]
    if marination > 0:
        mask = mask * (1 - marination)
    return jnp.asarray(mask)
