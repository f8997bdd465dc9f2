"""Gradio web interface.

Parity target: reference `interface/gradio.py:25-738` — global model load,
conditional generation with init-audio / inpaint-outpaint mask args,
unconditional generation, LM generation, and per-model-type UIs
(txt2audio Generation+Inpainting tabs, uncond, autoencoder process tab with
latent-noise slider, diffusion-prior stereoize tab, LM tab). Timing sliders
appear only when the conditioning config contains seconds_start /
seconds_total ids (reference :401-424).

gradio is an optional dependency; `create_ui` raises a clear error without it.
"""

from __future__ import annotations

import gc
import json
import typing as tp

import numpy as np

MODEL = None
MODEL_CONFIG = None
SAMPLE_RATE = 44100
SAMPLE_SIZE = 2097152


def _norm_gr_audio(data):
    """gradio audio array -> float32 [C, T] in [-1, 1]. gr.Audio delivers
    int16 PCM by default; the int check must happen BEFORE the float cast
    (a post-cast dtype check is always 'f' and quiet int16 clips would skip
    normalization)."""
    arr = np.asarray(data)
    is_int = arr.dtype.kind in ("i", "u")
    arr = arr.astype(np.float32)
    if is_int or np.abs(arr).max() > 2:
        arr = arr / 32768.0
    return arr.T if arr.ndim == 2 else arr[None, :]


def load_model(model_config=None, model_ckpt_path=None, pretrained_name=None,
               pretransform_ckpt_path=None, device=None, model_half=False):
    """reference gradio.py:25-56."""
    global MODEL, MODEL_CONFIG, SAMPLE_RATE, SAMPLE_SIZE
    import jax

    if pretrained_name is not None:
        from ..models.pretrained import get_pretrained_model

        MODEL, MODEL_CONFIG = get_pretrained_model(pretrained_name)
    else:
        from ..models.factory import create_model_from_config

        if isinstance(model_config, str):
            with open(model_config) as f:
                model_config = json.load(f)
        MODEL_CONFIG = model_config
        MODEL = create_model_from_config(model_config, init_rng=jax.random.PRNGKey(0))
        if model_ckpt_path:
            from ..models.utils import load_unwrapped_checkpoint

            load_unwrapped_checkpoint(MODEL, model_ckpt_path)

    if pretransform_ckpt_path and getattr(MODEL, "pretransform", None) is not None:
        from ..models.utils import load_ckpt_state_dict
        from ..utils.common import copy_state_dict

        MODEL.pretransform.model.params = copy_state_dict(
            MODEL.pretransform.model.params, load_ckpt_state_dict(pretransform_ckpt_path))

    if model_half:
        import jax.numpy as jnp

        # bfloat16 on TPU (fp16 has no hardware advantage there); mirrors the
        # reference's model.half() memory intent
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if hasattr(a, "astype") and a.dtype == np.float32 else a, t)
        MODEL.params = cast(MODEL.params)
        if getattr(MODEL, "pretransform", None) is not None and getattr(MODEL.pretransform, "model", None) is not None:
            MODEL.pretransform.model.params = cast(MODEL.pretransform.model.params)

    SAMPLE_RATE = MODEL_CONFIG["sample_rate"]
    SAMPLE_SIZE = MODEL_CONFIG["sample_size"]
    return MODEL, MODEL_CONFIG


def generate_cond(prompt, negative_prompt=None, seconds_start=0, seconds_total=30,
                  cfg_scale=6.0, steps=250, preview_every=None, seed=-1,
                  sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
                  cfg_rescale=0.0, use_init=False, init_audio=None, init_noise_level=1.0,
                  mask_cropfrom=None, mask_pastefrom=None, mask_pasteto=None,
                  mask_maskstart=None, mask_maskend=None, mask_softnessL=None,
                  mask_softnessR=None, mask_marination=None, batch_size=1):
    """reference gradio.py:59-207. With `preview_every` set, collects a
    spectrogram preview of the decoded denoised latents every N steps
    (reference gradio.py:143-153) and returns (audio, [previews])."""
    from ..inference.generation import generate_diffusion_cond

    conditioning = [{"prompt": prompt, "seconds_start": seconds_start, "seconds_total": seconds_total}] * batch_size
    negative_conditioning = None
    if negative_prompt:
        negative_conditioning = [
            {"prompt": negative_prompt, "seconds_start": seconds_start, "seconds_total": seconds_total}
        ] * batch_size

    init = None
    if use_init and init_audio is not None:
        in_sr, audio = init_audio
        init = (in_sr, _norm_gr_audio(audio))

    mask_args = None
    if mask_maskstart is not None:
        mask_args = {
            "cropfrom": mask_cropfrom or 0.0,
            "pastefrom": mask_pastefrom or 0.0,
            "pasteto": mask_pasteto if mask_pasteto is not None else 100.0,
            "maskstart": mask_maskstart,
            "maskend": mask_maskend if mask_maskend is not None else 100.0,
            "softnessL": mask_softnessL or 0.0,
            "softnessR": mask_softnessR or 0.0,
            "marination": mask_marination or 0.0,
        }

    preview_every, preview_latents, progress_callback = _make_preview_callback(preview_every)

    audio = generate_diffusion_cond(
        MODEL, steps=steps, cfg_scale=cfg_scale,
        conditioning=conditioning, negative_conditioning=negative_conditioning,
        sample_size=SAMPLE_SIZE, seed=seed, sampler_type=sampler_type,
        sigma_min=sigma_min, sigma_max=sigma_max, scale_phi=cfg_rescale,
        init_audio=init, init_noise_level=init_noise_level, mask_args=mask_args,
        callback=progress_callback,
    )
    from ..utils.audio_utils import float_to_int16_audio

    # reference flattens the whole batch into time ("b d n -> d (b n)")
    a = np.asarray(audio)
    flat_audio = a.transpose(1, 0, 2).reshape(a.shape[1], -1)
    out_audio = (SAMPLE_RATE, float_to_int16_audio(flat_audio).T)
    if preview_every is not None:
        return out_audio, _render_previews(preview_latents)
    return out_audio


def _make_preview_callback(preview_every):
    """Shared preview plumbing for the cond and uncond paths (reference
    gradio.py:143-153 and :259-268). Returns (normalized preview_every,
    collected latents list, sampler callback or None)."""
    if preview_every == 0:
        preview_every = None
    preview_latents: tp.List = []
    if preview_every is None:
        return None, preview_latents, None

    def progress_callback(info):
        # snapshot only — decoding here would re-enter jitted JAX from
        # inside a host callback (deadlock-prone on TPU); gradio returns
        # previews with the final output anyway, so decode afterwards
        step = info["i"]
        if (step - 1) % int(preview_every) == 0:
            preview_latents.append((step, float(info["sigma"]), np.array(info["denoised"])))

    return preview_every, preview_latents, progress_callback


def _render_previews(preview_latents):
    """Decode collected preview latents to captioned spectrogram images."""
    import jax

    from ..training.viz import audio_spectrogram_image

    # host callbacks may still be in flight after the output transfer;
    # drain them so trailing previews are not dropped
    try:
        jax.effects_barrier()
    except Exception:
        pass
    preview_images = []
    for step, sigma, denoised in preview_latents:  # [B, L, C] latents
        if MODEL.pretransform is not None:
            denoised = np.asarray(MODEL.pretransform.decode_nwc(denoised))
        # [B, T, C] -> [C, B*T] like the reference's "b d n -> d (b n)"
        flat = np.clip(denoised.transpose(2, 0, 1).reshape(denoised.shape[-1], -1), -1, 1)
        img = _fig_to_array(audio_spectrogram_image(flat, sample_rate=SAMPLE_RATE))
        if img is not None:
            preview_images.append((img, f"Step {step} sigma={sigma:.3f}"))
    return preview_images


def _fig_to_array(fig):
    """matplotlib Figure -> RGB np.ndarray (gr.Gallery cannot render Figure
    objects — it raises on them, failing the whole generation request)."""
    if fig is None:
        return None
    import matplotlib

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf


def generate_uncond(steps=250, seed=-1, sampler_type="dpmpp-3m-sde", sigma_min=0.03,
                    sigma_max=1000, use_init=False, init_audio=None, init_noise_level=1.0,
                    batch_size=1, preview_every=None):
    """reference gradio.py:210-306 (sigma defaults 0.03/1000 per :214-216;
    `preview_every` collects per-step spectrogram previews like the cond
    path and returns (audio, [previews]))."""
    from ..inference.generation import generate_diffusion_uncond

    init = None
    if use_init and init_audio is not None:
        in_sr, audio = init_audio
        init = (in_sr, _norm_gr_audio(audio))
    preview_every, preview_latents, progress_callback = _make_preview_callback(preview_every)
    audio = generate_diffusion_uncond(
        MODEL, steps=steps, batch_size=batch_size, sample_size=SAMPLE_SIZE, seed=seed,
        sampler_type=sampler_type, sigma_min=sigma_min, sigma_max=sigma_max,
        init_audio=init, init_noise_level=init_noise_level,
        callback=progress_callback,
    )
    from ..utils.audio_utils import float_to_int16_audio

    a = np.asarray(audio)
    out_audio = (SAMPLE_RATE, float_to_int16_audio(a.transpose(1, 0, 2).reshape(a.shape[1], -1)).T)
    if preview_every is not None:
        return out_audio, _render_previews(preview_latents)
    return out_audio


def generate_lm(temperature=1.0, top_p=0.95, top_k=0, batch_size=1):
    """reference gradio.py:309-339."""
    import jax

    max_len = SAMPLE_SIZE // MODEL.pretransform.downsampling_ratio
    audio = MODEL.generate_audio(
        batch_size=batch_size, max_gen_len=max_len,
        temp=temperature, top_p=top_p, top_k=top_k,
        rng=jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)),
    )
    from ..utils.audio_utils import float_to_int16_audio

    a = np.asarray(audio)
    return (SAMPLE_RATE, float_to_int16_audio(a.transpose(1, 0, 2).reshape(a.shape[1], -1)).T)


def process_audio(audio, latent_noise: float = 0.0, n_quantizers: int = 0):
    """Autoencoder round-trip tab (reference gradio.py:555-619)."""
    import jax

    in_sr, data = audio
    data = _norm_gr_audio(data)
    batch = MODEL.preprocess_audio_for_encoder(data, in_sr)
    enc_kwargs = {"n_quantizers": int(n_quantizers)} if n_quantizers else {}
    latents = MODEL.encode_audio(batch, chunked=False, **enc_kwargs)
    if latent_noise > 0:
        latents = latents + latent_noise * jax.random.normal(jax.random.PRNGKey(0), latents.shape)
    out = MODEL.decode_audio(latents, chunked=False)
    from ..utils.audio_utils import float_to_int16_audio

    return (MODEL.sample_rate, float_to_int16_audio(np.asarray(out)[0]).T)


def _has_timing_conds():
    conditioning = (MODEL_CONFIG or {}).get("model", {}).get("conditioning", {})
    ids = [c.get("id") for c in conditioning.get("configs", [])]
    return "seconds_start" in ids or "seconds_total" in ids


def create_ui(model_config=None, ckpt_path=None, pretrained_name=None,
              pretransform_ckpt_path=None, model_half=False):
    """reference gradio.py:700-738 (dispatch per model_type)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this environment; `pip install gradio` "
            "to use the web interface"
        ) from e

    load_model(model_config, ckpt_path, pretrained_name, pretransform_ckpt_path,
               model_half=model_half)
    model_type = MODEL_CONFIG["model_type"]

    if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        with gr.Blocks() as ui:
            gr.Markdown("# friendly-stable-audio-tools-tpu: text-to-audio")
            with gr.Tab("Generation"):
                prompt = gr.Textbox(label="Prompt")
                negative = gr.Textbox(label="Negative prompt")
                with gr.Row():
                    sec_start = gr.Slider(0, 512, value=0, label="Seconds start", visible=_has_timing_conds())
                    sec_total = gr.Slider(0, 512, value=30, label="Seconds total", visible=_has_timing_conds())
                with gr.Row():
                    steps = gr.Slider(1, 500, value=100, step=1, label="Steps")
                    cfg = gr.Slider(0, 25, value=7, label="CFG scale")
                    cfg_rescale = gr.Slider(0, 1, value=0.0, label="CFG rescale")
                preview_every = gr.Slider(0, 100, value=0, step=1,
                                          label="Preview every N steps (0 = off)")
                sampler = gr.Dropdown(
                    ["dpmpp-3m-sde", "dpmpp-2m-sde", "k-heun", "k-lms", "k-dpm-2",
                     "k-dpmpp-2s-ancestral", "k-euler"], value="dpmpp-3m-sde", label="Sampler")
                seed = gr.Number(value=-1, label="Seed (-1 random)")
                use_init = gr.Checkbox(label="Use init audio")
                init_audio = gr.Audio(label="Init audio")
                init_noise = gr.Slider(0.1, 100, value=1.0, label="Init noise level")
                out = gr.Audio(label="Output")
                previews = gr.Gallery(label="Step previews", visible=True)

                def _generate(p, n, ss, st, c, s, pe, sd, sa, smin, smax, cr, ui_, ia, inl):
                    res = generate_cond(p, n, ss, st, c, s, int(pe) or None, sd, sa,
                                        smin, smax, cr, ui_, ia, inl)
                    if isinstance(res, tuple) and len(res) == 2 and isinstance(res[1], list):
                        return res[0], res[1]
                    return res, []

                gr.Button("Generate").click(
                    fn=_generate,
                    inputs=[prompt, negative, sec_start, sec_total, cfg, steps,
                            preview_every, seed, sampler, gr.State(0.3), gr.State(500),
                            cfg_rescale, use_init, init_audio, init_noise],
                    outputs=[out, previews],
                )
            with gr.Tab("Inpainting"):
                prompt2 = gr.Textbox(label="Prompt")
                init_audio2 = gr.Audio(label="Input audio")
                maskstart = gr.Slider(0, 100, value=25, label="Mask start %")
                maskend = gr.Slider(0, 100, value=75, label="Mask end %")
                softL = gr.Slider(0, 50, value=0, label="Softness L %")
                softR = gr.Slider(0, 50, value=0, label="Softness R %")
                marination = gr.Slider(0, 1, value=0.0, label="Marination")
                out2 = gr.Audio(label="Output")
                gr.Button("Inpaint").click(
                    fn=lambda p, a, ms, me, sl, sr_, m: generate_cond(
                        p, use_init=True, init_audio=a, mask_maskstart=ms, mask_maskend=me,
                        mask_softnessL=sl, mask_softnessR=sr_, mask_marination=m),
                    inputs=[prompt2, init_audio2, maskstart, maskend, softL, softR, marination],
                    outputs=out2,
                )
        return ui

    if model_type == "diffusion_uncond":
        with gr.Blocks() as ui:
            gr.Markdown("# friendly-stable-audio-tools-tpu: unconditional generation")
            steps = gr.Slider(1, 500, value=250, step=1, label="Steps")
            preview_every = gr.Slider(0, 100, value=0, step=1,
                                      label="Preview every N steps (0 = off)")
            seed = gr.Number(value=-1, label="Seed")
            out = gr.Audio(label="Output")
            previews = gr.Gallery(label="Step previews", visible=True)

            def _generate_uncond(s, pe, sd):
                res = generate_uncond(steps=int(s), seed=int(sd),
                                      preview_every=int(pe) or None)
                if isinstance(res, tuple) and len(res) == 2 and isinstance(res[1], list):
                    return res[0], res[1]
                return res, []

            gr.Button("Generate").click(fn=_generate_uncond,
                                        inputs=[steps, preview_every, seed],
                                        outputs=[out, previews])
        return ui

    if model_type in ("autoencoder", "diffusion_autoencoder"):
        with gr.Blocks() as ui:
            gr.Markdown("# friendly-stable-audio-tools-tpu: audio reconstruction")
            inp = gr.Audio(label="Input audio")
            latent_noise = gr.Slider(0.0, 10.0, value=0.0, label="Latent noise")
            n_quantizers = gr.Slider(0, 32, value=0, step=1, label="# quantizers (0=all)")
            out = gr.Audio(label="Reconstruction")
            gr.Button("Process").click(fn=process_audio, inputs=[inp, latent_noise, n_quantizers], outputs=out)
        return ui

    if model_type == "diffusion_prior":
        with gr.Blocks() as ui:
            gr.Markdown("# friendly-stable-audio-tools-tpu: mono -> stereo")
            inp = gr.Audio(label="Mono input")
            steps = gr.Slider(1, 500, value=100, step=1, label="Steps")
            out = gr.Audio(label="Stereo output")

            def stereoize(audio, steps):
                in_sr, data = audio
                data = _norm_gr_audio(data)
                result = MODEL.stereoize(data[None], in_sr, steps=int(steps))
                from ..utils.audio_utils import float_to_int16_audio

                return (MODEL.sample_rate, float_to_int16_audio(np.asarray(result)[0]).T)

            gr.Button("Stereoize").click(fn=stereoize, inputs=[inp, steps], outputs=out)
        return ui

    if model_type == "lm":
        with gr.Blocks() as ui:
            gr.Markdown("# friendly-stable-audio-tools-tpu: audio language model")
            temp = gr.Slider(0.0, 5.0, value=1.0, label="Temperature")
            top_p = gr.Slider(0.0, 1.0, value=0.95, label="Top p")
            top_k = gr.Slider(0, 500, value=0, step=1, label="Top k")
            out = gr.Audio(label="Output")
            gr.Button("Generate").click(fn=generate_lm, inputs=[temp, top_p, top_k], outputs=out)
        return ui

    raise ValueError(f"Unknown model type {model_type}")
