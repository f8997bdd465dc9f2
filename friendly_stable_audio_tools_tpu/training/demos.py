"""Demo callbacks: periodic in-training inference sanity checks.

Parity target: the reference's per-trainer rank-0 demo callbacks that run
full sampling + decode and log audio/spectrograms/PCA to wandb
(training/autoencoders.py:293-375, training/diffusion.py:432-594,
training/lm.py:181-266). Demo wavs are also written to
`save_dir/samples/<step>/` (reference training/diffusion.py:533-552).

All callbacks swallow their own exceptions at the Trainer level so a demo
failure never kills training.
"""

from __future__ import annotations

import os
import typing as tp

import jax
import numpy as np

from ..utils.audio_utils import write_wav
from ..utils.common import get_rank
from .viz import audio_spectrogram_image, pca_point_cloud, tokens_spectrogram_image


def _swap_conditioner_params(conditioner, state):
    """Install trained conditioner params from the train state for the demo
    (the wrappers' own .params are only synced by push_params at the END of
    fit — without this, mid-training demos pair trained model weights with
    epoch-0 conditioner weights). Returns a restore dict."""
    trained = None
    if isinstance(getattr(state, "params", None), dict):
        trained = state.params.get("conditioner")
    if conditioner is None or not trained:
        return {}
    old = {}
    for cid, p in trained.items():
        if cid in conditioner.conditioners:
            old[cid] = conditioner.conditioners[cid].params
            conditioner.conditioners[cid].params = jax.device_get(p)
    return old


def _restore_conditioner_params(conditioner, old):
    for cid, p in old.items():
        conditioner.conditioners[cid].params = p


class DemoCallback:
    def __init__(self, demo_every: int = 2000):
        self.demo_every = demo_every
        self.last_demo_step = -1

    def on_step(self, trainer, state, step: int, batch) -> None:
        if get_rank() != 0:
            return
        if step % self.demo_every != 0 or step == self.last_demo_step or step == 0:
            return
        self.last_demo_step = step
        self.run_demo(trainer, state, step, batch)

    def run_demo(self, trainer, state, step, batch):
        raise NotImplementedError

    def _out_dir(self, trainer, step):
        path = os.path.join(trainer.save_dir, "samples", str(step))
        os.makedirs(path, exist_ok=True)
        return path


class AutoencoderDemoCallback(DemoCallback):
    """Reconstruction demos (reference training/autoencoders.py:293-375)."""

    def __init__(self, demo_every: int = 2000, max_num_sample: int = 4,
                 sample_size: int = 65536, sample_rate: int = 48000, demo_dl=None, **kw):
        super().__init__(demo_every)
        self.max_num_sample = max_num_sample
        self.sample_rate = sample_rate
        self.demo_dl = demo_dl

    def run_demo(self, trainer, state, step, batch):
        reals, _ = batch
        reals = np.asarray(reals)[: self.max_num_sample]
        ae = trainer.wrapper.autoencoder
        params = jax.device_get(state.gen_params)
        import jax.numpy as jnp

        x = jnp.asarray(reals.transpose(0, 2, 1))
        latents = ae.module.apply({"params": params}, x, method="encode")
        recon = ae.module.apply({"params": params}, latents, method="decode")
        recon = np.asarray(recon).transpose(0, 2, 1)

        out = self._out_dir(trainer, step)
        for i in range(len(recon)):
            write_wav(os.path.join(out, f"recon_{i}.wav"), self.sample_rate, recon[i])
            write_wav(os.path.join(out, f"real_{i}.wav"), self.sample_rate, reals[i])
            trainer.logger.log_audio(f"demo/recon_{i}", recon[i], self.sample_rate, step=step)
        fig = audio_spectrogram_image(recon[0], self.sample_rate)
        if fig is not None:
            trainer.logger.log_image("demo/recon_melspec", fig, step=step)
        pc = pca_point_cloud(np.asarray(latents).transpose(0, 2, 1))
        np.save(os.path.join(out, "latent_pca.npy"), pc)
        trainer.logger.log_object3d("demo/latent_pca", pc, step=step)


class DiffusionDemoCallback(DemoCallback):
    """Unconditional sampling demos (reference training/diffusion.py:146-216)."""

    def __init__(self, demo_every: int = 2000, num_demos: int = 4, demo_steps: int = 250,
                 sample_rate: int = 48000, sample_size: int = 65536, **kw):
        super().__init__(demo_every)
        self.num_demos = num_demos
        self.demo_steps = demo_steps
        self.sample_rate = sample_rate
        self.sample_size = sample_size

    def run_demo(self, trainer, state, step, batch):
        from ..inference.generation import generate_diffusion_uncond

        model = trainer.wrapper.diffusion
        old = model.params
        model.params = jax.device_get(
            state.ema_params if getattr(state, "ema_params", None) is not None else state.params["model"])
        try:
            audio = generate_diffusion_uncond(
                model, steps=self.demo_steps, batch_size=self.num_demos,
                sample_size=self.sample_size, seed=step,
                sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
            )
        finally:
            model.params = old
        audio = np.asarray(audio)
        out = self._out_dir(trainer, step)
        for i in range(len(audio)):
            write_wav(os.path.join(out, f"demo_{i}.wav"), self.sample_rate, audio[i])
            trainer.logger.log_audio(f"demo/audio_{i}", audio[i], self.sample_rate, step=step)


class DiffusionCondDemoCallback(DemoCallback):
    """Conditional demos with cfg-scale sweep and optional pretransform
    round-trip sanity logging (reference training/diffusion.py:432-594)."""

    def __init__(self, demo_every: int = 2000, num_demos: int = 8, demo_steps: int = 250,
                 sample_size: int = 2097152, sample_rate: int = 44100,
                 demo_conditioning: tp.Optional[list] = None,
                 demo_cfg_scales: tp.Sequence[float] = (3, 5, 7),
                 display_audio_cond: bool = False, **kw):
        super().__init__(demo_every)
        self.num_demos = num_demos
        self.demo_steps = demo_steps
        self.sample_size = sample_size
        self.sample_rate = sample_rate
        self.demo_conditioning = (demo_conditioning or [{}])[:num_demos]
        self.demo_cfg_scales = demo_cfg_scales

    def run_demo(self, trainer, state, step, batch):
        from ..inference.generation import generate_diffusion_cond

        model = trainer.wrapper.diffusion
        old = model.params
        model.params = jax.device_get(
            state.ema_params if getattr(state, "ema_params", None) is not None else state.params["model"])
        old_cond = _swap_conditioner_params(model.conditioner, state)
        try:
            out = self._out_dir(trainer, step)
            # pretransform round-trip sanity check on a real batch
            # (reference training/diffusion.py:559-588)
            if batch is not None and model.pretransform is not None:
                import jax.numpy as jnp

                reals = np.asarray(batch[0])[:1]
                latents = model.pretransform.encode(jnp.asarray(reals))
                recon = np.asarray(model.pretransform.decode(latents))
                write_wav(os.path.join(out, "pretransform_recon.wav"), self.sample_rate, recon[0])
                trainer.logger.log_audio("demo/pretransform_recon", recon[0],
                                         self.sample_rate, step=step)
            for cfg_scale in self.demo_cfg_scales:
                audio = generate_diffusion_cond(
                    model, steps=self.demo_steps, cfg_scale=cfg_scale,
                    conditioning=self.demo_conditioning, sample_size=self.sample_size,
                    seed=step, sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
                )
                audio = np.asarray(audio)
                for i in range(len(audio)):
                    write_wav(os.path.join(out, f"demo_cfg{cfg_scale}_{i}.wav"), self.sample_rate, audio[i])
                    trainer.logger.log_audio(f"demo/audio_cfg{cfg_scale}_{i}", audio[i],
                                             self.sample_rate, step=step)
        finally:
            model.params = old
            _restore_conditioner_params(model.conditioner, old_cond)


class DiffusionAutoencoderDemoCallback(DemoCallback):
    """Encode -> diffusion-decode reconstruction demos
    (reference training/diffusion.py:1109-1188)."""

    def __init__(self, demo_every: int = 2000, max_num_sample: int = 4,
                 demo_steps: int = 100, sample_size: int = 65536,
                 sample_rate: int = 48000, **kw):
        super().__init__(demo_every)
        self.max_num_sample = max_num_sample
        self.demo_steps = demo_steps
        self.sample_rate = sample_rate

    def run_demo(self, trainer, state, step, batch):
        import jax.numpy as jnp

        reals, _ = batch
        reals = np.asarray(reals)[: self.max_num_sample]
        diffae = trainer.wrapper.diffae
        old_ae, old_d = diffae.params, diffae.diffusion.params
        params = jax.device_get(
            state.ema_params if getattr(state, "ema_params", None) is not None else state.params)
        diffae.params = params["ae"]
        diffae.diffusion.params = params["diffusion"]
        try:
            latents = diffae.encode(jnp.asarray(reals), rng=jax.random.PRNGKey(step))
            recon = np.asarray(diffae.decode(latents, steps=self.demo_steps,
                                             rng=jax.random.PRNGKey(step + 1)))
        finally:
            diffae.params, diffae.diffusion.params = old_ae, old_d
        out = self._out_dir(trainer, step)
        for i in range(len(recon)):
            write_wav(os.path.join(out, f"recon_{i}.wav"), self.sample_rate, recon[i])
            write_wav(os.path.join(out, f"real_{i}.wav"), self.sample_rate, reals[i])
            trainer.logger.log_audio(f"demo/diffae_recon_{i}", recon[i], self.sample_rate, step=step)
        fig = audio_spectrogram_image(recon[0], self.sample_rate)
        if fig is not None:
            trainer.logger.log_image("demo/diffae_recon_melspec", fig, step=step)
        # diffae.encode returns [B, latent_dim, L] — already the [B, C, T]
        # layout pca_point_cloud expects (the old transpose ran PCA over the
        # wrong axis, producing garbage point clouds)
        pc = pca_point_cloud(np.asarray(latents))
        np.save(os.path.join(out, "latent_pca.npy"), pc)
        trainer.logger.log_object3d("demo/diffae_latent_pca", pc, step=step)


class AudioLanguageModelDemoCallback(DemoCallback):
    """LM generation demos (reference training/lm.py:181-266)."""

    def __init__(self, demo_every: int = 2000, num_demos: int = 8,
                 sample_size: int = 65536, sample_rate: int = 48000,
                 demo_conditioning: tp.Optional[list] = None, **kw):
        super().__init__(demo_every)
        self.num_demos = num_demos
        self.sample_size = sample_size
        self.sample_rate = sample_rate
        self.demo_conditioning = demo_conditioning

    def run_demo(self, trainer, state, step, batch):
        model = trainer.wrapper.lm
        old = model.params
        model.params = jax.device_get(state.params["model"])
        old_cond = _swap_conditioner_params(model.conditioner, state)
        try:
            max_len = self.sample_size // model.pretransform.downsampling_ratio
            n = min(self.num_demos, 2)
            cond = self.demo_conditioning[:n] if self.demo_conditioning else None
            audio = model.generate_audio(
                batch_size=n,
                max_gen_len=max_len,
                conditioning=cond,
                rng=jax.random.PRNGKey(step),
            )
            audio = np.asarray(audio)
            out = self._out_dir(trainer, step)
            for i in range(len(audio)):
                write_wav(os.path.join(out, f"lm_demo_{i}.wav"), self.sample_rate, audio[i])
                trainer.logger.log_audio(f"demo/lm_audio_{i}", audio[i], self.sample_rate, step=step)
        finally:
            model.params = old
            _restore_conditioner_params(model.conditioner, old_cond)
