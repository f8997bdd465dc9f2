"""Diffusion priors (mono -> stereo).

Parity target: reference `models/diffusion_prior.py:14-82`.
"""

from __future__ import annotations

import dataclasses
import enum
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import ConditionedDiffusionModelWrapper


class PriorType(enum.Enum):
    MonoToStereo = 1


@dataclasses.dataclass
class DiffusionPrior(ConditionedDiffusionModelWrapper):
    prior_type: tp.Optional[PriorType] = None


@dataclasses.dataclass
class MonoToStereoDiffusionPrior(DiffusionPrior):
    def __post_init__(self):
        self.prior_type = PriorType.MonoToStereo

    def stereoize(self, audio, in_sr: int, steps: int, sampler_kwargs: tp.Optional[dict] = None):
        """Mono [B, C, T] -> stereo via the prior (reference :28-82)."""
        from ..inference.generation import generate_diffusion_cond
        from ..inference.utils import resample

        sampler_kwargs = sampler_kwargs or {}
        audio = np.asarray(audio, np.float32)
        if in_sr != self.sample_rate:
            audio = resample(audio, in_sr, self.sample_rate)
        audio_length = audio.shape[-1]
        min_length = self.min_input_length
        padded = audio_length + (min_length - (audio_length % min_length)) % min_length
        if padded > audio_length:
            audio = np.pad(audio, ((0, 0), (0, 0), (0, padded - audio_length)))

        dual_mono = np.repeat(audio.mean(1, keepdims=True), 2, axis=1)
        dm = jnp.asarray(dual_mono).transpose(0, 2, 1)  # [B, T, C]
        if self.pretransform is not None:
            dm = self.pretransform.encode_nwc(dm)

        conditioning = {"source": (dm, jnp.ones(dm.shape[:2], bool))}
        return generate_diffusion_cond(
            self,
            conditioning_tensors=conditioning,
            steps=steps,
            sample_size=padded,
            **sampler_kwargs,
        )
