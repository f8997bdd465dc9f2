"""friendly-stable-audio-tools-tpu: a TPU-native JAX audio-generation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
`yukara-ikemiya/friendly-stable-audio-tools` (PyTorch): the Oobleck VAE-GAN
audio compressor, latent diffusion transformers (Stable Audio 1.0 / 2.0 /
Open 1.0), diffusion U-Nets (Dance Diffusion), diffusion autoencoders,
mono->stereo diffusion priors, and MusicGen-style multi-codebook token LMs.

Public API mirrors the reference's `stable_audio_tools/__init__.py:1-2`:
`create_model_from_config`, `create_model_config_from_path`,
`get_pretrained_model`.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing the full model zoo on package import
    if name in ("create_model_from_config", "create_model_from_config_path"):
        from .models import factory

        return getattr(factory, name)
    if name == "get_pretrained_model":
        from .models.pretrained import get_pretrained_model

        return get_pretrained_model
    raise AttributeError(name)

__all__ = [
    "create_model_from_config",
    "create_model_from_config_path",
    "get_pretrained_model",
    "__version__",
]
