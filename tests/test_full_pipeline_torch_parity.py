"""Full-pipeline torch-vs-JAX composition parity.

Every component is cross-checked individually elsewhere (DiT forward:
tests/test_transformer_torch_parity.py, samplers:
tests/test_sampler_torch_crosscheck.py, VAE converter:
tests/test_torch_import.py, CFG math: tests/test_dit.py) — this test
composes them: a tiny random SAO-shaped torch model is run through an
in-test transcription of the reference's `generate_diffusion_cond` pipeline
(reference inference/generation.py:94-261: seeded noise -> VDenoiser-wrapped
DiT with CFG batch-doubling + rescale (reference dit.py:270-347) ->
dpmpp-3m-sde with injected per-step noise (reference sampling.py:144-228) ->
latent scale multiply + Oobleck VAE decode (reference
pretransforms.py:57-76)), and the result is diffed end-to-end against this
repo's `inference/generation.generate_diffusion_cond` on converted weights.

The composition seams this covers that no per-component test can: CFG
rescale operand ordering across the [B,C,T] <-> [B,T,C] boundary, the
latent `scale` divide/multiply direction, sigma schedule endpoints feeding
the denoiser, the noise draw/key-split order in the generation driver, and
the final decode/transpose chain.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_sampler_torch_crosscheck import (  # noqa: E402
    VDenoiserTorch,
    _scan_noise_values,
    sample_dpmpp_3m_sde_torch,
)
from test_torch_import import SnakeBeta, _wn, build_torch_oobleck_encoder  # noqa: E402
from test_transformer_torch_parity import (  # noqa: E402
    CTX,
    DIM,
    GLOBAL_DIM,
    IO,
    TDiT,
)

from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond
from friendly_stable_audio_tools_tpu.inference.sampling import get_sigmas_polyexponential
from friendly_stable_audio_tools_tpu.models.autoencoders import (
    AudioAutoencoder,
    AudioAutoencoderModule,
    OobleckDecoder,
    OobleckEncoder,
)
from friendly_stable_audio_tools_tpu.models.bottleneck import VAEBottleneck
from friendly_stable_audio_tools_tpu.models.diffusion import ConditionedDiffusionModelWrapper
from friendly_stable_audio_tools_tpu.models.dit import DiffusionTransformer
from friendly_stable_audio_tools_tpu.models.pretransforms import AutoencoderPretransform
from friendly_stable_audio_tools_tpu.utils.torch_import import (
    convert_autoencoder_state_dict,
    convert_dit_state_dict,
)

B = 2
COND_DIM = 64
SEQ = 24  # latent frames
RATIO = 8  # VAE downsampling (strides 2*4)
SAMPLE_SIZE = SEQ * RATIO
STEPS = 8
CFG_SCALE = 4.0
SCALE_PHI = 0.75
LATENT_SCALE = 0.5  # non-1 so the divide-vs-multiply seam is exercised
SIGMA_MIN, SIGMA_MAX, RHO = 0.3, 50.0, 1.0
SEED = 1234


def build_torch_oobleck_decoder(out_ch=2, channels=4, c_mults=(1, 2), strides=(2, 4), latent=IO):
    """Mirror of the reference OobleckDecoder structure
    (reference autoencoders.py:88-194) for converter-driven parity."""

    def residual_unit(c, d):
        return torch.nn.Sequential(
            SnakeBeta(c), _wn(torch.nn.Conv1d(c, c, 7, dilation=d, padding=(d * 6) // 2)),
            SnakeBeta(c), _wn(torch.nn.Conv1d(c, c, 1)),
        )

    class RU(torch.nn.Module):
        def __init__(self, c, d):
            super().__init__()
            self.layers = residual_unit(c, d)

        def forward(self, x):
            return x + self.layers(x)

    class Block(torch.nn.Module):
        def __init__(self, cin, cout, s):
            super().__init__()
            self.layers = torch.nn.Sequential(
                SnakeBeta(cin),
                _wn(torch.nn.ConvTranspose1d(cin, cout, 2 * s, stride=s,
                                             padding=math.ceil(s / 2))),
                RU(cout, 1), RU(cout, 3), RU(cout, 9),
            )

        def forward(self, x):
            return self.layers(x)

    cm = [1] + list(c_mults)
    layers = [_wn(torch.nn.Conv1d(latent, cm[-1] * channels, 7, padding=3))]
    for i in range(len(cm) - 1, 0, -1):
        layers.append(Block(cm[i] * channels, cm[i - 1] * channels, strides[i - 1]))
    layers += [SnakeBeta(cm[0] * channels),
               _wn(torch.nn.Conv1d(cm[0] * channels, out_ch, 7, padding=3, bias=False))]

    class Dec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(x)

    return Dec()


def _build_models():
    """Random torch models + their converted-weights JAX twins."""
    torch.manual_seed(11)
    tdit = TDiT().eval()  # io=IO, embed 128, depth 2, cond 64, global 96
    tenc = build_torch_oobleck_encoder(in_ch=2, channels=4, c_mults=(1, 2),
                                       strides=(2, 4), latent=2 * IO)
    tdec = build_torch_oobleck_decoder(out_ch=2, channels=4, c_mults=(1, 2),
                                       strides=(2, 4), latent=IO)
    # randomize the snake params away from init so the activation is non-trivial
    with torch.no_grad():
        for m in list(tenc.modules()) + list(tdec.modules()):
            if isinstance(m, SnakeBeta):
                m.alpha.normal_(0.0, 0.3)
                m.beta.normal_(0.0, 0.3)

    dit_sd = {k: v.detach().numpy() for k, v in tdit.state_dict().items()
              if not k.endswith(".beta")}
    dit_params = jax.tree_util.tree_map(
        jnp.asarray, convert_dit_state_dict(dit_sd, prefix=""))

    vae_sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    vae_sd.update({f"decoder.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()})
    vae_params = jax.tree_util.tree_map(
        jnp.asarray, convert_autoencoder_state_dict(vae_sd, n_enc_blocks=2, n_dec_blocks=2))

    enc = OobleckEncoder(in_channels=2, channels=4, latent_dim=2 * IO,
                         c_mults=(1, 2), strides=(2, 4), use_snake=True)
    dec = OobleckDecoder(out_channels=2, channels=4, latent_dim=IO,
                         c_mults=(1, 2), strides=(2, 4), use_snake=True, final_tanh=False)
    vae_module = AudioAutoencoderModule(encoder=enc, decoder=dec, bottleneck=VAEBottleneck())
    vae = AudioAutoencoder(module=vae_module, latent_dim=IO, downsampling_ratio=RATIO,
                           sample_rate=16000, io_channels=2)
    vae.params = vae_params

    jdit = DiffusionTransformer(
        io_channels=IO, embed_dim=DIM, depth=2, num_heads=2,
        cond_token_dim=COND_DIM, global_cond_dim=GLOBAL_DIM,
        transformer_type="continuous_transformer", global_cond_type="prepend",
    )
    model = ConditionedDiffusionModelWrapper(
        module=jdit, conditioner=None, io_channels=IO, sample_rate=16000,
        min_input_length=RATIO, params=dit_params, diffusion_objective="v",
        pretransform=AutoencoderPretransform(vae, scale=LATENT_SCALE),
        cross_attn_cond_ids=("prompt",), global_cond_ids=("glob",),
        cond_token_dim=COND_DIM, module_kind="dit",
    )
    return tdit, tdec, model


def _torch_pipeline(tdit, tdec, cond, glob, noise_btc, step_noises_btc, sigmas):
    """In-test transcription of the reference generate_diffusion_cond
    composition (generation.py:94-261) on torch tensors in [B, C, T]."""
    cond_t = torch.tensor(cond)
    glob_t = torch.tensor(glob)

    def cfg_model(x, ts):  # reference dit.py:270-347
        xb = torch.cat([x, x], dim=0)
        tb = torch.cat([ts, ts], dim=0)
        cond_b = torch.cat([cond_t, torch.zeros_like(cond_t)], dim=0)
        glob_b = torch.cat([glob_t, glob_t], dim=0)
        out = tdit(xb, tb, cond_b, glob_b)
        cond_o, uncond_o = out.chunk(2, dim=0)
        cfg = uncond_o + (cond_o - uncond_o) * CFG_SCALE
        cond_std = cond_o.std(dim=1, keepdim=True)  # [B, C, T]: dim 1 = channels
        cfg_std = cfg.std(dim=1, keepdim=True)
        return SCALE_PHI * (cfg * (cond_std / cfg_std)) + (1 - SCALE_PHI) * cfg

    x = torch.tensor(noise_btc.transpose(0, 2, 1)) * sigmas[0]  # [B, C, T]
    noises = [torch.tensor(n.transpose(0, 2, 1)) for n in step_noises_btc]
    with torch.no_grad():
        latents = sample_dpmpp_3m_sde_torch(VDenoiserTorch(cfg_model), x, sigmas, noises)
        audio = tdec(latents * LATENT_SCALE)  # reference pretransforms.py:64-76
    return audio.numpy()


@pytest.mark.slow
def test_generate_diffusion_cond_matches_torch_composition():
    tdit, tdec, model = _build_models()

    rng = jax.random.PRNGKey(99)
    cond = np.asarray(jax.random.normal(jax.random.fold_in(rng, 0),
                                        (B, CTX, COND_DIM), jnp.float32) * 0.5)
    glob = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1),
                                        (B, GLOBAL_DIM), jnp.float32) * 0.5)
    conditioning_tensors = {
        "prompt": (jnp.asarray(cond), jnp.ones((B, CTX), bool)),
        "glob": (jnp.asarray(glob)[:, None, :], jnp.ones((B, 1), bool)),
    }

    got = generate_diffusion_cond(
        model, steps=STEPS, cfg_scale=CFG_SCALE,
        conditioning_tensors=conditioning_tensors,
        sample_size=SAMPLE_SIZE, seed=SEED, scale_phi=SCALE_PHI,
        sampler_type="dpmpp-3m-sde", sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX,
        rho=RHO,
    )
    got = np.asarray(got, np.float32)  # [B, 2, SAMPLE_SIZE]
    assert got.shape == (B, 2, SAMPLE_SIZE)

    # replicate the driver's noise derivation (generation.py: seed ->
    # PRNGKey -> split -> normal, then rng=k_sampler into sample_k)
    key = jax.random.PRNGKey(SEED)
    k_noise, k_sampler = jax.random.split(key)
    noise = np.asarray(jax.random.normal(k_noise, (B, SEQ, IO), jnp.float32))
    step_noises = _scan_noise_values(k_sampler, STEPS, (B, SEQ, IO))
    sigmas = torch.tensor(np.asarray(
        get_sigmas_polyexponential(STEPS, SIGMA_MIN, SIGMA_MAX, RHO), np.float32))

    ref = _torch_pipeline(tdit, tdec, cond, glob, noise, step_noises, sigmas)

    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(got - ref).max() / scale
    assert err < 1e-3, f"end-to-end composition divergence: rel err {err:.2e}"
    # and the result is meaningfully non-trivial
    assert np.abs(ref).max() > 1e-4


def test_composition_latents_match_torch():
    """Same pipeline with return_latents=True: isolates the sampler+CFG
    composition from the VAE decode, so a failure above is attributable."""
    tdit, tdec, model = _build_models()

    rng = jax.random.PRNGKey(7)
    cond = np.asarray(jax.random.normal(jax.random.fold_in(rng, 0),
                                        (B, CTX, COND_DIM), jnp.float32) * 0.5)
    glob = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1),
                                        (B, GLOBAL_DIM), jnp.float32) * 0.5)
    conditioning_tensors = {
        "prompt": (jnp.asarray(cond), jnp.ones((B, CTX), bool)),
        "glob": (jnp.asarray(glob)[:, None, :], jnp.ones((B, 1), bool)),
    }

    got = generate_diffusion_cond(
        model, steps=STEPS, cfg_scale=CFG_SCALE,
        conditioning_tensors=conditioning_tensors,
        sample_size=SAMPLE_SIZE, seed=SEED, scale_phi=SCALE_PHI,
        sampler_type="dpmpp-3m-sde", sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX,
        rho=RHO, return_latents=True,
    )
    got = np.asarray(got, np.float32)  # [B, IO, SEQ] (pre-scale latents)

    key = jax.random.PRNGKey(SEED)
    k_noise, k_sampler = jax.random.split(key)
    noise = np.asarray(jax.random.normal(k_noise, (B, SEQ, IO), jnp.float32))
    step_noises = _scan_noise_values(k_sampler, STEPS, (B, SEQ, IO))
    sigmas = torch.tensor(np.asarray(
        get_sigmas_polyexponential(STEPS, SIGMA_MIN, SIGMA_MAX, RHO), np.float32))

    cond_t, glob_t = torch.tensor(cond), torch.tensor(glob)

    def cfg_model(x, ts):
        xb = torch.cat([x, x], dim=0)
        tb = torch.cat([ts, ts], dim=0)
        cond_b = torch.cat([cond_t, torch.zeros_like(cond_t)], dim=0)
        glob_b = torch.cat([glob_t, glob_t], dim=0)
        out = tdit(xb, tb, cond_b, glob_b)
        cond_o, uncond_o = out.chunk(2, dim=0)
        cfg = uncond_o + (cond_o - uncond_o) * CFG_SCALE
        cond_std = cond_o.std(dim=1, keepdim=True)
        cfg_std = cfg.std(dim=1, keepdim=True)
        return SCALE_PHI * (cfg * (cond_std / cfg_std)) + (1 - SCALE_PHI) * cfg

    x = torch.tensor(noise.transpose(0, 2, 1)) * sigmas[0]
    noises = [torch.tensor(n.transpose(0, 2, 1)) for n in step_noises]
    with torch.no_grad():
        ref = sample_dpmpp_3m_sde_torch(VDenoiserTorch(cfg_model), x, sigmas, noises).numpy()

    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(got - ref).max() / scale
    assert err < 5e-4, f"latent composition divergence: rel err {err:.2e}"
