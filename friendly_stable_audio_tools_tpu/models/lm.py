"""MusicGen-style multi-codebook audio language model.

Parity target: reference `models/lm.py:38-549` — `AudioLanguageModel`
(per-quantizer embeddings summed into the backbone, per-quantizer logit
heads, pattern-shifted `compute_logits`), `AudioLanguageModelWrapper`
(conditioning mapping, CFG dropout, CFG batch-doubled sampling with
top-k/top-p/temperature, autoregressive `generate`, `generate_audio`), and
the config factory with pattern providers parallel/delay/unroll/musiclm.

TPU design: `generate` compiles the whole autoregressive loop into ONE
`lax.scan` over sequence offsets with static KV caches (fixed-size buffers;
reference loops in Python with mutable cache hooks, lm.py:415-445). The
pattern build/revert are single gathers (codebook_patterns.py).
"""

from __future__ import annotations

import functools

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .codebook_patterns import (
    CodebooksPatternProvider,
    CoarseFirstPattern,
    DelayedPatternProvider,
    MusicLMPattern,
    ParallelPatternProvider,
    UnrolledPatternProvider,
)
from .conditioners import MultiConditioner, create_multi_conditioner_from_conditioning_config
from .lm_backbone import ContinuousTransformerAudioLMBackbone
from .pretransforms import Pretransform
from .utils import multinomial, sample_top_k, sample_top_p


@dataclasses.dataclass
class LMOutput:
    logits: jnp.ndarray  # [B, K, T, card]
    mask: jnp.ndarray  # [B, K, T]


class AudioLanguageModelModule(nn.Module):
    """Embeds + backbone + heads (reference lm.py:38-140). The pattern
    provider lives on the wrapper (host-side table construction)."""

    backbone: nn.Module
    num_quantizers: int
    codebook_size: int

    def setup(self):
        embed_dim = self.backbone.embed_dim
        # +1 slot for the masked/special token (reference lm.py:53-58)
        self.embeds = [
            nn.Embed(self.codebook_size + 1, embed_dim, param_dtype=jnp.float32, name=f"embed{i}")
            for i in range(self.num_quantizers)
        ]
        self.quantizer_heads = [
            nn.Dense(self.codebook_size, param_dtype=jnp.float32, name=f"head{i}")
            for i in range(self.num_quantizers)
        ]

    def _embed_sequence(self, sequence):
        # sequence [B, K, S] -> summed embeddings [B, S, D]
        return sum(self.embeds[i](sequence[:, i]) for i in range(self.num_quantizers))

    def __call__(self, sequence, prepend_cond=None, prepend_cond_mask=None,
                 cross_attn_cond=None, global_cond=None, **kwargs):
        """sequence [B, K, S] -> logits [B, K, S, card]."""
        x = self._embed_sequence(sequence)
        out = self.backbone(
            x, cross_attn_cond=cross_attn_cond,
            prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
            global_cond=global_cond, **kwargs,
        )
        return jnp.stack([self.quantizer_heads[i](out) for i in range(self.num_quantizers)], axis=1)

    def init_cache(self, batch: int, max_len: int, prepend_len: int = 0, dtype=jnp.float32):
        return self.backbone.init_cache(batch, max_len, prepend_len, dtype)

    def decode_step(self, sequence, caches, prepend_cond=None, prepend_cond_mask=None,
                    cross_attn_cond=None, global_cond=None):
        """sequence [B, K, n] tokens -> (logits [B, K, n, card], caches)."""
        x = self._embed_sequence(sequence)
        out, caches = self.backbone.decode_step(
            x, caches, cross_attn_cond=cross_attn_cond,
            prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
            global_cond=global_cond,
        )
        logits = jnp.stack([self.quantizer_heads[i](out) for i in range(self.num_quantizers)], axis=1)
        return logits, caches


@dataclasses.dataclass
class AudioLanguageModelWrapper:
    """reference lm.py:143-476."""

    pretransform: Pretransform
    module: AudioLanguageModelModule
    pattern_provider: CodebooksPatternProvider
    sample_rate: int
    min_input_length: int
    params: tp.Optional[dict] = None
    conditioner: tp.Optional[MultiConditioner] = None
    cross_attn_cond_ids: tp.Sequence[str] = ()
    prepend_cond_ids: tp.Sequence[str] = ()
    global_cond_ids: tp.Sequence[str] = ()

    def __post_init__(self):
        assert self.pretransform.is_discrete, "Pretransform must be discrete"
        self.num_quantizers = self.pretransform.num_quantizers
        self.codebook_size = self.pretransform.codebook_size
        self.masked_token_id = self.codebook_size

    def init(self, rng: jax.Array, length: int = 8) -> dict:
        seq = jnp.zeros((1, self.num_quantizers, length), jnp.int32)
        kwargs = {}
        if self.cross_attn_cond_ids:
            kwargs["cross_attn_cond"] = jnp.zeros((1, 2, self.module.backbone.cross_attn_cond_dim))
        if self.prepend_cond_ids:
            kwargs["prepend_cond"] = jnp.zeros((1, 2, self.module.backbone.prepend_cond_dim))
        self.params = jax.jit(functools.partial(self.module.init, **kwargs))(rng, seq)["params"]
        return self.params

    def get_conditioning_inputs(self, cond: tp.Dict[str, tp.Any], negative: bool = False):
        """reference lm.py:189-226."""
        cross_attention_input = None
        prepend_cond = None
        prepend_cond_mask = None
        global_cond = None
        if len(self.cross_attn_cond_ids) > 0:
            cross_attention_input = jnp.concatenate([cond[key][0] for key in self.cross_attn_cond_ids], axis=1)
        if len(self.prepend_cond_ids) > 0:
            prepend_cond = jnp.concatenate([cond[key][0] for key in self.prepend_cond_ids], axis=1)
            prepend_cond_mask = jnp.concatenate([cond[key][1] for key in self.prepend_cond_ids], axis=1)
        if len(self.global_cond_ids) > 0:
            global_cond = jnp.concatenate([cond[key][0] for key in self.global_cond_ids], axis=-1)
            if global_cond.ndim == 3:
                global_cond = global_cond.squeeze(1)
        prefix = "negative_" if negative else ""
        return {
            f"{prefix}cross_attn_cond": cross_attention_input,
            f"{prefix}prepend_cond": prepend_cond,
            f"{prefix}prepend_cond_mask": prepend_cond_mask,
            f"{prefix}global_cond": global_cond,
        }

    def compute_logits(self, params, codes, condition_tensors=None, cfg_dropout_prob: float = 0.0,
                       rng: tp.Optional[jax.Array] = None, **kwargs) -> LMOutput:
        """Training-path logits with pattern shift/revert and CFG dropout
        (reference lm.py:229-268, 104-140)."""
        condition_tensors = condition_tensors or {}
        ci = self.get_conditioning_inputs(condition_tensors)
        cross_attn_cond = ci["cross_attn_cond"]
        prepend_cond = ci["prepend_cond"]
        prepend_cond_mask = ci["prepend_cond_mask"]
        global_cond = ci["global_cond"]

        if cfg_dropout_prob > 0.0 and rng is None:
            raise ValueError(
                "cfg_dropout_prob > 0 requires an rng key — silently skipping "
                "CFG dropout would train a model whose CFG-scaled generation "
                "quality quietly degrades")
        if cfg_dropout_prob > 0.0:
            def drop(arr, key, g=False):
                if arr is None:
                    return None
                shape = (arr.shape[0], 1) if g else (arr.shape[0], 1, 1)
                m = jax.random.bernoulli(key, cfg_dropout_prob, shape)
                return jnp.where(m, jnp.zeros_like(arr), arr)

            k1, k2, k3 = jax.random.split(rng, 3)
            cross_attn_cond = drop(cross_attn_cond, k1)
            prepend_cond = drop(prepend_cond, k2)
            global_cond = drop(global_cond, k3, g=True)

        batch, _, seq_len = codes.shape
        pattern = self.pattern_provider.get_pattern(seq_len)
        shifted, _, _ = pattern.build_pattern_sequence(codes, self.masked_token_id, keep_only_valid_steps=True)
        logits = self.module.apply(
            {"params": params}, shifted,
            cross_attn_cond=cross_attn_cond, prepend_cond=prepend_cond,
            prepend_cond_mask=prepend_cond_mask, global_cond=global_cond, **kwargs,
        )  # [B, K, S, card]
        logits = logits.transpose(0, 3, 1, 2)  # [B, card, K, S]
        logits, _, logits_mask = pattern.revert_pattern_logits(logits, float("nan"), keep_only_valid_steps=True)
        logits = logits.transpose(0, 2, 3, 1)  # [B, K, T, card]
        logits_mask = jnp.broadcast_to(logits_mask[None], (batch,) + logits_mask.shape)
        return LMOutput(logits=logits, mask=logits_mask)

    # ---- generation ------------------------------------------------------

    def _sample_token(self, logits, rng, top_k=250, top_p=0.0, temp=1.0, cfg_scale=1.0):
        """logits [B(, 2B if cfg), K, 1, card] last-step -> next token [B, K, 1]
        (reference lm.py:329-348)."""
        if cfg_scale != 1.0:
            cond, uncond = jnp.split(logits, 2, axis=0)
            logits = uncond + (cond - uncond) * cfg_scale
        logits = logits[:, :, -1, :]  # [B, K, card]
        if temp > 0:
            probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
            if top_p > 0.0:
                return sample_top_p(rng, probs, top_p)
            if top_k > 0:
                return sample_top_k(rng, probs, top_k)
            return multinomial(rng, probs, num_samples=1)
        return jnp.argmax(logits, axis=-1, keepdims=True)

    def generate(
        self,
        max_gen_len: int = 256,
        batch_size: tp.Optional[int] = None,
        init_data: tp.Optional[jnp.ndarray] = None,
        conditioning: tp.Optional[tp.List[dict]] = None,
        conditioning_tensors: tp.Optional[dict] = None,
        callback=None,
        use_cache: bool = True,
        cfg_scale: float = 1.0,
        rng: tp.Optional[jax.Array] = None,
        top_k: int = 250,
        top_p: float = 0.0,
        temp: float = 1.0,
        params=None,
        **kwargs,
    ):
        """Autoregressive generation as one jitted scan (reference lm.py:351-462).

        `callback(step, total_steps)` fires per generated token (host-side,
        reference lm.py:447-450) on backends with host callbacks."""
        if not use_cache:
            raise NotImplementedError(
                "use_cache=False (recompute full attention per token) is not "
                "implemented: the scan decode always uses static KV caches")
        params = params if params is not None else self.params
        rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

        if conditioning_tensors is None and conditioning is not None:
            conditioning_tensors = self.conditioner(conditioning)

        if batch_size is None:
            if init_data is not None:
                batch_size = init_data.shape[0]
            elif conditioning_tensors is not None:
                batch_size = conditioning_tensors[list(conditioning_tensors)[0]][0].shape[0]
            else:
                batch_size = 1

        K = self.num_quantizers
        if init_data is None:
            init_data = jnp.zeros((batch_size, K, 0), jnp.int32)
        start_offset = init_data.shape[-1]
        assert start_offset < max_gen_len, "init data longer than max gen length"

        pattern = self.pattern_provider.get_pattern(max_gen_len)
        unknown_token = -1
        gen_codes = jnp.full((batch_size, K, max_gen_len), unknown_token, jnp.int32)
        if start_offset > 0:
            gen_codes = gen_codes.at[:, :, :start_offset].set(init_data)
        gen_sequence, _, mask = pattern.build_pattern_sequence(gen_codes, self.masked_token_id)
        start_offset_sequence = pattern.get_first_step_with_timesteps(start_offset)
        assert start_offset_sequence is not None
        S = gen_sequence.shape[-1]

        ci = {}
        if conditioning_tensors:
            ci = self.get_conditioning_inputs(conditioning_tensors)
        cross_attn_cond = ci.get("cross_attn_cond")
        prepend_cond = ci.get("prepend_cond")
        prepend_cond_mask = ci.get("prepend_cond_mask")
        global_cond = ci.get("global_cond")

        use_cfg = cfg_scale != 1.0
        eff_batch = batch_size * 2 if use_cfg else batch_size
        if use_cfg:
            if cross_attn_cond is not None:
                cross_attn_cond = jnp.concatenate([cross_attn_cond, jnp.zeros_like(cross_attn_cond)], axis=0)
            if prepend_cond is not None:
                prepend_cond = jnp.concatenate([prepend_cond, jnp.zeros_like(prepend_cond)], axis=0)
                if prepend_cond_mask is not None:
                    prepend_cond_mask = jnp.concatenate([prepend_cond_mask, prepend_cond_mask], axis=0)
            if global_cond is not None:
                global_cond = jnp.concatenate([global_cond, jnp.zeros_like(global_cond)], axis=0)

        prepend_len = prepend_cond.shape[1] if prepend_cond is not None else 0

        def dup(a):
            return jnp.concatenate([a, a], axis=0) if use_cfg else a

        def run(params, gen_sequence, mask_j, cross_attn_cond, prepend_cond,
                prepend_cond_mask, global_cond, rng):
            caches = self.module.apply(
                {"params": params}, eff_batch, S, prepend_len, method="init_cache")

            # PREFILL: tokens [0, start_offset_sequence) plus prepend
            prefill = dup(gen_sequence[..., :start_offset_sequence])
            logits, caches = self.module.apply(
                {"params": params}, prefill, caches,
                prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
                cross_attn_cond=cross_attn_cond, global_cond=global_cond,
                method="decode_step",
            )
            # carry only the LAST position's logits: the prefill emits
            # [B, K, start_offset_sequence, card] but each scan step emits
            # [B, K, 1, card] — mismatched carries crash lax.scan for any
            # prompt continuation (init_data non-empty)
            logits = logits[:, :, -1:, :]

            from ..inference.sampling import host_callbacks_supported

            emit_cb = callback if (callback is not None and host_callbacks_supported()) else None
            total_gen = S - start_offset_sequence

            def body(carry, offset):
                gen_sequence, caches, logits, rng = carry
                if emit_cb is not None:
                    jax.debug.callback(
                        lambda off: emit_cb(int(off) + 1 - start_offset_sequence, total_gen),
                        offset, ordered=True)
                rng, k_sample = jax.random.split(rng)
                next_token = self._sample_token(
                    logits[:, :, -1:, :], k_sample, top_k=top_k, top_p=top_p,
                    temp=temp, cfg_scale=cfg_scale,
                )  # [B, K, 1]
                valid = jax.lax.dynamic_slice(mask_j, (0, offset), (K, 1))[None]
                next_token = jnp.where(valid, next_token, self.masked_token_id)
                cur = jax.lax.dynamic_slice(gen_sequence, (0, 0, offset), (batch_size, K, 1))
                new = jnp.where(cur == unknown_token, next_token, cur)
                gen_sequence = jax.lax.dynamic_update_slice(gen_sequence, new, (0, 0, offset))
                logits, caches = self.module.apply(
                    {"params": params}, dup(new), caches,
                    cross_attn_cond=cross_attn_cond, global_cond=global_cond,
                    method="decode_step",
                )
                return (gen_sequence, caches, logits, rng), None

            offsets = jnp.arange(start_offset_sequence, S)
            (gen_sequence, *_), _ = jax.lax.scan(body, (gen_sequence, caches, logits, rng), offsets)
            return gen_sequence

        # cache the jitted scan per static generation config — conditioning
        # tensors are ARGUMENTS, so a new prompt reuses the compiled program
        # (a fresh closure per call would bake conds as constants and retrace
        # every generate() invocation)
        gen_key = (S, start_offset_sequence, eff_batch, prepend_len, use_cfg,
                   float(cfg_scale), int(top_k), float(top_p), float(temp),
                   id(callback) if callback is not None else None)
        if not hasattr(self, "_gen_jits"):
            self._gen_jits = {}
        from ..utils.trace_flags import trace_env_key
        gen_key = (gen_key, trace_env_key())
        if gen_key not in self._gen_jits:
            self._gen_jits[gen_key] = jax.jit(run)
        gen_sequence = self._gen_jits[gen_key](
            params, gen_sequence, jnp.asarray(mask), cross_attn_cond, prepend_cond,
            prepend_cond_mask, global_cond, rng)

        out_codes, _, out_mask = pattern.revert_pattern_sequence(gen_sequence, special_token=unknown_token)
        out_codes = np.asarray(out_codes)
        assert (out_codes[..., :max_gen_len] != unknown_token).all(), "Unknown tokens in generated sequence"
        return jnp.asarray(out_codes)

    def generate_audio(self, params=None, **kwargs):
        """reference lm.py:464-476. Codes flow to the pretransform in the
        uniform [B, K, T] layout (DAC / audiocraft / autoencoder alike)."""
        codes = self.generate(params=params, **kwargs)
        return self.pretransform.decode_tokens(codes)


def create_audio_lm_from_config(config: dict) -> AudioLanguageModelWrapper:
    """reference lm.py:479-549."""
    from .factory import create_pretransform_from_config

    model_config = config["model"]
    sample_rate = config["sample_rate"]
    lm_config = model_config["lm"]
    codebook_pattern = lm_config.get("codebook_pattern", "delay")

    pattern_providers = {
        "parallel": ParallelPatternProvider,
        "delay": DelayedPatternProvider,
        "unroll": UnrolledPatternProvider,
        "coarse_first": CoarseFirstPattern,
        "musiclm": MusicLMPattern,
    }

    pretransform = create_pretransform_from_config(model_config["pretransform"], sample_rate)
    assert pretransform.is_discrete, "Pretransform must be discrete"
    min_input_length = pretransform.downsampling_ratio

    pattern_provider = pattern_providers[codebook_pattern](n_q=pretransform.num_quantizers)

    conditioner = None
    if model_config.get("conditioning") is not None:
        conditioner = create_multi_conditioner_from_conditioning_config(model_config["conditioning"])

    lm_type = lm_config["type"]
    lm_model_config = lm_config["config"]
    if lm_type in ("x-transformers", "continuous_transformer"):
        backbone = ContinuousTransformerAudioLMBackbone(**lm_model_config)
    else:
        raise NotImplementedError(f"Unrecognized lm type {lm_type}")

    module = AudioLanguageModelModule(
        backbone=backbone,
        num_quantizers=pretransform.num_quantizers,
        codebook_size=pretransform.codebook_size,
    )

    return AudioLanguageModelWrapper(
        pretransform=pretransform,
        module=module,
        pattern_provider=pattern_provider,
        conditioner=conditioner,
        sample_rate=sample_rate,
        min_input_length=min_input_length,
        cross_attn_cond_ids=lm_config.get("cross_attention_cond_ids", []),
        prepend_cond_ids=lm_config.get("prepend_cond_ids", []),
        global_cond_ids=lm_config.get("global_cond_ids", []),
    )
