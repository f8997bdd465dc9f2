"""Conditioning encoders.

Parity target: reference `models/conditioners.py:19-599` — Int / Number /
CLAP-text / CLAP-audio / T5 / phoneme / tokenizer-LUT / pretransform
conditioners dispatched by a MultiConditioner with `default_keys` aliasing.

Architecture (TPU-first): every conditioner splits into
  * `preprocess(raw_list) -> dict[str, np.ndarray]`  — host-side (tokenizing,
    float casting); runs outside jit.
  * `embed(params, **arrays) -> (embeds [B,N,D], mask [B,N])` — pure flax
    apply; composes into jitted training/sampling steps.
  * `__call__(raw_list)` — convenience path matching the reference API.

Frozen text encoders keep their params OUTSIDE the trainable pytree (the
reference hides frozen CLAP/T5 weights from state_dict via `self.__dict__`,
conditioners.py:147-150 — same intent, cleaner mechanism).
"""

from __future__ import annotations

import functools

import dataclasses
import hashlib
import logging
import typing as tp
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .t5 import T5_CONFIGS, T5_MODEL_DIMS, T5Encoder


# --------------------------------------------------------------------------
# flax building blocks
# --------------------------------------------------------------------------


class LearnedPositionalEmbedding(nn.Module):
    """Continuous-value Fourier features + passthrough (reference adp.py:680-694)."""

    dim: int

    @nn.compact
    def __call__(self, x):  # x: [B]
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,), jnp.float32)
        x = x[:, None].astype(jnp.float32)
        freqs = x * w[None, :] * 2 * np.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class NumberEmbedder(nn.Module):
    """reference adp.py:1495-1514: LearnedPositionalEmbedding -> Linear."""

    features: int
    dim: int = 256

    @nn.compact
    def __call__(self, x):  # [B] floats -> [B, features]
        f = LearnedPositionalEmbedding(self.dim, name="pos")(x)
        return nn.Dense(self.features, param_dtype=jnp.float32, name="to_out")(f)


class _IntEmbed(nn.Module):
    n: int
    output_dim: int

    @nn.compact
    def __call__(self, ints):
        return nn.Embed(self.n, self.output_dim, param_dtype=jnp.float32, name="int_embedder")(ints)


class _ProjOut(nn.Module):
    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.dim_out, param_dtype=jnp.float32, name="proj_out")(x)


# --------------------------------------------------------------------------
# host-side tokenizer with offline fallback
# --------------------------------------------------------------------------


class SimpleTokenizer:
    """Deterministic hash tokenizer used when HF tokenizers are unavailable
    (zero-egress environments without cached vocab files). NOT compatible with
    pretrained checkpoints — use only for from-scratch training and smoke
    tests; a loud warning is emitted once. Pretrained-weight loading paths
    (models/pretrained.py, utils/torch_import.py) hard-fail when they detect
    this fallback via `is_fallback`."""

    warned = False
    is_fallback = True

    def __init__(self, vocab_size: int = 32100):
        self.vocab_size = vocab_size
        if not SimpleTokenizer.warned:
            logging.warning(
                "Using SimpleTokenizer fallback (HF tokenizer unavailable offline). "
                "Token ids will NOT match pretrained checkpoints."
            )
            SimpleTokenizer.warned = True

    def __len__(self):
        return self.vocab_size

    def __call__(self, texts, truncation=True, max_length=128, padding="max_length", **kw):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, text in enumerate(texts):
            toks = []
            for w in str(text).lower().split():
                h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                toks.append(2 + h % (self.vocab_size - 2))
            toks = toks[: max_length - 1] + [1]  # eos
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _is_sentencepiece_family(name: str) -> bool:
    """Only T5-family (sentencepiece-unigram) tokenizers may resolve to a
    spiece.model. BPE tokenizers (CLAP's roberta-base, GPT-style LUT names)
    must NOT silently pick up an unrelated T5 spiece.model — that would be
    wrong token ids with no error, the failure class the hard-fail ladder
    exists to prevent."""
    n = name.lower()
    return "t5" in n or "ul2" in n or "spiece" in n


def _find_spiece_model(name: str, tokenizer_path: tp.Optional[str]) -> tp.Optional[str]:
    """Locate a local sentencepiece `spiece.model` for `name`.

    Search order: explicit `tokenizer_path` (file or directory), then
    `$FSAT_TOKENIZER_DIR/<name>/spiece.model` (name-scoped, any tokenizer),
    then the bare `$FSAT_TOKENIZER_DIR/spiece.model` — the bare candidate
    only for sentencepiece-family names: a directory holding the T5 model
    must not capture roberta/CLAP tokenizer lookups.
    """
    import os

    candidates = []
    if tokenizer_path:
        if os.path.isdir(tokenizer_path):
            candidates.append(os.path.join(tokenizer_path, "spiece.model"))
        else:
            candidates.append(tokenizer_path)
    root = os.environ.get("FSAT_TOKENIZER_DIR")
    if root:
        candidates.append(os.path.join(root, name.replace("/", "--"), "spiece.model"))
        candidates.append(os.path.join(root, name, "spiece.model"))
        if _is_sentencepiece_family(name):
            candidates.append(os.path.join(root, "spiece.model"))
    for c in candidates:
        if os.path.isfile(c):
            # an explicit FILE path must actually be a sentencepiece model;
            # tokenizer.json / vocab.json etc. go to the AutoTokenizer ladder
            if tokenizer_path and not os.path.isdir(tokenizer_path) \
                    and not c.endswith(".model"):
                return None
            return c
    if tokenizer_path and not os.path.isdir(tokenizer_path):
        raise FileNotFoundError(f"tokenizer_path={tokenizer_path!r}: no spiece.model found")
    return None


def get_hf_tokenizer(name: str, fallback_vocab: int = 32100,
                     tokenizer_path: tp.Optional[str] = None):
    """Tokenizer resolution ladder: local spiece.model (native sentencepiece
    loader — no external dep) -> HF AutoTokenizer -> hash fallback."""
    spiece = _find_spiece_model(name, tokenizer_path)
    if spiece is not None:
        from .sentencepiece import SentencePieceUnigramTokenizer

        # HF T5 tokenizers append 100 <extra_id_*> sentinels after the 32000
        # sentencepiece pieces (vocab 32100); LUT embedding tables sized by
        # len(tokenizer) must match that or pretrained checkpoints break.
        extra = 100 if _is_sentencepiece_family(name) else 0
        return SentencePieceUnigramTokenizer.from_file(spiece, extra_ids=extra)
    if tokenizer_path:
        # explicit local path holding an HF tokenizer (tokenizer.json /
        # vocab.json): load it directly before falling back to `name`
        try:
            import os

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                from transformers import AutoTokenizer

                d = tokenizer_path if os.path.isdir(tokenizer_path) else os.path.dirname(tokenizer_path)
                return AutoTokenizer.from_pretrained(d, local_files_only=True)
        except Exception:
            pass
    previous = logging.root.manager.disable
    logging.disable(logging.ERROR)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from transformers import AutoTokenizer

            # local cache first (fast, no network); then one network attempt
            # unless the environment is pinned offline (zero-egress builds
            # otherwise stall ~40 s per conditioner in HTTP retries)
            import os

            try:
                return AutoTokenizer.from_pretrained(name, local_files_only=True)
            except Exception:
                pass
            offline = os.environ.get("HF_HUB_OFFLINE") == "1" or \
                os.environ.get("TRANSFORMERS_OFFLINE") == "1"
            if not offline:
                return AutoTokenizer.from_pretrained(name)
    except Exception:
        pass
    finally:
        logging.disable(previous)
    return SimpleTokenizer(fallback_vocab)


# --------------------------------------------------------------------------
# conditioner wrappers
# --------------------------------------------------------------------------


class Conditioner:
    """Base wrapper (reference conditioners.py:19-37)."""

    def __init__(self, dim: int, output_dim: int, project_out: bool = False):
        self.dim = dim
        self.output_dim = output_dim
        self.has_proj_out = dim != output_dim or project_out
        self.module: tp.Optional[nn.Module] = None
        self.params: tp.Optional[dict] = None
        self.trainable = True

    def init(self, rng: jax.Array):
        arrays = self.preprocess(self.example_input())
        self.params = jax.jit(functools.partial(self.module.init, **arrays))(rng)["params"]
        return self.params

    def example_input(self):
        raise NotImplementedError

    def preprocess(self, raw: tp.List) -> tp.Dict[str, np.ndarray]:
        raise NotImplementedError

    def embed(self, params, **arrays):
        return self.module.apply({"params": params}, **arrays)

    def __call__(self, raw: tp.List):
        assert self.params is not None, "conditioner not initialized"
        return self.embed(self.params, **self.preprocess(raw))


class IntConditioner(Conditioner):
    """Embedding table over clamped ints (reference conditioners.py:40-61)."""

    def __init__(self, output_dim: int, min_val: int = 0, max_val: int = 512):
        super().__init__(output_dim, output_dim)
        self.min_val, self.max_val = min_val, max_val

        n = max_val - min_val + 1
        output_dim_ = output_dim

        class M(nn.Module):
            @nn.compact
            def __call__(self, ints):
                e = _IntEmbed(n, output_dim_, name="embed")(ints)
                e = e[:, None, :]
                return e, jnp.ones((e.shape[0], 1), bool)

        self.module = M()

    def example_input(self):
        return [0]

    def preprocess(self, ints):
        arr = np.clip(np.asarray([int(i) for i in ints], np.int32), self.min_val, self.max_val)
        return {"ints": arr - self.min_val}


class NumberConditioner(Conditioner):
    """Floats -> clamp -> [0,1] normalize -> Fourier embed
    (reference conditioners.py:64-102); used for seconds_start/seconds_total."""

    def __init__(self, output_dim: int, min_val: float = 0.0, max_val: float = 1.0):
        super().__init__(output_dim, output_dim)
        self.min_val, self.max_val = float(min_val), float(max_val)
        output_dim_ = output_dim

        class M(nn.Module):
            @nn.compact
            def __call__(self, floats):
                e = NumberEmbedder(output_dim_, name="embedder")(floats)
                e = e[:, None, :]
                return e, jnp.ones((e.shape[0], 1), bool)

        self.module = M()

    def example_input(self):
        return [0.0]

    def preprocess(self, floats):
        arr = np.asarray([float(x) for x in floats], np.float32)
        arr = np.clip(arr, self.min_val, self.max_val)
        arr = (arr - self.min_val) / (self.max_val - self.min_val)
        return {"floats": arr}


class T5Conditioner(Conditioner):
    """Frozen T5 encoder producing masked token embeddings
    (reference conditioners.py:261-346). bf16 on TPU."""

    T5_MODELS = list(T5_CONFIGS.keys())
    T5_MODEL_DIMS = T5_MODEL_DIMS

    def __init__(self, output_dim: int, t5_model_name: str = "t5-base",
                 max_length: int = 128, enable_grad: bool = False, project_out: bool = False,
                 tokenizer_path: tp.Optional[str] = None):
        assert t5_model_name in T5_CONFIGS, f"Unknown T5 model name: {t5_model_name}"
        dim = T5_MODEL_DIMS[t5_model_name]
        super().__init__(dim, output_dim, project_out=project_out)
        self.t5_model_name = t5_model_name
        self.max_length = max_length
        self.enable_grad = enable_grad
        self.trainable = enable_grad
        self.tokenizer = get_hf_tokenizer(t5_model_name, T5_CONFIGS[t5_model_name].vocab_size,
                                          tokenizer_path=tokenizer_path)

        cfg = T5_CONFIGS[t5_model_name]
        has_proj = self.has_proj_out
        out_dim = output_dim
        enable_grad_ = enable_grad

        class M(nn.Module):
            @nn.compact
            def __call__(self, input_ids, attention_mask):
                h = T5Encoder(cfg, name="t5")(input_ids, attention_mask.astype(bool))
                if not enable_grad_:
                    h = jax.lax.stop_gradient(h)
                h = h.astype(jnp.float32)
                if has_proj:
                    h = nn.Dense(out_dim, param_dtype=jnp.float32, name="proj_out")(h)
                h = h * attention_mask[..., None].astype(h.dtype)
                return h, attention_mask.astype(bool)

        self.module = M()

    def example_input(self):
        return ["example"]

    def preprocess(self, texts):
        enc = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return {
            "input_ids": np.asarray(enc["input_ids"], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        }


class PhonemeConditioner(Conditioner):
    """Phoneme LUT conditioner (reference conditioners.py:349-405). Uses
    g2p_en when installed; otherwise falls back to character tokens (keeps
    the module trainable end-to-end offline)."""

    def __init__(self, output_dim: int, max_length: int = 1024, project_out: bool = False):
        super().__init__(output_dim, output_dim, project_out=project_out)
        self.max_length = max_length
        try:
            from g2p_en import G2p  # type: ignore

            self.g2p = G2p()
        except Exception:
            self.g2p = None
        # ARPAbet phonemes + punctuation + words fallback; fixed-size table
        self.vocab_size = 256
        self.module = _LUTWithMask(self.vocab_size, output_dim, self.has_proj_out)

    def example_input(self):
        return ["hi"]

    def _tokens(self, text: str):
        if self.g2p is not None:
            phonemes = self.g2p(text)
        else:
            phonemes = list(str(text).lower())
        return [2 + (int(hashlib.md5(str(p).encode()).hexdigest(), 16) % (self.vocab_size - 2)) for p in phonemes]

    def preprocess(self, texts):
        ids = np.zeros((len(texts), self.max_length), np.int32)
        mask = np.zeros((len(texts), self.max_length), np.int32)
        for i, t in enumerate(texts):
            toks = self._tokens(t)[: self.max_length]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"ids": ids, "mask": mask}


class _LUTWithMask(nn.Module):
    vocab: int
    output_dim: int
    project: bool

    @nn.compact
    def __call__(self, ids, mask):
        e = nn.Embed(self.vocab, self.output_dim, param_dtype=jnp.float32, name="token_embedder")(ids)
        if self.project:
            e = nn.Dense(self.output_dim, param_dtype=jnp.float32, name="proj_out")(e)
        e = e * mask[..., None].astype(e.dtype)
        return e, mask.astype(bool)


class TokenizerLUTConditioner(Conditioner):
    """LUT over a pretrained tokenizer's vocab (reference conditioners.py:408-468)."""

    def __init__(self, tokenizer_name: str, output_dim: int, max_length: int = 1024,
                 project_out: bool = False, tokenizer_path: tp.Optional[str] = None):
        super().__init__(output_dim, output_dim, project_out=project_out)
        self.tokenizer = get_hf_tokenizer(tokenizer_name, tokenizer_path=tokenizer_path)
        self.max_length = max_length
        self.module = _LUTWithMask(len(self.tokenizer), output_dim, self.has_proj_out)

    def example_input(self):
        return ["hi"]

    def preprocess(self, texts):
        enc = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return {
            "ids": np.asarray(enc["input_ids"], np.int32),
            "mask": np.asarray(enc["attention_mask"], np.int32),
        }


class CLAPTextConditioner(Conditioner):
    """CLAP text embedding conditioner (reference conditioners.py:105-192):
    a native RoBERTa text branch + laion-clap projection (models/clap.py).

    `clap_ckpt_path` may be a laion-clap torch checkpoint (converted on the
    fly) or empty for from-scratch weights. `use_text_features` returns
    per-token hidden states from `feature_layer_ix` (reference :155-171);
    otherwise the pooled 512-d joint embedding."""

    def __init__(self, output_dim: int, clap_ckpt_path: str = "", use_text_features: bool = False,
                 feature_layer_ix: int = -1, audio_model_type: str = "HTSAT-base",
                 enable_fusion: bool = True, project_out: bool = False, finetune: bool = False):
        from .clap import CLAPTextBranch

        dim = 768 if use_text_features else 512
        super().__init__(dim, output_dim, project_out=project_out)
        self.use_text_features = use_text_features
        self.feature_layer_ix = feature_layer_ix
        self.finetune = finetune
        self.trainable = finetune
        self.clap_ckpt_path = clap_ckpt_path
        self.max_length = 77  # laion-clap RoBERTa tokenizer budget
        self.tokenizer = get_hf_tokenizer("roberta-base", 50265)

        use_feats = use_text_features
        f_ix = feature_layer_ix
        has_proj = self.has_proj_out
        out_dim = output_dim
        finetune_ = finetune

        class M(nn.Module):
            @nn.compact
            def __call__(self, input_ids, attention_mask):
                clap = CLAPTextBranch(name="clap")
                if use_feats:
                    h = clap.text_features(input_ids, attention_mask, layer_ix=f_ix)
                    mask = attention_mask.astype(bool)
                else:
                    h = clap(input_ids, attention_mask)[:, None, :]
                    mask = jnp.ones((h.shape[0], 1), bool)
                if not finetune_:
                    h = jax.lax.stop_gradient(h)
                h = h.astype(jnp.float32)
                if has_proj:
                    h = nn.Dense(out_dim, param_dtype=jnp.float32, name="proj_out")(h)
                if use_feats:
                    h = h * attention_mask[..., None].astype(h.dtype)
                return h, mask

        self.module = M()

    def init(self, rng: jax.Array):
        import os

        params = super().init(rng)
        if self.clap_ckpt_path and os.path.exists(self.clap_ckpt_path):
            if getattr(self.tokenizer, "is_fallback", False) and \
                    os.environ.get("FSAT_ALLOW_FALLBACK_TOKENIZER") != "1":
                raise RuntimeError(
                    "CLAPTextConditioner: pretrained CLAP weights requested "
                    "(clap_ckpt_path) but only the hash-fallback tokenizer is "
                    "available — token ids would not match the checkpoint and "
                    "conditioning would be silently wrong. Provide a cached "
                    "roberta-base tokenizer (HF cache or FSAT_TOKENIZER_DIR/"
                    "roberta-base/), or set FSAT_ALLOW_FALLBACK_TOKENIZER=1 "
                    "for smoke tests.")
            from .clap import convert_clap_text_branch
            from .utils import load_ckpt_state_dict
            from ..utils.common import copy_state_dict

            sd = load_ckpt_state_dict(self.clap_ckpt_path)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            converted = {"clap": convert_clap_text_branch(sd)}
            self.params = copy_state_dict(self.params, converted)
        elif self.clap_ckpt_path:
            logging.warning(
                f"CLAP checkpoint {self.clap_ckpt_path} not found; using random init"
            )
        return self.params

    def example_input(self):
        return ["example"]

    def preprocess(self, texts):
        enc = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return {
            "input_ids": np.asarray(enc["input_ids"], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        }


class CLAPAudioConditioner(Conditioner):
    """CLAP audio embedding conditioner (reference conditioners.py:195-258):
    mono-mix -> log-mel features (fusion or rand_trunc prep, models/htsat.py
    ClapAudioFeatureProcessor) -> native HTSAT Swin encoder -> projected,
    L2-normalized 512-d embedding, shaped [B, 1, output_dim] + ones mask.

    The audio branch is frozen (stop_gradient), matching the reference's
    non-finetune path. `clap_ckpt_path` accepts laion-clap or HF transformers
    CLAP checkpoints; empty/missing falls back to random init with a warning.
    """

    def __init__(self, output_dim: int, clap_ckpt_path: str = "", audio_model_type: str = "HTSAT-base",
                 enable_fusion: bool = True, project_out: bool = False,
                 htsat_config=None):
        from .htsat import HTSAT_CONFIGS, CLAPAudioBranch, ClapAudioFeatureProcessor

        super().__init__(512, output_dim, project_out=project_out)
        self.clap_ckpt_path = clap_ckpt_path
        self.trainable = False
        self.htsat_cfg = dataclasses.replace(
            htsat_config or HTSAT_CONFIGS[audio_model_type], enable_fusion=enable_fusion
        )
        self.processor = ClapAudioFeatureProcessor(self.htsat_cfg)

        cfg = self.htsat_cfg
        has_proj = self.has_proj_out
        out_dim = output_dim

        class M(nn.Module):
            @nn.compact
            def __call__(self, input_features, is_longer):
                h = CLAPAudioBranch(cfg, name="clap_audio")(input_features, is_longer)
                h = jax.lax.stop_gradient(h)[:, None, :].astype(jnp.float32)
                if has_proj:
                    h = nn.Dense(out_dim, param_dtype=jnp.float32, name="proj_out")(h)
                return h, jnp.ones((h.shape[0], 1), bool)

        self.module = M()

    def init(self, rng: jax.Array):
        import os

        params = super().init(rng)
        if self.clap_ckpt_path and os.path.exists(self.clap_ckpt_path):
            from .htsat import convert_clap_audio_branch
            from .utils import load_ckpt_state_dict
            from ..utils.common import copy_state_dict

            sd = load_ckpt_state_dict(self.clap_ckpt_path)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            converted = {"clap_audio": convert_clap_audio_branch(sd, self.htsat_cfg)}
            self.params = copy_state_dict(self.params, converted)
        elif self.clap_ckpt_path:
            logging.warning(
                f"CLAP checkpoint {self.clap_ckpt_path} not found; using random init"
            )
        return self.params

    def example_input(self):
        return [np.zeros((self.htsat_cfg.sample_rate // 10,), np.float32)]

    def preprocess(self, audios):
        waveforms = []
        for a in audios:
            arr = np.asarray(a, np.float32)
            if arr.ndim == 2:  # [C, T] -> mono mix (reference :250)
                arr = arr.mean(axis=0)
            waveforms.append(arr)
        feats, longer = self.processor(waveforms)
        return {"input_features": feats, "is_longer": longer}


class PretransformConditioner(Conditioner):
    """Audio -> frozen pretransform latents as cond tokens
    (reference conditioners.py:471-503)."""

    def __init__(self, pretransform, output_dim: int):
        super().__init__(pretransform.encoded_channels, output_dim)
        self.pretransform = pretransform
        dim_in, dim_out = pretransform.encoded_channels, output_dim
        self.module = _ProjOut(dim_in, dim_out) if self.has_proj_out else None

    def init(self, rng):
        if self.module is not None:
            z = jnp.zeros((1, 4, self.dim))
            self.params = jax.jit(self.module.init)(rng, z)["params"]
        else:
            self.params = {}
        return self.params

    def preprocess(self, audio_list):
        from ..inference.utils import set_audio_channels

        audio = np.concatenate([np.asarray(a)[None] if np.asarray(a).ndim == 2 else np.asarray(a) for a in audio_list], axis=0)
        audio = set_audio_channels(audio, self.pretransform.io_channels)
        return {"audio": audio}

    def embed(self, params, audio, pt_params=None):
        """pt_params: the frozen pretransform weights as an explicit argument
        (training steps pass them via frozen_arrays so they become jit inputs
        rather than closed-over HLO constants)."""
        kw = {"params": pt_params} if pt_params is not None else {}
        latents = self.pretransform.encode_nwc(jnp.asarray(audio).transpose(0, 2, 1), **kw)
        if self.module is not None:
            latents = self.module.apply({"params": params}, latents)
        return latents, jnp.ones(latents.shape[:2], bool)

    def __call__(self, raw):
        return self.embed(self.params or {}, **self.preprocess(raw))


class MultiConditioner:
    """Keyed dispatch over conditioners with default_keys aliasing
    (reference conditioners.py:506-549)."""

    def __init__(self, conditioners: tp.Dict[str, Conditioner], default_keys: tp.Dict[str, str] = {}):
        self.conditioners = conditioners
        self.default_keys = default_keys

    def init(self, rng: jax.Array) -> tp.Dict[str, dict]:
        params = {}
        for i, (key, c) in enumerate(sorted(self.conditioners.items())):
            params[key] = c.init(jax.random.fold_in(rng, i))
        return params

    @property
    def params(self):
        return {k: c.params for k, c in self.conditioners.items()}

    def gather_raw(self, batch_metadata: tp.List[tp.Dict[str, tp.Any]]) -> tp.Dict[str, list]:
        """Pull each conditioner's raw inputs out of per-sample metadata dicts."""
        out = {}
        for key in self.conditioners:
            condition_key = key
            inputs = []
            for x in batch_metadata:
                if condition_key not in x:
                    if key in self.default_keys:
                        condition_key = self.default_keys[key]
                    else:
                        raise ValueError(f"Conditioner key {condition_key} not found in batch metadata")
                val = x[condition_key]
                if isinstance(val, (list, tuple)) and len(val) == 1:
                    inputs.append(val[0])
                else:
                    inputs.append(val)
            out[key] = inputs
        return out

    def preprocess(self, batch_metadata) -> tp.Dict[str, tp.Dict[str, np.ndarray]]:
        raw = self.gather_raw(batch_metadata)
        return {k: self.conditioners[k].preprocess(v) for k, v in raw.items()}

    def embed(self, params: tp.Dict[str, dict], arrays: tp.Dict[str, tp.Dict[str, jnp.ndarray]]):
        """Pure/jittable: dict of conditioner arrays -> dict of (embeds, mask)."""
        return {k: self.conditioners[k].embed(params[k], **arrays[k]) for k in arrays}

    def _frozen_weight_token(self):
        """Identity of frozen weight trees read at TRACE time inside embed
        (pretransform encoders). They are baked into the compiled program as
        constants; if load_params() swaps them after the first call, the
        cached jit would silently serve embeddings from the STALE weights —
        so the cache key includes their object identity."""
        toks = []
        for _, c in sorted(self.conditioners.items()):
            pt = getattr(c, "pretransform", None)
            if pt is not None:
                toks.append(id(getattr(getattr(pt, "model", None), "params", None)))
        return tuple(toks)

    def __call__(self, batch_metadata: tp.List[tp.Dict[str, tp.Any]]) -> tp.Dict[str, tp.Any]:
        arrays = self.preprocess(batch_metadata)
        # jit the embed (cached; retraces only on new array shapes/structure
        # or swapped frozen weights): a frozen-T5 forward dispatched eagerly
        # costs seconds over the TPU dispatch path, vs one compiled program
        key = self._frozen_weight_token()
        if getattr(self, "_embed_jit_key", None) != key:
            self._embed_jit = jax.jit(self.embed)
            self._embed_jit_key = key
        return self._embed_jit(self.params, arrays)


def create_multi_conditioner_from_conditioning_config(config: tp.Dict[str, tp.Any]) -> MultiConditioner:
    """reference conditioners.py:552-599."""
    conditioners = {}
    cond_dim = config["cond_dim"]
    default_keys = config.get("default_keys", {})

    for conditioner_info in config["configs"]:
        cid = conditioner_info["id"]
        ctype = conditioner_info["type"]
        ccfg = {"output_dim": cond_dim}
        ccfg.update(conditioner_info["config"])

        if ctype == "t5":
            conditioners[cid] = T5Conditioner(**ccfg)
        elif ctype == "clap_text":
            conditioners[cid] = CLAPTextConditioner(**ccfg)
        elif ctype == "clap_audio":
            conditioners[cid] = CLAPAudioConditioner(**ccfg)
        elif ctype == "int":
            conditioners[cid] = IntConditioner(**ccfg)
        elif ctype == "number":
            conditioners[cid] = NumberConditioner(**ccfg)
        elif ctype == "phoneme":
            conditioners[cid] = PhonemeConditioner(**ccfg)
        elif ctype == "lut":
            conditioners[cid] = TokenizerLUTConditioner(**ccfg)
        elif ctype == "pretransform":
            from .factory import create_pretransform_from_config

            sample_rate = ccfg.pop("sample_rate")
            pretransform = create_pretransform_from_config(ccfg.pop("pretransform_config"), sample_rate=sample_rate)
            ckpt = ccfg.pop("pretransform_ckpt_path", None)
            if ckpt is not None:
                from .utils import load_ckpt_state_dict

                pretransform.load_params(load_ckpt_state_dict(ckpt))
            conditioners[cid] = PretransformConditioner(pretransform, **ccfg)
        else:
            raise ValueError(f"Unknown conditioner type: {ctype}")

    return MultiConditioner(conditioners, default_keys=default_keys)
