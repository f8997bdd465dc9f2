"""PyTorch -> JAX checkpoint conversion.

Maps the reference's unwrapped state_dicts (torch naming) onto this
framework's flax parameter trees so released checkpoints (e.g.
stabilityai/stable-audio-open-1.0 `model.safetensors`) load directly
(SURVEY.md §7 step 1: "the converter is needed first because parity testing
drives all subsequent work").

Key layout conversions:
  * Linear:          torch (out, in)        -> kernel (in, out)
  * Conv1d:          torch (out, in, k)     -> kernel/v (k, in, out)
  * ConvTranspose1d: torch (in, out, k)     -> kernel/v (k, in, out)
  * weight_g:        (out|in, 1, 1)         -> (out|in,)
  * Embedding:       unchanged (n, d)

Name mapping covers: Oobleck VAE (encoder/decoder/bottleneck), the DiT stack
(DiffusionTransformer + ContinuousTransformer), conditioners
(NumberConditioner / IntConditioner / TokenizerLUT), and the HF T5 encoder.
"""

from __future__ import annotations

import re
import typing as tp

import numpy as np


def _t_linear(w):
    return np.asarray(w).T


def _t_conv(w):
    return np.asarray(w).transpose(2, 1, 0)


def _t_convtr(w):
    return np.asarray(w).transpose(2, 0, 1)


def _t_g(g):
    return np.asarray(g).reshape(-1)


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    cur = tree
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = np.asarray(value)


# ---------------------------------------------------------------------------
# Oobleck VAE
# ---------------------------------------------------------------------------


def _convert_wn_conv(out, torch_sd, torch_prefix, jax_prefix, transposed=False):
    """weight-normalized conv params (v, g, bias?)."""
    tv = _t_convtr if transposed else _t_conv
    for tkey, jkey, fn in ((f"{torch_prefix}.weight_v", f"{jax_prefix}/v", tv),
                           (f"{torch_prefix}.weight_g", f"{jax_prefix}/g", _t_g),
                           (f"{torch_prefix}.bias", f"{jax_prefix}/bias", np.asarray),
                           # torch >= 2.1 parametrized naming
                           (f"{torch_prefix}.parametrizations.weight.original1", f"{jax_prefix}/v", tv),
                           (f"{torch_prefix}.parametrizations.weight.original0", f"{jax_prefix}/g", _t_g)):
        if tkey in torch_sd:
            _set(out, jkey, fn(torch_sd[tkey]))


def _convert_snake(out, torch_sd, torch_prefix, jax_prefix):
    for p in ("alpha", "beta"):
        k = f"{torch_prefix}.{p}"
        if k in torch_sd:
            _set(out, f"{jax_prefix}/{p}", np.asarray(torch_sd[k]))


def _convert_residual_unit(out, sd, tp_, jp):
    """ResidualUnit.layers = [act1, conv1, act2, conv2] (autoencoders.py:45-68)."""
    _convert_snake(out, sd, f"{tp_}.layers.0", f"{jp}/act1")
    _convert_wn_conv(out, sd, f"{tp_}.layers.1", f"{jp}/conv1")
    _convert_snake(out, sd, f"{tp_}.layers.2", f"{jp}/act2")
    _convert_wn_conv(out, sd, f"{tp_}.layers.3", f"{jp}/conv2")


def convert_oobleck_encoder(sd: dict, prefix: str = "encoder", n_blocks: int = 5) -> dict:
    """OobleckEncoder.layers = [conv_in, blocks..., act_out, conv_out]."""
    out: dict = {}
    _convert_wn_conv(out, sd, f"{prefix}.layers.0", "conv_in")
    for i in range(n_blocks):
        bp = f"{prefix}.layers.{1 + i}.layers"
        jb = f"block{i}"
        for j in range(3):
            _convert_residual_unit(out, sd, f"{bp}.{j}", f"{jb}/res{j}")
        _convert_snake(out, sd, f"{bp}.3", f"{jb}/act")
        _convert_wn_conv(out, sd, f"{bp}.4", f"{jb}/down")
    _convert_snake(out, sd, f"{prefix}.layers.{1 + n_blocks}", "act_out")
    _convert_wn_conv(out, sd, f"{prefix}.layers.{2 + n_blocks}", "conv_out")
    return out


def convert_oobleck_decoder(sd: dict, prefix: str = "decoder", n_blocks: int = 5) -> dict:
    """OobleckDecoder.layers = [conv_in, blocks..., act_out, conv_out, tanh]."""
    out: dict = {}
    _convert_wn_conv(out, sd, f"{prefix}.layers.0", "conv_in")
    for i in range(n_blocks):
        bp = f"{prefix}.layers.{1 + i}.layers"
        jb = f"block{i}"
        _convert_snake(out, sd, f"{bp}.0", f"{jb}/act")
        # upsample: WNConvTranspose1d OR nearest Sequential(Upsample, WNConv1d)
        if f"{bp}.1.weight_v" in sd or f"{bp}.1.parametrizations.weight.original1" in sd:
            _convert_wn_conv(out, sd, f"{bp}.1", f"{jb}/up", transposed=True)
        else:
            _convert_wn_conv(out, sd, f"{bp}.1.1", f"{jb}/up")
        for j in range(3):
            _convert_residual_unit(out, sd, f"{bp}.{2 + j}", f"{jb}/res{j}")
    _convert_snake(out, sd, f"{prefix}.layers.{1 + n_blocks}", "act_out")
    _convert_wn_conv(out, sd, f"{prefix}.layers.{2 + n_blocks}", "conv_out")
    return out


def convert_autoencoder_state_dict(sd: dict, n_enc_blocks: int = 5, n_dec_blocks: int = 5) -> dict:
    """Full AudioAutoencoder state dict -> flax params for
    AudioAutoencoderModule (encoder/decoder/bottleneck)."""
    out = {
        "encoder": convert_oobleck_encoder(sd, "encoder", n_enc_blocks),
        "decoder": convert_oobleck_decoder(sd, "decoder", n_dec_blocks),
    }
    # discrete bottlenecks carry quantizer params
    bn: dict = {}
    for k, v in sd.items():
        m = re.match(r"bottleneck\.quantizer\.quantizers\.(\d+)\.codebook\.weight", k)
        if m:
            _set(bn, f"quantizer/quantizer_{m.group(1)}/codebook", np.asarray(v))
    if bn:
        out["bottleneck"] = bn
    return out


# ---------------------------------------------------------------------------
# Descript Audio Codec (descript-audio-codec `weights.pth`)
# ---------------------------------------------------------------------------


def _dac_snake(out, sd, tkey, jkey):
    """dac.nn.layers.Snake1d: alpha (1, C, 1) -> (C,)."""
    for suffix in (".alpha",):
        k = tkey + suffix
        if k in sd:
            _set(out, f"{jkey}/alpha", np.asarray(sd[k]).reshape(-1))


def _dac_residual_unit(out, sd, tp_, jp):
    """dac ResidualUnit.block = [Snake1d, WNConv1d k7, Snake1d, WNConv1d k1]
    -> models/dac_codec.py DACResidualUnit {snake1, conv1, snake2, conv2}."""
    _dac_snake(out, sd, f"{tp_}.block.0", f"{jp}/snake1")
    _convert_wn_conv(out, sd, f"{tp_}.block.1", f"{jp}/conv1")
    _dac_snake(out, sd, f"{tp_}.block.2", f"{jp}/snake2")
    _convert_wn_conv(out, sd, f"{tp_}.block.3", f"{jp}/conv2")


def _fold_wn_linear(sd, tprefix):
    """weight-normalized k=1 conv -> Dense {kernel, bias} (folds g*v/||v||)."""
    if f"{tprefix}.weight_v" in sd:
        v = np.asarray(sd[f"{tprefix}.weight_v"])
        g = np.asarray(sd[f"{tprefix}.weight_g"])
    else:
        v = np.asarray(sd[f"{tprefix}.parametrizations.weight.original1"])
        g = np.asarray(sd[f"{tprefix}.parametrizations.weight.original0"])
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))  # per out channel
    w = (v * (g / (norm + 1e-12)))[:, :, 0]  # (out, in)
    out = {"kernel": w.T}
    if f"{tprefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{tprefix}.bias"])
    return out


def convert_dac_codec_state_dict(sd: dict, n_blocks: int = 4) -> dict:
    """Descript `dac.DAC` state dict -> flax params for DACCodecModule
    (models/dac_codec.py). Encoder/decoder convs keep weight-norm (v, g);
    quantizer in/out projections (k=1 WNConv1d) fold into Dense kernels;
    Snake1d alphas reshape (1,C,1)->(C,)."""
    out: dict = {}
    # encoder: block = [WNConv1d, EncoderBlock*, Snake1d, WNConv1d]
    _convert_wn_conv(out, sd, "encoder.block.0", "encoder/conv_in")
    for i in range(n_blocks):
        bp = f"encoder.block.{1 + i}.block"
        jb = f"encoder/block{i}"
        for j in range(3):
            _dac_residual_unit(out, sd, f"{bp}.{j}", f"{jb}/res{j}")
        _dac_snake(out, sd, f"{bp}.3", f"{jb}/snake")
        _convert_wn_conv(out, sd, f"{bp}.4", f"{jb}/down")
    _dac_snake(out, sd, f"encoder.block.{1 + n_blocks}", "encoder/snake_out")
    _convert_wn_conv(out, sd, f"encoder.block.{2 + n_blocks}", "encoder/conv_out")

    # quantizer.quantizers.{i}: in_proj/out_proj WNConv1d(k=1) + codebook Embedding
    i = 0
    while f"quantizer.quantizers.{i}.codebook.weight" in sd:
        jq = f"quantizer/quantizer_{i}"
        _set(out, f"{jq}/codebook", np.asarray(sd[f"quantizer.quantizers.{i}.codebook.weight"]))
        for tname, jname in (("in_proj", "proj_in"), ("out_proj", "proj_out")):
            folded = _fold_wn_linear(sd, f"quantizer.quantizers.{i}.{tname}")
            for k, v in folded.items():
                _set(out, f"{jq}/{jname}/{k}", v)
        i += 1

    # decoder: model = [WNConv1d, DecoderBlock*, Snake1d, WNConv1d, Tanh]
    _convert_wn_conv(out, sd, "decoder.model.0", "decoder/conv_in")
    for i in range(n_blocks):
        bp = f"decoder.model.{1 + i}.block"
        jb = f"decoder/block{i}"
        _dac_snake(out, sd, f"{bp}.0", f"{jb}/snake")
        _convert_wn_conv(out, sd, f"{bp}.1", f"{jb}/up", transposed=True)
        for j in range(3):
            _dac_residual_unit(out, sd, f"{bp}.{2 + j}", f"{jb}/res{j}")
    _dac_snake(out, sd, f"decoder.model.{1 + n_blocks}", "decoder/snake_out")
    _convert_wn_conv(out, sd, f"decoder.model.{2 + n_blocks}", "decoder/conv_out")
    return out


# ---------------------------------------------------------------------------
# EnCodec (HF transformers.EncodecModel, e.g. facebook/encodec_32khz)
# ---------------------------------------------------------------------------


def _enc_conv(out, sd, tkey, jkey):
    """EncodecConv1d: params live under `<tkey>.conv.*` -> `<jkey>/conv`."""
    _convert_wn_conv(out, sd, f"{tkey}.conv", f"{jkey}/conv")


def _enc_convtr(out, sd, tkey, jkey):
    _convert_wn_conv(out, sd, f"{tkey}.conv", f"{jkey}/conv", transposed=True)


def _enc_lstm(out, sd, tkey, jkey, num_layers: int):
    """torch nn.LSTM (gates rows [i;f;g;o]) -> flax OptimizedLSTMCell gates.
    flax input Dense has no bias; the hidden Dense bias takes
    bias_ih + bias_hh (identical math)."""
    for layer in range(num_layers):
        w_ih = np.asarray(sd[f"{tkey}.lstm.weight_ih_l{layer}"])
        w_hh = np.asarray(sd[f"{tkey}.lstm.weight_hh_l{layer}"])
        b = np.asarray(sd[f"{tkey}.lstm.bias_ih_l{layer}"]) + np.asarray(
            sd[f"{tkey}.lstm.bias_hh_l{layer}"])
        hdim = w_hh.shape[1]
        for gi, gate in enumerate(("i", "f", "g", "o")):
            sl = slice(gi * hdim, (gi + 1) * hdim)
            _set(out, f"{jkey}/cell{layer}/i{gate}/kernel", w_ih[sl].T)
            _set(out, f"{jkey}/cell{layer}/h{gate}/kernel", w_hh[sl].T)
            _set(out, f"{jkey}/cell{layer}/h{gate}/bias", b[sl])


def _enc_resnet(out, sd, tkey, jkey, use_conv_shortcut: bool):
    """EncodecResnetBlock.block = [ELU, conv, ELU, conv] (convs at 1, 3)."""
    _enc_conv(out, sd, f"{tkey}.block.1", f"{jkey}/block0")
    _enc_conv(out, sd, f"{tkey}.block.3", f"{jkey}/block1")
    if use_conv_shortcut:
        _enc_conv(out, sd, f"{tkey}.shortcut", f"{jkey}/shortcut")


def convert_encodec_state_dict(sd: dict, cfg: dict) -> dict:
    """HF `transformers.EncodecModel` state dict -> flax params for
    EncodecCodecModule (models/encodec_codec.py). Layer indices follow
    EncodecEncoder/EncodecDecoder sequential construction
    (modeling_encodec.py:286-349)."""
    out: dict = {}
    ratios = list(cfg["upsampling_ratios"])
    n_res = cfg["num_residual_layers"]
    shortcut = cfg["use_conv_shortcut"]
    n_lstm = cfg["num_lstm_layers"]

    # encoder: [conv, (res*; ELU, down)*, lstm, ELU, conv]
    li = 0
    _enc_conv(out, sd, f"encoder.layers.{li}", "encoder/conv_in"); li += 1
    for bi in range(len(ratios)):
        for j in range(n_res):
            _enc_resnet(out, sd, f"encoder.layers.{li}", f"encoder/block{bi}_res{j}", shortcut)
            li += 1
        li += 1  # ELU
        _enc_conv(out, sd, f"encoder.layers.{li}", f"encoder/down{bi}"); li += 1
    _enc_lstm(out, sd, f"encoder.layers.{li}", "encoder/lstm", n_lstm); li += 1
    li += 1  # ELU
    _enc_conv(out, sd, f"encoder.layers.{li}", "encoder/conv_out")

    # quantizer.layers.{i}.codebook.embed
    for i in range(cfg["num_quantizers"]):
        _set(out, f"quantizer/quantizer_{i}/codebook",
             np.asarray(sd[f"quantizer.layers.{i}.codebook.embed"]))

    # decoder: [conv, lstm, (ELU, up, res*)*, ELU, conv]
    li = 0
    _enc_conv(out, sd, f"decoder.layers.{li}", "decoder/conv_in"); li += 1
    _enc_lstm(out, sd, f"decoder.layers.{li}", "decoder/lstm", n_lstm); li += 1
    for bi in range(len(ratios)):
        li += 1  # ELU
        _enc_convtr(out, sd, f"decoder.layers.{li}", f"decoder/up{bi}"); li += 1
        for j in range(n_res):
            _enc_resnet(out, sd, f"decoder.layers.{li}", f"decoder/block{bi}_res{j}", shortcut)
            li += 1
    li += 1  # ELU
    _enc_conv(out, sd, f"decoder.layers.{li}", "decoder/conv_out")
    return out


# ---------------------------------------------------------------------------
# DiT / ContinuousTransformer
# ---------------------------------------------------------------------------

_DIT_RULES: tp.Sequence[tp.Tuple[str, str, tp.Callable]] = (
    (r"^timestep_features\.weight$", "timestep_features/weight", np.asarray),
    (r"^to_timestep_embed\.(\d)\.weight$", r"to_timestep_embed/\1/kernel", _t_linear),
    (r"^to_timestep_embed\.(\d)\.bias$", r"to_timestep_embed/\1/bias", np.asarray),
    (r"^to_cond_embed\.(\d)\.weight$", r"to_cond_embed/\1/kernel", _t_linear),
    (r"^to_global_embed\.(\d)\.weight$", r"to_global_embed/\1/kernel", _t_linear),
    (r"^to_prepend_embed\.(\d)\.weight$", r"to_prepend_embed/\1/kernel", _t_linear),
    (r"^preprocess_conv\.weight$", "preprocess_conv/kernel", _t_conv),
    (r"^postprocess_conv\.weight$", "postprocess_conv/kernel", _t_conv),
    (r"^transformer\.project_in\.weight$", "transformer/project_in/kernel", _t_linear),
    (r"^transformer\.project_out\.weight$", "transformer/project_out/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.pre_norm\.gamma$", r"transformer/layer\1/pre_norm/gamma", np.asarray),
    (r"^transformer\.layers\.(\d+)\.pre_norm\.beta$", r"transformer/layer\1/pre_norm/beta", np.asarray),
    (r"^transformer\.layers\.(\d+)\.self_attn\.to_qkv\.weight$", r"transformer/layer\1/self_attn/to_qkv/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.self_attn\.to_out\.weight$", r"transformer/layer\1/self_attn/to_out/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.cross_attend_norm\.gamma$", r"transformer/layer\1/cross_attend_norm/gamma", np.asarray),
    (r"^transformer\.layers\.(\d+)\.cross_attn\.to_q\.weight$", r"transformer/layer\1/cross_attn/to_q/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.cross_attn\.to_kv\.weight$", r"transformer/layer\1/cross_attn/to_kv/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.cross_attn\.to_out\.weight$", r"transformer/layer\1/cross_attn/to_out/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.ff_norm\.gamma$", r"transformer/layer\1/ff_norm/gamma", np.asarray),
    (r"^transformer\.layers\.(\d+)\.ff\.ff\.0\.proj\.weight$", r"transformer/layer\1/ff/linear_in/proj/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.ff\.ff\.0\.proj\.bias$", r"transformer/layer\1/ff/linear_in/proj/bias", np.asarray),
    (r"^transformer\.layers\.(\d+)\.ff\.ff\.2\.weight$", r"transformer/layer\1/ff/linear_out/kernel", _t_linear),
    (r"^transformer\.layers\.(\d+)\.ff\.ff\.2\.bias$", r"transformer/layer\1/ff/linear_out/bias", np.asarray),
    (r"^transformer\.layers\.(\d+)\.to_scale_shift_gate\.1\.weight$", r"transformer/layer\1/to_scale_shift_gate/kernel", _t_linear),
)


def convert_dit_state_dict(sd: dict, prefix: str = "model.model.") -> dict:
    """DiffusionTransformer state dict (reference dit.py naming) -> flax tree."""
    out: dict = {}
    plen = len(prefix)
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        key = k[plen:]
        for pat, repl, fn in _DIT_RULES:
            if re.match(pat, key):
                _set(out, re.sub(pat, repl, key), fn(v))
                break
    return out


# ---------------------------------------------------------------------------
# Dance Diffusion U-Net (DiffusionAttnUnet1D)
# ---------------------------------------------------------------------------


def _plain_conv(out, sd, tkey, jkey, transposed=False):
    tv = _t_convtr if transposed else _t_conv
    if f"{tkey}.weight" in sd:
        _set(out, f"{jkey}/kernel", tv(sd[f"{tkey}.weight"]))
    if f"{tkey}.bias" in sd:
        _set(out, f"{jkey}/bias", np.asarray(sd[f"{tkey}.bias"]))


def _groupnorm(out, sd, tkey, jkey):
    if f"{tkey}.weight" in sd:
        _set(out, f"{jkey}/scale", np.asarray(sd[f"{tkey}.weight"]))
        _set(out, f"{jkey}/bias", np.asarray(sd[f"{tkey}.bias"]))


def _dd_resconv(out, sd, tp_, jp):
    """blocks.py ResConvBlock: main=[conv, GN, act, conv, GN, act], skip.
    Snake acts (use_snake) carry dac Snake1d alphas (1,C,1)->(C,)."""
    _plain_conv(out, sd, f"{tp_}.main.0", f"{jp}/conv1")
    _groupnorm(out, sd, f"{tp_}.main.1", f"{jp}/gn1")
    if f"{tp_}.main.2.alpha" in sd:
        _set(out, f"{jp}/act1/alpha", np.asarray(sd[f"{tp_}.main.2.alpha"]).reshape(-1))
    _plain_conv(out, sd, f"{tp_}.main.3", f"{jp}/conv2")
    _groupnorm(out, sd, f"{tp_}.main.4", f"{jp}/gn2")
    if f"{tp_}.main.5.alpha" in sd:
        _set(out, f"{jp}/act2/alpha", np.asarray(sd[f"{tp_}.main.5.alpha"]).reshape(-1))
    _plain_conv(out, sd, f"{tp_}.skip", f"{jp}/skip")


def _dd_attn(out, sd, tp_, jp):
    _groupnorm(out, sd, f"{tp_}.norm", f"{jp}/norm")
    _plain_conv(out, sd, f"{tp_}.qkv_proj", f"{jp}/qkv_proj")
    _plain_conv(out, sd, f"{tp_}.out_proj", f"{jp}/out_proj")


def convert_dance_unet_state_dict(sd: dict, prefix: str = "model.model.",
                                  depth: int = 14) -> dict:
    """DiffusionAttnUnet1D (reference diffusion.py:376-479, torch nested
    SkipBlock indices) -> models/dance_diffusion.py flat level{i}_* naming.

    Torch layout: outer Sequential `net` = [in0,in1,in2, SkipBlock, out0,out1,
    out2]; each SkipBlock.main = [down, in0,a0,in1,a1,in2,a2, inner, out0,a3,
    out1,a4,out2,a5, up]. Attn/resample entries are nn.Identity when absent,
    so key presence drives what gets mapped."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out: dict = {}
    if "timestep_embed.weight" in sd:
        _set(out, "timestep_embed/weight", np.asarray(sd["timestep_embed.weight"]))

    # level 1 (outer Sequential)
    for j, role in ((0, "in0"), (1, "in1"), (2, "in2"),
                    (4, "out0"), (5, "out1"), (6, "out2")):
        _dd_resconv(out, sd, f"net.{j}", f"level1_{role}")

    # levels 2..depth nested at net.3.(main.7.)*main
    tp_ = "net.3"
    for i in range(2, depth + 1):
        mp = f"{tp_}.main"
        jb = f"level{i}"
        _plain_conv(out, sd, f"{mp}.0", f"{jb}_down")  # learned resample only
        for j, role in ((1, "in0"), (3, "in1"), (5, "in2"),
                        (8, "out0"), (10, "out1"), (12, "out2")):
            _dd_resconv(out, sd, f"{mp}.{j}", f"{jb}_{role}")
        for j, role in ((2, "attn0"), (4, "attn1"), (6, "attn2"),
                        (9, "attn3"), (11, "attn4"), (13, "attn5")):
            _dd_attn(out, sd, f"{mp}.{j}", f"{jb}_{role}")
        _plain_conv(out, sd, f"{mp}.14", f"{jb}_up", transposed=True)
        tp_ = f"{mp}.7"
    return out


# ---------------------------------------------------------------------------
# Audio LM (AudioLanguageModelWrapper)
# ---------------------------------------------------------------------------


def convert_continuous_transformer(sd: dict, prefix: str) -> dict:
    """ContinuousTransformer subtree (reference transformer.py naming) ->
    flax tree, reusing the DiT transformer-core rules."""
    out: dict = {}
    plen = len(prefix)
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        key = "transformer." + k[plen:]
        for pat, repl, fn in _DIT_RULES:
            if re.match(pat, key):
                _set(out, re.sub(pat, repl, key), fn(v))
                break
    return out.get("transformer", {})


def convert_lm_state_dict(sd: dict) -> dict:
    """AudioLanguageModelWrapper state dict (reference lm.py:38-102 naming:
    lm.embeddings.N / lm.backbone.model.* / lm.quantizer_heads.N) -> flax
    params for AudioLanguageModelModule (embed{N} / backbone/model / head{N})."""
    out: dict = {}
    for k, v in sd.items():
        m = re.match(r"^lm\.embeddings\.(\d+)\.weight$", k)
        if m:
            _set(out, f"embed{m.group(1)}/embedding", np.asarray(v))
        m = re.match(r"^lm\.quantizer_heads\.(\d+)\.weight$", k)
        if m:
            _set(out, f"head{m.group(1)}/kernel", _t_linear(v))
        m = re.match(r"^lm\.quantizer_heads\.(\d+)\.bias$", k)
        if m:
            _set(out, f"head{m.group(1)}/bias", np.asarray(v))
    ct = convert_continuous_transformer(sd, "lm.backbone.model.")
    if ct:
        out["backbone"] = {"model": ct}
    return out


def convert_conditioner_state_dict(sd: dict, prefix: str) -> dict:
    """Trainable conditioner params under `conditioner.conditioners.<id>`:
    LUT/phoneme token_embedder (reference conditioners.py:408-468), int
    embedder (:40-61), NumberConditioner Fourier embedder (:64-102), and the
    shared proj_out Linear (:31). Frozen hub models (T5/CLAP) are excluded
    from reference checkpoints and need no conversion."""
    out: dict = {}
    if f"{prefix}.token_embedder.weight" in sd:
        _set(out, "token_embedder/embedding", np.asarray(sd[f"{prefix}.token_embedder.weight"]))
    if f"{prefix}.int_embedder.weight" in sd:
        _set(out, "int_embedder/embedding", np.asarray(sd[f"{prefix}.int_embedder.weight"]))
    if f"{prefix}.proj_out.weight" in sd:
        _set(out, "proj_out/kernel", _t_linear(sd[f"{prefix}.proj_out.weight"]))
        if f"{prefix}.proj_out.bias" in sd:
            _set(out, "proj_out/bias", np.asarray(sd[f"{prefix}.proj_out.bias"]))
    if f"{prefix}.embedder.embedding.0.weights" in sd:
        for k, v in convert_number_conditioner(sd, prefix).items():
            out[k] = v
    return out


def convert_number_conditioner(sd: dict, prefix: str) -> dict:
    """NumberConditioner.embedder = NumberEmbedder(TimePositionalEmbedding)
    (reference conditioners.py:64-102, adp.py:1495-1514)."""
    out: dict = {}
    _set(out, "embedder/pos/weights", np.asarray(sd[f"{prefix}.embedder.embedding.0.weights"]))
    _set(out, "embedder/to_out/kernel", _t_linear(sd[f"{prefix}.embedder.embedding.1.weight"]))
    _set(out, "embedder/to_out/bias", np.asarray(sd[f"{prefix}.embedder.embedding.1.bias"]))
    return out


def convert_t5_encoder(sd: dict, prefix: str = "") -> dict:
    """HF T5EncoderModel state dict -> models/t5.py tree."""
    out: dict = {}

    def g(k):
        return np.asarray(sd[prefix + k])

    _set(out, "shared/embedding", g("shared.weight"))
    n = 0
    while f"{prefix}encoder.block.{n}.layer.0.SelfAttention.q.weight" in sd:
        b = f"encoder.block.{n}"
        jb = f"block{n}"
        for name in ("q", "k", "v", "o"):
            _set(out, f"{jb}/attn/{name}/kernel", _t_linear(g(f"{b}.layer.0.SelfAttention.{name}.weight")))
        if f"{prefix}{b}.layer.0.SelfAttention.relative_attention_bias.weight" in sd:
            _set(out, f"{jb}/attn/relative_attention_bias",
                 g(f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"))
        _set(out, f"{jb}/ln1/weight", g(f"{b}.layer.0.layer_norm.weight"))
        ff = f"{b}.layer.1.DenseReluDense"
        if f"{prefix}{ff}.wi.weight" in sd:
            _set(out, f"{jb}/ff/wi/kernel", _t_linear(g(f"{ff}.wi.weight")))
        else:
            _set(out, f"{jb}/ff/wi_0/kernel", _t_linear(g(f"{ff}.wi_0.weight")))
            _set(out, f"{jb}/ff/wi_1/kernel", _t_linear(g(f"{ff}.wi_1.weight")))
        _set(out, f"{jb}/ff/wo/kernel", _t_linear(g(f"{ff}.wo.weight")))
        _set(out, f"{jb}/ln2/weight", g(f"{b}.layer.1.layer_norm.weight"))
        n += 1
    _set(out, "final_layer_norm/weight", g("encoder.final_layer_norm.weight"))
    return out


def convert_checkpoint(ckpt_path: str, model_config_path: str, out_path: str) -> None:
    """One-shot CLI-friendly converter: PyTorch unwrapped checkpoint
    (.safetensors / .ckpt) + model_config.json -> JAX-native safetensors
    (flat '/'-joined keys) loadable by generate.py --ckpt-path and
    get_pretrained_model (as `model.jax.safetensors`)."""
    import json

    from ..models.factory import create_model_from_config
    from ..models.utils import save_ckpt_state_dict

    with open(model_config_path) as f:
        model_config = json.load(f)
    model = create_model_from_config(model_config)
    load_torch_checkpoint_into_model(model, ckpt_path, model_config)
    save_ckpt_state_dict(model.params, out_path)
    print(f"Converted {ckpt_path} -> {out_path}")


def _load_conditioners(model, sd: dict) -> None:
    """Copy trainable conditioner params (LUT/int/number/proj_out) from a
    reference checkpoint onto the model's MultiConditioner."""
    from .common import copy_state_dict

    conditioner = getattr(model, "conditioner", None)
    if conditioner is None:
        return
    for cid, cond in conditioner.conditioners.items():
        conv = convert_conditioner_state_dict(sd, f"conditioner.conditioners.{cid}")
        if conv and cond.params is not None:
            cond.params = copy_state_dict(cond.params, conv)
        elif conv:
            cond.params = conv


def load_torch_checkpoint_into_model(model, ckpt_path: str, model_config: dict) -> None:
    """Load a reference-format unwrapped checkpoint into a built model."""
    from ..models.pretrained import assert_no_fallback_tokenizers
    from ..models.utils import load_ckpt_state_dict
    from .common import copy_state_dict

    assert_no_fallback_tokenizers(model, context=f"load_torch_checkpoint_into_model({ckpt_path!r})")
    sd = load_ckpt_state_dict(ckpt_path)
    model_type = model_config["model_type"]

    if model_type == "autoencoder":
        n_blocks = len(model_config["model"]["encoder"]["config"].get("c_mults", [1] * 5))
        converted = convert_autoencoder_state_dict(sd, n_blocks, n_blocks)
        if model.params is None:
            import jax

            model.init(jax.random.PRNGKey(0))
        model.params = copy_state_dict(model.params, converted)
        return

    if model_type in ("diffusion_cond", "diffusion_cond_inpaint", "diffusion_prior"):
        import jax

        diffusion_type = model_config["model"].get("diffusion", {}).get("type", "dit")
        if diffusion_type not in ("dit",):
            # better a loud error than copy_state_dict silently matching
            # nothing for adp/DAU backbones (SA-1.0-style configs)
            raise NotImplementedError(
                f"torch import for {model_type} with diffusion type="
                f"{diffusion_type!r} is not implemented (DiT checkpoints — "
                "SAO 1.0 / SA 2.0 — are supported)")
        if model.params is None:
            model.init(jax.random.PRNGKey(0))
        converted = convert_dit_state_dict(sd, "model.model.")
        model.params = copy_state_dict(model.params, converted)
        _load_conditioners(model, sd)
        # pretransform VAE weights may be embedded under pretransform.model.*
        if model.pretransform is not None and any(k.startswith("pretransform.model.") for k in sd):
            sub = {k[len("pretransform.model."):]: v for k, v in sd.items() if k.startswith("pretransform.model.")}
            n_blocks = 5
            model.pretransform.model.params = copy_state_dict(
                model.pretransform.model.params, convert_autoencoder_state_dict(sub, n_blocks, n_blocks))
        return

    if model_type == "diffusion_uncond":
        import jax

        if model.params is None:
            model.init(jax.random.PRNGKey(0))
        inner_type = model_config["model"].get("type", "DAU1d")
        if inner_type != "DAU1d":
            raise NotImplementedError(
                f"torch import for diffusion_uncond type={inner_type} not implemented")
        depth = model_config["model"].get("config", model_config["model"]).get("depth", 14)
        converted = convert_dance_unet_state_dict(sd, "model.model.", depth=depth)
        model.params = copy_state_dict(model.params, converted)
        return

    if model_type == "lm":
        import jax

        if model.params is None:
            model.init(jax.random.PRNGKey(0))
        model.params = copy_state_dict(model.params, convert_lm_state_dict(sd))
        _load_conditioners(model, sd)
        return

    if model_type == "diffusion_autoencoder":
        import jax

        if model.params is None:
            model.init(jax.random.PRNGKey(0))
        # encoder (+ optional oobleck decoder) live in the AE tree; the
        # diffusion decoder is a separate wrapper with its own params
        # (reference autoencoders.py:648-690: self.encoder / self.diffusion)
        updates: dict = {}
        if any(k.startswith("encoder.") for k in sd):
            n_blocks = len(model_config["model"]["encoder"]["config"].get(
                "c_mults", [1] * 5)) if "encoder" in model_config["model"] else 5
            updates["encoder"] = convert_oobleck_encoder(sd, "encoder", n_blocks)
        if any(k.startswith("decoder.") for k in sd):
            n_blocks = len(model_config["model"]["decoder"]["config"].get(
                "c_mults", [1] * 5)) if "decoder" in model_config["model"] else 5
            updates["decoder"] = convert_oobleck_decoder(sd, "decoder", n_blocks)
        if updates:
            model.params = copy_state_dict(model.params, updates)
        diff_cfg = model_config["model"]["diffusion"]
        if diff_cfg["type"] != "DAU1d":
            raise NotImplementedError(
                f"torch import for diffusion_autoencoder diffusion type="
                f"{diff_cfg['type']} not implemented")
        depth = diff_cfg["config"].get("depth", 14)
        converted = convert_dance_unet_state_dict(sd, "diffusion.model.", depth=depth)
        model.diffusion.params = copy_state_dict(model.diffusion.params, converted)
        return

    raise NotImplementedError(f"torch import for model_type={model_type} not implemented yet")
