"""Audio language model training.

Parity target: reference `training/lm.py:26-180`
(AudioLanguageModelTrainingWrapper): tokenize on-the-fly through the frozen
discrete pretransform (or consume pre-encoded tokens), interpolate the
waveform padding mask to token rate, per-codebook masked cross-entropy over
pattern-aligned logits, per-codebook perplexity logging, AdamW
betas=(0.9, 0.95) wd=0.1 default, CFG dropout, optional EMA.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .diffusion import TrainState, _nearest_interp_mask
from .ema import ema_update
from .scheduler import build_optimizer


class AudioLanguageModelTrainingWrapper:
    def __init__(self, model, lr: tp.Optional[float] = None, use_ema: bool = False,
                 optimizer_configs: tp.Optional[dict] = None, pre_encoded: bool = False,
                 cfg_dropout_prob: float = 0.1):
        self.lm = model
        self.use_ema = use_ema
        self.pre_encoded = pre_encoded
        self.cfg_dropout_prob = cfg_dropout_prob
        if optimizer_configs is None:
            optimizer_configs = {
                "lm": {"optimizer": {"type": "AdamW",
                                     "config": {"lr": lr or 1e-4, "betas": (0.9, 0.95),
                                                "weight_decay": 0.1}}}
            }
        self.tx = build_optimizer(optimizer_configs["lm"])

    def trainable_params(self):
        params = {"model": self.lm.params}
        cond = {}
        if self.lm.conditioner is not None:
            for cid, c in self.lm.conditioner.conditioners.items():
                if c.trainable and c.params:
                    cond[cid] = c.params
        if cond:
            params["conditioner"] = cond
        return params

    def frozen_cond_params(self):
        out = {}
        if self.lm.conditioner is not None:
            for cid, c in self.lm.conditioner.conditioners.items():
                if not (c.trainable and c.params):
                    out[cid] = c.params or {}
        return out

    def init_state(self) -> TrainState:
        params = self.trainable_params()
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params["model"]) if self.use_ema else None,
            step=jnp.zeros((), jnp.int32),
            qmc_counter=jnp.zeros((), jnp.uint32),
        )

    def push_params(self, state: TrainState) -> None:
        self.lm.params = state.params["model"]
        if self.lm.conditioner is not None and "conditioner" in state.params:
            for cid, p in state.params["conditioner"].items():
                self.lm.conditioner.conditioners[cid].params = p

    def prepare_batch(self, reals_bct, metadata) -> dict:
        batch = {"reals": jnp.asarray(np.asarray(reals_bct).transpose(0, 2, 1))}
        if self.lm.conditioner is not None:
            batch["cond"] = self.lm.conditioner.preprocess(metadata)
        else:
            batch["cond"] = {}
        if metadata and "padding_mask" in metadata[0]:
            pm = np.stack([np.asarray(md["padding_mask"]).reshape(-1) for md in metadata])
            batch["padding_mask"] = jnp.asarray(pm.astype(bool))
        return batch

    def frozen_arrays(self) -> dict:
        """Frozen param trees passed as jit arguments (not HLO constants)."""
        out = {"cond": self.frozen_cond_params()}
        pt = self.lm.pretransform
        if pt is not None and getattr(pt, "model", None) is not None and not self.pre_encoded:
            out["pretransform"] = pt.model.params
        return out

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array,
                   frozen: tp.Optional[dict] = None):
        reals = batch["reals"]  # [B, T, C] audio or [B, T, K] codes if pre_encoded
        padding_mask = batch.get("padding_mask")
        k_cfg, k_sample = jax.random.split(rng)
        frozen = frozen or {}
        frozen_cond = frozen.get("cond") or self.frozen_cond_params()
        pt_kwargs = ({"params": frozen["pretransform"]}
                     if frozen.get("pretransform") is not None else {})

        # tokenize outside grad (frozen pretransform; reference :119-122);
        # pretransform.tokenize returns [B, K, T'] for every pretransform type
        if not self.pre_encoded:
            codes_bkt = self.lm.pretransform.tokenize(reals.transpose(0, 2, 1), **pt_kwargs)
        else:
            codes_bkt = reals.astype(jnp.int32).transpose(0, 2, 1)  # [B, T, K] -> [B, K, T]
        codes_bkt = jax.lax.stop_gradient(jnp.asarray(codes_bkt)).astype(jnp.int32)

        if padding_mask is not None:
            token_mask = _nearest_interp_mask(padding_mask, codes_bkt.shape[-1])
        else:
            token_mask = jnp.ones((codes_bkt.shape[0], codes_bkt.shape[-1]), bool)

        def loss_fn(params):
            cond_tensors = {}
            if self.lm.conditioner is not None:
                trainable_cond = params.get("conditioner", {})
                for cid, arrays in batch["cond"].items():
                    c = self.lm.conditioner.conditioners[cid]
                    cp = trainable_cond.get(cid, frozen_cond.get(cid))
                    cond_tensors[cid] = c.embed(cp, **arrays)

            out = self.lm.compute_logits(
                params["model"], codes_bkt, condition_tensors=cond_tensors,
                cfg_dropout_prob=self.cfg_dropout_prob, rng=k_cfg, train=True,
            )
            logits = out.logits  # [B, K, T, card]
            valid = out.mask & token_mask[:, None, :]  # [B, K, T]

            logits32 = jnp.where(jnp.isnan(logits), 0.0, logits).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits32, axis=-1)
            nll = -jnp.take_along_axis(logp, codes_bkt[..., None], axis=-1)[..., 0]
            nll = jnp.where(valid, nll, 0.0)
            denom = jnp.maximum(valid.sum(), 1)
            loss = nll.sum() / denom

            aux = {"ce_loss": loss}
            # per-codebook perplexity (reference :153-162)
            for k in range(codes_bkt.shape[1]):
                vk = valid[:, k]
                ck = jnp.where(vk, nll[:, k], 0.0).sum() / jnp.maximum(vk.sum(), 1)
                aux[f"perplexity_q{k}"] = jnp.exp(ck)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(state.ema_params, new_params["model"], state.step)
        new_state = TrainState(new_params, new_opt, new_ema, state.step + 1,
                               state.qmc_counter + jnp.uint32(reals.shape[0]))
        return new_state, {"loss": loss, **aux}

    def export_model(self, path: str, state: tp.Optional[TrainState] = None, use_safetensors: bool = True):
        from ..models.utils import save_ckpt_state_dict

        if state is not None:
            params = state.ema_params if (self.use_ema and state.ema_params is not None) else state.params["model"]
        else:
            params = self.lm.params
        payload = dict(params)
        if state is not None and isinstance(state.params, dict) and "conditioner" in state.params:
            payload["conditioner"] = state.params["conditioner"]
        save_ckpt_state_dict(payload, path)
