"""Diffusion training wrappers.

Parity target: reference `training/diffusion.py` —
`DiffusionUncondTrainingWrapper` (32-143), `DiffusionCondTrainingWrapper`
(219-429), `DiffusionCondInpaintTrainingWrapper` (597-838),
`DiffusionPriorTrainingWrapper` (1215-1423) + `create_source_mixture`.

Architecture (replacing PyTorch-Lightning): each wrapper owns
  * `state` — a `TrainState` pytree (params / opt_state / ema_params / step /
    quasirandom counter)
  * `train_step(state, batch, rng)` — a PURE function; jit/pjit it once and
    the whole step (conditioner embed -> frozen VAE encode -> noising -> DiT
    fwd/bwd -> optax update -> EMA) is one fused XLA program. Gradient
    all-reduce happens automatically from sharding annotations (no DDP
    wrapper).

Timestep sampling: "uniform" uses a scrambled van der Corput (base-2 radical
inverse + Cranley-Patterson rotation) — the jit-friendly equivalent of the
reference's scrambled SobolEngine draw (training/diffusion.py:53,61);
"logit_normal" matches sigmoid(randn) exactly.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..inference.sampling import get_alphas_sigmas
from ..models.diffusion import ConditionedDiffusionModelWrapper, DiffusionModelWrapper
from .ema import ema_update
from .losses.losses import MSELoss, MultiLoss
from .scheduler import build_optimizer


@flax.struct.dataclass
class TrainState:
    params: tp.Any
    opt_state: tp.Any
    ema_params: tp.Any
    step: jnp.ndarray
    qmc_counter: jnp.ndarray


def _bit_reverse32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    x = ((x >> 1) & jnp.uint32(0x55555555)) | ((x & jnp.uint32(0x55555555)) << 1)
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def quasirandom_uniform(counter: jnp.ndarray, n: int, shift: jnp.ndarray) -> jnp.ndarray:
    """Low-discrepancy [0,1) draws: radical-inverse of a running counter with a
    random rotation (Sobol-dim-1 equivalent)."""
    idx = counter + jnp.arange(n, dtype=jnp.uint32)
    # keep the top 24 bits: exactly representable in float32
    vdc = (_bit_reverse32(idx) >> jnp.uint32(8)).astype(jnp.float32) / jnp.float32(2**24)
    return (vdc + shift) % 1.0


def draw_timesteps(sampler: str, batch: int, qmc_counter, rng) -> jnp.ndarray:
    if sampler == "uniform":
        shift = jax.random.uniform(rng, (), jnp.float32)
        return quasirandom_uniform(qmc_counter, batch, shift)
    if sampler == "logit_normal":
        return jax.nn.sigmoid(jax.random.normal(rng, (batch,), jnp.float32))
    raise ValueError(f"Unknown timestep sampler {sampler}")


def _nearest_interp_mask(mask: jnp.ndarray, length: int) -> jnp.ndarray:
    """[B, T] bool -> [B, length] via nearest interpolation (reference
    training/diffusion.py:331-334)."""
    idx = (jnp.arange(length) * mask.shape[1]) // length
    return mask[:, idx]


class DiffusionCondTrainingWrapper:
    """reference training/diffusion.py:219-429."""

    def __init__(
        self,
        model: ConditionedDiffusionModelWrapper,
        lr: tp.Optional[float] = None,
        mask_padding: bool = False,
        mask_padding_dropout: float = 0.0,
        use_ema: bool = True,
        log_loss_info: bool = False,
        optimizer_configs: tp.Optional[dict] = None,
        pre_encoded: bool = False,
        cfg_dropout_prob: float = 0.1,
        timestep_sampler: str = "uniform",
        logging_config: tp.Optional[dict] = None,
    ):
        assert lr is not None or optimizer_configs is not None, \
            "Must specify either lr or optimizer_configs in training config"
        self.diffusion = model
        self.mask_padding = mask_padding
        self.mask_padding_dropout = mask_padding_dropout
        self.use_ema = use_ema
        self.log_loss_info = log_loss_info
        self.pre_encoded = pre_encoded
        self.cfg_dropout_prob = cfg_dropout_prob
        self.timestep_sampler = timestep_sampler
        self.diffusion_objective = model.diffusion_objective
        self.log_every = (logging_config or {}).get("log_every", 1)

        if optimizer_configs is None:
            optimizer_configs = {"diffusion": {"optimizer": {"type": "Adam", "config": {"lr": lr}}}}
        self.optimizer_configs = optimizer_configs
        self.tx = build_optimizer(optimizer_configs["diffusion"])

        self.losses = MultiLoss([
            MSELoss("output", "targets", weight=1.0,
                    mask_key="padding_mask" if mask_padding else None, name="mse_loss")
        ])

    # ---- state ----------------------------------------------------------

    def trainable_params(self) -> dict:
        params = {"model": self.diffusion.params}
        cond_params = {}
        if self.diffusion.conditioner is not None:
            for cid, c in self.diffusion.conditioner.conditioners.items():
                if c.trainable and c.params:
                    cond_params[cid] = c.params
        if cond_params:
            params["conditioner"] = cond_params
        return params

    def frozen_cond_params(self) -> dict:
        out = {}
        if self.diffusion.conditioner is not None:
            for cid, c in self.diffusion.conditioner.conditioners.items():
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
        """Write trained params back into the model/conditioner wrappers."""
        self.diffusion.params = state.params["model"]
        if self.diffusion.conditioner is not None and "conditioner" in state.params:
            for cid, p in state.params["conditioner"].items():
                self.diffusion.conditioner.conditioners[cid].params = p

    # ---- the pure step --------------------------------------------------

    def frozen_arrays(self) -> dict:
        """Frozen (non-trainable) parameter trees the step consumes — passed
        to train_step as ARGUMENTS so they become jit inputs rather than
        giant HLO constants (an SAO VAE + T5 would otherwise bake >1 GB of
        literals into every training compile)."""
        out = {"cond": self.frozen_cond_params()}
        pt = self.diffusion.pretransform
        if pt is not None and getattr(pt, "model", None) is not None and not self.pre_encoded:
            out["pretransform"] = pt.model.params
        # PretransformConditioner holds a frozen codec of its own; its
        # weights ride as jit arguments too (same giant-constant hazard)
        if self.diffusion.conditioner is not None:
            cond_pt = {}
            for cid, c in self.diffusion.conditioner.conditioners.items():
                cpt = getattr(c, "pretransform", None)
                if cpt is not None and getattr(cpt, "model", None) is not None:
                    cond_pt[cid] = cpt.model.params
            if cond_pt:
                out["cond_pretransform"] = cond_pt
        return out

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array, accum: int = 1,
                   frozen: tp.Optional[dict] = None, already_encoded: bool = False):
        """batch = {"reals": [B,T,C] (or latents if pre_encoded),
                    "cond": {id: {arrays}}, "padding_mask": [B,T] bool|None}.
        Returns (new_state, metrics).

        `accum > 1` runs true gradient accumulation (PTL accumulate_grad_batches
        parity, reference train.py:123): the batch's leading axis splits into
        `accum` micro-batches processed by one `lax.scan` — peak activation
        memory is a single micro-batch — with averaged grads and ONE optimizer
        update. `frozen` carries the frozen pretransform/conditioner params
        (see `frozen_arrays`); None falls back to closure constants."""
        if accum > 1:
            return self._train_step_accum(state, batch, rng, accum, frozen,
                                          already_encoded=already_encoded)
        (loss, aux), grads = self._loss_and_grads(state.params, batch, rng, state.qmc_counter,
                                                  frozen, already_encoded=already_encoded)
        return self._apply_update(state, batch["reals"].shape[0], loss, aux, grads)

    def _loss_and_grads(self, params_in, batch: dict, rng: jax.Array, qmc_counter,
                        frozen: tp.Optional[dict] = None, already_encoded: bool = False):
        reals = batch["reals"]
        padding_mask = batch.get("padding_mask")
        b = reals.shape[0]
        k_t, k_noise, k_cfg, k_sample, k_pdrop = jax.random.split(rng, 5)

        frozen = frozen or {}
        frozen_cond = frozen.get("cond") or self.frozen_cond_params()
        pretransform_params = frozen.get("pretransform")

        def loss_fn(params):
            # conditioner embeddings (trainable + frozen)
            cond_tensors = {}
            if self.diffusion.conditioner is not None:
                trainable_cond = params.get("conditioner", {})
                cond_pt = frozen.get("cond_pretransform", {})
                for cid, arrays in batch["cond"].items():
                    c = self.diffusion.conditioner.conditioners[cid]
                    cp = trainable_cond.get(cid, frozen_cond.get(cid))
                    extra_kw = {"pt_params": cond_pt[cid]} if cid in cond_pt else {}
                    cond_tensors[cid] = c.embed(cp, **arrays, **extra_kw)
            # precomputed tensors (e.g. inpaint mask/masked-input conds)
            cond_tensors.update(batch.get("_extra_cond_tensors", {}))

            diffusion_input = reals
            use_mask = padding_mask is not None and self.mask_padding
            mask = padding_mask
            if self.diffusion.pretransform is not None and not already_encoded:
                if not self.pre_encoded:
                    pt_kwargs = {"params": pretransform_params} if pretransform_params is not None else {}
                    diffusion_input = self.diffusion.pretransform.encode_nwc(diffusion_input, **pt_kwargs)
                    if use_mask:
                        mask = _nearest_interp_mask(mask, diffusion_input.shape[1])
                else:
                    scale = getattr(self.diffusion.pretransform, "scale", 1.0)
                    if scale != 1.0:
                        diffusion_input = diffusion_input / scale

            if use_mask and self.mask_padding_dropout > 0:
                drop = jax.random.uniform(k_pdrop, ()) < self.mask_padding_dropout
                mask = jnp.where(drop, jnp.ones_like(mask), mask)

            t = draw_timesteps(self.timestep_sampler, b, qmc_counter, k_t)
            if self.diffusion_objective == "v":
                alphas, sigmas = get_alphas_sigmas(t)
            elif self.diffusion_objective == "rectified_flow":
                alphas, sigmas = 1 - t, t
            else:
                raise ValueError(self.diffusion_objective)
            alphas = alphas[:, None, None]
            sigmas = sigmas[:, None, None]
            noise = jax.random.normal(k_noise, diffusion_input.shape, jnp.float32)
            x32 = diffusion_input.astype(jnp.float32)
            noised = x32 * alphas + noise * sigmas
            if self.diffusion_objective == "v":
                targets = noise * alphas - x32 * sigmas
            else:
                targets = noise - x32

            extra = {"mask": mask} if use_mask else {}
            cond_inputs = self.diffusion.get_conditioning_inputs(cond_tensors) if cond_tensors else {}
            output = self.diffusion.model_fn(
                params["model"], noised, t,
                cfg_dropout_prob=self.cfg_dropout_prob, train=True,
                rngs={"cfg": k_cfg, "sample": k_sample},
                **cond_inputs, **extra,
            )

            info = {
                "output": output,
                "targets": targets,
                "padding_mask": mask if use_mask else None,
            }
            loss, losses = self.losses(info)
            aux = dict(losses)
            aux["std_data"] = x32.std()
            if self.log_loss_info:
                # per-sigma-bucket diagnostics (reference 379-400) reduced to
                # SCALARS here so they survive _apply_update's scalar metrics
                # filter and reach the logger (8 buckets like the reference)
                mse_all = jnp.mean(jnp.square(output - targets), axis=(1, 2))
                sig = sigmas.squeeze((1, 2))
                n_buckets = 8
                bucket = jnp.clip((sig * n_buckets).astype(jnp.int32), 0, n_buckets - 1)
                for i_b in range(n_buckets):
                    in_b = bucket == i_b
                    cnt = jnp.maximum(in_b.sum(), 1)
                    aux[f"loss_sigma_{i_b / n_buckets:.3f}"] = \
                        jnp.where(in_b, mse_all, 0.0).sum() / cnt
            return loss, aux

        return jax.value_and_grad(loss_fn, has_aux=True)(params_in)

    def _apply_update(self, state: TrainState, n_samples: int, loss, aux, grads):
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(state.ema_params, new_params["model"], state.step, beta=0.9999, power=0.75)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            step=state.step + 1,
            qmc_counter=state.qmc_counter + jnp.uint32(n_samples),
        )
        metrics = {"loss": loss, **{k: v for k, v in aux.items() if not hasattr(v, "shape") or v.ndim == 0}}
        return new_state, metrics

    def _train_step_accum(self, state: TrainState, batch: dict, rng: jax.Array, accum: int,
                          frozen: tp.Optional[dict] = None, already_encoded: bool = False):
        b = batch["reals"].shape[0]
        assert b % accum == 0, f"batch {b} not divisible by accum_batches {accum}"
        mb = b // accum

        def split(x):
            return x.reshape(accum, mb, *x.shape[1:]) if hasattr(x, "ndim") and x.ndim >= 1 else x

        micro = jax.tree_util.tree_map(split, batch)

        def body(carry, inp):
            i, microbatch = inp
            loss_acc, aux_acc, grads_acc = carry
            k = jax.random.fold_in(rng, i)
            (loss, aux), grads = self._loss_and_grads(
                state.params, microbatch, k,
                state.qmc_counter + jnp.uint32(i) * jnp.uint32(mb), frozen,
                already_encoded=already_encoded)
            return (
                loss_acc + loss,
                jax.tree_util.tree_map(jnp.add, aux_acc, aux),
                jax.tree_util.tree_map(jnp.add, grads_acc, grads),
            ), None

        # shape the accumulators ABSTRACTLY (eval_shape): tracing a probe
        # call would compile the whole fwd/bwd twice — once inline, once as
        # the scan body — doubling compile time for exactly the large models
        # accumulation targets
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        out_shapes = jax.eval_shape(
            lambda p, mbatch: self._loss_and_grads(
                p, mbatch, rng, state.qmc_counter, frozen, already_encoded=already_encoded),
            state.params, first)
        init = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), out_shapes)
        (l0, a0), g0 = init
        idx = jnp.arange(accum)
        (loss_sum, aux_sum, grads_sum), _ = jax.lax.scan(body, (l0, a0, g0), (idx, micro))
        inv = 1.0 / accum
        loss = loss_sum * inv
        aux = jax.tree_util.tree_map(lambda a: a * inv, aux_sum)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads_sum)
        return self._apply_update(state, b, loss, aux, grads)

    def prepare_batch(self, reals_bct: np.ndarray, metadata: tp.Sequence[dict]) -> dict:
        """Host-side: [B,C,T] numpy + metadata dicts -> device batch."""
        batch = {"reals": jnp.asarray(np.asarray(reals_bct).transpose(0, 2, 1))}
        if self.diffusion.conditioner is not None:
            batch["cond"] = self.diffusion.conditioner.preprocess(metadata)
        else:
            batch["cond"] = {}
        if self.mask_padding and metadata and "padding_mask" in metadata[0]:
            pm = np.stack([np.asarray(md["padding_mask"]).reshape(-1) for md in metadata])
            batch["padding_mask"] = jnp.asarray(pm.astype(bool))
        return batch

    # ---- export ---------------------------------------------------------

    def export_model(self, path: str, state: tp.Optional[TrainState] = None, use_safetensors: bool = True):
        """EMA-preferring export (reference training/diffusion.py:425-429).

        Saves the model params at the ROOT (loadable straight into
        wrapper.params via copy_state_dict / load_unwrapped_checkpoint) plus
        trained conditioner weights under conditioner/<id>/ — the reference
        exports them too (its state_dict includes the conditioner); dropping
        them would pair the trained DiT with stale conditioner weights."""
        from ..models.utils import save_ckpt_state_dict

        if state is not None:
            params = state.ema_params if (self.use_ema and state.ema_params is not None) else state.params["model"]
        else:
            params = self.diffusion.params
        payload = dict(params)
        if state is not None and "conditioner" in state.params:
            payload["conditioner"] = state.params["conditioner"]
        save_ckpt_state_dict(payload, path)


class DiffusionUncondTrainingWrapper:
    """reference training/diffusion.py:32-143."""

    def __init__(self, model: DiffusionModelWrapper, lr: float = 1e-4, pre_encoded: bool = False,
                 use_ema: bool = True, logging_config: tp.Optional[dict] = None,
                 optimizer_configs: tp.Optional[dict] = None, timestep_sampler: str = "uniform"):
        self.diffusion = model
        self.use_ema = use_ema
        self.pre_encoded = pre_encoded
        self.timestep_sampler = timestep_sampler
        self.diffusion_objective = getattr(model, "diffusion_objective", "v")
        if optimizer_configs is None:
            optimizer_configs = {"diffusion": {"optimizer": {"type": "Adam", "config": {"lr": lr}}}}
        self.tx = build_optimizer(optimizer_configs["diffusion"])
        self.losses = MultiLoss([MSELoss("output", "targets", weight=1.0, name="mse_loss")])

    def init_state(self) -> TrainState:
        params = {"model": self.diffusion.params}
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params["model"]) if self.use_ema else None,
            step=jnp.zeros((), jnp.int32),
            qmc_counter=jnp.zeros((), jnp.uint32),
        )

    def push_params(self, state: TrainState) -> None:
        self.diffusion.params = state.params["model"]

    def frozen_arrays(self) -> dict:
        """Frozen pretransform params, passed to train_step as jit ARGUMENTS
        (never closed-over constants — stale-weight / giant-HLO hazard)."""
        pt = self.diffusion.pretransform
        if pt is not None and getattr(pt, "model", None) is not None and not self.pre_encoded:
            return {"pretransform": pt.model.params}
        return {}

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array,
                   frozen: tp.Optional[dict] = None):
        reals = batch["reals"]  # [B, T, C]
        k_t, k_noise = jax.random.split(rng)
        pt_params = (frozen or {}).get("pretransform")

        def loss_fn(params):
            diffusion_input = reals
            if self.diffusion.pretransform is not None and not self.pre_encoded:
                pt_kwargs = {"params": pt_params} if pt_params is not None else {}
                diffusion_input = self.diffusion.pretransform.encode_nwc(diffusion_input, **pt_kwargs)
            t = draw_timesteps(self.timestep_sampler, reals.shape[0], state.qmc_counter, k_t)
            if self.diffusion_objective == "v":
                alphas, sigmas = get_alphas_sigmas(t)
            else:
                alphas, sigmas = 1 - t, t
            alphas, sigmas = alphas[:, None, None], sigmas[:, None, None]
            noise = jax.random.normal(k_noise, diffusion_input.shape, jnp.float32)
            x32 = diffusion_input.astype(jnp.float32)
            noised = x32 * alphas + noise * sigmas
            targets = noise * alphas - x32 * sigmas if self.diffusion_objective == "v" else noise - x32
            output = self.diffusion.forward(params["model"], noised, t)
            loss, losses = self.losses({"output": output, "targets": targets})
            return loss, losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(state.ema_params, new_params["model"], state.step)
        new_state = TrainState(new_params, new_opt_state, new_ema, state.step + 1,
                               state.qmc_counter + jnp.uint32(reals.shape[0]))
        return new_state, {"loss": loss, **aux}

    def prepare_batch(self, reals_bct, metadata=None) -> dict:
        return {"reals": jnp.asarray(np.asarray(reals_bct).transpose(0, 2, 1))}

    def export_model(self, path: str, state: tp.Optional[TrainState] = None, use_safetensors: bool = True):
        from ..models.utils import save_ckpt_state_dict

        params = None
        if state is not None:
            params = state.ema_params if (self.use_ema and state.ema_params is not None) else state.params["model"]
        else:
            params = self.diffusion.params
        save_ckpt_state_dict(params, path)


def create_source_mixture(rng, reals: jnp.ndarray, num_sources: int = 2) -> jnp.ndarray:
    """Random circular-shifted mixture of other batch elements
    (reference training/diffusion.py:1191-1212). reals: [B, T, C]."""
    b = reals.shape[0]
    mix = jnp.zeros_like(reals)
    for i in range(num_sources):
        k_perm, k_shift, rng = jax.random.split(rng, 3)
        source = reals[jax.random.permutation(k_perm, b)]
        shift = jax.random.randint(k_shift, (), 0, reals.shape[1])
        mix = mix + jnp.roll(source, shift, axis=1)
    return mix


class DiffusionCondInpaintTrainingWrapper(DiffusionCondTrainingWrapper):
    """reference training/diffusion.py:597-838: adds random inpaint masks and
    feeds masked input + mask through `inpaint_mask`/`inpaint_masked_input`
    conditioning ids."""

    def __init__(self, *args, max_mask_segments: int = 10, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_mask_segments = max_mask_segments

    def random_mask(self, rng, shape: tp.Tuple[int, int]) -> jnp.ndarray:
        """[B, T] KEEP masks (1 = keep, 0 = regenerate — the REFERENCE
        convention, diffusion.py:680-717): random multi-segment / full /
        causal, chosen per batch element.

        Segments follow the reference distribution: num_segments ~ U{1..max},
        each length ~ U{1..T//num_segments} (the reference samples lengths
        without replacement; with-replacement here — same scale, static
        shapes). Full masks regenerate EVERYTHING; causal masks regenerate a
        random-length suffix."""
        b, t = shape
        keys = jax.random.split(rng, 6)
        mask_type = jax.random.randint(keys[0], (b,), 0, 3)

        n_max = self.max_mask_segments
        n_seg = jax.random.randint(keys[1], (b, 1), 1, n_max + 1)
        max_len = jnp.maximum(t // n_seg, 1)  # [b,1]
        u_len = jax.random.uniform(keys[2], (b, n_max))
        lens = 1 + jnp.floor(u_len * max_len).astype(jnp.int32)
        u_start = jax.random.uniform(keys[3], (b, n_max))
        starts = jnp.floor(u_start * (t - lens + 1)).astype(jnp.int32)
        active = jnp.arange(n_max)[None, :] < n_seg
        pos = jnp.arange(t)[None, None, :]
        regen = ((pos >= starts[..., None]) & (pos < (starts + lens)[..., None])
                 & active[..., None]).any(axis=1)
        seg_keep = ~regen

        full_keep = jnp.zeros((b, t), bool)  # full mask: regenerate all
        mask_len = jax.random.randint(keys[4], (b, 1), 1, t + 1)
        causal_keep = jnp.arange(t)[None, :] < (t - mask_len)

        return jnp.where(mask_type[:, None] == 0, seg_keep,
                         jnp.where(mask_type[:, None] == 1, full_keep, causal_keep))

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array, accum: int = 1,
                   frozen: tp.Optional[dict] = None):
        """Adds inpaint conditioning into batch['cond'] before the shared
        conditional step. Encodes ONCE here (masking happens on the scaled
        latents like the reference, diffusion.py:744-751) and tells the
        parent the input is already encoded — the previous pre_encoded flip
        re-divided by the pretransform scale a second time."""
        rng, k_mask = jax.random.split(rng)
        reals = batch["reals"]
        frozen = frozen or {}

        diffusion_input = reals
        if self.diffusion.pretransform is not None:
            if not self.pre_encoded:
                pt_params = frozen.get("pretransform")
                pt_kwargs = {"params": pt_params} if pt_params is not None else {}
                diffusion_input = self.diffusion.pretransform.encode_nwc(reals, **pt_kwargs)
            else:
                scale = getattr(self.diffusion.pretransform, "scale", 1.0)
                if scale != 1.0:
                    diffusion_input = diffusion_input / scale

        keep = self.random_mask(k_mask, (diffusion_input.shape[0], diffusion_input.shape[1]))
        masked_input = diffusion_input.astype(jnp.float32) * keep[:, :, None]

        batch = dict(batch)
        batch["cond"] = dict(batch.get("cond", {}))
        batch["_extra_cond_tensors"] = {
            "inpaint_mask": (keep[:, :, None].astype(jnp.float32), jnp.ones(keep.shape[:1] + (1,), bool)),
            "inpaint_masked_input": (masked_input, jnp.ones(masked_input.shape[:2], bool)),
        }
        batch["reals"] = diffusion_input
        return super().train_step(state, batch, rng, accum=accum, frozen=frozen,
                                  already_encoded=True)
