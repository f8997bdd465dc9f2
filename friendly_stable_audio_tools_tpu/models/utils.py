"""Model utilities: checkpoint I/O and sampling helpers.

Parity target: reference `models/utils.py:7-86` (ckpt loader handling
safetensors vs {"state_dict": ...}, multinomial/top-k/top-p sampling).
"""

from __future__ import annotations

import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def load_ckpt_state_dict(ckpt_path: str) -> dict:
    """Load a checkpoint into a flat/nested dict of numpy arrays.

    Supports: .safetensors; torch .ckpt/.pt (requires torch; unwraps
    {"state_dict": ...}); orbax/npz trees saved by this framework.
    (reference models/utils.py:7-13)
    """
    if ckpt_path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(ckpt_path)
    if ckpt_path.endswith(".npz"):
        data = np.load(ckpt_path, allow_pickle=False)
        return {k: data[k] for k in data.files}
    if os.path.isdir(ckpt_path):  # orbax checkpoint dir
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(ckpt_path))
    # torch pickle checkpoint
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}


def save_ckpt_state_dict(params, path: str) -> None:
    """Save a (nested) param pytree as safetensors (flat, '/'-joined keys)."""
    from safetensors.numpy import save_file

    from ..utils.common import _flatten_dict

    flat = _flatten_dict(params) if isinstance(params, dict) else dict(params)
    # ascontiguousarray: safetensors serializes the raw buffer, so transposed
    # (non-contiguous) views — e.g. torch->JAX converted kernels — would be
    # written with wrong element order otherwise.
    flat = {k: np.ascontiguousarray(np.asarray(v)) for k, v in flat.items()}
    save_file(flat, path)


def remove_weight_norm_from_model(params: dict) -> dict:
    """Fold (v, g) weight-norm parameterization into plain kernels
    (reference models/utils.py:16-22). Operates on a nested param tree,
    rewriting any subtree {v, g, bias?} into {kernel, bias?}."""

    def fold(tree):
        if isinstance(tree, dict):
            if "v" in tree and "g" in tree and not isinstance(tree["v"], dict):
                v, g = np.asarray(tree["v"]), np.asarray(tree["g"])
                if g.shape[0] == v.shape[-1]:  # conv: per-out-channel
                    norm = np.sqrt((v**2).sum(axis=(0, 1)))
                    kernel = v * (g / (norm + 1e-12))
                else:  # transposed conv: per-in-channel
                    norm = np.sqrt((v**2).sum(axis=(0, 2)))
                    kernel = v * (g / (norm + 1e-12))[None, :, None]
                out = {"kernel": kernel}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)


# audiocraft-derived sampling utils (reference models/utils.py:28-86)


def multinomial(rng: jax.Array, probs: jnp.ndarray, num_samples: int = 1) -> jnp.ndarray:
    """Categorical draw over the last axis; keeps batch dims.
    probs [..., K] -> samples [..., num_samples]."""
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    shape = probs.shape[:-1] + (num_samples,)
    return jax.random.categorical(rng, logits[..., None, :], axis=-1, shape=shape)


def sample_top_k(rng: jax.Array, probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep top-k probabilities, renormalize, sample (reference utils.py:45-61)."""
    v, _ = jax.lax.top_k(probs, k)
    min_v = v[..., -1:]
    probs = jnp.where(probs < min_v, 0.0, probs)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return multinomial(rng, probs, num_samples=1)


def sample_top_p(rng: jax.Array, probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus sampling (reference utils.py:64-86)."""
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(probs_sort, axis=-1)
    mask = (cum - probs_sort) > p
    probs_sort = jnp.where(mask, 0.0, probs_sort)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    draw = multinomial(rng, probs_sort, num_samples=1)
    return jnp.take_along_axis(sort_idx, draw, axis=-1)


def load_unwrapped_checkpoint(model, ckpt_path: str):
    """Load an unwrapped (exported) checkpoint into a model wrapper.

    Handles this framework's export formats: model params at the root
    (current), a legacy "model/" root prefix (earlier exports), and trained
    conditioner weights under "conditioner/<id>/" (copied into the wrapper's
    conditioners when present). Shape-checked partial load via
    copy_state_dict.
    """
    from ..utils.common import _flatten_dict, copy_state_dict

    flat = load_ckpt_state_dict(ckpt_path)
    flat = _flatten_dict(flat) if any(isinstance(v, dict) for v in flat.values()) else dict(flat)

    cond_flat = {k[len("conditioner/"):]: v for k, v in flat.items()
                 if k.startswith("conditioner/")}
    model_flat = {k: v for k, v in flat.items() if not k.startswith("conditioner/")}
    if model_flat and all(k.startswith("model/") for k in model_flat):
        model_flat = {k[len("model/"):]: v for k, v in model_flat.items()}

    model.params = copy_state_dict(model.params, model_flat)

    conditioner = getattr(model, "conditioner", None)
    if cond_flat and conditioner is not None:
        for cid, c in conditioner.conditioners.items():
            sub = {k[len(cid) + 1:]: v for k, v in cond_flat.items()
                   if k.startswith(cid + "/")}
            if sub and c.params:
                c.params = copy_state_dict(c.params, sub)
    return model
