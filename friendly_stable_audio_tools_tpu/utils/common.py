"""Process/host utilities.

JAX-native equivalents of the reference's `utils/torch_common.py:12-61`:
rank/world helpers degrade to (0, 1) single-process, `set_seed` seeds every
host RNG, and `copy_state_dict` does a shape-checked partial pytree load.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def get_rank() -> int:
    """Index of this host process (reference: torch_common.py:12-17)."""
    try:
        return jax.process_index()
    except Exception:
        return 0


def get_world_size() -> int:
    """Number of host processes (reference: torch_common.py:19-24)."""
    try:
        return jax.process_count()
    except Exception:
        return 1


def print_once(*args, **kwargs) -> None:
    """Print from process 0 only (reference: torch_common.py:27-29)."""
    if get_rank() == 0:
        print(*args, **kwargs)


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a root `jax.random` key.

    The reference (torch_common.py:32-38) seeds python/numpy/torch and
    PYTHONHASHSEED; in JAX, device randomness flows through explicit keys, so
    we additionally return the root key for the caller to thread.
    """
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def count_parameters(params) -> int:
    """Total number of elements in a parameter pytree
    (reference: torch_common.py:41-43 counts trainable torch params)."""
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(leaf.shape) for leaf in leaves if hasattr(leaf, "shape")))


def copy_state_dict(params, state_dict, prefix: str = ""):
    """Shape-checked partial load of `state_dict` into the pytree `params`.

    Mirrors the reference's `copy_state_dict` (torch_common.py:46-61): keys
    present in both with matching shapes are copied; mismatched or missing
    keys are reported and left at their current value.

    Args:
        params: nested-dict parameter pytree (as produced by `module.init`).
        state_dict: flat dict mapping "/"-joined paths to arrays, or a nested
            dict pytree of the same structure.
        prefix: optional key prefix stripped from `state_dict` keys.
    Returns:
        new pytree with copied values.
    """
    flat = _flatten_dict(state_dict) if _is_nested(state_dict) else dict(state_dict)
    if prefix:
        flat = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in flat.items()}

    tgt_flat = _flatten_dict(params)
    out = {}
    skipped = []
    for k, v in tgt_flat.items():
        if k in flat and tuple(np.shape(flat[k])) == tuple(v.shape):
            out[k] = np.asarray(flat[k]).astype(v.dtype) if not isinstance(flat[k], jax.Array) else flat[k]
        else:
            if k in flat:
                skipped.append((k, tuple(np.shape(flat[k])), tuple(v.shape)))
            out[k] = v
    for k, got, want in skipped:
        print_once(f"copy_state_dict: shape mismatch for {k}: ckpt {got} vs model {want}; keeping model value")
    missing = [k for k in tgt_flat if k not in flat]
    if missing:
        print_once(f"copy_state_dict: {len(missing)} params not found in checkpoint (kept at init)")
    return _unflatten_dict(out)


def _is_nested(d) -> bool:
    return isinstance(d, dict) and any(isinstance(v, dict) for v in d.values())


def _flatten_dict(d, parent: str = "", sep: str = "/"):
    items = {}
    for k, v in d.items():
        key = f"{parent}{sep}{k}" if parent else str(k)
        if isinstance(v, dict):
            items.update(_flatten_dict(v, key, sep))
        else:
            items[key] = v
    return items


def _unflatten_dict(flat, sep: str = "/"):
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(sep)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out

def enable_compilation_cache(path: str = "/tmp/jax_cache") -> None:
    """CLI entry-point JAX init: persistent compilation cache + platform pin.

    First TPU compile of the SAO sampler scan is ~20-40 s; the on-disk cache
    makes repeat CLI invocations (generate, reconstruct, gradio restarts)
    start in seconds. Honors an existing JAX_COMPILATION_CACHE_DIR; safe to
    call before or after backend init.

    Also pins `jax_platforms` from the JAX_PLATFORMS env var in-process:
    site hooks that force-register an accelerator plugin override the bare
    env var, so `JAX_PLATFORMS=cpu python generate.py ...` would otherwise
    silently run on (or hang on) the accelerator."""
    path = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass  # older jax: env var alone is sufficient
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass  # backend already initialized: too late to repin


def dezero_params(params, seed: int = 7, scale: float = 0.02,
                  damp: float = 0.5, dtype=None):
    """Perturb every param leaf: `damp * leaf + scale * normal(key)`.

    The transformers' zero-init output projections (reference parity) make a
    FRESH-INIT forward input-independent (CLAUDE.md): any output-sensitivity
    comparison on fresh params — int8 fidelity, quantization error, parity
    probes — passes vacuously without this. One shared implementation so
    every harness (bench.py, scripts/tpu_probe.py, tests) applies the same
    invariant instead of re-deriving it.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [(l * damp + scale * jax.random.normal(k, l.shape)).astype(
        dtype if dtype is not None else l.dtype) for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
