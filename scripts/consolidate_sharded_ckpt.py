#!/usr/bin/env python3
"""Consolidate a sharded (multi-host / ZeRO-style) orbax checkpoint into a
single-file checkpoint loadable on one host.

Parity target: reference `scripts/ds_zero_to_pl_ckpt.py:2-14`, which converts
a DeepSpeed ZeRO shard directory into one fp32 Lightning checkpoint. In this
framework the training Trainer saves orbax checkpoints; when training ran
with parameters/optimizer state sharded over an `fsdp` mesh axis (the ZeRO-2
analogue, SURVEY.md §2.9), orbax stores per-shard array chunks. This script
restores the tree on host RAM (orbax reassembles shards transparently on a
single-process read), upcasts to fp32, and re-saves as one consolidated
checkpoint directory — or, with --safetensors, as a flat safetensors file.

Usage:
  python scripts/consolidate_sharded_ckpt.py --ckpt-dir save/checkpoints/step_10000 \
      --out consolidated_ckpt [--safetensors]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", type=str, required=True,
                   help="Sharded orbax checkpoint directory (one step).")
    p.add_argument("--out", type=str, required=True,
                   help="Output path: orbax dir, or .safetensors with --safetensors.")
    p.add_argument("--safetensors", action="store_true",
                   help="Write a flat safetensors file instead of an orbax dir.")
    p.add_argument("--fp32", action="store_true", default=True,
                   help="Upcast floating arrays to float32 (matches the ZeRO->fp32 "
                        "semantics of the reference converter).")
    args = p.parse_args()

    # Single-process restore: orbax reassembles sharded arrays to full host
    # arrays when no sharding is requested.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # env alone is not enough where a site hook force-registers an
        # accelerator plugin (which may even hang if its tunnel is down);
        # pin the platform before any backend init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(args.ckpt_dir)
    # Restore every leaf as a host numpy array: this reassembles shards and
    # is topology-independent (the checkpoint may have been written from a
    # multi-chip mesh that does not exist on this host).
    meta = ckptr.metadata(path)
    meta_tree = meta
    for attr in ("item_metadata", "tree"):
        if hasattr(meta_tree, attr):
            meta_tree = getattr(meta_tree, attr)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree,
        is_leaf=lambda x: not isinstance(x, dict))
    tree = ckptr.restore(path, restore_args=restore_args)

    def to_fp32(x):
        if hasattr(x, "dtype") and jnp.issubdtype(np.asarray(x).dtype, np.floating):
            return np.asarray(x, dtype=np.float32)
        return x

    if args.fp32:
        tree = jax.tree_util.tree_map(to_fp32, tree)

    if args.safetensors:
        from safetensors.numpy import save_file

        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        tensors = {}
        for path, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            arr = np.asarray(leaf)
            if arr.dtype == object:
                continue  # non-tensor metadata (e.g. embedded model config)
            tensors[key] = np.ascontiguousarray(arr)
        save_file(tensors, args.out)
        print(f"Consolidated {len(tensors)} tensors -> {args.out}")
    else:
        ckptr.save(os.path.abspath(args.out), tree)
        print(f"Consolidated checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
