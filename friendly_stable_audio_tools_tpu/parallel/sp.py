"""Sequence-parallel (context-parallel) sharding for the DiT.

The reference stack has NO sequence parallelism (SURVEY.md §2.9: long
sequences are handled by latent-space downsampling + flash attention on one
device). This is a TPU-native enhancement for long-form workloads (SA 2.0:
6144 latent tokens): activations shard over a `seq` mesh axis, so every
per-token op (LN, projections, FF — the bulk of the FLOPs) runs on T/n
tokens per chip, and attention runs through the XLA einsum path, which GSPMD
partitions with queries sharded over `seq` and keys/values all-gathered over
ICI (the Ulysses-style tradeoff: K/V gather is O(T·D), negligible vs the
O(T²/n·D) attention FLOPs per chip).

The Pallas flash kernel is bypassed when sequence sharding is active — an
opaque custom call would force GSPMD to replicate the whole attention; the
einsum formulation lets the compiler split it. At 6144 tokens the fp32
score tile per chip is [B·H, T/n, T] (~150 MB at n=8, B=2) — well within
HBM.

Usage:
    mesh = create_mesh(jax.devices(), data=1, seq=8)
    dit = DiffusionTransformer(..., seq_shard_axis="seq")
    with mesh:
        out = jax.jit(apply)(params, x, t, ...)
Params stay replicated (or compose with tp/fsdp rules on other axes); only
activation shardings are constrained, collectives are inserted by GSPMD.
"""

from __future__ import annotations

import typing as tp

import jax
from jax.sharding import PartitionSpec as P


def seq_constraint(x, axis: tp.Optional[str]):
    """Constrain [B, T, C] activations to shard T over `axis` (no-op when
    axis is None or not in the current mesh)."""
    if axis is None:
        return x
    try:
        return jax.lax.with_sharding_constraint(x, P(None, axis, None))
    except (ValueError, RuntimeError):
        # no mesh context / axis missing: leave unsharded
        return x
