"""Tensor-parallel sharding rules for the DiT.

The reference stack has NO tensor parallelism (SURVEY.md §2.9) — this is a
TPU-native enhancement for DiTs too large (or too latency-sensitive) for one
chip: Megatron-style column/row sharding of the attention and feed-forward
projections over the mesh's 'tensor' axis, expressed purely as parameter
PartitionSpecs. GSPMD propagates the shardings through the jitted forward and
inserts the all-reduces after the row-parallel projections; no model-code
changes are needed.

Layout (per TransformerBlock, paths from models/transformer.py):
  self_attn/to_qkv      [d, 3d]       column-parallel  P(None, 'tensor')
  self_attn/to_out      [d, d]        row-parallel     P('tensor', None)
  cross_attn/to_q       [d, d]        column-parallel
  cross_attn/to_kv      [dc, 2d]      column-parallel
  cross_attn/to_out     [d, d]        row-parallel
  ff/linear_in/proj     [d, 2*inner]  column-parallel (GLU: gate+value both)
  ff/linear_out         [inner, d]    row-parallel
  norms / embeds / convs               replicated

Use `tp_shard_params(params, mesh)` on a mesh from parallel.mesh.create_mesh
with tensor > 1; batch axes shard over 'data' as usual (composable with DP).
"""

from __future__ import annotations

import re
import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; paths are '/'-joined key strings
DIT_TP_RULES: tp.Tuple[tp.Tuple[str, P], ...] = (
    (r".*self_attn/to_qkv/kernel$", P(None, "tensor")),
    (r".*self_attn/to_out/kernel$", P("tensor", None)),
    (r".*cross_attn/to_q/kernel$", P(None, "tensor")),
    (r".*cross_attn/to_kv/kernel$", P(None, "tensor")),
    (r".*cross_attn/to_out/kernel$", P("tensor", None)),
    (r".*ff/linear_in/proj/kernel$", P(None, "tensor")),
    (r".*ff/linear_in/proj/bias$", P("tensor")),
    (r".*ff/linear_out/kernel$", P("tensor", None)),
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def _spec_for(path_str: str, shape, n_tensor: int,
              compiled: tp.Sequence[tp.Tuple["re.Pattern", P]]) -> P:
    for pat, spec in compiled:
        if pat.match(path_str):
            for i, ax in enumerate(spec):
                if ax is not None and (i >= len(shape) or shape[i] % n_tensor != 0):
                    return P()  # not divisible -> replicate
            return spec
    return P()


def tp_shard_params(params, mesh: Mesh,
                    rules: tp.Sequence[tp.Tuple[str, P]] = DIT_TP_RULES):
    """Place `params` on `mesh` with tensor-parallel shardings (replicated
    over 'data'/'fsdp'). Divisibility is checked per leaf; non-divisible
    leaves replicate."""
    n_t = mesh.shape.get("tensor", 1)
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def place(path, leaf):
        spec = _spec_for(_path_str(path), leaf.shape, max(n_t, 1), compiled)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
