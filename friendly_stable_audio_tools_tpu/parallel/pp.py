"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference scales only by data parallelism (PTL DDP / DeepSpeed ZeRO-2,
reference train.py:99-131); pipeline parallelism is a TPU-native addition
for models whose layer stack does not fit one chip even under fsdp.

Design (the `ppermute` pipeline from the JAX scaling playbook):

  * The L identical transformer layers are stacked into one pytree with a
    leading layer axis, reshaped to [P, L/P] and sharded over `pipe` — each
    device holds one contiguous STAGE of L/P layers.
  * Inside `shard_map`, every device runs the same tick loop (a single
    `lax.scan`, so the whole schedule is one compiled program):
      - stage 0 ingests the next microbatch, other stages take the
        activation received from their predecessor;
      - the device applies its stage (an inner `lax.scan` over its layers);
      - activations rotate one step along the ring via `lax.ppermute`.
  * After M + P - 1 ticks every microbatch has traversed all stages; the
    last stage scatters its results into the output buffer, which a final
    `psum` replicates (all other devices contribute zeros).

The bubble is the standard (P-1)/(M+P-1); choose n_microbatches >= P.
Everything is differentiable (`ppermute`'s transpose is the reverse
permutation), so the same executor serves training.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def stack_layer_params(params: dict, depth: int, prefix: str = "layer"):
    """[{prefix}0..{prefix}{depth-1}] subtrees -> one pytree stacked on a
    new leading layer axis (all layers share one module structure)."""
    layers = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, depth: int, prefix: str = "layer") -> dict:
    """Inverse of stack_layer_params."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda a, i=i: a[i], stacked)
        for i in range(depth)
    }


def shard_stage_params(stacked, mesh: Mesh, axis: str = "pipe"):
    """Reshape [L, ...] stacked layer params to [P, L/P, ...] and place each
    stage on its pipeline device."""
    p = mesh.shape[axis]

    def reshape(a):
        l = a.shape[0]
        assert l % p == 0, f"depth {l} not divisible by pipe={p}"
        return jax.device_put(
            a.reshape(p, l // p, *a.shape[1:]),
            NamedSharding(mesh, P(axis)),
        )

    return jax.tree_util.tree_map(reshape, stacked)


def pipeline_apply(
    block_fn: tp.Callable,
    stage_params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int = 4,
    broadcast_args: tp.Tuple = (),
    per_sample_args: tp.Tuple = (),
):
    """Run x [B, ...] through the full layer stack with GPipe scheduling.

    block_fn(layer_params, x_mb, *broadcast_args, *per_sample_args_mb)
    applies ONE layer. stage_params: pytree with leading axes [P, L/P, ...]
    sharded on `axis` (from shard_stage_params). B must be divisible by
    n_microbatches.

    Conditioning is passed as real arguments — replicated over the pipe
    axis, NOT closed over — so per-request values never bake into the
    compiled program as constants. Two kinds:
      * broadcast_args: identical for every sample (rotary tables).
      * per_sample_args: leading batch axis B (cross-attention context,
        global conditioning). Stage p at tick t processes microbatch
        j = t - p, so each stage indexes the microbatch-aligned slice
        dynamically — the conditioning travels with its microbatch.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    assert b % n_microbatches == 0, f"batch {b} % microbatches {n_microbatches}"
    mb = b // n_microbatches
    xs = x.reshape(n_microbatches, mb, *x.shape[1:])
    ps_args = tuple(a.reshape(n_microbatches, mb, *a.shape[1:]) for a in per_sample_args)

    n_b = len(broadcast_args)

    def run(stage_p, xs, *cond):
        bargs, psargs = cond[:n_b], cond[n_b:]
        p = jax.lax.axis_index(axis)
        stage_p = jax.tree_util.tree_map(lambda a: a[0], stage_p)  # local [L/P, ...]
        m = xs.shape[0]
        n_ticks = m + n_stages - 1

        def apply_stage(x_mb, ps_mb):
            def body(h, layer_p):
                return block_fn(layer_p, h, *bargs, *ps_mb), None
            y, _ = jax.lax.scan(body, x_mb, stage_p)
            return y

        def tick(carry, t):
            act, out = carry
            feed = xs[jnp.clip(t, 0, m - 1)]
            my_in = jnp.where(p == 0, feed, act)
            # microbatch index this stage is working on at tick t
            j = jnp.clip(t - p, 0, m - 1)
            ps_mb = tuple(a[j] for a in psargs)
            y = apply_stage(my_in, ps_mb)
            idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            out_upd = jax.lax.dynamic_update_slice_in_dim(out, y[None], idx, axis=0)
            write = jnp.logical_and(p == n_stages - 1, t >= n_stages - 1)
            out = jnp.where(write, out_upd, out)
            act = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (act, out), None

        (_, out), _ = jax.lax.scan(
            tick, (jnp.zeros_like(xs[0]), jnp.zeros_like(xs)), jnp.arange(n_ticks))
        # only the last stage wrote real values; everyone else holds zeros
        return jax.lax.psum(out, axis)

    in_specs = (P(axis), P()) + tuple(P() for _ in (broadcast_args + ps_args))
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=P())
    try:
        fn = shard_map(run, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - pre-0.8 jax uses check_rep
        fn = shard_map(run, check_rep=False, **kwargs)
    out = fn(stage_params, xs, *broadcast_args, *ps_args)
    return out.reshape(b, *x.shape[1:])


def pipeline_transformer_block_fn(block_module, arg_names: tp.Tuple[str, ...] = ()):
    """Adapter: one ContinuousTransformer TransformerBlock as a pipeline
    block_fn. `arg_names` names the broadcast_args positions — per-request
    conditioning (rotary_pos_emb, context, global_cond) flows through
    pipeline_apply's broadcast_args as real jit arguments so it is never
    baked into the compiled program as constants."""

    def block_fn(layer_params, x, *bargs):
        kwargs = dict(zip(arg_names, bargs))
        return block_module.apply({"params": layer_params}, x, **kwargs)

    return block_fn


def pipeline_continuous_transformer(
    transformer,
    params: dict,
    x: jnp.ndarray,
    mesh: Mesh,
    context: tp.Optional[jnp.ndarray] = None,
    global_cond: tp.Optional[jnp.ndarray] = None,
    prepend_embeds: tp.Optional[jnp.ndarray] = None,
    axis: str = "pipe",
    n_microbatches: int = 4,
):
    """Full ContinuousTransformer inference forward with the layer stack
    pipelined over `axis` — project_in, prepend tokens, rotary table, the
    TransformerBlock stack via GPipe, project_out.

    Mirrors models/transformer.py ContinuousTransformer.__call__'s
    inference path (no masks / kv caches / causal decode / seq-pad); parity
    with the module forward is pinned by tests/test_pipeline_parallel.py.
    Conditioning flows via broadcast_args (real jit arguments).
    """
    from ..models.transformer import TransformerBlock
    from ..ops.embeddings import rotary_freqs

    tr = transformer
    assert not tr.causal and tr.natten_kernel_size is None \
        and not tr.use_sinusoidal_emb and not tr.use_abs_pos_emb \
        and tr.seq_shard_axis is None, \
        "pipeline_continuous_transformer covers the plain inference path"

    if tr.dim_in:
        x = x @ params["project_in"]["kernel"].astype(x.dtype)
    if prepend_embeds is not None:
        x = jnp.concatenate([prepend_embeds.astype(x.dtype), x], axis=-2)

    rot = None
    if tr.rotary_pos_emb:
        rot_dim = min(max(tr.dim_heads // 2, 32), tr.dim_heads)
        rot = rotary_freqs(x.shape[1], rot_dim)

    block = TransformerBlock(
        dim=tr.dim,
        dim_heads=tr.dim_heads,
        cross_attend=tr.cross_attend,
        dim_context=tr.cond_token_dim if tr.cross_attend else None,
        global_cond_dim=tr.global_cond_dim,
        causal=tr.causal,
        zero_init_branch_outputs=tr.zero_init_branch_outputs,
        conformer=tr.conformer,
        qk_norm=tr.qk_norm,
        natten_kernel_size=tr.natten_kernel_size,
        ff_mult=tr.ff_mult,
    )
    names, b_vals, ps_names, ps_vals = [], [], [], []
    if rot is not None:
        names.append("rotary_pos_emb")
        b_vals.append(rot)
    if context is not None:
        ps_names.append("context")
        ps_vals.append(context)
    if global_cond is not None:
        ps_names.append("global_cond")
        ps_vals.append(global_cond)
    block_fn = pipeline_transformer_block_fn(block, arg_names=tuple(names + ps_names))

    stage_p = shard_stage_params(stack_layer_params(params, tr.depth), mesh, axis=axis)
    x = pipeline_apply(block_fn, stage_p, x, mesh, axis=axis,
                       n_microbatches=n_microbatches, broadcast_args=tuple(b_vals),
                       per_sample_args=tuple(ps_vals))

    if tr.dim_out:
        x = x @ params["project_out"]["kernel"].astype(x.dtype)
    return x
