"""GPipe pipeline parallelism (parallel/pp.py): output parity with the
sequential layer stack, gradient flow, and the DiT TransformerBlock adapter
on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.parallel.mesh import create_mesh
from friendly_stable_audio_tools_tpu.parallel.pp import (
    pipeline_apply,
    pipeline_transformer_block_fn,
    shard_stage_params,
    stack_layer_params,
    unstack_layer_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs the 8-virtual-device CPU mesh"
)


def _mlp_block(layer_params, x):
    h = jnp.tanh(x @ layer_params["w1"] + layer_params["b1"])
    return x + h @ layer_params["w2"]


def _make_mlp_stack(depth, dim, hidden, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"layer{i}": {
            "w1": jnp.asarray(rng.standard_normal((dim, hidden)) * 0.3, jnp.float32),
            "b1": jnp.asarray(rng.standard_normal((hidden,)) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((hidden, dim)) * 0.3, jnp.float32),
        }
        for i in range(depth)
    }


def _sequential(params, depth, x):
    for i in range(depth):
        x = _mlp_block(params[f"layer{i}"], x)
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (4, 8)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    depth, dim, hidden, batch = 8, 16, 32, 8
    params = _make_mlp_stack(depth, dim, hidden)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((batch, 6, dim)), jnp.float32)

    mesh = create_mesh(n_stages, data=1, pipe=n_stages)
    stacked = stack_layer_params(params, depth)
    stage_p = shard_stage_params(stacked, mesh)

    y_pp = pipeline_apply(_mlp_block, stage_p, x, mesh, n_microbatches=n_micro)
    y_seq = _sequential(params, depth, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq), rtol=2e-5, atol=2e-5)


def test_stack_unstack_roundtrip():
    params = _make_mlp_stack(4, 8, 12)
    stacked = stack_layer_params(params, 4)
    back = unstack_layer_params(stacked, 4)
    for i in range(4):
        for k in ("w1", "b1", "w2"):
            np.testing.assert_array_equal(
                np.asarray(back[f"layer{i}"][k]), np.asarray(params[f"layer{i}"][k]))


def test_pipeline_gradients_match_sequential():
    depth, dim, hidden, batch = 4, 8, 16, 4
    params = _make_mlp_stack(depth, dim, hidden)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((batch, 3, dim)), jnp.float32)
    mesh = create_mesh(4, data=1, pipe=4)
    stacked = stack_layer_params(params, depth)

    def loss_pp(stacked_p):
        stage_p = shard_stage_params(stacked_p, mesh)
        y = pipeline_apply(_mlp_block, stage_p, x, mesh, n_microbatches=4)
        return jnp.sum(y ** 2)

    def loss_seq(p):
        return jnp.sum(_sequential(p, depth, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = stack_layer_params(jax.grad(loss_seq)(params), depth)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pipeline_transformer_blocks():
    """The DiT TransformerBlock stack through the pipeline equals the
    sequential apply (self-attention blocks with rotary, like the dryrun)."""
    from friendly_stable_audio_tools_tpu.models.transformer import TransformerBlock
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    depth, dim, heads_dim, batch, seq = 4, 32, 16, 4, 24
    block = TransformerBlock(dim=dim, dim_heads=heads_dim)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((batch, seq, dim)), jnp.float32)
    rot = rotary_freqs(seq, heads_dim // 2)

    rng = jax.random.PRNGKey(0)
    params = {}
    for i in range(depth):
        p = block.init(jax.random.fold_in(rng, i), x, rotary_pos_emb=rot)["params"]
        # de-zero the zero-init residual out-projections so layers act
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(jax.random.fold_in(rng, 100 + i), len(leaves))
        leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        params[f"layer{i}"] = jax.tree_util.tree_unflatten(treedef, leaves)

    block_fn = pipeline_transformer_block_fn(block, arg_names=("rotary_pos_emb",))

    y_seq = x
    for i in range(depth):
        y_seq = block_fn(params[f"layer{i}"], y_seq, rot)

    mesh = create_mesh(4, data=1, pipe=4)
    stage_p = shard_stage_params(stack_layer_params(params, depth), mesh)
    y_pp = pipeline_apply(block_fn, stage_p, x, mesh, n_microbatches=4,
                          broadcast_args=(rot,))
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq), rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_pipeline_transformer_gradients_match_sequential():
    """Training parity: grads w.r.t. the stacked TransformerBlock params
    through the GPipe executor equal the sequential stack's grads (VERDICT
    round-2 item 9: pipeline backward beyond smoke level)."""
    from friendly_stable_audio_tools_tpu.models.transformer import TransformerBlock
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    depth, dim, heads_dim, batch, seq = 4, 32, 16, 4, 12
    block = TransformerBlock(dim=dim, dim_heads=heads_dim)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((batch, seq, dim)), jnp.float32)
    rot = rotary_freqs(seq, heads_dim // 2)

    rng = jax.random.PRNGKey(9)
    params = {}
    for i in range(depth):
        p = block.init(jax.random.fold_in(rng, i), x, rotary_pos_emb=rot)["params"]
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(jax.random.fold_in(rng, 100 + i), len(leaves))
        leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        params[f"layer{i}"] = jax.tree_util.tree_unflatten(treedef, leaves)

    block_fn = pipeline_transformer_block_fn(block, arg_names=("rotary_pos_emb",))
    stacked = stack_layer_params(params, depth)
    mesh = create_mesh(4, data=1, pipe=4)
    tgt = jnp.asarray(np.random.default_rng(8).standard_normal((batch, seq, dim)), jnp.float32)

    def loss_pp(stacked_p):
        stage_p = shard_stage_params(stacked_p, mesh)
        y = pipeline_apply(block_fn, stage_p, x, mesh, n_microbatches=4,
                           broadcast_args=(rot,))
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(p):
        y = x
        for i in range(depth):
            y = block_fn(p[f"layer{i}"], y, rot)
        return jnp.mean((y - tgt) ** 2)

    l_pp, g_pp = jax.value_and_grad(loss_pp)(stacked)
    l_seq, g_seq_tree = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-5)
    g_seq = stack_layer_params(g_seq_tree, depth)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pipeline_full_continuous_transformer():
    """pipeline_continuous_transformer == the module's own forward, with
    cross-attention context, adaLN global cond, prepend tokens, and
    project_in/out — the real DiT configuration."""
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer
    from friendly_stable_audio_tools_tpu.parallel.pp import pipeline_continuous_transformer

    model = ContinuousTransformer(
        dim=32, depth=4, dim_heads=16, dim_in=8, dim_out=8,
        cross_attend=True, cond_token_dim=32, global_cond_dim=32,
    )
    rng = jax.random.PRNGKey(0)
    b, seq = 4, 22
    x = jax.random.normal(rng, (b, seq, 8), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (b, 6, 32), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(rng, 2), (b, 32), jnp.float32)
    pre = jax.random.normal(jax.random.fold_in(rng, 3), (b, 2, 32), jnp.float32)
    params = model.init(jax.random.fold_in(rng, 4), x, context=ctx,
                        global_cond=g, prepend_embeds=pre)["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.fold_in(rng, 5), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    y_seq = model.apply({"params": params}, x, context=ctx, global_cond=g,
                        prepend_embeds=pre)
    mesh = create_mesh(4, data=1, pipe=4)
    y_pp = pipeline_continuous_transformer(
        model, params, x, mesh, context=ctx, global_cond=g,
        prepend_embeds=pre, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               rtol=3e-5, atol=3e-5)
