"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL stack (PTL DDP /
DeepSpeed ZeRO-2, train.py:99-131; HF Accelerate work-sharding,
generate.py:119-120):

  * DDP parity  -> `data` mesh axis: batch sharded, params replicated; the
    gradient all-reduce is inserted by XLA from sharding annotations.
  * ZeRO-2 parity -> `fsdp` axis: parameters (and hence Adam moments, which
    follow the param sharding) sharded on their largest divisible axis,
    all-gathered on use; reduce-scatter on gradients — all compiler-inserted.
  * Multi-node -> mesh over DCN via jax.distributed (slower outer axis).

No parameter-server / wrapper classes: shardings are data, attached to
arrays, and jit compiles the collectives.
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: tp.Optional[int] = None,
    data: tp.Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'fsdp', 'tensor', 'seq', 'pipe') mesh. Defaults to
    pure data parallelism over all local devices; `seq` is the
    sequence-parallel axis for long-form DiT inference (parallel/sp.py),
    `pipe` the pipeline-parallel stage axis (parallel/pp.py)."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data is None:
        data = n // (fsdp * tensor * seq * pipe)
    assert data * fsdp * tensor * seq * pipe == n, \
        f"mesh {data}x{fsdp}x{tensor}x{seq}x{pipe} != {n} devices"
    return Mesh(devices.reshape(data, fsdp, tensor, seq, pipe),
                ("data", "fsdp", "tensor", "seq", "pipe"))


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading (batch) axis over data+fsdp axes."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(("data", "fsdp")))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec(x)), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def _largest_divisible_axis(shape: tp.Tuple[int, ...], n: int) -> tp.Optional[int]:
    best = None
    best_size = 0
    for i, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best, best_size = i, s
    return best


def fsdp_shard_params(params, mesh: Mesh, min_size: int = 2**14):
    """ZeRO-style parameter sharding: each large param is sharded on its
    largest axis divisible by the fsdp axis size; small params replicate.
    Optimizer state created from these params inherits the same shardings."""
    n = mesh.shape["fsdp"]

    def shard_one(x):
        if not hasattr(x, "shape") or x.ndim == 0 or np.prod(x.shape) < min_size or n == 1:
            return jax.device_put(x, NamedSharding(mesh, P()))
        ax = _largest_divisible_axis(x.shape, n)
        if ax is None:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[ax] = "fsdp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(shard_one, params)


def sharding_like(tree):
    """Extract the NamedSharding pytree of an already-placed pytree (for
    donate/out_shardings plumbing)."""
    return jax.tree_util.tree_map(lambda x: x.sharding if hasattr(x, "sharding") else None, tree)
