"""Fused SwiGLU MLP Pallas kernel for the DiT hot path.

The per-layer MLP (reference models/transformer.py:241-287: GLU in-proj ->
silu-mul -> out-proj) is the largest GEMM group in the DiT step (116 of
164 GFLOP/layer at SAO shapes). Run as separate XLA ops it round-trips the
[M, 2*inner] GLU intermediate (~50 MB bf16 at M=2052) plus the [M, inner]
activation product through HBM between the two GEMMs.

This kernel fuses the whole chain: grid over (M blocks, inner blocks), the
[bm, K] input block and a [bm, K] fp32 accumulator stay resident in VMEM
across the inner dimension; value/gate projections, the silu-mul, and the
out-projection partial product all happen on VMEM tiles. The GLU
intermediate never touches HBM.

Numerics track the unfused XLA chain closely but are NOT bit-exact: the
dots are bf16 x bf16 -> fp32 accumulate and the value/gate tiles round to
bf16 at the same points the XLA chain's GEMM outputs do (bias adds and the
silu-mul run in bf16, sigmoid in fp32 then rounded), but Mosaic's and XLA's
fp32 sigmoid implementations may differ in the last ulp. rel-l2 vs the XLA
chain is bounded in tests/test_pallas_kernels.py.

Weight layout: value kernel [K, inner], gate kernel [K, inner] (the two
halves of the reference's doubled in-projection), out kernel [inner, K_out].
Weight blocks stream HBM->VMEM once per M block — at SAO shapes (M=2052,
bm 512+) that traffic is ~2x the unfused chain's weight reads but far less
than the intermediate round-trips it removes, and it double-buffers under
the dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    import os

    return os.environ.get("FSAT_PALLAS_INTERPRET") == "1"


def fused_mlp_enabled() -> bool:
    """Route FeedForward's SwiGLU through the fused Pallas kernel.

    Opt-in via FSAT_FUSED_MLP=1; FSAT_DISABLE_FUSED_MLP=1 forces off.
    Off under FSAT_INT8_MATMUL (the int8 path owns those GEMMs) and on CPU
    unless interpret mode is on (tests). Trace-time: both flags are in
    utils/trace_flags.TRACE_TIME_ENV_FLAGS."""
    import os

    import jax

    from ..quant import int8_matmul_enabled

    # tag "mlp": FSAT_INT8_SCOPE=mlp still quantizes these GEMMs, so the
    # fused bf16 kernel must yield (untagged check would miss the scoped case
    # and silently run bf16 under an "int8 mlp-only" label)
    if os.environ.get("FSAT_DISABLE_FUSED_MLP") == "1" or int8_matmul_enabled("mlp"):
        return False
    if os.environ.get("FSAT_FUSED_MLP") != "1":
        return False
    return jax.default_backend() != "cpu" or _interpret()


def pick_block_j(inner: int):
    """Largest supported inner-dim block that tiles `inner` exactly, or None
    when the kernel cannot run this shape (caller falls back to XLA)."""
    for bj in (2048, 1024, 512, 256, 128):
        if inner % bj == 0:
            return bj
    return None


_VMEM_BUDGET = 88 * 2**20  # leave headroom under the 100 MB compiler limit


def _vmem_bytes(bm: int, bj: int, k: int, k_out: int, itemsize: int) -> int:
    # Pallas double-buffers EVERY grid-indexed block, not just the weight
    # tiles: 2x x block + fp32 acc scratch + 2x out block + 2x weight tiles
    # (wv, wg, wo). Counting x/out single-buffered underestimated fp32
    # shapes by ~2x and OOM'd the 100 MB scoped-vmem limit at init-trace
    # (fp32) batch-8 DiT shapes.
    return (2 * bm * k * itemsize + bm * k_out * 4 + 2 * bm * k_out * itemsize
            + 2 * (2 * k * bj + bj * k_out) * itemsize)


def pick_blocks(m: int, inner: int, k: int, k_out: int, itemsize: int = 2):
    """Shape-aware (block_m, block_j) choice.

    Measured on v5e at SAO DiT shapes (M=2052, K=1536, inner=6144): a single
    M block with bj=2048 runs ~165 TFLOP/s vs ~139 for the unfused XLA chain,
    while the old fixed bm=512 padded M 2052->2560 (+25% wasted rows) and
    re-streamed weights per M block. Prefer one M block when it fits the
    VMEM budget; otherwise shrink bj, then split M.
    """
    bj0 = pick_block_j(inner)
    if bj0 is None:
        return None, None
    align = 16 if itemsize == 2 else 8
    m_aligned = (m + align - 1) // align * align
    for bm in (m_aligned, 2048, 1024, 512, 256):
        if bm > m_aligned:
            continue
        bj = bj0
        while bj >= 128:
            if inner % bj == 0 and _vmem_bytes(bm, bj, k, k_out, itemsize) <= _VMEM_BUDGET:
                return bm, bj
            bj //= 2
    return 256, min(bj0, 128 if inner % 128 == 0 else bj0)


def _glu_mlp_kernel(x_ref, wv_ref, wg_ref, wo_ref, bv_ref, bg_ref,
                    o_ref, acc_ref, *, n_j: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    dt = x.dtype
    v = jax.lax.dot_general(x, wv_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # match the unfused chain's rounding points: GEMM output rounds to the
    # input dtype, then the bias add and silu-mul run in that dtype (flax
    # Dense adds a promoted-dtype bias after the dot); sigmoid computes in
    # fp32 and rounds, like XLA's upcast-compute-downcast bf16 elementwise
    v = v.astype(dt) + bv_ref[:].astype(dt)
    g = g.astype(dt) + bg_ref[:].astype(dt)
    h = v * (g * jax.nn.sigmoid(g.astype(jnp.float32)).astype(dt))
    acc_ref[:] += jax.lax.dot_general(h, wo_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _glu_mlp_impl(x, w_value, w_gate, w_out, b_value, b_gate,
                  block_m: int, block_j: int):
    *lead, k = x.shape
    inner = w_value.shape[1]
    k_out = w_out.shape[1]
    assert w_gate.shape == (k, inner) and w_out.shape[0] == inner

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    # bf16 TPU tiling wants the second-to-minor block dim 16-aligned (an
    # 8-only multiple like 2056 can fail Mosaic lowering or degrade)
    align = 16 if x.dtype == jnp.bfloat16 else 8
    bm = min(block_m, (m + align - 1) // align * align)
    bj = min(block_j, inner)
    assert inner % bj == 0, (inner, bj)
    n_j = inner // bj
    pm = (bm - m % bm) % bm
    if pm:
        x2 = jnp.pad(x2, ((0, pm), (0, 0)))
    n_m = x2.shape[0] // bm

    bv = jnp.broadcast_to(b_value.astype(jnp.float32), (1, inner))
    bg = jnp.broadcast_to(b_gate.astype(jnp.float32), (1, inner))

    out = pl.pallas_call(
        functools.partial(_glu_mlp_kernel, n_j=n_j),
        grid=(n_m, n_j),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bj), lambda i, j: (0, j)),
            pl.BlockSpec((k, bj), lambda i, j: (0, j)),
            pl.BlockSpec((bj, k_out), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bj), lambda i, j: (0, j)),
            pl.BlockSpec((1, bj), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, k_out), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], k_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(x2, w_value, w_gate, w_out, bv, bg)

    if pm:
        out = out[:m]
    return out.reshape(*lead, k_out)


def _xla_reference(x, w_value, w_gate, w_out, b_value, b_gate):
    """The unfused chain the kernel replaces (same bf16 rounding points)."""
    v = (x @ w_value + b_value.astype(x.dtype)).astype(x.dtype)
    g = (x @ w_gate + b_gate.astype(x.dtype)).astype(x.dtype)
    return ((v * jax.nn.silu(g)) @ w_out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _glu_mlp(x, w_value, w_gate, w_out, b_value, b_gate, block_m, block_j):
    return _glu_mlp_impl(x, w_value, w_gate, w_out, b_value, b_gate,
                         block_m, block_j)


def _glu_mlp_fwd(x, w_value, w_gate, w_out, b_value, b_gate, block_m, block_j):
    # training: gradients via the XLA chain's vjp (same math, standard
    # rematerialization; the fused kernel is an inference-throughput tool)
    out, vjp = jax.vjp(_xla_reference, x, w_value, w_gate, w_out, b_value, b_gate)
    return out, vjp


def _glu_mlp_bwd(block_m, block_j, vjp, dy):
    return vjp(dy)


_glu_mlp.defvjp(_glu_mlp_fwd, _glu_mlp_bwd)


def glu_mlp(x: jnp.ndarray, w_value: jnp.ndarray, w_gate: jnp.ndarray,
            w_out: jnp.ndarray, b_value: jnp.ndarray = None,
            b_gate: jnp.ndarray = None,
            block_m: int = None, block_j: int = None) -> jnp.ndarray:
    """x [..., K] -> ((x @ w_value + b_value) * silu(x @ w_gate + b_gate)) @ w_out.

    The GLU intermediate lives only in VMEM. The caller adds any output-
    projection bias itself (it is a plain epilogue add). Block sizes default
    to the shape-aware `pick_blocks` choice (single M block where VMEM
    allows — the measured-fastest config at SAO shapes).
    """
    inner = w_value.shape[1]
    if b_value is None:
        b_value = jnp.zeros((inner,), jnp.float32)
    if b_gate is None:
        b_gate = jnp.zeros((inner,), jnp.float32)
    if block_m is None or block_j is None:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        auto_bm, auto_bj = pick_blocks(m, inner, x.shape[-1], w_out.shape[1],
                                       x.dtype.itemsize)
        block_m = block_m or auto_bm
        block_j = block_j or auto_bj
    return _glu_mlp(x, w_value, w_gate, w_out, b_value, b_gate, block_m, block_j)
