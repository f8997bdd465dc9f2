"""Continuous transformer backbone (DiT / LM core).

Parity target: reference `models/transformer.py` — biasless LayerNorm
(188-206), SwiGLU FeedForward with zero-init output (211-287), fused-QKV /
split-KV Attention with GQA + qk-norm + partial rotary (310-553),
ConformerModule (557-591), TransformerBlock with adaLN 6-way
scale/shift/gate (595-703), ContinuousTransformer (707-809).

TPU notes: attention dispatches through ops/attention (XLA fused or Pallas
flash); per-layer gradient checkpointing becomes `nn.remat`; everything is
channels-last [B, T, C] already.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention, windowed_attention
from ..ops.quant import QuantDense
from ..ops.embeddings import (
    AbsolutePositionalEmbedding,
    ScaledSinusoidalEmbedding,
    apply_rotary_pos_emb,
    rotary_freqs,
)


class LayerNorm(nn.Module):
    """Biasless LN with optional fixed scale (reference transformer.py:188-206)."""

    dim: int
    bias: bool = False
    fix_scale: bool = False

    @nn.compact
    def __call__(self, x, scale_shift=None):
        gamma = (None if self.fix_scale else
                 self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32))
        if scale_shift is not None and not self.bias:
            # adaLN fusion hook: LN + x*(1+scale)+shift in one pass
            # (ops/pallas/elementwise.py; exact XLA fallback when off)
            from ..ops.pallas.elementwise import ln_modulate

            return ln_modulate(x, gamma, *scale_shift)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        if gamma is not None:
            y = y * gamma
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
            y = y + beta
        y = y.astype(x.dtype)
        if scale_shift is not None:
            y = y * (1 + scale_shift[0]) + scale_shift[1]
        return y


class GLU(nn.Module):
    """x*act(gate) after a doubled projection (reference transformer.py:211-238)."""

    dim_in: int
    dim_out: int
    activation: tp.Callable = jax.nn.silu

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        proj = QuantDense(self.dim_out * 2, param_dtype=jnp.float32, quant_tag="mlp", name="proj")
        if return_weights:
            # fused-MLP hook: hand the doubled in-projection weights to the
            # caller (FeedForward) for the Pallas glu_mlp kernel
            return proj(x, return_kernel=True)
        x = proj(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * self.activation(gate)


class FeedForward(nn.Module):
    """SwiGLU MLP, zero-init output (reference transformer.py:241-287)."""

    dim: int
    dim_out: tp.Optional[int] = None
    mult: int = 4
    no_bias: bool = False
    glu: bool = True
    zero_init_output: bool = True

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        dim_out = self.dim_out or self.dim
        kinit = nn.initializers.zeros if self.zero_init_output else nn.initializers.lecun_normal()
        out_dense = QuantDense(
            dim_out, use_bias=not self.no_bias, kernel_init=kinit,
            param_dtype=jnp.float32, quant_tag="mlp", name="linear_out",
        )

        from ..ops.pallas.mlp import fused_mlp_enabled, pick_block_j

        if self.glu and fused_mlp_enabled() and pick_block_j(inner):
            # Fused Pallas SwiGLU: GLU in-proj -> silu-mul -> out-proj in one
            # kernel; the [.., 2*inner] intermediate never touches HBM
            # (ops/pallas/mlp.py). Param tree is identical to the unfused
            # path (weights come from the same submodules via return_kernel).
            from ..ops.pallas.mlp import glu_mlp

            w_in, b_in = GLU(self.dim, inner, name="linear_in")(x, return_weights=True)
            # shape-hint placeholder: out_dense's kernel is [inner, dim_out]
            # (in the unfused path it is called on the inner activation)
            w_out, b_out = out_dense(jnp.zeros((1, inner), x.dtype), return_kernel=True)
            y = glu_mlp(
                x, w_in[:, :inner], w_in[:, inner:], w_out,
                None if b_in is None else b_in[:inner],
                None if b_in is None else b_in[inner:],
            )
            if b_out is not None:
                y = y + b_out
            return y

        if self.glu:
            x = GLU(self.dim, inner, name="linear_in")(x)
        else:
            x = QuantDense(inner, use_bias=not self.no_bias, param_dtype=jnp.float32, quant_tag="mlp", name="linear_in")(x)
            x = jax.nn.silu(x)
        return out_dense(x)


class Attention(nn.Module):
    """Self- or cross-attention (reference transformer.py:310-553).

    Fused QKV for self-attn; separate q / packed kv for cross-attn. GQA when
    dim_context < dim. Optional qk-norm (cosine-sim attention) and 1-D
    neighborhood attention (natten replacement) via `natten_kernel_size`.
    """

    dim: int
    dim_heads: int = 64
    dim_context: tp.Optional[int] = None
    causal: bool = False
    zero_init_output: bool = True
    qk_norm: bool = False
    natten_kernel_size: tp.Optional[int] = None
    # true token count when inputs are pre-padded to an aligned length
    # (padded-sequence path); masks self-attention K/V at this length
    self_kv_len: tp.Optional[int] = None
    # sequence-parallel mesh axis (parallel/sp.py): forces the XLA attention
    # path so GSPMD can partition the einsums (an opaque Pallas call would be
    # replicated); per-token ops shard via activation constraints upstream
    seq_shard_axis: tp.Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,
        context: tp.Optional[jnp.ndarray] = None,
        mask: tp.Optional[jnp.ndarray] = None,
        context_mask: tp.Optional[jnp.ndarray] = None,
        rotary_pos_emb: tp.Optional[jnp.ndarray] = None,
        causal: tp.Optional[bool] = None,
        kv_cache: tp.Optional[tp.Tuple[jnp.ndarray, jnp.ndarray]] = None,
        return_kv: bool = False,
    ):
        has_context = context is not None
        h = self.dim // self.dim_heads
        dim_kv = self.dim_context if self.dim_context else self.dim
        kv_h = dim_kv // self.dim_heads
        kv_input = context if has_context else x

        def split_heads(t, heads):
            b, n, _ = t.shape
            return t.reshape(b, n, heads, self.dim_heads).transpose(0, 2, 1, 3)

        if self.dim_context:
            q = QuantDense(self.dim, use_bias=False, param_dtype=jnp.float32, quant_tag="attn", name="to_q")(x)
            kv = QuantDense(dim_kv * 2, use_bias=False, param_dtype=jnp.float32, quant_tag="attn", name="to_kv")(kv_input)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = QuantDense(self.dim * 3, use_bias=False, param_dtype=jnp.float32, quant_tag="attn", name="to_qkv")(x)

            # Fused qkv-layout + rope + flash-attention path
            # (ops/pallas/flash_attention.py): at head_dim 64 / even heads the
            # head-PAIR kernel reads qkv and writes the output in native
            # [B, T, C] layout — no head split/merge transposes, no separate
            # rope HBM passes. A/B on v5e at SAO shapes: 3.21 -> 3.06 s per
            # 100-step CFG generation at batch 1, +9% at batch 4. Default ON
            # for eligible self-attention on TPU; FSAT_FUSED_ATTN=0 forces
            # off, =1 forces on (e.g. for CPU-interpret parity runs).
            import os as _os

            _fused_env = _os.environ.get("FSAT_FUSED_ATTN")
            resolved_causal = self.causal if causal is None else causal
            # head-pair kernels mask K/V at self_kv_len in-kernel, so both
            # padded-sequence paths (16-aligned SAO, 128-aligned long-form)
            # stay on the fused fast path; 8192 = SINGLE_DOT_MAX_TK
            _pair_ok = (self.dim_heads == 64 and h % 2 == 0
                        and x.shape[1] <= 8192)
            if (
                rotary_pos_emb is not None
                and mask is None
                and kv_cache is None
                and not return_kv
                and not self.qk_norm
                and self.natten_kernel_size is None
                and not resolved_causal
                and (self.self_kv_len is None or _pair_ok)
                and (_fused_env == "1"
                     or (_fused_env != "0"
                         and jax.default_backend() != "cpu"))
            ):
                from ..ops.pallas.flash_attention import fused_qkv_rope_attention

                out = fused_qkv_rope_attention(qkv, rotary_pos_emb, h,
                                               kv_len=self.self_kv_len)
                kinit = (nn.initializers.zeros if self.zero_init_output
                         else nn.initializers.lecun_normal())
                return QuantDense(self.dim, use_bias=False, kernel_init=kinit,
                                  param_dtype=jnp.float32, quant_tag="attn", name="to_out")(out)

            q, k, v = jnp.split(qkv, 3, axis=-1)

        q = split_heads(q, h)
        k = split_heads(k, kv_h)
        v = split_heads(v, kv_h)

        if self.qk_norm:
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        if rotary_pos_emb is not None and not has_context:
            q = apply_rotary_pos_emb(q, rotary_pos_emb)
            k = apply_rotary_pos_emb(k, rotary_pos_emb)

        attn_mask = None
        if kv_cache is not None and isinstance(kv_cache, dict):
            # STATIC cache (scan-compatible decode): fixed-size [B, H, L, D]
            # buffers; write the current (rotated) k/v at cache_index and
            # attend over positions <= cache_index.
            idx = kv_cache["index"]
            k_buf = jax.lax.dynamic_update_slice(kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, 0, idx, 0))
            v_buf = jax.lax.dynamic_update_slice(kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, 0, idx, 0))
            new_kv = {"k": k_buf, "v": v_buf, "index": idx + q.shape[-2]}
            k, v = k_buf, v_buf
            # causal over the buffer: query i (absolute pos idx+i) sees <= idx+i
            q_pos = idx + jnp.arange(q.shape[-2])
            valid = jnp.arange(k.shape[-2])[None, :] <= q_pos[:, None]
            attn_mask = valid[None, None, :, :]
            if "kmask" in kv_cache:
                # per-key validity persisted across decode steps: the PREFILL
                # writes the (padded) prepend mask, decode steps write True —
                # without this, every decode step attends to padding
                # embeddings the training path masks out
                b_ = x.shape[0]
                cur_valid = (mask.astype(bool) if mask is not None
                             else jnp.ones((b_, q.shape[-2]), bool))
                kmask = jax.lax.dynamic_update_slice(kv_cache["kmask"], cur_valid, (0, idx))
                new_kv["kmask"] = kmask
                attn_mask = attn_mask & kmask[:, None, None, :]
            mask = None  # consumed into attn_mask; do not re-apply per-q-token
            causal = False  # masking handles causality over the buffer
        elif kv_cache is not None:
            # dynamic cache (host-loop decode): concatenate past keys/values
            k = jnp.concatenate([kv_cache[0], k], axis=-2)
            v = jnp.concatenate([kv_cache[1], v], axis=-2)
            new_kv = (k, v)
        else:
            new_kv = (k, v)

        # mask semantics: input mask [B, Tk] True=keep -> [B, 1, 1, Tk]
        input_mask = context_mask if has_context else mask
        if attn_mask is None:
            attn_mask = input_mask[:, None, None, :] if input_mask is not None else None

        if isinstance(kv_cache, dict):
            causal = False  # static-cache masking already enforces causality
        else:
            causal = self.causal if causal is None else causal
            if q.shape[-2] == 1 and kv_cache is not None:
                causal = False  # single-token decode attends to full cache

        if self.natten_kernel_size:
            out = windowed_attention(q, k, v, self.natten_kernel_size, mask=attn_mask)
        else:
            kv_len = self.self_kv_len if (not has_context and kv_cache is None) else None
            impl = "xla" if self.seq_shard_axis is not None else "auto"
            out = scaled_dot_product_attention(q, k, v, mask=attn_mask, causal=causal,
                                               kv_len=kv_len, implementation=impl)

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        kinit = nn.initializers.zeros if self.zero_init_output else nn.initializers.lecun_normal()
        out = QuantDense(self.dim, use_bias=False, kernel_init=kinit, param_dtype=jnp.float32, quant_tag="attn", name="to_out")(out)

        if mask is not None and not has_context:
            out = jnp.where(mask[:, :, None], out, 0.0)
        elif mask is not None:
            out = jnp.where(mask[:, :, None], out, 0.0)

        return (out, new_kv) if return_kv else out


class ConformerModule(nn.Module):
    """reference transformer.py:557-591 (channels-last conv block)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        from ..ops.convs import Conv1d

        x = LayerNorm(self.dim, name="in_norm")(x)
        x = Conv1d(self.dim, self.dim, 1, use_bias=False, name="pointwise_conv")(x)
        x = GLU(self.dim, self.dim, name="glu")(x)
        x = Conv1d(self.dim, self.dim, 17, padding=8, groups=self.dim, use_bias=False, name="depthwise_conv")(x)
        x = LayerNorm(self.dim, name="mid_norm")(x)
        x = jax.nn.silu(x)
        x = Conv1d(self.dim, self.dim, 1, use_bias=False, name="pointwise_conv_2")(x)
        return x


class TransformerBlock(nn.Module):
    """Pre-norm block with optional cross-attention and adaLN global cond
    (reference transformer.py:595-703). adaLN: 6-way scale/shift/gate from a
    zero-init SiLU+Linear; branch outputs gated by sigmoid(1 - gate)."""

    dim: int
    dim_heads: int = 64
    cross_attend: bool = False
    dim_context: tp.Optional[int] = None
    global_cond_dim: tp.Optional[int] = None
    causal: bool = False
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    remove_norms: bool = False
    qk_norm: bool = False
    natten_kernel_size: tp.Optional[int] = None
    ff_mult: int = 4
    self_kv_len: tp.Optional[int] = None  # see Attention.self_kv_len
    seq_shard_axis: tp.Optional[str] = None  # see Attention.seq_shard_axis
    cross_cfg_skip: bool = False  # static form of the cross_half_batch kwarg

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        global_cond=None,
        mask=None,
        context_mask=None,
        rotary_pos_emb=None,
        kv_cache=None,
        return_kv: bool = False,
        cross_half_batch: bool = False,
    ):
        # the CFG cross-skip can also be set as a module attribute
        # (cross_cfg_skip) — under nn.remat a True call kwarg becomes a
        # traced bool and crashes the `if not cross_half_batch` branch
        # (jax.checkpoint has no static kwargs); attributes are static.
        cross_half_batch = cross_half_batch or self.cross_cfg_skip
        norm = (lambda d, name: LayerNorm(d, name=name)) if not self.remove_norms else (
            lambda d, name: (lambda y, scale_shift=None:
                             y if scale_shift is None
                             else y * (1 + scale_shift[0]) + scale_shift[1])
        )

        def run_cross(cross_attn, cross_norm, x, context, context_mask):
            """CFG batch-doubling: the uncond half's context is the all-zero
            null embedding, and every projection on the K/V path is biasless,
            so its cross-attention output is identically zero — skip it and
            concatenate zeros (exact, not an approximation). Enabled by the
            DiT when no negative conditioning is present (dit.py)."""
            if not cross_half_batch:
                return cross_attn(cross_norm(x), context=context, context_mask=context_mask)
            half = x.shape[0] // 2
            out = cross_attn(cross_norm(x[:half]), context=context[:half],
                             context_mask=None if context_mask is None else context_mask[:half])
            return jnp.concatenate([out, jnp.zeros_like(out)], axis=0)
        self_attn = Attention(
            self.dim, self.dim_heads, causal=self.causal,
            zero_init_output=self.zero_init_branch_outputs,
            qk_norm=self.qk_norm, natten_kernel_size=self.natten_kernel_size,
            self_kv_len=self.self_kv_len, seq_shard_axis=self.seq_shard_axis,
            name="self_attn",
        )
        pre_norm = norm(self.dim, "pre_norm")
        ff = FeedForward(self.dim, mult=self.ff_mult, zero_init_output=self.zero_init_branch_outputs, name="ff")
        ff_norm = norm(self.dim, "ff_norm")

        new_kv = None

        if self.global_cond_dim and global_cond is not None:
            ssg = nn.Dense(
                self.dim * 6, use_bias=False, kernel_init=nn.initializers.zeros,
                param_dtype=jnp.float32, name="to_scale_shift_gate",
            )(jax.nn.silu(global_cond))[:, None, :]
            scale_self, shift_self, gate_self, scale_ff, shift_ff, gate_ff = jnp.split(ssg, 6, axis=-1)

            from ..ops.pallas.elementwise import gated_residual

            residual = x
            x = pre_norm(x, scale_shift=(scale_self, shift_self))
            if return_kv or kv_cache is not None:
                x, new_kv = self_attn(x, mask=mask, rotary_pos_emb=rotary_pos_emb, kv_cache=kv_cache, return_kv=True)
            else:
                x = self_attn(x, mask=mask, rotary_pos_emb=rotary_pos_emb)
            x = gated_residual(x, gate_self, residual)

            if context is not None:
                x = x + run_cross(
                    Attention(self.dim, self.dim_heads, dim_context=self.dim_context,
                              causal=self.causal, zero_init_output=self.zero_init_branch_outputs,
                              qk_norm=self.qk_norm, name="cross_attn"),
                    norm(self.dim, "cross_attend_norm"), x, context, context_mask)

            if self.conformer:
                x = x + ConformerModule(self.dim, name="conformer")(x)

            residual = x
            x = ff_norm(x, scale_shift=(scale_ff, shift_ff))
            x = ff(x)
            x = gated_residual(x, gate_ff, residual)
        else:
            if return_kv or kv_cache is not None:
                attn_out, new_kv = self_attn(
                    pre_norm(x), mask=mask, rotary_pos_emb=rotary_pos_emb, kv_cache=kv_cache, return_kv=True
                )
            else:
                attn_out = self_attn(pre_norm(x), mask=mask, rotary_pos_emb=rotary_pos_emb)
            x = x + attn_out
            if context is not None:
                x = x + run_cross(
                    Attention(self.dim, self.dim_heads, dim_context=self.dim_context,
                              causal=self.causal, zero_init_output=self.zero_init_branch_outputs,
                              qk_norm=self.qk_norm, name="cross_attn"),
                    norm(self.dim, "cross_attend_norm"), x, context, context_mask)
            if self.conformer:
                x = x + ConformerModule(self.dim, name="conformer")(x)
            x = x + ff(ff_norm(x))

        return (x, new_kv) if (return_kv or kv_cache is not None) else x


class ContinuousTransformer(nn.Module):
    """reference transformer.py:707-809.

    `grad_checkpointing` remats each layer (reference checkpoints every layer
    unconditionally during training, transformer.py:800-802).
    """

    dim: int
    depth: int
    dim_in: tp.Optional[int] = None
    dim_out: tp.Optional[int] = None
    dim_heads: int = 64
    cross_attend: bool = False
    cond_token_dim: tp.Optional[int] = None
    global_cond_dim: tp.Optional[int] = None
    causal: bool = False
    rotary_pos_emb: bool = True
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    use_sinusoidal_emb: bool = False
    use_abs_pos_emb: bool = False
    abs_pos_emb_max_length: int = 10000
    qk_norm: bool = False
    natten_kernel_size: tp.Optional[int] = None
    ff_mult: int = 4
    grad_checkpointing: bool = False
    # sequence-parallel mesh axis name (parallel/sp.py); activations shard
    # [B, T/n, C] per chip, attention partitions via GSPMD
    seq_shard_axis: tp.Optional[str] = None

    def _block(self, i, remat: bool = False,
               self_kv_len: tp.Optional[int] = None,
               cross_cfg_skip: bool = False) -> TransformerBlock:
        cls = nn.remat(TransformerBlock) if remat else TransformerBlock
        return cls(
            cross_cfg_skip=cross_cfg_skip,
            dim=self.dim,
            dim_heads=self.dim_heads,
            cross_attend=self.cross_attend,
            dim_context=self.cond_token_dim if self.cross_attend else None,
            global_cond_dim=self.global_cond_dim,
            causal=self.causal,
            zero_init_branch_outputs=self.zero_init_branch_outputs,
            conformer=self.conformer,
            qk_norm=self.qk_norm,
            natten_kernel_size=self.natten_kernel_size,
            ff_mult=self.ff_mult,
            self_kv_len=self_kv_len,
            seq_shard_axis=self.seq_shard_axis,
            name=f"layer{i}",
        )

    @nn.compact
    def __call__(
        self,
        x,
        mask=None,
        prepend_embeds=None,
        prepend_mask=None,
        global_cond=None,
        context=None,
        context_mask=None,
        return_info: bool = False,
        kv_caches: tp.Optional[list] = None,
        return_kv: bool = False,
        rotary_offset: int = 0,
        cross_half_batch: bool = False,
        train: bool = False,
    ):
        batch, seq = x.shape[:2]
        info = {"hidden_states": []}

        if self.dim_in:
            x = nn.Dense(self.dim, use_bias=False, param_dtype=jnp.float32, name="project_in")(x)

        if prepend_embeds is not None:
            prepend_length = prepend_embeds.shape[1]
            assert prepend_embeds.shape[-1] == x.shape[-1]
            x = jnp.concatenate([prepend_embeds.astype(x.dtype), x], axis=-2)
            if prepend_mask is not None or mask is not None:
                mask = mask if mask is not None else jnp.ones((batch, seq), bool)
                prepend_mask = prepend_mask if prepend_mask is not None else jnp.ones((batch, prepend_length), bool)
                mask = jnp.concatenate([prepend_mask, mask], axis=-1)

        # Padded-sequence fast path: misaligned lengths (prepend tokens make
        # the DiT 1024+2) cost a pad+slice pair around the flash kernel in
        # every layer. Pad ONCE here to the lane multiple, mask K/V at the
        # true length inside the kernel (self_kv_len), slice ONCE after the
        # stack. The whole residual stream then runs at the padded length, so
        # every GEMM pays (padded-valid)/valid extra FLOPs — v5e A/B: at SAO's
        # 1026 (+12%) that LOSES (12.3 vs 12.9 s-audio/s/chip), so the path
        # only engages when the pad ratio is small (long-form SA 2.0: 6146 ->
        # 6272 = +2%). Padded rows carry garbage but never contaminate valid
        # tokens (attention is kv-masked; everything else is per-token), and
        # their cotangents are identically zero in backward because they are
        # sliced off here.
        import os as _os

        valid_len = x.shape[1]
        # Head-pair-kernel-eligible stacks only need 16-alignment (the kernel
        # masks score LANES; 1026 -> 1040 = +1.4% GEMM FLOPs, not 1152 =
        # +12%), which flips the trade at batch: per-layer qkv pad+slice HBM
        # copies scale with batch (~0.45 ms/layer at CFG batch 16,
        # scripts/pair_batch_exp.py) while the pad-FLOP cost is ~flat per
        # sample. Engage at CFG batch >= 4 where it measures net-positive;
        # batch 1 keeps the unpadded path (its pad copies are ~free).
        heads = self.dim // self.dim_heads
        pair_16 = (
            self.dim_heads == 64 and heads % 2 == 0 and self.rotary_pos_emb
            and not self.qk_norm
            and (valid_len + 15) // 16 * 16 <= 2048
            # CFG batch >= 4 only: at CFG batch 2 the padded step measured
            # +15% (63.9 vs 55.5 ms/call) despite the same kernel win — the
            # per-layer pad copies it removes are ~free at batch 2, while at
            # batch >= 4 removing them is a clear net gain (batch probes,
            # docs/performance.md "Batch scaling")
            and x.shape[0] >= 4
        )
        align = 16 if pair_16 else 128
        padded_len = (valid_len + align - 1) // align * align
        pad_ratio_ok = 0 < padded_len - valid_len and (
            (padded_len - valid_len) / valid_len <= 0.04
            or _os.environ.get("FSAT_FORCE_SEQ_PAD") == "1")
        use_seq_pad = (
            mask is None and kv_caches is None and not return_kv
            and not self.causal and self.natten_kernel_size is None
            and self.seq_shard_axis is None
            and not return_info and valid_len >= 1024 and pad_ratio_ok
            and self.dim_heads <= 128
            and (jax.default_backend() not in ("cpu",)
                 or _os.environ.get("FSAT_FORCE_SEQ_PAD") == "1")
            and _os.environ.get("FSAT_DISABLE_SEQ_PAD") != "1"
        )
        if use_seq_pad:
            x = jnp.pad(x, ((0, 0), (0, padded_len - valid_len), (0, 0)))
        self_kv_len = valid_len if use_seq_pad else None

        rot = None
        if self.rotary_pos_emb:
            # reference uses max(dim_heads//2, 32); clamp to head dim so tiny
            # test configs stay valid (partial rotary otherwise)
            rot_dim = min(max(self.dim_heads // 2, 32), self.dim_heads)
            if kv_caches is not None and isinstance(kv_caches[0], dict):
                # static-cache decode: positions start at the cache index
                max_len = kv_caches[0]["k"].shape[-2]
                table = rotary_freqs(max_len, rot_dim)
                rot = jax.lax.dynamic_slice(table, (kv_caches[0]["index"], 0), (x.shape[1], rot_dim))
            else:
                total_len = rotary_offset + x.shape[1]
                rot = rotary_freqs(total_len, rot_dim)
                rot = rot[rotary_offset:] if kv_caches is None else rot

        if self.use_sinusoidal_emb:
            x = x + ScaledSinusoidalEmbedding(self.dim, name="pos_emb")(x)
        elif self.use_abs_pos_emb:
            x = x + AbsolutePositionalEmbedding(self.dim, self.abs_pos_emb_max_length, name="pos_emb")(x)

        if self.seq_shard_axis is not None:
            from ..parallel.sp import seq_constraint

            x = seq_constraint(x, self.seq_shard_axis)

        new_kvs = []
        for i in range(self.depth):
            layer_kv = kv_caches[i] if kv_caches is not None else None
            if kv_caches is not None or return_kv:
                x, kv = self._block(i)(
                    x, context=context, global_cond=global_cond, mask=mask,
                    context_mask=context_mask, rotary_pos_emb=rot, kv_cache=layer_kv, return_kv=True,
                )
                new_kvs.append(kv)
            else:
                # remat only under training like the reference
                # (transformer.py:800-802 gates on self.training): at
                # inference the checkpoint regions block XLA fusion for no
                # memory benefit — measured ~10% on SAO-config generation
                x = self._block(i, remat=self.grad_checkpointing and train,
                                self_kv_len=self_kv_len,
                                cross_cfg_skip=bool(cross_half_batch))(
                    x, context=context, global_cond=global_cond, mask=mask,
                    context_mask=context_mask, rotary_pos_emb=rot,
                )
            if self.seq_shard_axis is not None:
                from ..parallel.sp import seq_constraint

                x = seq_constraint(x, self.seq_shard_axis)
            if return_info:
                info["hidden_states"].append(x)

        if use_seq_pad:
            x = x[:, :valid_len]

        if self.dim_out:
            x = nn.Dense(self.dim_out, use_bias=False, param_dtype=jnp.float32, name="project_out")(x)

        out = x
        if return_kv:
            return (out, new_kvs, info) if return_info else (out, new_kvs)
        return (out, info) if return_info else out
