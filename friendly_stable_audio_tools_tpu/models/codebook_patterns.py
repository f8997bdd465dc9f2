"""Multi-codebook interleaving patterns for audio language models.

Parity target: reference `models/codebook_patterns.py:19-544` (audiocraft
semantics): a Pattern maps a dense [B, K, T] code tensor to an interleaved
[B, K, S] sequence (and back), with a special token filling undefined
coordinates. Providers: delay, parallel, unroll (flattening+delays),
coarse_first, musiclm.

Implementation: the layout is represented directly as two integer index
tables built host-side with numpy —
  * build table  [K, S] -> flattened source index into z (or special slot)
  * revert table [K, T] -> flattened source index into s (or special slot)
Application is a single `jnp.take` per direction: O(1) kernels, static
shapes, jit/scany. Tables are LRU-cached per (timesteps, flags).
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax.numpy as jnp
import numpy as np

# a layout is: for each sequence step, a list of (t, q) coordinates
LayoutCoord = tp.Tuple[int, int]
PatternLayout = tp.List[tp.List[LayoutCoord]]


@dataclasses.dataclass
class Pattern:
    layout: PatternLayout
    timesteps: int
    n_q: int

    def __post_init__(self):
        assert len(self.layout) > 0
        self._validate()
        self._build_table = functools.lru_cache(100)(self._build_table_uncached)
        self._revert_table = functools.lru_cache(100)(self._revert_table_uncached)

    def _validate(self):
        last_t = {q: 0 for q in range(self.n_q)}
        for s, coords in enumerate(self.layout):
            qs = set()
            for t, q in coords:
                qs.add(q)
                assert t >= last_t[q], f"past timestep for codebook {q} at step {s}"
                last_t[q] = t
            assert len(qs) == len(coords), f"duplicate codebook at step {s}"

    @property
    def num_sequence_steps(self) -> int:
        return len(self.layout) - 1

    @property
    def max_delay(self) -> int:
        m = 0
        for coords in self.layout[1:]:
            for t, _ in coords:
                m = max(m, t + 1)
        return m - self.timesteps

    @property
    def valid_layout(self) -> PatternLayout:
        return self.layout[: len(self.layout) - self.max_delay]

    def starts_with_special_token(self) -> bool:
        return self.layout[0] == []

    def get_steps_with_timestep(self, t: int, q: tp.Optional[int] = None) -> tp.List[int]:
        steps = []
        for s, coords in enumerate(self.layout):
            for ct, cq in coords:
                if ct == t and (q is None or cq == q):
                    steps.append(s)
        return steps

    def get_first_step_with_timesteps(self, t: int, q: tp.Optional[int] = None) -> tp.Optional[int]:
        steps = self.get_steps_with_timestep(t, q)
        return steps[0] if steps else None

    # ---- index tables ----------------------------------------------------

    def _build_table_uncached(self, timesteps: int, n_q: int, keep_only_valid_steps: bool):
        assert n_q == self.n_q
        assert timesteps <= self.timesteps
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        S = len(ref_layout)
        idx = np.full((n_q, S), n_q * timesteps, np.int32)  # special slot
        mask = np.zeros((n_q, S), bool)
        for s, coords in enumerate(ref_layout):
            for t, q in coords:
                if t < timesteps:
                    idx[q, s] = q * timesteps + t
                    mask[q, s] = True
        return idx, mask

    def _revert_table_uncached(self, sequence_steps: int, n_q: int,
                               keep_only_valid_steps: bool, is_model_output: bool):
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        assert n_q == self.n_q
        assert sequence_steps <= len(ref_layout)
        if is_model_output and self.starts_with_special_token():
            ref_layout = ref_layout[1:]
        T = self.timesteps
        idx = np.full((n_q, T), n_q * sequence_steps, np.int32)
        mask = np.zeros((n_q, T), bool)
        for s, coords in enumerate(ref_layout):
            if s >= sequence_steps:
                break
            for t, q in coords:
                if t < T:
                    idx[q, t] = q * sequence_steps + s
                    mask[q, t] = True
        return idx, mask

    # ---- application -----------------------------------------------------

    def build_pattern_sequence(self, z, special_token: int, keep_only_valid_steps: bool = False):
        """z [B, K, T] -> (values [B, K, S], indexes [K, S], mask [K, S])."""
        B, K, T = z.shape
        idx, mask = self._build_table(T, K, keep_only_valid_steps)
        flat = jnp.concatenate([z.reshape(B, -1), jnp.full((B, 1), special_token, z.dtype)], axis=1)
        values = jnp.take(flat, jnp.asarray(idx).reshape(-1), axis=1).reshape(B, K, idx.shape[-1])
        return values, jnp.asarray(idx), jnp.asarray(mask)

    def revert_pattern_sequence(self, s, special_token: int, keep_only_valid_steps: bool = False):
        """s [B, K, S] -> (values [B, K, T], indexes [K, T], mask [K, T])."""
        B, K, S = s.shape
        idx, mask = self._revert_table(S, K, keep_only_valid_steps, False)
        flat = jnp.concatenate([s.reshape(B, -1), jnp.full((B, 1), special_token, s.dtype)], axis=1)
        values = jnp.take(flat, jnp.asarray(idx).reshape(-1), axis=1).reshape(B, K, idx.shape[-1])
        return values, jnp.asarray(idx), jnp.asarray(mask)

    def revert_pattern_logits(self, logits, special_token: float, keep_only_valid_steps: bool = False):
        """logits [B, card, K, S] -> [B, card, K, T] (first-special-token
        alignment for model outputs, reference :249-267)."""
        B, card, K, S = logits.shape
        idx, mask = self._revert_table(S, K, keep_only_valid_steps, True)
        flat = jnp.concatenate(
            [logits.reshape(B, card, -1), jnp.full((B, card, 1), special_token, logits.dtype)], axis=-1
        )
        values = jnp.take(flat, jnp.asarray(idx).reshape(-1), axis=2).reshape(B, card, K, idx.shape[-1])
        return values, jnp.asarray(idx), jnp.asarray(mask)


class CodebooksPatternProvider:
    def __init__(self, n_q: int):
        assert n_q > 0
        self.n_q = n_q
        self.get_pattern = functools.lru_cache(100)(self.get_pattern)  # type: ignore

    def get_pattern(self, timesteps: int) -> Pattern:
        raise NotImplementedError


class DelayedPatternProvider(CodebooksPatternProvider):
    """Per-codebook delays (reference :302-353); default delay q."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None,
                 flatten_first: int = 0, empty_initial: int = 0):
        super().__init__(n_q)
        self.delays = delays if delays is not None else list(range(n_q))
        self.flatten_first = flatten_first
        self.empty_initial = empty_initial
        assert len(self.delays) == self.n_q
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [] if self.empty_initial < 0 else [[]]
        max_delay = max(self.delays)
        if self.empty_initial:
            out += [[] for _ in range(self.empty_initial)]
        if self.flatten_first:
            for t in range(min(timesteps, self.flatten_first)):
                for q in range(self.n_q):
                    out.append([(t, q)])
        for t in range(self.flatten_first, timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= self.flatten_first:
                    v.append((t_for_q, q))
            out.append(v)
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class ParallelPatternProvider(DelayedPatternProvider):
    """No delays (reference :356-366)."""

    def __init__(self, n_q: int, empty_initial: int = 0):
        super().__init__(n_q, [0] * n_q, empty_initial=empty_initial)


class UnrolledPatternProvider(CodebooksPatternProvider):
    """Flattening with optional per-codebook delays (reference :369-489)."""

    def __init__(self, n_q: int, flattening: tp.Optional[tp.List[int]] = None,
                 delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        flattening = flattening if flattening is not None else list(range(n_q))
        delays = delays if delays is not None else [0] * n_q
        assert len(flattening) == n_q and len(delays) == n_q
        assert sorted(flattening) == flattening
        assert sorted(delays) == delays
        self._flat: tp.Dict[int, tp.Tuple[tp.List[int], int]] = {}
        for q, (inner, delay) in enumerate(zip(flattening, delays)):
            if inner in self._flat:
                qs, d = self._flat[inner]
                assert d == delay, "codebooks flattened to the same step must share a delay"
                qs.append(q)
            else:
                self._flat[inner] = ([q], delay)
        self.max_delay = max(delays)

    @property
    def _num_inner_steps(self) -> int:
        return max(self._flat.keys()) + 1

    def num_virtual_steps(self, timesteps: int) -> int:
        return timesteps * self._num_inner_steps + 1

    def get_pattern(self, timesteps: int) -> Pattern:
        indexed: tp.List[tp.Tuple[int, tp.List[LayoutCoord]]] = [(-1, [])]
        max_timesteps = timesteps + self.max_delay
        for t in range(max_timesteps):
            for step in range(self._num_inner_steps):
                if step in self._flat:
                    qs, delay = self._flat[step]
                    t_for_q = t + delay
                    if t_for_q < max_timesteps:
                        indexed.append((t_for_q, [(t, q) for q in qs]))
                else:
                    indexed.append((t, []))
        out = [coords for _, coords in sorted(indexed)]
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class CoarseFirstPattern(CodebooksPatternProvider):
    """All of codebook 0 first, then the rest with delays (reference :490-526)."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        self.delays = delays if delays is not None else [0] * (n_q - 1)
        assert len(self.delays) == self.n_q - 1
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for t in range(timesteps):
            out.append([(t, 0)])
        max_delay = max(self.delays) if self.delays else 0
        for t in range(timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= 0:
                    v.append((t_for_q, q + 1))
            out.append(v)
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)


class MusicLMPattern(CodebooksPatternProvider):
    """Grouped full flattening (reference :527-544)."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for offset in range(0, self.n_q, self.group_by):
            for t in range(timesteps):
                for q in range(offset, min(offset + self.group_by, self.n_q)):
                    out.append([(t, q)])
        return Pattern(out, n_q=self.n_q, timesteps=timesteps)
