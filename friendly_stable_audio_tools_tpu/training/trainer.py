"""Training loop harness — the PyTorch-Lightning replacement.

Covers what the reference gets from `pl.Trainer` (train.py:99-133):
stepping with gradient accumulation, periodic checkpointing (with the model
config embedded like `ModelConfigEmbedderCallback`, train.py:20-25), demo
callbacks, metrics logging, exception surfacing, and `--ckpt-path` resume.

Multi-device: pass a Mesh and the harness shards batches over ('data','fsdp')
and parameters over 'fsdp' (ZeRO-2 parity); the jitted step compiles the
collectives. No DDP/DeepSpeed wrapper classes — shardings are data.
"""

from __future__ import annotations

import json
import os
import time
import traceback
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .logging import ExperimentLogger, MetricsLogger


class Trainer:
    def __init__(
        self,
        training_wrapper,
        dataloader,
        model_config: dict,
        save_dir: str = ".",
        checkpoint_every: int = 10000,
        demo_callback=None,
        logger: tp.Optional[ExperimentLogger] = None,
        max_steps: tp.Optional[int] = None,
        accum_batches: int = 1,
        mesh=None,
        log_every: int = 1,
        progress_every: int = 50,
        gradient_clip_val: float = 0.0,
        profile_dir: tp.Optional[str] = None,
        profile_start_step: int = 10,
        profile_steps: int = 5,
    ):
        self.wrapper = training_wrapper
        self.dataloader = dataloader
        self.model_config = model_config
        self.save_dir = save_dir
        self.checkpoint_every = checkpoint_every
        self.demo_callback = demo_callback
        self.logger = logger or ExperimentLogger()
        self.max_steps = max_steps
        self.accum_batches = accum_batches
        self.mesh = mesh
        self.metrics_logger = MetricsLogger()
        self.log_every = log_every
        self.progress_every = progress_every
        # jax.profiler trace window (SURVEY §5 tracing; the reference only has
        # ad-hoc CUDA-event timing): traces steps
        # [profile_start_step, profile_start_step + profile_steps)
        self.profile_dir = profile_dir
        self.profile_start_step = profile_start_step
        self.profile_steps = profile_steps
        self._profiling = False

        from ..ops.quant import int8_matmul_enabled

        # check both tags: FSAT_INT8_SCOPE=mlp|attn still quantizes that
        # family, which must warn too (an untagged check misses scoped runs)
        if int8_matmul_enabled("mlp") or int8_matmul_enabled("attn"):
            import logging

            logging.warning(
                "FSAT_INT8_MATMUL=1 is set while TRAINING: the int8 rounding "
                "has zero gradient, so the quantized projections will not "
                "learn. The flag is an inference-only optimization — unset "
                "it for training runs."
            )

        if gradient_clip_val and gradient_clip_val > 0:
            # global-norm clipping wraps the wrapper's optimizers
            # (PTL gradient_clip_val parity, reference train.py:128)
            import optax

            clip = optax.clip_by_global_norm(gradient_clip_val)
            for attr in ("tx", "gen_tx", "disc_tx"):
                if hasattr(training_wrapper, attr):
                    setattr(training_wrapper, attr, optax.chain(clip, getattr(training_wrapper, attr)))

        ckpt_dir = os.path.join(save_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        self.ckpt_dir = ckpt_dir

    # ---- checkpointing ---------------------------------------------------

    def save_checkpoint(self, state, step: int) -> str:
        """Orbax checkpoint of the full train state + embedded model config
        (parity: ModelConfigEmbedderCallback, train.py:20-25)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.ckpt_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state))
        ckptr.wait_until_finished()
        with open(os.path.join(path, "model_config.json"), "w") as f:
            json.dump(self.model_config, f)
        # update "last" symlink
        last = os.path.join(self.ckpt_dir, "last")
        try:
            if os.path.islink(last):
                os.unlink(last)
            os.symlink(path, last)
        except OSError:
            pass
        return path

    def load_checkpoint(self, state, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), jax.device_get(state))
        return jax.tree_util.tree_map(jnp.asarray, restored)

    # ---- the loop --------------------------------------------------------

    def fit(self, state=None, ckpt_path: tp.Optional[str] = None, seed: int = 42):
        wrapper = self.wrapper
        state = state if state is not None else wrapper.init_state()
        if ckpt_path:
            state = self.load_checkpoint(state, ckpt_path)

        if self.mesh is not None:
            from ..parallel.mesh import fsdp_shard_params, replicate, shard_batch

            if self.mesh.shape.get("fsdp", 1) > 1:
                state = jax.tree_util.tree_map(lambda x: x, state)
                state = type(state)(**{
                    f: (fsdp_shard_params(getattr(state, f), self.mesh)
                        if f in ("params", "opt_state", "ema_params", "gen_params",
                                 "disc_params", "gen_opt_state", "disc_opt_state")
                        else jax.device_put(getattr(state, f)))
                    for f in state.__dataclass_fields__
                })
            else:
                state = replicate(state, self.mesh)

        rng = jax.random.PRNGKey(seed)
        step = int(jax.device_get(state.step))
        t_last = time.time()
        accum = []

        try:
            while self.max_steps is None or step < self.max_steps:
                for batch in self.dataloader:
                    if self.max_steps is not None and step >= self.max_steps:
                        break
                    reals, metadata = batch if isinstance(batch, tuple) else (batch[0], batch[1])
                    device_batch = wrapper.prepare_batch(reals, metadata)
                    if self.mesh is not None:
                        from ..parallel.mesh import shard_batch

                        device_batch = shard_batch(device_batch, self.mesh)

                    if self.accum_batches > 1:
                        accum.append(device_batch)
                        if len(accum) < self.accum_batches:
                            continue
                        # micro-batch accumulation: concatenate along batch
                        device_batch = jax.tree_util.tree_map(
                            lambda *xs: jnp.concatenate(xs, axis=0), *accum)
                        accum = []

                    if self.profile_dir and not self._profiling and step == self.profile_start_step:
                        jax.profiler.start_trace(self.profile_dir)
                        self._profiling = True

                    rng, k = jax.random.split(rng)
                    state, metrics = self._step(state, device_batch, k, step)
                    step += 1

                    if self._profiling and step >= self.profile_start_step + self.profile_steps:
                        jax.tree_util.tree_map(
                            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                            metrics)
                        jax.profiler.stop_trace()
                        self._profiling = False
                        print(f"profiler trace written to {self.profile_dir}", flush=True)

                    self.metrics_logger.add({f"train/{k_}": v for k_, v in metrics.items()})
                    if (step - 1) % self.log_every == 0:
                        self.logger.log(self.metrics_logger.pop(), step=step)
                    if step % self.progress_every == 0:
                        dt = time.time() - t_last
                        print(f"step {step}  ({self.progress_every / dt:.2f} it/s)", flush=True)
                        t_last = time.time()

                    if self.checkpoint_every and step % self.checkpoint_every == 0:
                        self.save_checkpoint(state, step)

                    if self.demo_callback is not None:
                        try:
                            self.demo_callback.on_step(self, state, step, (reals, metadata))
                        except Exception:
                            # demos must never kill training (reference
                            # training/diffusion.py:212-216 swallows errors)
                            traceback.print_exc()
        except KeyboardInterrupt:
            print("interrupted; saving checkpoint")
            self.save_checkpoint(state, step)
        except Exception:
            # ExceptionCallback parity (train.py:15-17)
            traceback.print_exc()
            raise
        finally:
            if self._profiling:
                jax.profiler.stop_trace()
                self._profiling = False
            wrapper.push_params(state)
        return state

    def _step(self, state, batch, rng, step: int):
        if hasattr(self.wrapper, "_get_step_fn"):  # GAN wrapper host-dispatch
            return self.wrapper.train_step(state, batch, rng, step=step)
        if not hasattr(self, "_jitted"):
            import functools
            import inspect

            ts = self.wrapper.train_step
            sig = inspect.signature(ts).parameters
            if self.accum_batches > 1 and "accum" in sig:
                # true grad accumulation: lax.scan over micro-batches inside
                # the step (one micro-batch of activations at a time)
                ts = functools.partial(ts, accum=self.accum_batches)
            self._frozen = None
            if "frozen" in sig and hasattr(self.wrapper, "frozen_arrays"):
                # frozen pretransform/conditioner params ride as jit ARGUMENTS,
                # not HLO constants (a frozen SAO VAE + T5 is >1 GB of weights)
                self._frozen = jax.tree_util.tree_map(jnp.asarray, self.wrapper.frozen_arrays())
            self._jitted = jax.jit(ts, donate_argnums=(0,))
        if self._frozen is not None:
            return self._jitted(state, batch, rng, frozen=self._frozen)
        return self._jitted(state, batch, rng)
