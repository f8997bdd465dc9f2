#!/usr/bin/env python3
"""Checkpoint unwrapper.

Parity target: reference `unwrap_model.py:6-121`: load a wrapped training
checkpoint (here: an orbax Trainer state dir) and export only the (EMA)
model weights via the training wrapper's `export_model`, as safetensors.
"""

import argparse
import json


def main():
    from friendly_stable_audio_tools_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--ckpt-path", type=str, required=True, help="Trainer checkpoint dir (orbax).")
    p.add_argument("--name", type=str, default="exported_model")
    p.add_argument("--use-safetensors", action="store_true", default=True)
    args = p.parse_args()

    import jax

    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config
    from friendly_stable_audio_tools_tpu.training.trainer import Trainer

    with open(args.model_config) as f:
        model_config = json.load(f)

    model = create_model_from_config(model_config, init_rng=jax.random.PRNGKey(0))
    wrapper = create_training_wrapper_from_config(model_config, model)
    state = wrapper.init_state()

    trainer = Trainer(wrapper, dataloader=None, model_config=model_config)
    state = trainer.load_checkpoint(state, args.ckpt_path)

    out = f"{args.name}.safetensors"
    wrapper.export_model(out, state, use_safetensors=True)
    print(f"Exported unwrapped (EMA-preferred) model weights to {out}")


if __name__ == "__main__":
    main()
