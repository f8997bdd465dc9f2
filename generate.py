#!/usr/bin/env python3
"""Batch text-to-audio generation CLI.

Parity target: reference `generate.py:23-157` — nested YAML prompt file
flattened to per-sample conditions, work sharded across processes as
`[rank::world_size]`, CFG-aware effective batch, wav output with optional
`--clip-length` trim to each condition's seconds_total.

TPU notes: within one host the prompt batch is generated on the chip(s) via
the jitted sampler scan; across hosts work shards by jax process index
(the reference uses HF Accelerate ranks, generate.py:78-80,119-120).
"""

import argparse
import math
import os
from pathlib import Path


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", type=str, required=True, help="Directory for generated audio.")
    p.add_argument("--cond-yaml-path", type=str, required=True, help="YAML file of sample conditions.")
    p.add_argument("--model-name", type=str, default="stabilityai/stable-audio-open-1.0",
                   help="Pretrained model name or local directory.")
    p.add_argument("--model-config", type=str, default="", help="Model config JSON (random init if no ckpt).")
    p.add_argument("--ckpt-path", type=str, default="", help="Unwrapped model checkpoint.")
    p.add_argument("--sampler-type", type=str, default="dpmpp-3m-sde")
    p.add_argument("--sample-steps", type=int, default=100)
    p.add_argument("--cfg-scale", type=float, default=7.0)
    p.add_argument("--n-sample-per-cond", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--clip-length", action="store_true",
                   help="Clip generated audio to the specified 'seconds_total'.")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--verbose", action="store_true",
                   help="print sampler iters/sec every 10 steps (reference "
                        "sampling.py:33-56 behavior)")
    p.add_argument("--int8", action="store_true",
                   help="int8 dynamic-quantized transformer GEMMs (faster on "
                        "TPU MXU; changes outputs vs bf16 — the measured "
                        "error/speed frontier is in docs/performance.md)")
    p.add_argument("--int8-bf16-tail", type=int, default=None, metavar="N",
                   help="with --int8: run the last N sampler steps in bf16 "
                        "(hybrid schedule; reduces end-to-end divergence at "
                        "a small speed cost — docs/performance.md)")
    return p.parse_args()


def flatten_dict(d, parent_key="", separator="/", depth=0):
    """reference generate.py:38-50."""
    items = {}
    for k, v in d.items():
        if depth == 0:
            assert isinstance(v, dict) and all(isinstance(v_, dict) for v_ in v.values())
        new_key = f"{parent_key}{separator}{k}" if parent_key else k
        if isinstance(list(v.values())[0], dict):
            items.update(flatten_dict(v, new_key, separator=separator, depth=depth + 1))
        else:
            assert all(not isinstance(v_, dict) for v_ in v.values())
            items[new_key] = dict(v)
    return items


def parse_cond_yaml(yaml_path):
    import yaml

    with open(yaml_path, "r") as yml:
        conds = yaml.safe_load(yml)
    return flatten_dict(conds)


def main():
    from friendly_stable_audio_tools_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    args = get_args()

    if args.int8:
        os.environ["FSAT_INT8_MATMUL"] = "1"
        if args.int8_bf16_tail is not None:
            os.environ["FSAT_INT8_BF16_TAIL"] = str(args.int8_bf16_tail)

    import jax

    from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond
    from friendly_stable_audio_tools_tpu.utils.audio_utils import float_to_int16_audio, write_wav
    from friendly_stable_audio_tools_tpu.utils.common import count_parameters, get_rank, get_world_size

    rank, world_size = get_rank(), get_world_size()

    if args.model_config:
        import json

        from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config

        with open(args.model_config) as f:
            model_config = json.load(f)
        model = create_model_from_config(model_config, init_rng=jax.random.PRNGKey(0))
        if args.ckpt_path:
            from friendly_stable_audio_tools_tpu.models.utils import load_unwrapped_checkpoint

            load_unwrapped_checkpoint(model, args.ckpt_path)
    else:
        from friendly_stable_audio_tools_tpu.models.pretrained import get_pretrained_model

        model, model_config = get_pretrained_model(args.model_name)

    sample_rate = model_config["sample_rate"]
    sample_size = model_config["sample_size"]

    # CFG batch-doubling halves the effective batch (reference generate.py:75)
    batch_sample = args.batch_size // 2 if args.cfg_scale != 1.0 else args.batch_size
    batch_sample = max(batch_sample, 1)

    conds = parse_cond_yaml(args.cond_yaml_path)
    path_full, conds_full = [], []
    for p, cond in conds.items():
        for idx in range(args.n_sample_per_cond):
            path_full.append(f"{p}_item-{idx + 1}")
            conds_full.append(cond)

    if rank == 0:
        params_model = count_parameters(model.params)
        print("=== Model Info ===")
        print(f"\tSample rate:\t{sample_rate}")
        print(f"\tSample size:\t{sample_size} ({sample_size / sample_rate:.3f} [sec])")
        print(f"\tDiffusion params:\t{params_model / 1e6:.3f} [million]")
        print("=== Sampling parameters ===")
        print(f"\tSampler type:\t{args.sampler_type}")
        print(f"\tSample steps:\t{args.sample_steps}")
        print(f"\tCFG scale:\t{args.cfg_scale}")
        print(f"\tTotal prompts:\t{len(conds)} x {args.n_sample_per_cond}")

    path_rank = path_full[rank::world_size]
    conds_rank = conds_full[rank::world_size]

    n_iter = int(math.ceil(len(conds_rank) / batch_sample))
    for idx in range(n_iter):
        path_i = path_rank[idx * batch_sample : (idx + 1) * batch_sample]
        conds_i = conds_rank[idx * batch_sample : (idx + 1) * batch_sample]

        samples_i = generate_diffusion_cond(
            model,
            steps=args.sample_steps,
            cfg_scale=args.cfg_scale,
            conditioning=conds_i,
            sample_size=sample_size,
            sigma_min=0.3,
            sigma_max=500,
            sampler_type=args.sampler_type,
            seed=args.seed,
            verbose=args.verbose,
        )

        import numpy as np

        samples_np = np.asarray(samples_i)
        for idx_n in range(samples_np.shape[0]):
            audio = samples_np[idx_n]
            if args.clip_length:
                L = int(conds_i[idx_n]["seconds_total"] * sample_rate)
                audio = audio[:, :L]
            save_path = os.path.join(args.output_dir, f"{path_i[idx_n]}.wav")
            Path(save_path).parent.mkdir(parents=True, exist_ok=True)
            write_wav(save_path, sample_rate, audio)

    print(f"->->-> Rank-{rank}: Finished.")


if __name__ == "__main__":
    main()
