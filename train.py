#!/usr/bin/env python3
"""Trainer CLI.

Parity target: reference `train.py:28-133` — ini+CLI flags, per-host seed
offsets, dataloader/model/wrapper construction from JSON configs, pretrained/
pretransform checkpoint loading, optional weight-norm removal, checkpointing
with the model config embedded, demo callbacks, and multi-device training.

TPU: parallelism comes from a jax Mesh ('dp' = replicated params,
'fsdp' = ZeRO-style sharded optimizer/params), not DDP/DeepSpeed wrappers.
Multi-host runs initialize jax.distributed from the standard TPU env.
"""

import json
import os

from friendly_stable_audio_tools_tpu.utils.config_args import get_all_args
from friendly_stable_audio_tools_tpu.utils.common import copy_state_dict, set_seed


def main():
    from friendly_stable_audio_tools_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    args = get_all_args()

    seed = args.seed
    # per-process seed offset (reference train.py:33-37 uses SLURM_PROCID)
    for env_key in ("SLURM_PROCID", "JAX_PROCESS_INDEX"):
        if os.environ.get(env_key) is not None:
            seed += int(os.environ[env_key])
            break
    set_seed(seed)

    import jax

    if args.num_nodes > 1:
        jax.distributed.initialize()

    with open(args.model_config) as f:
        model_config = json.load(f)
    with open(args.dataset_config) as f:
        dataset_config = json.load(f)

    from friendly_stable_audio_tools_tpu.data.dataset import create_dataloader_from_config
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.models.utils import load_ckpt_state_dict, remove_weight_norm_from_model
    from friendly_stable_audio_tools_tpu.training.factory import (
        create_demo_callback_from_config,
        create_training_wrapper_from_config,
    )
    from friendly_stable_audio_tools_tpu.training.logging import ExperimentLogger
    from friendly_stable_audio_tools_tpu.training.trainer import Trainer
    from friendly_stable_audio_tools_tpu.parallel.mesh import create_mesh

    train_dl = create_dataloader_from_config(
        dataset_config,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        sample_rate=model_config["sample_rate"],
        sample_size=model_config["sample_size"],
        audio_channels=model_config["audio_channels"],
    )

    model = create_model_from_config(model_config, init_rng=jax.random.PRNGKey(seed))

    if args.pretrained_ckpt_path:
        print(f"->->-> Loading a pretrained checkpoint from {args.pretrained_ckpt_path}...")
        from friendly_stable_audio_tools_tpu.models.utils import load_unwrapped_checkpoint

        load_unwrapped_checkpoint(model, args.pretrained_ckpt_path)

    if args.remove_pretransform_weight_norm == "pre_load" and model.pretransform is not None:
        model.pretransform.model.params = remove_weight_norm_from_model(model.pretransform.model.params)

    if args.pretransform_ckpt_path and model.pretransform is not None:
        print(f"->->-> Loading a pretransform checkpoint from {args.pretransform_ckpt_path}...")
        model.pretransform.model.params = copy_state_dict(
            model.pretransform.model.params, load_ckpt_state_dict(args.pretransform_ckpt_path)
        )

    if args.remove_pretransform_weight_norm == "post_load" and model.pretransform is not None:
        model.pretransform.model.params = remove_weight_norm_from_model(model.pretransform.model.params)

    training_wrapper = create_training_wrapper_from_config(model_config, model)

    logger = ExperimentLogger(project=args.name, config={"model_config": model_config,
                                                         "dataset_config": dataset_config,
                                                         **vars(args)})
    save_dir = os.path.join(args.save_dir or ".", args.name, logger.run_id)
    os.makedirs(save_dir, exist_ok=True)

    ckpt_config = model_config["training"].get(
        "checkpoint", {"every_n_train_steps": 10000, "save_top_k": 1, "save_last": True}
    )

    demo_callback = None
    try:
        demo_callback = create_demo_callback_from_config(model_config, demo_dl=train_dl)
    except NotImplementedError:
        pass

    n_devices = args.num_chips or len(jax.devices())
    fsdp = n_devices if args.strategy == "fsdp" and n_devices > 1 else 1
    mesh = create_mesh(n_devices, fsdp=fsdp) if n_devices > 1 else None

    trainer = Trainer(
        training_wrapper,
        train_dl,
        model_config=model_config,
        save_dir=save_dir,
        checkpoint_every=ckpt_config.get("every_n_train_steps", 10000),
        demo_callback=demo_callback,
        logger=logger,
        max_steps=args.max_steps or None,
        accum_batches=args.accum_batches,
        mesh=mesh,
        log_every=model_config["training"].get("logging", {}).get("log_every", 1),
        gradient_clip_val=args.gradient_clip_val,
        profile_dir=getattr(args, "profile_dir", "") or None,
        profile_start_step=int(getattr(args, "profile_start_step", 10)),
        profile_steps=int(getattr(args, "profile_steps", 5)),
    )

    trainer.fit(ckpt_path=args.ckpt_path or None, seed=seed)


if __name__ == "__main__":
    main()
