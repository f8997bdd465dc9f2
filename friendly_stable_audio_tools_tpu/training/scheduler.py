"""Optimizers and LR schedules (optax).

Parity target: reference `training/scheduler.py:5-84` — closed-form
`InverseLR` with exponential warmup and final-lr floor, plus config-driven
optimizer/scheduler construction (torch.optim names -> optax)."""

from __future__ import annotations

import typing as tp

import optax


def inverse_lr_schedule(base_lr: float, inv_gamma: float = 1.0, power: float = 1.0,
                        warmup: float = 0.0, final_lr: float = 0.0) -> optax.Schedule:
    """lr(t) = base * warmup(t) * max((1 + t/inv_gamma)^-power, final/base)
    (reference scheduler.py:5-44)."""

    def schedule(step):
        import jax.numpy as jnp

        lr_mult = (1 + step / inv_gamma) ** -power
        lr_mult = jnp.maximum(lr_mult, final_lr / base_lr if base_lr else 0.0)
        warmup_mult = (1 - warmup ** (step + 1)) if warmup > 0 else 1.0
        return base_lr * warmup_mult * lr_mult

    return schedule


_BETA_DEFAULTS = {"Adam": (0.9, 0.999), "AdamW": (0.9, 0.999)}


def create_optimizer_from_config(optimizer_config: dict) -> tp.Tuple[optax.GradientTransformation, tp.Optional[optax.Schedule]]:
    """reference scheduler.py:47-66. Maps torch optimizer types to optax.
    Returns (optimizer, schedule_or_None); attach the schedule via
    `create_optimizer_and_schedule_from_configs` for combined configs."""
    opt_type = optimizer_config["type"]
    cfg = dict(optimizer_config.get("config", {}))
    lr = cfg.pop("lr", 1e-4)
    betas = tuple(cfg.pop("betas", _BETA_DEFAULTS.get(opt_type, (0.9, 0.999))))
    weight_decay = cfg.pop("weight_decay", 0.0)
    eps = cfg.pop("eps", 1e-8)

    if opt_type in ("Adam", "FusedAdam"):
        if weight_decay:
            tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
        else:
            tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif opt_type == "AdamW":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif opt_type == "SGD":
        tx = optax.sgd(lr, momentum=cfg.pop("momentum", 0.0))
    elif opt_type == "Lion":
        tx = optax.lion(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    else:
        raise NotImplementedError(f"Unknown optimizer type: {opt_type}")
    return tx, lr


def create_scheduler_from_config(scheduler_config: dict, base_lr: float) -> optax.Schedule:
    """reference scheduler.py:69-84 (InverseLR | ExponentialLR | torch names)."""
    sched_type = scheduler_config["type"]
    cfg = dict(scheduler_config.get("config", {}))
    if sched_type == "InverseLR":
        return inverse_lr_schedule(base_lr, **cfg)
    if sched_type == "ExponentialLR":
        gamma = cfg.get("gamma", 0.999996)
        return lambda step: base_lr * gamma**step
    if sched_type == "CosineAnnealingLR":
        t_max = cfg.get("T_max", 1000000)
        eta_min = cfg.get("eta_min", 0.0)
        return optax.cosine_decay_schedule(base_lr, t_max, alpha=eta_min / base_lr if base_lr else 0.0)
    raise NotImplementedError(f"Unknown scheduler type: {sched_type}")


def build_optimizer(optimizer_and_scheduler_config: dict) -> optax.GradientTransformation:
    """Combine an `optimizer` (+ optional `scheduler`) config block into one
    optax transformation with the schedule folded into the learning rate."""
    opt_cfg = optimizer_and_scheduler_config["optimizer"]
    opt_type = opt_cfg["type"]
    cfg = dict(opt_cfg.get("config", {}))
    lr = cfg.pop("lr", 1e-4)
    betas = tuple(cfg.pop("betas", _BETA_DEFAULTS.get(opt_type, (0.9, 0.999))))
    weight_decay = cfg.pop("weight_decay", 0.0)
    eps = cfg.pop("eps", 1e-8)

    if "scheduler" in optimizer_and_scheduler_config:
        lr_or_sched = create_scheduler_from_config(optimizer_and_scheduler_config["scheduler"], lr)
    else:
        lr_or_sched = lr

    if opt_type in ("Adam", "FusedAdam") and not weight_decay:
        return optax.adam(lr_or_sched, b1=betas[0], b2=betas[1], eps=eps)
    if opt_type in ("Adam", "FusedAdam", "AdamW"):
        return optax.adamw(lr_or_sched, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    if opt_type == "SGD":
        return optax.sgd(lr_or_sched, momentum=cfg.pop("momentum", 0.0))
    if opt_type == "Lion":
        return optax.lion(lr_or_sched, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    raise NotImplementedError(f"Unknown optimizer type: {opt_type}")
