"""Optimizer construction (optax) matching the reference's torch surface.

The reference reflects optimizer/LR-scheduler classes by name from the config
(``diffusion_wrapper.py:1092-1112``: ``getattr(optim, cfg.name)`` /
``getattr(optim.lr_scheduler, cfg.name)``). Here the same name-keyed configs
map onto optax: AdamW/Adam/SGD and LinearLR/ConstantLR with torch-equivalent
semantics, wrapped with global-norm clipping (``gradient_clip_val``,
reference ``config/main.yaml:83``) and ``optax.MultiSteps`` gradient
accumulation (``accumulate_grad_batches``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(base_lr: float, scheduler_cfg) -> Callable:
    """Torch-semantics LR factor schedules keyed by name.

    LinearLR(start_factor, end_factor=1.0, total_iters): multiplies the base
    LR by a factor interpolating start->end over total_iters steps.
    """
    if scheduler_cfg is None:
        return optax.constant_schedule(base_lr)
    kwargs: Dict[str, Any] = scheduler_cfg.kwargs or {}
    name = scheduler_cfg.name
    if name == "LinearLR":
        start = float(kwargs.get("start_factor", 1.0 / 3.0))
        end = float(kwargs.get("end_factor", 1.0))
        total = int(kwargs.get("total_iters", 5))

        def schedule(step):
            frac = jnp.clip(step / total, 0.0, 1.0)
            return base_lr * (start + (end - start) * frac)

        return schedule
    if name == "ConstantLR":
        factor = float(kwargs.get("factor", 1.0 / 3.0))
        total = int(kwargs.get("total_iters", 5))

        def schedule(step):
            return base_lr * jnp.where(step < total, factor, 1.0)

        return schedule
    if name == "CosineAnnealingLR":
        t_max = int(kwargs["T_max"])
        eta_min = float(kwargs.get("eta_min", 0.0))
        return optax.cosine_decay_schedule(base_lr, t_max, alpha=eta_min / base_lr)
    raise ValueError(f"Unknown LR scheduler: {name}")


def build_optimizer(
    optimizer_cfg,
    lr_schedule: Callable,
    gradient_clip_val: Optional[float] = None,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    kwargs: Dict[str, Any] = optimizer_cfg.kwargs or {}
    name = optimizer_cfg.name
    if name == "AdamW":
        import jax.numpy as jnp

        mu_dtype = kwargs.get("mu_dtype")
        opt = optax.adamw(
            learning_rate=lr_schedule,
            b1=kwargs.get("betas", (0.9, 0.999))[0],
            b2=kwargs.get("betas", (0.9, 0.999))[1],
            eps=kwargs.get("eps", 1e-8),
            weight_decay=kwargs.get("weight_decay", 0.01),
            mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None,
        )
    elif name == "Adam":
        opt = optax.adam(
            learning_rate=lr_schedule,
            b1=kwargs.get("betas", (0.9, 0.999))[0],
            b2=kwargs.get("betas", (0.9, 0.999))[1],
            eps=kwargs.get("eps", 1e-8),
        )
    elif name == "SGD":
        opt = optax.sgd(
            learning_rate=lr_schedule, momentum=kwargs.get("momentum", 0.0)
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    chain = []
    if gradient_clip_val is not None:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    chain.append(opt)
    tx = optax.chain(*chain)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def ema_update(ema_params, params, decay: float = 0.995):
    """EMA parameter tree (reference AveragedModel with
    ``get_ema_multi_avg_fn(0.995)``, ``diffusion_wrapper.py:138-142``)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
