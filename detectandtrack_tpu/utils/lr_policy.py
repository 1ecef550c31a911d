"""Learning-rate schedules (Parity: `lib/utils/lr_policy.py`, SURVEY.md §2.1).

Supports the lineage's policies: step, steps_with_decay, steps_with_lrs,
fixed — each with linear/constant warm-up (SOLVER.WARM_UP_*). Exposed both
as `get_lr_at_iter` (host logging) and as an optax-compatible schedule.
"""

from __future__ import annotations

import bisect
from typing import Sequence

import jax.numpy as jnp


def get_lr_at_iter(it: int, *, base_lr: float, policy: str = "steps_with_decay",
                   gamma: float = 0.1, steps: Sequence[int] = (0,),
                   max_iter: int = 0, step_size: int = 30000,
                   warm_up_iters: int = 0, warm_up_factor: float = 1.0 / 3.0,
                   warm_up_method: str = "linear") -> float:
    """LR at iteration `it` (host-side scalar version)."""
    if policy == "fixed":
        lr = base_lr
    elif policy == "step":
        lr = base_lr * gamma ** (it // step_size)
    elif policy == "steps_with_decay":
        idx = bisect.bisect_right(list(steps), it) - 1
        lr = base_lr * gamma ** idx
    else:
        raise ValueError(f"Unknown LR_POLICY {policy!r}")

    if it < warm_up_iters:
        if warm_up_method == "linear":
            alpha = it / max(warm_up_iters, 1)
            factor = warm_up_factor * (1 - alpha) + alpha
        elif warm_up_method == "constant":
            factor = warm_up_factor
        else:
            raise ValueError(f"Unknown WARM_UP_METHOD {warm_up_method!r}")
        lr *= factor
    return lr


def make_schedule(solver_cfg):
    """SolverCfg → jit-friendly schedule fn: step (traced int) → lr."""
    base_lr = solver_cfg.BASE_LR
    gamma = solver_cfg.GAMMA
    steps = jnp.asarray(solver_cfg.STEPS)
    warm_iters = solver_cfg.WARM_UP_ITERS
    warm_factor = solver_cfg.WARM_UP_FACTOR
    policy = solver_cfg.LR_POLICY
    method = solver_cfg.WARM_UP_METHOD

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if policy == "fixed":
            lr = jnp.asarray(base_lr)
        elif policy == "steps_with_decay":
            idx = jnp.sum(step >= steps.astype(jnp.float32)) - 1
            lr = base_lr * gamma ** jnp.maximum(idx, 0).astype(jnp.float32)
        elif policy == "step":
            lr = base_lr * gamma ** jnp.floor(step / 30000.0)
        else:
            raise ValueError(f"Unknown LR_POLICY {policy!r}")
        if warm_iters > 0:
            alpha = jnp.clip(step / warm_iters, 0.0, 1.0)
            if method == "linear":
                factor = warm_factor * (1 - alpha) + alpha
            else:
                factor = jnp.where(step < warm_iters, warm_factor, 1.0)
            lr = lr * factor
        return lr

    return schedule
