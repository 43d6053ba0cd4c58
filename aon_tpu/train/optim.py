"""Optimizer / LR-scheduler factories (optax).

Parity with the reference's (dormant) factories ``utils/__init__.py:32-88``
and ``utils/warmup_scheduler.py`` — the reference defines sgd/adam/radam/
ranger + steplr/cosine/poly + gradual warmup but its three live systems
bypass them (hardcoded Adam, model.py:386-389).  Here they are live and
composable: ``get_optimizer(cfg)`` returns an optax transform using
``get_scheduler(cfg)`` as its learning rate.

Mapping notes: torch RAdam -> optax.radam; "ranger" (RAdam + Lookahead) ->
optax.lookahead over radam; GradualWarmupScheduler(multiplier, warmup
epochs) -> linear multiplier ramp composed with the base schedule.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import optax

from aon_tpu.train.schedule import nerf_lr_schedule


def get_scheduler(
    lr: float,
    lr_scheduler: str = "poly",
    num_epochs: int = 80,
    steps_per_epoch: int = 1000,
    decay_step: Sequence[int] = (20,),
    decay_gamma: float = 0.1,
    poly_exp: float = 0.99,
    warmup_epochs: int = 0,
    warmup_multiplier: float = 1.0,
) -> Callable:
    """Returns an optax schedule fn(step) -> lr.

    steplr/cosine/poly semantics from utils/__init__.py:71-88 (epoch-based
    in the reference; converted to steps here via steps_per_epoch).
    """
    total_steps = max(1, num_epochs * steps_per_epoch)

    if lr_scheduler == "steplr":
        boundaries = {int(e) * steps_per_epoch: decay_gamma for e in decay_step}
        base = optax.piecewise_constant_schedule(lr, boundaries)
    elif lr_scheduler == "cosine":
        base = optax.cosine_decay_schedule(lr, total_steps)
    elif lr_scheduler == "poly":
        base = optax.polynomial_schedule(
            init_value=lr, end_value=0.0, power=poly_exp, transition_steps=total_steps
        )
    else:
        raise ValueError(f"scheduler {lr_scheduler!r} not recognized")

    if warmup_epochs <= 0:
        return base

    warmup_steps = warmup_epochs * steps_per_epoch

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        # GradualWarmupScheduler: lr ramps from base to base*multiplier
        mult = 1.0 + (warmup_multiplier - 1.0) * frac
        return base(step) * mult

    return schedule


def get_optimizer(
    optimizer: str = "adam",
    lr: float = 1.0e-3,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """sgd/adam/radam/ranger factory (utils/__init__.py:32-52 parity).

    The reference's "adam" branch actually constructs AdamW
    (torch_optimizer heritage); mirrored here with optax.adamw.
    """
    learning_rate = schedule if schedule is not None else lr
    if optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum),
        )
    if optimizer == "adam":
        return optax.adamw(learning_rate, eps=eps, weight_decay=weight_decay)
    if optimizer == "radam":
        return optax.radam(learning_rate, eps=eps)
    if optimizer == "ranger":
        # Ranger = RAdam + Lookahead.  optax.lookahead requires params
        # wrapped in optax.LookaheadParams (fast/slow copies); use
        # ``wrap_lookahead_params`` on your pytree when selecting this.
        return optax.lookahead(
            optax.radam(learning_rate, eps=eps), sync_period=6, slow_step_size=0.5
        )
    raise ValueError(f"optimizer {optimizer!r} not recognized")


def wrap_lookahead_params(params):
    """Wrap a params pytree for the "ranger" (lookahead) optimizer."""
    return optax.LookaheadParams(fast=params, slow=params)


def default_nerf_optimizer(cfg) -> optax.GradientTransformation:
    """The live training path's Adam + log-lerp/warmup schedule."""
    return optax.adam(
        nerf_lr_schedule(
            cfg.lr_init, cfg.lr_final, cfg.lr_delay_steps, cfg.lr_delay_mult,
            # lr_max_steps decouples the decay horizon from run_max_steps
            # (0 = coupled, the reference's behavior); past the horizon the
            # schedule floors at lr_final (t clipped at 1).  See
            # utils/config.py lr_max_steps for the AE-100k rationale.
            getattr(cfg, "lr_max_steps", 0) or cfg.run_max_steps,
        ),
        b1=0.9,
        b2=0.999,
    )
