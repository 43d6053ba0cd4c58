"""Learning-rate schedule: log-lerp with sin-delay warmup.

Exact contract from reference ``models/vanilla_nerf/model.py:391-419``:

  delay_rate = mult + (1 - mult) * sin(pi/2 * clip(step/delay_steps, 0, 1))
  t = clip(step / max_steps, 0, 1)
  lr = delay_rate * exp(log(lr_init) * (1 - t) + log(lr_final) * t)

Implemented as an optax-compatible schedule (jnp, traceable).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def nerf_lr_schedule(
    lr_init: float = 5.0e-4,
    lr_final: float = 5.0e-6,
    lr_delay_steps: int = 2500,
    lr_delay_mult: float = 0.01,
    max_steps: int = 100000,
):
    log_init = math.log(lr_init)
    log_final = math.log(lr_final)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        scaled = jnp.exp(log_init * (1 - t) + log_final * t)
        return delay_rate * scaled

    return schedule
