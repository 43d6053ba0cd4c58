"""aon_tpu — a TPU-native (JAX/XLA/Pallas) framework for articulated-object NeRFs.

This is a ground-up rebuild of the capabilities of
``zubair-irshad/articulated-object-nerf`` (reference mounted read-only at
``/root/reference``) designed TPU-first:

* pure-functional models (flax.linen) — params are pytrees, one jitted
  train step, explicit ``jax.random`` keys instead of global RNG state;
* data-parallel ray sharding over a ``jax.sharding.Mesh`` (ICI collectives
  inserted by XLA) instead of PyTorch-Lightning DDP/NCCL;
* fixed-shape batches everywhere (XLA-friendly), no host-side chunk loops;
* Pallas kernels for the fused sample→pos-enc→MLP→composite hot path.

Layout:
  core/      ray + sampling + volume-rendering math (pure jnp)
  models/    NeRF MLPs, articulated variants, latent code library, encoders
  data/      SAPIEN dataset loaders (host-side numpy) + batch pipelines
  train/     train systems, LR schedule, checkpointing, metrics, logging
  eval/      full-frame sharded rendering, image/video/stats artifacts
  parallel/  mesh + sharding helpers
  ops/       Pallas TPU kernels
  native/    C++ host-side helpers (ray/AABB, batch assembly) via ctypes
  utils/     config (reference-compatible CLI/JSON surface), visualization
"""

__version__ = "0.1.0"
