"""Microbatched gradient accumulation + scan-chunked rendering.

Two jobs:
  1. Keep per-compile sample counts bounded: the TPU backend's regalloc
     trips a RET_CHECK (live_range_finder.cc:29) compiling this MLP above
     ~0.5M samples per call; bounded microbatch bodies sidestep that and
     keep peak HBM flat as ray batches grow.
  2. Gradient accumulation with exact mean semantics: equal-size microbatch
     MSE means average to the full-batch mean.

Layout contract: ray-axis entries arrive stacked as ``(k, m, ...)`` with the
SECOND axis sharded over the mesh "data" axis (see
``parallel.shard_ray_batch(..., microbatch=)``) — so every microbatch spans
all chips and ``lax.scan`` over axis 0 preserves data parallelism.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

# batch entries carrying a per-ray leading axis (everything else is shared)
from aon_tpu.parallel.mesh import RAY_KEYS  # canonical per-ray key list


def _inject_ray_ids(superbatch: Dict, m_global: int, offset) -> Dict:
    """Attach GLOBAL per-ray indices (T, k, m_local) so randomized sampling
    is independent of microbatching and device sharding (per-ray fold_in;
    see core/sampling.per_ray_uniform)."""
    ref = superbatch["rays_o"]  # (T, k, m_local, 3)
    t_steps, k, m_local = ref.shape[:3]
    micro = jax.lax.broadcasted_iota(jnp.int32, (k, m_local), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, m_local), 1)
    ids = micro * m_global + offset + row
    return dict(superbatch, ray_ids=jnp.broadcast_to(ids[None], (t_steps, k, m_local)))


def _loss_aux_grads(loss_fn: Callable, params, batch: Dict, key: jax.Array):
    """(loss, aux, grads) from either kind of loss function.

    A plain loss_fn returns (loss, aux) and is differentiated here; a
    gradient-producing step (``loss_fn.returns_grads = True``, e.g. the v3
    fused level-train kernels that compute weight grads in-kernel) returns
    (loss, aux, grads) directly."""
    if getattr(loss_fn, "returns_grads", False):
        return loss_fn(params, batch, key)
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
    return loss, aux, grads


def accumulated_grads(
    loss_fn: Callable, params, batch: Dict, key: jax.Array, axis_name=None
):
    """Mean (loss, aux, grads) over stacked microbatches.

    ``batch``: ray entries (k, m, ...), shared entries as-is.
    ``loss_fn(params, flat_batch, key) -> (loss, aux_dict)`` sees (m, ...)
    ray entries.

    A loss_fn may expose ``prepare_shared(batch, axis_name) -> dict`` to
    compute WHOLE-BATCH reductions (across all k microbatches and, when
    ``axis_name`` names the mesh data axis we are shard_mapped over, across
    all chips) that each microbatch then consumes as shared entries — e.g.
    the AE's masked-MSE denominator, which the reference computes over the
    full ray batch (model_ae_art.py:380-387), not per microbatch.
    """
    prep = getattr(loss_fn, "prepare_shared", None)
    if prep is not None:
        batch = dict(batch, **prep(batch, axis_name))
    ray_parts = {n: v for n, v in batch.items() if n in RAY_KEYS}
    shared = {n: v for n, v in batch.items() if n not in RAY_KEYS}

    if batch["rays_o"].ndim == 2:
        # flat (unstacked) batch: single microbatch.  Discriminate on rays_o
        # specifically — 1-D ray entries (instance_mask, t_near, loss_w) have
        # ndim 1 flat / 2 stacked, so "first ray entry in dict order" would
        # misclassify a flat AE batch as stacked.
        return _loss_aux_grads(loss_fn, params, batch, key)

    k = next(iter(ray_parts.values())).shape[0]

    if k == 1:
        mb = dict(shared, **{n: v[0] for n, v in ray_parts.items()})
        return _loss_aux_grads(loss_fn, params, mb, key)

    if "ray_ids" in batch:
        # global per-ray ids already decorrelate every ray's stream (per-ray
        # fold_in, core/sampling.per_ray_uniform); keeping the step key
        # microbatch-INVARIANT makes the training trajectory independent of
        # the microbatch count k (changing microbatch_rays only re-chunks
        # compute, it does not resample)
        keys = jnp.stack([key] * k)
    else:
        keys = jax.random.split(key, k)

    def body(carry, xs):
        grads_acc, loss_acc, aux_acc = carry
        mb_key, mb_rays = xs
        mb = dict(shared, **mb_rays)
        loss, aux, grads = _loss_aux_grads(loss_fn, params, mb, mb_key)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        return (grads_acc, loss_acc + loss, jax.tree.map(jnp.add, aux_acc, aux)), None

    zero_grads = jax.tree.map(jnp.zeros_like, params)
    mb0 = dict(shared, **{n: v[0] for n, v in ray_parts.items()})
    aux_proto = jax.eval_shape(
        lambda p, b, kk: _loss_aux_grads(loss_fn, p, b, kk), params, mb0, keys[0]
    )[1]
    zero_aux = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_proto)

    (grads, loss, aux), _ = jax.lax.scan(
        body, (zero_grads, jnp.zeros(()), zero_aux), (keys, ray_parts)
    )
    inv_k = 1.0 / k
    return (
        loss * inv_k,
        jax.tree.map(lambda a: a * inv_k, aux),
        jax.tree.map(lambda g: g * inv_k, grads),
    )


def make_train_many_sharded(loss_fn: Callable, metrics_fn: Callable, mesh):
    """Multi-chip variant of make_train_many for Pallas-kernel losses.

    Pallas calls don't auto-partition under jit with sharded operands, so
    the whole scan-of-steps runs inside ``shard_map`` over the mesh "data"
    axis: each chip consumes its ray shard, gradients are ``pmean``-ed over
    ICI inside, and the optimizer update happens replicated per chip
    (identical inputs -> identical params, same as the single-jit path).
    """
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local_many(state, superbatch, key):
        t_steps = next(iter(superbatch.values())).shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(t_steps))
        m_local = superbatch["rays_o"].shape[2]
        m_global = m_local * jax.lax.axis_size("data")
        offset = jax.lax.axis_index("data") * m_local
        superbatch = _inject_ray_ids(superbatch, m_global, offset)

        def step(st, xs):
            k, b = xs
            loss, aux, grads = accumulated_grads(
                loss_fn, st.params, b, k, axis_name="data"
            )
            loss, aux, grads = jax.lax.pmean((loss, aux, grads), "data")
            st = st.apply_gradients(grads=grads)
            return st, (loss, aux)

        state, (losses, auxs) = jax.lax.scan(step, state, (keys, superbatch))
        mean_aux = jax.tree.map(jnp.mean, auxs)
        metrics = metrics_fn(jnp.mean(losses), mean_aux)
        metrics["train/loss_last"] = losses[-1]
        return state, metrics

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def train_many(state, superbatch, key):
        batch_specs = {
            k: (P(None, None, "data") if k in RAY_KEYS else P())
            for k in superbatch
        }
        fn = shard_map(
            local_many,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, superbatch, key)

    return train_many


def make_train_many(loss_fn: Callable, metrics_fn: Callable):
    """Multi-step dispatch: scan T optimizer steps inside ONE jitted call.

    Through the axon relay every dispatch costs ~45 ms RTT; scanning T steps
    per call amortizes that to 45/T ms.  ``superbatch`` entries carry a
    leading T axis (see parallel.stack_step_batches); each scanned step runs
    the usual microbatched grad accumulation + optimizer update.

    Returns jitted ``fn(state, superbatch, key) -> (state, metrics)`` where
    metrics are means over the T steps (loss also reported for the last).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_many(state, superbatch, key):
        t_steps = next(iter(superbatch.values())).shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(t_steps))
        superbatch = _inject_ray_ids(
            superbatch, superbatch["rays_o"].shape[2], 0
        )

        def step(st, xs):
            k, b = xs
            loss, aux, grads = accumulated_grads(loss_fn, st.params, b, k)
            st = st.apply_gradients(grads=grads)
            return st, (loss, aux)

        state, (losses, auxs) = jax.lax.scan(step, state, (keys, superbatch))
        mean_aux = jax.tree.map(jnp.mean, auxs)
        metrics = metrics_fn(jnp.mean(losses), mean_aux)
        metrics["train/loss_last"] = losses[-1]
        return state, metrics

    return train_many
