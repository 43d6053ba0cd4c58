"""Ray sampling math for hierarchical NeRF rendering (pure jnp, TPU-first).

Behavioral contracts match the reference implementation
(``/root/reference/models/vanilla_nerf/helper.py``):

* ``sample_along_rays`` (helper.py:106-133): stratified sampling produces
  ``num_samples + 1`` t-values (the MLP is evaluated on N+1 points), with
  optional lindisp spacing and jittered midpoint perturbation.
* ``pos_enc`` (helper.py:136-140): sin/cos computed as
  ``sin(concat([xb, xb + pi/2]))`` with identity channels prepended, giving
  ``(2*(max_deg-min_deg) + 1) * C`` output channels, frequency-major layout.
* ``sorted_piecewise_constant_pdf`` (helper.py:203-243): weight padding to
  eps=1e-5 total mass, CDF with 0/1 endpoints, deterministic u in
  ``[0, 1 - 2**-32]`` when not randomized, piecewise-linear inverse CDF.
  The reference inverts the CDF with an O(bins*samples) masked max/min
  (helper.py:232-241); we use an equivalent comparison-count formulation
  that maps to dense vectorized compare+gather (TPU/VPU friendly, no sort,
  no data-dependent control flow).
* ``sample_pdf`` (helper.py:246-252): fine t-values are drawn with
  gradients stopped, then the sorted union of coarse+fine t-values is
  recast into sample coordinates.

All functions are shape-polymorphic over leading batch dims but written for
``(num_rays, ...)`` batches; everything is jit/vmap/shard_map compatible
(static shapes, no Python control flow on traced values).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cast_rays(t_vals: jnp.ndarray, origins: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """o + t*d for every t. t_vals: (..., S); origins/directions: (..., 3) -> (..., S, 3)."""
    return origins[..., None, :] + t_vals[..., None] * directions[..., None, :]


def per_ray_uniform(
    key: jax.Array, ray_ids: jnp.ndarray, n: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, n) uniforms where row i depends only on (key, ray_ids[i]) —
    independent of batch size, microbatching, or device sharding (the key
    is folded with the GLOBAL ray index; SURVEY §7 'per-ray RNG under
    shard_map')."""
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(ray_ids)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype=dtype))(keys)


def sample_along_rays(
    key: Optional[jax.Array],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    num_samples: int,
    near: float,
    far: float,
    randomized: bool,
    lindisp: bool = False,
    ray_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified coarse sampling along rays.

    Returns ``(t_vals, coords)`` with ``t_vals: (B, num_samples + 1)`` and
    ``coords: (B, num_samples + 1, 3)``. When ``randomized`` is True, each of
    the N+1 points is jittered uniformly within its midpoint-bounded bin
    (reference helper.py:122-127).

    ``near`` / ``far`` may be scalars (the reference's global 2/6 contract)
    or per-ray ``(B,)`` arrays (AABB-tightened intervals, data/aabb.py) —
    per-ray values broadcast into per-ray sample ladders.
    """
    bsz = rays_o.shape[0]
    dtype = rays_o.dtype
    near = jnp.asarray(near, dtype=dtype)
    far = jnp.asarray(far, dtype=dtype)
    if near.ndim >= 1:
        near = near.reshape(-1, 1)
    if far.ndim >= 1:
        far = far.reshape(-1, 1)
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=dtype)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        if key is None:
            raise ValueError("randomized sampling requires a PRNG key")
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        if ray_ids is not None:
            t_rand = per_ray_uniform(key, ray_ids, num_samples + 1, dtype)
        else:
            t_rand = jax.random.uniform(key, (bsz, num_samples + 1), dtype=dtype)
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, (bsz, num_samples + 1))

    t_vals = jax.lax.stop_gradient(t_vals)  # sample positions carry no param grads
    coords = cast_rays(t_vals, rays_o, rays_d)
    return t_vals, coords


def pos_enc(x: jnp.ndarray, min_deg: int, max_deg: int) -> jnp.ndarray:
    """Positional encoding with identity passthrough.

    Output channels: ``(2*(max_deg - min_deg) + 1) * C`` laid out as
    ``[x, sin(x*2^d0), ..., sin(x*2^dk), cos(x*2^d0), ..., cos(x*2^dk)]``
    where each frequency block is C-wide (frequency-major, matching reference
    helper.py:136-140 which computes cos as sin(x + pi/2)).
    """
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    # (..., D, C) -> (..., D*C), frequency-major like the reference reshape.
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
    return jnp.concatenate([x, four_feat], axis=-1)


def sorted_piecewise_constant_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    float_min_eps: float = 2.0**-32,
    ray_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling from a piecewise-constant pdf over sorted bins.

    bins: (B, N) sorted positions; weights: (B, N - 1) bin masses.
    Returns samples: (B, num_samples).

    Matches reference helper.py:203-243 exactly, including the eps=1e-5
    total-mass padding and the cdf construction
    ``cat([0, min(1, cumsum(pdf[:-1])), 1])`` (length N).
    """
    eps = 1e-5
    dtype = bins.dtype
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(jnp.zeros_like(weight_sum), eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(jnp.ones_like(pdf[..., :-1]), jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # (B, N)

    if randomized:
        if key is None:
            raise ValueError("randomized PDF sampling requires a PRNG key")
        if ray_ids is not None:
            u = per_ray_uniform(key, ray_ids, num_samples, dtype)
        else:
            u = jax.random.uniform(key, (*cdf.shape[:-1], num_samples), dtype=dtype)
    else:
        u = jnp.linspace(0.0, 1.0 - float_min_eps, num_samples, dtype=dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

    # Reference inversion (helper.py:232-241):
    #   mask[i, j] = u_j >= cdf_i
    #   bin0_j = bins[max i with cdf_i <= u_j], bin1_j = bins[min i with cdf_i > u_j]
    # Equivalent: idx_j = #{i : cdf_i <= u_j}; bin0 = bins[idx-1], bin1 = bins[idx]
    # (clamped).  A dense compare+sum keeps this sort-free and vectorized.
    idx = jnp.sum(
        (u[..., None, :] >= cdf[..., :, None]).astype(jnp.int32), axis=-2
    )  # (B, num_samples), values in [1, N] since cdf[0] = 0 <= u
    lo = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    hi = jnp.clip(idx, 0, cdf.shape[-1] - 1)

    bin0 = jnp.take_along_axis(bins, lo, axis=-1)
    bin1 = jnp.take_along_axis(bins, hi, axis=-1)
    cdf0 = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf1 = jnp.take_along_axis(cdf, hi, axis=-1)

    denom = cdf1 - cdf0
    t = jnp.clip(jnp.nan_to_num((u - cdf0) / denom, nan=0.0), 0.0, 1.0)
    # Guard 0/0 without producing nan under jit (where both branches evaluate).
    t = jnp.where(denom <= 0, jnp.zeros_like(t), t)
    samples = bin0 + t * (bin1 - bin0)
    return samples


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    ray_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical fine resampling (reference helper.py:246-252).

    Draws ``num_samples`` fine t-values from the coarse weight pdf (gradients
    stopped), sorts the union with the coarse ``t_vals`` and recasts.
    Returns ``(t_union_sorted, coords)`` with shapes
    ``(B, T + num_samples)`` / ``(B, T + num_samples, 3)``.
    """
    t_samples = sorted_piecewise_constant_pdf(
        key, bins, weights, num_samples, randomized, ray_ids=ray_ids
    )
    t_samples = jax.lax.stop_gradient(t_samples)
    t_vals = jnp.sort(jnp.concatenate([t_vals, t_samples], axis=-1), axis=-1)
    # The t-value pipeline carries no parameter gradients (fine samples are
    # detached above; coarse t depends only on rays + RNG).  Stop gradients
    # here so autodiff never builds the sort/inverse-CDF backward — which at
    # large ray batches trips a TPU backend regalloc RET_CHECK and is pure
    # wasted compute anyway.
    t_vals = jax.lax.stop_gradient(t_vals)
    coords = cast_rays(t_vals, origins, directions)
    return t_vals, coords
