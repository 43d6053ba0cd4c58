"""Pallas inverse-CDF resampling: the hierarchical fine-sampling stage
(reference ``helper.py:203-252``) as one TPU kernel.

The XLA formulation of this stage (core/sampling.py) materializes a
``(B, bins, samples)`` compare tensor plus four ``take_along_axis`` gathers
and a generic ``jnp.sort`` of the 193-value coarse∪fine union — the last
HBM-bound glue outside the fused MLP kernels, and the piece whose compile
blows up above ~30k rays/chunk.  This kernel keeps the whole stage in VMEM:

  * inverse CDF via the reference's masked running-select (helper.py:232-241
    computes masked max/min over bins; here an unrolled ascending/descending
    scan over the static bin axis — no gathers, no (B, bins, samples)
    intermediate),
  * the sorted union via a bitonic MERGE network (the coarse t-vals are
    sorted by construction; the fine samples are sorted because the input
    ``u`` is sorted — see below): pad both to 128 lanes with +inf, reverse
    one, concatenate to a 256-wide bitonic row, then log2(256) = 8
    compare-exchange stages of static strided reshapes.  This replaces the
    general O(n log^2 n) XLA sort with the optimal two-list merge.

Randomized draws: the reference draws iid uniforms and relies on the final
union sort (helper.py:250); a merge network instead needs *sorted* u.  Iid
sorted uniforms are generated directly via the order-statistics identity
u_(k) = S_k / S_{n+1} with S partial sums of iid Exp(1) — the resulting
SORTED sample set is distributed identically to sorting iid draws, so the
training contract (statistical, not stream-for-stream — torch vs JAX PRNG
already differ) is preserved.  Deterministic eval u (linspace,
helper.py:227-229) is already sorted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.ops.fused_mlp import _interpret

LANE = 128


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def sorted_uniform(key, shape, dtype=jnp.float32):
    """Sorted iid-uniform order statistics, no sort: cumsum-of-exponentials."""
    n = shape[-1]
    e = -jnp.log1p(-jax.random.uniform(key, (*shape[:-1], n + 1), dtype=dtype))
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / s[..., -1:]


def sorted_per_ray_uniform(key, ray_ids, n, dtype=jnp.float32):
    """Per-ray-seeded sorted uniforms (layout-independent, like
    core/sampling.per_ray_uniform)."""
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(ray_ids)
    return jax.vmap(lambda k: sorted_uniform(k, (n,), dtype=dtype))(keys)


def _bitonic_merge_desc_asc(x, width):
    """Sort a bitonic row (T, width) ascending; width a power of two.

    log2(width) compare-exchange stages in the SIMD-roll formulation: the
    stage-d partner of lane i is i XOR d, fetched with two static lane
    rolls and selected by an iota bitmask.  (Mosaic has no lane-splitting
    reshape, so the textbook (blocks, 2, d) reshape can't lower; rolls and
    iota compares map directly onto VPU lane shuffles.)
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = width // 2
    while d >= 1:
        upper = (iota & d) != 0  # partner sits at i - d; else at i + d
        from_right = pltpu.roll(x, width - d, 1)  # lane i <- x[i + d]
        from_left = pltpu.roll(x, d, 1)  # lane i <- x[i - d]
        partner = jnp.where(upper, from_left, from_right)
        x = jnp.where(upper, jnp.maximum(x, partner), jnp.minimum(x, partner))
        d //= 2
    return x


def _resample_kernel(n_bins, n_t, n_u, t_ref, bins_ref, cdf_ref, u_ref, out_ref):
    """Per-tile: invert the CDF at u, merge fine samples with coarse t-vals.

    t_ref:    (T, LANE)  coarse t-vals ascending, cols >= n_t padded +inf
    bins_ref: (T, LANE)  bin positions (t-mids), cols >= n_bins ignored
    cdf_ref:  (T, LANE)  cdf at bins (cdf[0]=0, cdf[n_bins-1]=1), cols >= n_bins ignored
    u_ref:    (T, LANE)  quantiles in [0, 1) DESCENDING in cols >= LANE-n_u;
              leading pad cols hold a sentinel (ignored).  Mosaic has no
              ``rev`` lowering, so the caller reverses u instead of the
              kernel reversing samples for the bitonic concat.
    out_ref:  (T, 2*LANE) sorted union in [:, :n_t+n_u], +inf beyond
    """
    u = u_ref[...]  # (T, LANE), descending payload

    # Inverse CDF by running select over the static bin axis (reference
    # helper.py:232-241 contract: lo = last bin with cdf <= u, hi = first
    # bin with cdf > u; endpoints clamp to the first/last bin).
    lo_cdf = jnp.zeros_like(u)
    lo_bin = jnp.broadcast_to(bins_ref[:, 0:1], u.shape)
    for i in range(n_bins):
        c = cdf_ref[:, i : i + 1]
        b = bins_ref[:, i : i + 1]
        cond = c <= u
        lo_cdf = jnp.where(cond, c, lo_cdf)
        lo_bin = jnp.where(cond, b, lo_bin)
    hi_cdf = jnp.ones_like(u)
    hi_bin = jnp.broadcast_to(bins_ref[:, n_bins - 1 : n_bins], u.shape)
    for i in range(n_bins - 1, -1, -1):
        c = cdf_ref[:, i : i + 1]
        b = bins_ref[:, i : i + 1]
        cond = c > u
        hi_cdf = jnp.where(cond, c, hi_cdf)
        hi_bin = jnp.where(cond, b, hi_bin)

    denom = hi_cdf - lo_cdf
    t = jnp.clip((u - lo_cdf) / jnp.where(denom <= 0, 1.0, denom), 0.0, 1.0)
    t = jnp.where(denom <= 0, 0.0, t)
    samples = lo_bin + t * (hi_bin - lo_bin)  # descending (u desc, cdf monotone)
    # Leading pad columns become +inf: descending-with-leading-inf keeps the
    # concatenated row bitonic and sorts the pads to the union's tail.
    if n_u != LANE:
        iota = jax.lax.broadcasted_iota(jnp.int32, samples.shape, 1)
        samples = jnp.where(iota < LANE - n_u, jnp.inf, samples)

    tv = t_ref[...]  # (T, LANE) ascending; cols >= n_t already +inf

    # ascending(tv) ++ descending(samples) is bitonic -> one merge network.
    row = jnp.concatenate([tv, samples], axis=-1)
    out_ref[...] = _bitonic_merge_desc_asc(row, 2 * LANE)


@functools.partial(jax.jit, static_argnames=("num_samples", "tile"))
def fused_resample(t_vals, bins, weights, u, num_samples=128, tile=128):
    # tile 128: 256-row tiles put the kernel's scoped-vmem stack at 16.77M
    # (just over the 16M limit) when compiled inside the full eval render at
    # 61440-ray chunks; 128 rows leave ~2x headroom at negligible cost (the
    # kernel is <1% of a render).
    """(B, n_t) sorted coarse t-vals + piecewise-constant pdf + sorted
    quantiles u (B, num_samples) -> sorted union (B, n_t + num_samples).

    Matches sampling.sample_pdf(...)'s t-value output (helper.py:246-252)
    for sorted u; the cdf construction (eps=1e-5 mass padding, clamped
    cumsum, 0/1 endpoints) matches helper.py:217-226.
    """
    B, n_t = t_vals.shape
    n_bins = bins.shape[-1]
    assert n_t <= LANE and n_bins <= LANE and num_samples <= LANE

    # CDF in XLA: (B, n_bins) elementwise + one tiny cumsum — fuses upstream.
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding
    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # (B, n_bins)

    n_pad = _round_up(max(B, tile), tile)

    def pad_rows(x, fill=0.0):
        return jnp.pad(x, ((0, n_pad - B), (0, 0)), constant_values=fill)

    tvp = jnp.pad(t_vals, ((0, 0), (0, LANE - n_t)), constant_values=jnp.inf)
    # kernel expects u DESCENDING with leading sentinel pad (no rev in Mosaic)
    u_desc = jnp.pad(u[:, ::-1], ((0, 0), (LANE - num_samples, 0)), constant_values=2.0)
    args = (
        pad_rows(tvp, jnp.inf),
        pad_rows(jnp.pad(bins, ((0, 0), (0, LANE - n_bins)))),
        pad_rows(jnp.pad(cdf, ((0, 0), (0, LANE - n_bins))), 1.0),
        pad_rows(u_desc, 2.0),
    )
    kernel = functools.partial(_resample_kernel, n_bins, n_t, num_samples)
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in args
        ],
        out_specs=pl.BlockSpec((tile, 2 * LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2 * LANE), jnp.float32),
    )(*args)
    return out[:B, : n_t + num_samples]


def sample_pdf_fused(
    key,
    bins,
    weights,
    origins,
    directions,
    t_vals,
    num_samples,
    randomized,
    ray_ids=None,
):
    """Drop-in for ``core.sampling.sample_pdf`` on the fused TPU paths.

    Same output contract (sorted coarse∪fine t-values + recast coords,
    helper.py:246-252); the union is produced by the Pallas merge kernel.
    Randomized quantiles are sorted-by-construction order statistics (see
    module docstring) — distributionally identical to the reference's
    draw-then-sort, with per-ray layout-independent seeding when ``ray_ids``
    is given.
    """
    from aon_tpu.core.sampling import cast_rays

    if randomized:
        if key is None:
            raise ValueError("randomized PDF sampling requires a PRNG key")
        if ray_ids is not None:
            u = sorted_per_ray_uniform(key, ray_ids, num_samples, bins.dtype)
        else:
            u = sorted_uniform(key, (*bins.shape[:-1], num_samples), bins.dtype)
    else:
        u = jnp.linspace(0.0, 1.0 - 2.0**-32, num_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (*bins.shape[:-1], num_samples))

    # Detach BEFORE the kernel (reference detaches the drawn samples,
    # helper.py:249 — no gradient flows through the t-value pipeline either
    # way) so autodiff never builds a JVP of the Pallas call (roll has no
    # differentiation rule).
    t_union = fused_resample(
        jax.lax.stop_gradient(t_vals),
        jax.lax.stop_gradient(bins),
        jax.lax.stop_gradient(weights),
        jax.lax.stop_gradient(u),
        num_samples=num_samples,
    )
    return t_union, cast_rays(t_union, origins, directions)
