"""Fused two-level NeRF rendering on the Pallas MLP kernel.

Eval-path replacement for the flax apply in ``VanillaSystem.render_chunk``:
sampling, positional encoding and compositing stay XLA (they fuse well);
the two MLP passes run through ``fused_nerf_mlp`` so activations never
touch HBM.  Multi-chip: the whole render is wrapped in ``shard_map`` over
the mesh "data" axis — each chip runs the kernel on its local ray shard,
no collectives needed.

This path is also the TPU workaround for a backend regalloc RET_CHECK that
the plain XLA MLP trips above ~0.5M samples per call (the kernel compiles
fine at any size), letting eval use large chunks.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aon_tpu.core import sampling
from aon_tpu.core.rendering import volumetric_rendering
from aon_tpu.ops.fused_mlp import make_posenc_constants, pack_vanilla_mlp_params
from aon_tpu.ops.fused_mlp_train import fused_nerf_mlp_xyz_eval
from aon_tpu.ops.resample_pallas import sample_pdf_fused

try:  # jax >= 0.3x public API
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _level(packed, enc_consts, rays, t_vals, samples, white_bkgd, tile):
    raw_rgb, raw_sigma = fused_nerf_mlp_xyz_eval(
        packed, enc_consts, samples, rays["viewdirs"], tile=tile
    )
    rgb = jax.nn.sigmoid(raw_rgb)
    sigma = jax.nn.relu(raw_sigma)
    return volumetric_rendering(rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)


def make_fused_render_fn(
    mesh: Mesh,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    min_deg: int = 0,
    max_deg: int = 10,
    deg_view: int = 4,
    lindisp: bool = False,
    tile: int = 1024,  # per-sample rows per kernel tile (flat v2)
):
    """Returns jitted ``fn(params, rays) -> {comp_rgb, acc, depth}`` with
    ``params`` the VanillaNeRF flax params dict and ``rays`` sharded
    P("data") over ``mesh``.  Deterministic (randomized=False)."""

    enc_consts = make_posenc_constants(max_deg=max_deg, view_deg=deg_view)

    def local_render(params, rays) -> Dict[str, jnp.ndarray]:
        packed_c = pack_vanilla_mlp_params(params["coarse_mlp"])
        packed_f = pack_vanilla_mlp_params(params["fine_mlp"])

        t_vals, samples = sampling.sample_along_rays(
            None, rays["rays_o"], rays["rays_d"], num_coarse,
            rays.get("t_near", near), rays.get("t_far", far),
            randomized=False, lindisp=lindisp,
        )
        _, _, weights, _ = _level(
            packed_c, enc_consts, rays, t_vals, samples, white_bkgd, tile
        )

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_vals, samples = sample_pdf_fused(
            None, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
            t_vals, num_fine, randomized=False,
        )
        comp_rgb, acc, _, depth = _level(
            packed_f, enc_consts, rays, t_vals, samples, white_bkgd, tile
        )
        return {"comp_rgb": comp_rgb, "acc": acc, "depth": depth}

    if mesh is not None and mesh.devices.size > 1:
        out_spec = {"comp_rgb": P("data"), "acc": P("data"), "depth": P("data")}
        _cache = {}

        def fn(params, rays):
            # rays may carry t_near/t_far (AABB path): one shard_map+jit per
            # key-set (specs are static per closure)
            ks = tuple(sorted(rays))
            if ks not in _cache:
                rays_spec = {k: P("data") for k in ks}
                _cache[ks] = jax.jit(shard_map(
                    local_render, mesh=mesh, in_specs=(P(), rays_spec),
                    out_specs=out_spec, check_vma=False,
                ))
            return _cache[ks](params, rays)

        return fn
    return jax.jit(local_render)
