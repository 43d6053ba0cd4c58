"""Two-level hierarchical vanilla NeRF (flax.linen).

Behavioral contract from reference ``models/vanilla_nerf/model.py:123-199``:
coarse stratified level (num_coarse_samples, evaluated on N+1 t-values),
inverse-CDF fine level over the interior coarse weights, sigmoid rgb, ReLU
sigma, optional *uniform* sigma noise (the reference uses ``torch.rand_like``,
i.e. U[0,1), not Gaussian — reproduced faithfully), alpha compositing with
optional white background.  Unlike the reference, ``num_coarse_samples`` /
``num_fine_samples`` are honored from config (the reference's CLI flags
``--N_samples/--N_importance`` are dead; ``NeRF()`` is always built with
class defaults, model.py:218).

PRNG: explicit ``jax.random`` keys split per level replace the reference's
``randomized`` + global torch RNG.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aon_tpu.core import sampling
from aon_tpu.core.rendering import volumetric_rendering
from aon_tpu.models.mlp import NeRFMLP

Dtype = Any


class VanillaNeRF(nn.Module):
    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    use_viewdirs: bool = True
    noise_std: float = 0.0
    lindisp: bool = False
    netdepth: int = 8
    netwidth: int = 256
    netdepth_condition: int = 1
    netwidth_condition: int = 128
    skip_layer: int = 4
    remat: bool = True  # rematerialize MLP activations in backward (HBM saver)
    dtype: Dtype = jnp.float32

    def setup(self):
        mlp_kw = dict(
            netdepth=self.netdepth,
            netwidth=self.netwidth,
            netdepth_condition=self.netdepth_condition,
            netwidth_condition=self.netwidth_condition,
            skip_layer=self.skip_layer,
            dtype=self.dtype,
        )
        mlp_cls = nn.remat(NeRFMLP) if self.remat else NeRFMLP
        self.coarse_mlp = mlp_cls(**mlp_kw)
        self.fine_mlp = mlp_cls(**mlp_kw)

    def __call__(
        self,
        rays: Dict[str, jnp.ndarray],
        key: Optional[jax.Array],
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """rays: {rays_o, rays_d, viewdirs} each (B, 3).

        Returns [(comp_rgb, acc, depth) per level], matching reference
        model.py:147-199.
        """
        if randomized:
            keys = jax.random.split(key, 2 * self.num_levels)
        else:
            keys = [None] * (2 * self.num_levels)

        ret = []
        t_vals = None
        weights = None
        for i_level in range(self.num_levels):
            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    keys[0],
                    rays["rays_o"],
                    rays["rays_d"],
                    self.num_coarse_samples,
                    near,
                    far,
                    randomized=randomized,
                    lindisp=self.lindisp,
                )
                mlp = self.coarse_mlp
            else:
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    keys[2 * i_level],
                    t_mids,
                    weights[..., 1:-1],
                    rays["rays_o"],
                    rays["rays_d"],
                    t_vals,
                    self.num_fine_samples,
                    randomized=randomized,
                )
                mlp = self.fine_mlp

            samples_enc = sampling.pos_enc(samples, self.min_deg_point, self.max_deg_point)
            viewdirs_enc = sampling.pos_enc(rays["viewdirs"], 0, self.deg_view)
            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc)

            if self.noise_std > 0 and randomized:
                raw_sigma = raw_sigma + (
                    jax.random.uniform(keys[2 * i_level + 1], raw_sigma.shape, raw_sigma.dtype)
                    * self.noise_std
                )

            rgb = nn.sigmoid(raw_rgb)
            sigma = nn.relu(raw_sigma)

            comp_rgb, acc, weights, depth = volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd
            )
            ret.append((comp_rgb, acc, depth))
        return ret
