from aon_tpu.ops.fused_mlp import (
    fused_nerf_mlp,
    fused_nerf_mlp_per_ray,
    fused_nerf_mlp_xyz,
    make_posenc_constants,
    pack_vanilla_mlp_params,
)
from aon_tpu.ops.fused_mlp_train import (
    fused_mlp_train,
    fused_mlp_train_xyz,
    fused_nerf_mlp_xyz_eval,
    pack_vanilla_mlp_params_f32,
)
from aon_tpu.ops.fused_art import fused_art_mlp_eval, fused_art_mlp_train
from aon_tpu.ops.train_fused_level import fused_level_train_grads
from aon_tpu.ops.train_fused_level_art import fused_level_train_art_grads

__all__ = [
    "fused_level_train_grads",
    "fused_level_train_art_grads",
    "fused_nerf_mlp",
    "fused_nerf_mlp_per_ray",
    "fused_nerf_mlp_xyz",
    "fused_nerf_mlp_xyz_eval",
    "fused_mlp_train",
    "fused_mlp_train_xyz",
    "fused_art_mlp_train",
    "fused_art_mlp_eval",
    "make_posenc_constants",
    "pack_vanilla_mlp_params",
    "pack_vanilla_mlp_params_f32",
]
