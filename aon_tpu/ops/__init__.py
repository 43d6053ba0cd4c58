from aon_tpu.ops.fused_mlp import fused_nerf_mlp, pack_vanilla_mlp_params

__all__ = ["fused_nerf_mlp", "pack_vanilla_mlp_params"]
