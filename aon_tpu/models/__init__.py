from aon_tpu.models.mlp import NeRFMLP
from aon_tpu.models.nerf import VanillaNeRF
from aon_tpu.models.articulated import ArticulatedNeRFMLP, ArticulatedNeRF
from aon_tpu.models.code_library import CodeLibraryArticulated, interpolate_articulations
from aon_tpu.models.joint_state import JointStateDecoder

__all__ = [
    "NeRFMLP",
    "VanillaNeRF",
    "ArticulatedNeRFMLP",
    "ArticulatedNeRF",
    "CodeLibraryArticulated",
    "interpolate_articulations",
    "JointStateDecoder",
]
