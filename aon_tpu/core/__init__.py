from aon_tpu.core.sampling import (
    cast_rays,
    pos_enc,
    sample_along_rays,
    sorted_piecewise_constant_pdf,
    sample_pdf,
)
from aon_tpu.core.rendering import volumetric_rendering, img2mse, mse2psnr

__all__ = [
    "cast_rays",
    "pos_enc",
    "sample_along_rays",
    "sorted_piecewise_constant_pdf",
    "sample_pdf",
    "volumetric_rendering",
    "img2mse",
    "mse2psnr",
]
