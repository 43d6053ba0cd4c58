from aon_tpu.data.sapien import SapienDataset
from aon_tpu.data.sapien_multi import SapienDatasetMulti

dataset_dict = {
    "sapien": SapienDataset,
    "sapien_multi": SapienDatasetMulti,
}

__all__ = ["SapienDataset", "SapienDatasetMulti", "dataset_dict"]
