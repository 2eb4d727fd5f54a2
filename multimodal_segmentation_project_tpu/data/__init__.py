from multimodal_segmentation_project_tpu.data.nifti import (
    NiftiImage,
    load_nifti,
    save_nifti,
    reorient_to_ras,
)
from multimodal_segmentation_project_tpu.data.dataset import (
    CombinedDataset,
    Subset,
    ConcatDataset,
    preprocess_ct,
    preprocess_mri,
    AMOS_MAPPING,
    CHAOS_RANGES,
)
from multimodal_segmentation_project_tpu.data.pipeline import DataLoader

__all__ = [
    "NiftiImage",
    "load_nifti",
    "save_nifti",
    "reorient_to_ras",
    "CombinedDataset",
    "Subset",
    "ConcatDataset",
    "preprocess_ct",
    "preprocess_mri",
    "AMOS_MAPPING",
    "CHAOS_RANGES",
    "DataLoader",
]
