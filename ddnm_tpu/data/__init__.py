"""Data: transforms, datasets, metrics, image IO."""

from ddnm_tpu.data.transforms import data_transform, inverse_data_transform
from ddnm_tpu.data.metrics import psnr
from ddnm_tpu.data.io import load_image, save_image, load_mask
from ddnm_tpu.data.datasets import FolderDataset, ImageNetManifestDataset, get_dataset

__all__ = [
    "data_transform",
    "inverse_data_transform",
    "psnr",
    "load_image",
    "save_image",
    "load_mask",
    "FolderDataset",
    "ImageNetManifestDataset",
    "get_dataset",
]
