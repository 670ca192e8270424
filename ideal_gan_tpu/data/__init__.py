"""Data layer: HDF5/DICOM/NIfTI loaders, layout converters, augmentation."""

from .augment import (
    bipolar_phase_row,
    gaussian_noise,
    random_echo_count,
    random_fm_scale,
    random_geometric,
    random_phase_offset,
)
from .hdf5 import (
    Hdf5Data,
    acqs_mebcrn,
    complex_maps_mebcrn,
    group_tes,
    iterate_hdf5,
    load_hdf5,
    mag_phase_maps,
)
from .layouts import (
    acqs_from_mebcrn,
    acqs_to_mebcrn,
    mag_phase_to_complex_mebcrn,
    maps_from_mebcrn,
    maps_to_mebcrn,
)
from .dicom import (
    DicomDataset,
    gen_ds,
    load_dicom_series,
    read_dicom,
    write_dicom,
)
from .nifti import load_nifti_series, read_nifti, write_nifti
from .pipeline import Dataset, minmax_norm
from .pool import ItemPool
from .records import (
    iter_shards,
    list_shards,
    mix_partial_real,
    read_shards,
    write_shard,
)
from .unwrap import unwrap_phase_2d, unwrap_slices

__all__ = [
    "Hdf5Data", "load_hdf5", "group_tes", "iterate_hdf5",
    "mag_phase_maps", "complex_maps_mebcrn", "acqs_mebcrn",
    "acqs_from_mebcrn", "acqs_to_mebcrn", "maps_from_mebcrn",
    "maps_to_mebcrn", "mag_phase_to_complex_mebcrn", "ItemPool",
    "random_geometric", "random_fm_scale", "bipolar_phase_row",
    "random_echo_count", "random_phase_offset", "gaussian_noise",
    "unwrap_phase_2d", "unwrap_slices",
    "DicomDataset", "gen_ds", "write_dicom", "read_dicom",
    "load_dicom_series", "read_nifti", "write_nifti", "load_nifti_series",
    "write_shard", "read_shards", "list_shards", "iter_shards",
    "mix_partial_real", "Dataset", "minmax_norm",
]
