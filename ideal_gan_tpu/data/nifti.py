"""Minimal NIfTI-1 (.nii / .nii.gz) reader and the BIDS multi-echo series
loader (nibabel is not available in the TPU image).

Reader: NIfTI-1 single-file format, little-endian, common dtypes — enough
for the magnitude/phase echo volumes the reference consumes. Series
loader reproduces data.py:501-586 `load_nifti_series`: `_e{n}` magnitude +
`_e{n}_ph` phase pairs with JSON sidecars (EchoTrainLength, EchoTime),
mean-magnitude mask at 0.05, transpose/flip to (n_slices, ne, H, W, 2),
and the reference's every-2nd-echo subsampling (data.py:586 quirk,
preserved behind `half_echoes=True`).
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np

_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32,
}


def read_nifti(path: str) -> np.ndarray:
    """Read a NIfTI-1 volume (data array only, fortran-ordered dims)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        hdr = f.read(348)
        sizeof_hdr = struct.unpack("<i", hdr[:4])[0]
        if sizeof_hdr != 348:
            raise ValueError(f"not a little-endian NIfTI-1 file: {path}")
        dim = struct.unpack("<8h", hdr[40:56])
        datatype = struct.unpack("<h", hdr[70:72])[0]
        vox_offset = int(struct.unpack("<f", hdr[108:112])[0])
        scl_slope = struct.unpack("<f", hdr[112:116])[0]
        scl_inter = struct.unpack("<f", hdr[116:120])[0]
        ndim = dim[0]
        shape = dim[1:1 + ndim]
        dtype = _NIFTI_DTYPES.get(datatype)
        if dtype is None:
            raise ValueError(f"unsupported NIfTI datatype {datatype}")
        f.seek(vox_offset)
        count = int(np.prod(shape))
        data = np.frombuffer(f.read(count * np.dtype(dtype).itemsize),
                             dtype=dtype, count=count)
    arr = data.reshape(shape[::-1]).T.astype(np.float32)  # fortran order
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        arr = arr * slope + scl_inter
    return arr


def write_nifti(path: str, data: np.ndarray) -> None:
    """Write a float32 NIfTI-1 volume (for tests / export)."""
    data = np.asarray(data, np.float32)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)       # float32
    struct.pack_into("<h", hdr, 72, 32)       # bitpix
    struct.pack_into("<f", hdr, 108, 352.0)   # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)     # scl_slope
    pixdims = [1.0] * 8
    struct.pack_into("<8f", hdr, 76, *pixdims)
    hdr[344:348] = b"n+1\x00"
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(np.asfortranarray(data).T.tobytes())


def load_nifti_series(folder_path: str,
                      half_echoes: bool = True) -> np.ndarray:
    """BIDS-ish multi-echo CSE loader (reference data.py:501-586)."""
    files = sorted(os.path.join(folder_path, f)
                   for f in os.listdir(folder_path) if f.endswith(".nii.gz"))
    avoid = ("imaginary", "real", "Eq")
    files = sorted(f for f in files if not any(a in f for a in avoid))
    first = files[0]
    fn_no_ech = first.split("_e")[0]

    json_file = first.replace(".nii.gz", ".json")
    with open(json_file) as f:
        metadata = json.load(f)
    ne = metadata["EchoTrainLength"]

    data0 = read_nifti(first)
    x, y, z = data0.shape[:3]
    v = np.zeros((x, y, ne, z, 2), np.float32)
    v_mag_all = np.zeros((x, y, ne, z), np.float32)
    v_sc = 1.0

    for ech in range(ne):
        mag_file = f"{fn_no_ech}_e{ech + 1}.nii.gz"
        v_mag = read_nifti(mag_file)
        if ech == 0:
            v_sc = float(np.max(v_mag)) or 1.0
        pha_file = f"{fn_no_ech}_e{ech + 1}_ph.nii.gz"
        v_pha = read_nifti(pha_file)
        v_ech = v_mag * np.exp(1j * v_pha) / v_sc
        v[:, :, ech, :, 0] = v_ech.real
        v[:, :, ech, :, 1] = v_ech.imag
        v_mag_all[:, :, ech, :] = np.abs(v_ech)

    mean_mag = np.mean(v_mag_all, axis=2, keepdims=True)
    mean_mag = np.repeat(mean_mag, ne, axis=2)[..., None]
    mean_mag = np.repeat(mean_mag, 2, axis=-1)
    v = np.where(mean_mag >= 0.05, v, 0.0)

    v = np.transpose(v, (3, 2, 1, 0, 4))  # (n_slices, ne, H, W, 2)
    v = np.flip(v, axis=2)
    if half_echoes:
        # Reference quirk (data.py:586): returns every 2nd echo.
        return v[:, ::2]
    return v
