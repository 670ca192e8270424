"""ctypes binding for the native DICOM parser (native/dicom_parser.cc).

Series loading is host-side work on the training critical path when
feeding from DICOM folders; the C++ parser walks the tag stream ~20×
faster than the python reader. Built lazily with `make -C native` on first
use and cached; every entry point falls back to the pure-python parser
when the toolchain or library is unavailable, so deployments without a
compiler keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libdicom_parser.so"
_lib = None
_lib_failed = False


class _DicomInfo(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int32),
        ("cols", ctypes.c_int32),
        ("echo_num", ctypes.c_int32),
        ("echo_train", ctypes.c_int32),
        ("slice_pos", ctypes.c_double),
        ("rescale_i", ctypes.c_double),
        ("rescale_s", ctypes.c_double),
        ("component", ctypes.c_char),
        ("pixels", ctypes.POINTER(ctypes.c_uint16)),
        ("n_pixels", ctypes.c_int64),
    ]


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dicom_parse.restype = ctypes.c_void_p
        lib.dicom_parse.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(_DicomInfo)]
        lib.dicom_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def parse_dicom_native(path: str):
    """Parse one file → (meta dict, pixel uint16 array) or None on
    failure."""
    lib = _load_lib()
    if lib is None:
        return None
    info = _DicomInfo()
    handle = lib.dicom_parse(str(path).encode(), ctypes.byref(info))
    if not handle:
        return None
    try:
        n = int(info.n_pixels)
        px = np.ctypeslib.as_array(info.pixels, shape=(n,)).copy() \
            if n else np.zeros((0,), np.uint16)
        meta = {
            "rows": int(info.rows),
            "cols": int(info.cols),
            "echo_num": int(info.echo_num),
            "echo_train": int(info.echo_train),
            "slice_pos": float(info.slice_pos),
            "rescale_i": float(info.rescale_i),
            "rescale_s": float(info.rescale_s),
            "component": info.component.decode(),
        }
    finally:
        lib.dicom_free(handle)
    return meta, px


def load_dicom_series_native(folder_path: str) -> np.ndarray | None:
    """Native-backed version of data.dicom.load_dicom_series: same output
    (n_slices, ne, H, W, 2); returns None when the library is unavailable
    (callers fall back to the python parser)."""
    if not native_available():
        return None
    files = sorted(os.path.join(folder_path, f)
                   for f in os.listdir(folder_path) if f.endswith(".dcm"))
    sl_mag: dict = {}
    sl_pha: dict = {}
    echo_all = 1
    shape = None
    for f in files:
        parsed = parse_dicom_native(f)
        if parsed is None:
            return None
        meta, px = parsed
        if meta["rows"] * meta["cols"] != px.size:
            continue
        img = px.reshape(meta["cols"], meta["rows"]).astype(np.float32)
        shape = img.shape
        echo_all = meta["echo_train"] or echo_all
        sl_pos = round(meta["slice_pos"], 1)
        resc = (img - meta["rescale_i"]) / meta["rescale_s"]
        target = sl_pha if meta["component"] == "P" else sl_mag
        target.setdefault(sl_pos, {})[meta["echo_num"]] = resc

    complete = [sl for sl in sl_mag if len(sl_mag[sl]) == echo_all]
    x = np.zeros((len(complete), echo_all) + shape, np.complex64)
    for i, sl in enumerate(complete):
        for j, ech in enumerate(sorted(sl_mag[sl])):
            val = sl_mag[sl][ech].astype(np.complex64)
            if sl in sl_pha and ech in sl_pha[sl]:
                val = val * np.exp(1j * sl_pha[sl][ech])
            x[i, j] = val
    denom = np.abs(x).max()
    if denom > 0:
        x = x / denom
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
