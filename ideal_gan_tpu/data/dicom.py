"""Minimal pure-python DICOM reader/writer (pydicom is not available in
the TPU image).

Writer: Explicit-VR little-endian MR image files carrying exactly the tag
set the reference's synthetic-dataset writer emits (data.py:353-414
`gen_ds`/`write_dicom`): patient/series identity, 16-bit monochrome pixel
data, RescaleSlope 0.4 (PDFF) / 0.78 (R2*), instance numbering.

Reader: parses explicit- and implicit-VR little-endian files enough to
reconstruct the reference's Philips multi-echo CSE loader semantics
(data.py:417-480 `load_dicom_series`): magnitude/phase components via the
private (0x2005,0x1011) tag, echo number (0x0018,0x0086), echo train
length (0x0018,0x0091), slice position (0x0020,0x0032), private rescale
(0x2005,0x100D/0x100E), combining mag·e^{iφ} per slice/echo.
"""

from __future__ import annotations

import os
import struct
import time
from pathlib import Path

import numpy as np

_MAGIC_OFFSET = 132
_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}
MR_SOP_CLASS = "1.2.840.10008.5.1.4.1.1.4"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
_UID_ROOT = "1.2.826.0.1.3680043.8.498"  # generic test root


def generate_uid(entropy: int | None = None) -> str:
    entropy = entropy if entropy is not None else time.time_ns()
    return f"{_UID_ROOT}.{entropy % 10 ** 30}"


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def _elem(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr not in (b"UI", b"SH", b"LO", b"PN", b"CS",
                                       b"DS", b"IS") else b" "
    head = struct.pack("<HH", group, elem)
    if vr in _EXPLICIT_LONG_VRS:
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def _str_elem(group, elem, vr, s):
    return _elem(group, elem, vr, str(s).encode("ascii"))


class DicomDataset(dict):
    """Tag→(vr, value) mapping with the attribute API the reference's
    writer uses (ds.PatientName = ..., ds.save_as(path))."""

    _ATTRS = {
        "SOPClassUID": (0x0008, 0x0016, "UI"),
        "SOPInstanceUID": (0x0008, 0x0018, "UI"),
        "Modality": (0x0008, 0x0060, "CS"),
        "PatientName": (0x0010, 0x0010, "PN"),
        "PatientID": (0x0010, 0x0020, "LO"),
        "StudyInstanceUID": (0x0020, 0x000D, "UI"),
        "SeriesInstanceUID": (0x0020, 0x000E, "UI"),
        "FrameOfReferenceUID": (0x0020, 0x0052, "UI"),
        "InstanceNumber": (0x0020, 0x0013, "IS"),
        "ImagePositionPatient": (0x0020, 0x0032, "DS"),
        "ImageOrientationPatient": (0x0020, 0x0037, "DS"),
        "ImageType": (0x0008, 0x0008, "CS"),
        "ImagesInAcquisition": (0x0020, 0x1002, "IS"),
        "EchoNumbers": (0x0018, 0x0086, "IS"),
        "EchoTrainLength": (0x0018, 0x0091, "IS"),
        "EchoTime": (0x0018, 0x0081, "DS"),
        "SamplesPerPixel": (0x0028, 0x0002, "US"),
        "PhotometricInterpretation": (0x0028, 0x0004, "CS"),
        "Rows": (0x0028, 0x0010, "US"),
        "Columns": (0x0028, 0x0011, "US"),
        "PixelSpacing": (0x0028, 0x0030, "DS"),
        "BitsAllocated": (0x0028, 0x0100, "US"),
        "BitsStored": (0x0028, 0x0101, "US"),
        "HighBit": (0x0028, 0x0102, "US"),
        "PixelRepresentation": (0x0028, 0x0103, "US"),
        "RescaleIntercept": (0x0028, 0x1052, "DS"),
        "RescaleSlope": (0x0028, 0x1053, "DS"),
    }

    def __init__(self):
        super().__init__()
        self.PixelData: bytes = b""

    def __setattr__(self, name, value):
        if name in self._ATTRS:
            g, e, vr = self._ATTRS[name]
            self[(g, e)] = (vr, value)
        else:
            super().__setattr__(name, value)

    def __getattr__(self, name):
        if name in self._ATTRS:
            g, e, vr = self._ATTRS[name]
            try:
                return self[(g, e)][1]
            except KeyError as exc:
                raise AttributeError(name) from exc
        raise AttributeError(name)

    def save_as(self, path, write_like_original: bool = True) -> None:
        del write_like_original
        body = b""
        for (g, e) in sorted(self.keys()):
            vr, value = self[(g, e)]
            if vr == "US":
                raw = struct.pack("<H", int(value))
            else:
                raw = str(value).encode("ascii")
            body += _elem(g, e, vr.encode(), raw)
        body += _elem(0x7FE0, 0x0010, b"OW", self.PixelData)

        sop_uid = self.get((0x0008, 0x0018), ("UI", generate_uid()))[1]
        meta = b""
        meta += _elem(0x0002, 0x0001, b"OB", b"\x00\x01")
        meta += _str_elem(0x0002, 0x0002, b"UI", MR_SOP_CLASS)
        meta += _str_elem(0x0002, 0x0003, b"UI", sop_uid)
        meta += _str_elem(0x0002, 0x0010, b"UI", EXPLICIT_VR_LE)
        group_len = _elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta)))
        with open(path, "wb") as f:
            f.write(b"\x00" * 128 + b"DICM")
            f.write(group_len + meta)
            f.write(body)


def gen_ds(idx: int, method_prefix: str = "m000",
           r2s: bool = False) -> DicomDataset:
    """Synthetic MR DICOM skeleton (reference gen_ds, data.py:353-394)."""
    ds = DicomDataset()
    ds.SOPClassUID = MR_SOP_CLASS
    ds.SOPInstanceUID = generate_uid()
    ds.PatientName = f"Volunteer^{str(idx).zfill(3)}^-{method_prefix}"
    ds.PatientID = str(idx).zfill(6)
    ds.Modality = "MR"
    ds.SeriesInstanceUID = generate_uid()
    ds.StudyInstanceUID = generate_uid()
    ds.FrameOfReferenceUID = generate_uid()
    ds.BitsStored = 16
    ds.BitsAllocated = 16
    ds.SamplesPerPixel = 1
    ds.HighBit = 15
    ds.ImagePositionPatient = r"0\0\1"
    ds.ImageOrientationPatient = r"1\0\0\0\-1\0"
    ds.ImageType = r"ORIGINAL\PRIMARY\AXIAL"
    ds.RescaleIntercept = "0"
    ds.RescaleSlope = "0.78" if r2s else "0.4"
    ds.PixelSpacing = r"1\1"
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelRepresentation = 1
    return ds


def write_map_series(vdir, vol_idx: int, pdff_slice, r2s_slice,
                     method_prefix: str = "m000") -> None:
    """PDFF + R2s single-slice series for one volume under
    <vdir>/{PDFF,R2s}/ — the per-volunteer export convention shared by
    cli.gen_ldm_dataset (reference gen_LDM_dataset.py volume export) and
    cli.infer, kept in one place so the rescale/clipping conventions
    cannot diverge."""
    vdir = Path(vdir)
    write_dicom(gen_ds(vol_idx, method_prefix),
                np.clip(pdff_slice, 0, 1), str(vdir / "PDFF"),
                "PDFF", level=0, slices=1)
    write_dicom(gen_ds(vol_idx, method_prefix, r2s=True),
                np.clip(r2s_slice, 0, 1), str(vdir / "R2s"),
                "R2s", level=0, slices=1)


def write_dicom(ds: DicomDataset, pixel_array, path, filename, level,
                slices) -> None:
    """Per-slice writer (reference write_dicom, data.py:397-414): values
    ×255 as uint16."""
    image2d = (np.squeeze(np.asarray(pixel_array)) * 255).astype(np.uint16)
    suffix = "_s" + str(level).zfill(2) + ".dcm"
    ds.ImagesInAcquisition = str(slices)
    ds.InstanceNumber = level
    ds.Columns = image2d.shape[0]
    ds.Rows = image2d.shape[1]
    ds.PixelData = image2d.tobytes()
    Path(path).mkdir(parents=True, exist_ok=True)
    ds.save_as(os.path.join(path, filename + suffix))


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def read_dicom(path: str) -> dict:
    """Parse a little-endian DICOM file into {(group, elem): value}, with
    pixel data under (0x7FE0, 0x0010) as raw bytes and text values
    decoded."""
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    if data[_MAGIC_OFFSET - 4:_MAGIC_OFFSET] == b"DICM":
        pos = _MAGIC_OFFSET
    explicit = True
    out: dict = {}
    n = len(data)
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", data, pos)
        pos += 4
        if explicit and group != 0xFFFE:
            vr = data[pos:pos + 2]
            if vr.isalpha() and vr.isupper():
                if vr in _EXPLICIT_LONG_VRS:
                    length = struct.unpack_from("<I", data, pos + 4)[0]
                    pos += 8
                else:
                    length = struct.unpack_from("<H", data, pos + 2)[0]
                    pos += 4
            else:
                vr = b"UN"
                length = struct.unpack_from("<I", data, pos)[0]
                pos += 4
        else:
            vr = b"UN"
            length = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:
            break  # sequences with undefined length: out of scope
        value = data[pos:pos + length]
        pos += length
        if (group, elem) == (0x7FE0, 0x0010):
            out[(group, elem)] = value
        elif vr == b"US" or (vr == b"UN" and length == 2
                             and group == 0x0028):
            out[(group, elem)] = struct.unpack("<H", value[:2])[0]
        else:
            try:
                out[(group, elem)] = value.decode("ascii").strip("\x00 ")
            except UnicodeDecodeError:
                out[(group, elem)] = value
    return out


def pixel_array(tags: dict) -> np.ndarray:
    rows = int(tags.get((0x0028, 0x0010), 0))
    cols = int(tags.get((0x0028, 0x0011), 0))
    raw = tags[(0x7FE0, 0x0010)]
    return np.frombuffer(raw, dtype=np.uint16,
                         count=rows * cols).reshape(cols, rows)


def load_dicom_series(folder_path: str,
                      backend: str = "auto") -> np.ndarray:
    """Philips multi-echo CSE series loader (reference load_dicom_series,
    data.py:417-480): group files by slice position and echo number,
    rescale by the private (0x2005,0x100D/E) intercept/slope, combine
    magnitude·e^{i·phase}, normalize globally, return
    (n_slices, ne, H, W, 2).

    backend='auto' uses the native C++ parser when built (falling back to
    this python walk); 'python' forces the pure-python path."""
    if backend == "auto":
        from .dicom_native import load_dicom_series_native
        out = load_dicom_series_native(folder_path)
        if out is not None:
            return out
    files = sorted(os.path.join(folder_path, f)
                   for f in os.listdir(folder_path) if f.endswith(".dcm"))
    sl_mag: dict = {}
    sl_pha: dict = {}
    echo_all = 1
    shape = None
    for f in files:
        tags = read_dicom(f)
        img = pixel_array(tags).astype(np.float32)
        shape = img.shape
        comp = str(tags.get((0x2005, 0x1011), "M"))
        echo_num = int(float(tags.get((0x0018, 0x0086), 1)))
        echo_all = int(float(tags.get((0x0018, 0x0091), echo_all)))
        pos = str(tags.get((0x0020, 0x0032), "0\\0\\0"))
        sl_pos = round(float(pos.split("\\")[-1]), 1)
        intercept = float(tags.get((0x2005, 0x100D), 1.0) or 1.0)
        slope = float(tags.get((0x2005, 0x100E), 1.0) or 1.0)
        resc = (img - intercept) / slope
        target = sl_pha if comp == "P" else sl_mag
        target.setdefault(sl_pos, {})[echo_num] = resc

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
