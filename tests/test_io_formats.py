"""DICOM / NIfTI pure-python codec tests (roundtrip + series loaders)."""

import json
import os

import numpy as np

from ideal_gan_tpu.data import dicom as dcm
from ideal_gan_tpu.data import nifti as nif


class TestDicom:
    def test_write_read_roundtrip(self, tmp_path):
        ds = dcm.gen_ds(3, r2s=False)
        img = np.random.default_rng(0).uniform(0, 1, (16, 16)).astype(
            np.float32)
        dcm.write_dicom(ds, img, str(tmp_path), "PDFF", level=2, slices=5)
        files = os.listdir(tmp_path)
        assert files == ["PDFF_s02.dcm"]
        tags = dcm.read_dicom(str(tmp_path / files[0]))
        arr = dcm.pixel_array(tags)
        np.testing.assert_array_equal(arr, (img * 255).astype(np.uint16))
        assert tags[(0x0008, 0x0060)] == "MR"
        assert float(tags[(0x0028, 0x1053)]) == 0.4
        assert int(float(tags[(0x0020, 0x0013)])) == 2

    def test_r2s_rescale_slope(self, tmp_path):
        ds = dcm.gen_ds(1, r2s=True)
        dcm.write_dicom(ds, np.zeros((8, 8)), str(tmp_path), "R2s", 0, 1)
        tags = dcm.read_dicom(str(tmp_path / "R2s_s00.dcm"))
        assert float(tags[(0x0028, 0x1053)]) == 0.78

    def test_series_loader_combines_mag_phase(self, tmp_path):
        rng = np.random.default_rng(1)
        ne, h, w = 2, 8, 8
        mags = rng.uniform(100, 1000, (ne, h, w))
        phas = rng.uniform(0, 3000, (ne, h, w))
        for sl, zpos in enumerate(["0\\0\\1.0", "0\\0\\2.0"]):
            for ech in range(ne):
                for comp, arr in (("M", mags[ech]), ("P", phas[ech])):
                    ds = dcm.gen_ds(0)
                    ds[(0x2005, 0x1011)] = ("LO", comp)
                    ds.EchoNumbers = ech + 1
                    ds.EchoTrainLength = ne
                    ds.ImagePositionPatient = zpos
                    ds[(0x2005, 0x100D)] = ("DS", "0.0")
                    ds[(0x2005, 0x100E)] = ("DS", "1.0")
                    ds.Columns = w
                    ds.Rows = h
                    ds.PixelData = arr.astype(np.uint16).tobytes()
                    ds.save_as(tmp_path / f"s{sl}_e{ech}_{comp}.dcm")
        x = dcm.load_dicom_series(str(tmp_path))
        assert x.shape == (2, ne, h, w, 2)
        mag_got = np.hypot(x[..., 0], x[..., 1])
        assert np.isclose(mag_got.max(), 1.0, atol=1e-5)  # normalized


class TestNifti:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.normal(size=(6, 5, 4)).astype(np.float32)
        path = str(tmp_path / "vol.nii.gz")
        nif.write_nifti(path, vol)
        back = nif.read_nifti(path)
        np.testing.assert_allclose(back, vol, rtol=1e-6)

    def test_series_loader(self, tmp_path):
        rng = np.random.default_rng(2)
        ne, x, y, z = 4, 8, 8, 3
        base = str(tmp_path / "scan")
        for ech in range(ne):
            mag = rng.uniform(0.5, 1.0, (x, y, z)).astype(np.float32)
            pha = rng.uniform(-1, 1, (x, y, z)).astype(np.float32)
            nif.write_nifti(f"{base}_e{ech + 1}.nii.gz", mag)
            nif.write_nifti(f"{base}_e{ech + 1}_ph.nii.gz", pha)
            with open(f"{base}_e{ech + 1}.json", "w") as f:
                json.dump({"EchoTrainLength": ne,
                           "EchoTime": 1.3 + 2.1 * ech}, f)
        with open(f"{base}_e1.json", "w") as f:
            json.dump({"EchoTrainLength": ne, "EchoTime": 1.3}, f)
        v = nif.load_nifti_series(str(tmp_path))
        # half_echoes quirk: every 2nd echo of ne=4 → 2
        assert v.shape == (z, ne // 2, y, x, 2)
        v_full = nif.load_nifti_series(str(tmp_path), half_echoes=False)
        assert v_full.shape == (z, ne, y, x, 2)
        assert np.isfinite(v_full).all()


class TestNativeDicom:
    def test_native_parser_matches_python(self, tmp_path):
        from ideal_gan_tpu.data.dicom_native import (native_available,
                                                     parse_dicom_native)
        if not native_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        ds = dcm.gen_ds(1)
        ds.EchoNumbers = 3
        ds.EchoTrainLength = 6
        ds.ImagePositionPatient = "0\\0\\2.5"
        ds[(0x2005, 0x1011)] = ("LO", "P")
        ds[(0x2005, 0x100D)] = ("DS", "10.0")
        ds[(0x2005, 0x100E)] = ("DS", "2.0")
        img = np.arange(64, dtype=np.uint16).reshape(8, 8)
        ds.Columns = 8
        ds.Rows = 8
        ds.PixelData = img.tobytes()
        path = str(tmp_path / "t.dcm")
        ds.save_as(path)
        meta, px = parse_dicom_native(path)
        assert meta["echo_num"] == 3 and meta["echo_train"] == 6
        assert meta["component"] == "P"
        assert meta["slice_pos"] == 2.5
        assert meta["rescale_i"] == 10.0 and meta["rescale_s"] == 2.0
        np.testing.assert_array_equal(px.reshape(8, 8), img)

    def test_native_series_matches_python_loader(self, tmp_path):
        from ideal_gan_tpu.data.dicom_native import (
            load_dicom_series_native, native_available)
        if not native_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(3)
        ne = 2
        for sl, zpos in enumerate(["0\\0\\1.0", "0\\0\\2.0"]):
            for ech in range(ne):
                ds = dcm.gen_ds(0)
                ds.EchoNumbers = ech + 1
                ds.EchoTrainLength = ne
                ds.ImagePositionPatient = zpos
                ds[(0x2005, 0x100D)] = ("DS", "0.0")
                ds[(0x2005, 0x100E)] = ("DS", "1.0")
                ds.Columns = 8
                ds.Rows = 8
                ds.PixelData = rng.integers(
                    0, 1000, (8, 8)).astype(np.uint16).tobytes()
                ds.save_as(tmp_path / f"s{sl}_e{ech}.dcm")
        nat = load_dicom_series_native(str(tmp_path))
        py = dcm.load_dicom_series(str(tmp_path), backend="python")
        np.testing.assert_allclose(nat, py, rtol=1e-6, atol=1e-7)
