"""Eval suite tests: metrics, ROI pipelines, xlsx export."""

import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu.eval import (
    FIDAccumulator,
    covariance_map,
    echoes_to_vgg_input,
    frechet_distance,
    init_vgg19,
    mmd_linear,
    ms_ssim,
    perceptual_cosine_loss,
    ssim,
)
from ideal_gan_tpu.eval.export import XlsxWriter, load_crops, save_crops
from ideal_gan_tpu.eval import roi as roi_mod

RNG = np.random.default_rng(0)


class TestMetrics:
    def test_fid_zero_for_identical(self):
        feats = RNG.normal(size=(200, 8)).astype(np.float32)
        mu, cov = feats.mean(0), np.cov(feats, rowvar=False)
        d = frechet_distance(mu, cov, mu, cov)
        assert abs(d) < 1e-3

    def test_fid_grows_with_shift(self):
        a = RNG.normal(size=(500, 8))
        b = a + 2.0
        d = frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                             b.mean(0), np.cov(b, rowvar=False))
        np.testing.assert_allclose(d, 8 * 4.0, rtol=0.05)

    @pytest.mark.smoke
    def test_fid_accumulator(self):
        acc = FIDAccumulator()
        a = RNG.normal(size=(300, 4))
        acc.update(a[:150], a[150:] + 1.0)
        assert acc.result() > 0

    def test_mmd_linear(self):
        a = jnp.asarray(RNG.normal(size=(64, 32)).astype(np.float32))
        same = float(mmd_linear(a, a))
        other = float(mmd_linear(a, a + 1.0))
        assert abs(same) < 0.2
        assert other > same

    def test_ssim_identical_is_one(self):
        x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
        s = np.asarray(ssim(x, x))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)
        noisy = x + 0.2 * jnp.asarray(
            RNG.normal(size=x.shape).astype(np.float32))
        s2 = np.asarray(ssim(x, noisy))
        assert np.all(s2 < 0.9)

    @pytest.mark.smoke
    def test_ssim_matches_tf(self):
        tf = pytest.importorskip("tensorflow")
        a = RNG.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
        b = np.clip(a + 0.1 * RNG.normal(size=a.shape), 0, 1).astype(np.float32)
        want = tf.image.ssim(tf.convert_to_tensor(a), tf.convert_to_tensor(b),
                             max_val=1.0).numpy()
        got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_ms_ssim_runs(self):
        x = jnp.asarray(RNG.uniform(0, 1, (1, 192, 192, 1)).astype(np.float32))
        v = np.asarray(ms_ssim(x, x))
        np.testing.assert_allclose(v, 1.0, atol=1e-4)

    def test_vgg_pipeline(self):
        model, variables = init_vgg19()
        x = jnp.asarray(RNG.normal(size=(1, 3, 32, 32, 2)).astype(np.float32))
        inp = echoes_to_vgg_input(x, size=64)
        assert inp.shape == (3, 64, 64, 3)
        feats = model.apply(variables, inp)
        assert len(feats) == 5
        loss_same = float(perceptual_cosine_loss(feats, feats))
        assert abs(loss_same) < 1e-5

    def test_covariance_map(self):
        x = jnp.asarray(RNG.normal(size=(128, 4)).astype(np.float32))
        cov = np.asarray(covariance_map(x))[0]
        np.testing.assert_allclose(cov, np.cov(np.asarray(x), rowvar=False,
                                               bias=True), atol=0.05)


class TestROI:
    def _mk_crops(self, tmp_path, frms, crops_1, crops_2=()):
        path = str(tmp_path / "crops.npy")
        save_crops(path, frms, crops_1, list(crops_2))
        return path

    def test_roi_stats_median_mean(self, tmp_path):
        stack = np.zeros((2, 32, 32), np.float32)
        stack[0, 5:14, 3:12] = 0.4
        stack[1, 10:19, 10:19] = 0.2
        path = self._mk_crops(tmp_path, [0, 1], [(3, 5), (10, 10)],
                              [(3, 5), (10, 10)])
        res = roi_mod.roi_stats(stack, path, stat="median")
        np.testing.assert_allclose(res.values_1, [0.4, 0.2], rtol=1e-6)
        res2 = roi_mod.roi_stats(stack, path, stat="mean")
        np.testing.assert_allclose(res2.values_1, [0.4, 0.2], rtol=1e-6)

    def test_phantom_bias(self, tmp_path):
        gt = roi_mod.PHANTOM_GT_VALS
        h = w = 128
        stack = np.zeros((1, h, w), np.float32)
        crops = []
        frms = []
        for i, g in enumerate(gt):
            x = 2 + 11 * i
            stack[0, 10:19, x:x + 9] = g + 0.01
            crops.append((x, 10))
            frms.append(0)
        path = self._mk_crops(tmp_path, frms, crops)
        per_vial, bias = roi_mod.phantom_bias(stack, path)
        for g in gt:
            np.testing.assert_allclose(bias[g], 0.01, atol=1e-6)

    def test_maps_to_display(self):
        maps = np.zeros((1, 3, 4, 4, 2), np.float32)
        maps[:, 0, ..., 0] = 0.6   # water
        maps[:, 1, ..., 0] = 0.2   # fat
        maps[:, 2, ..., 1] = 0.3   # r2s
        pdff, r2s, w_abs = roi_mod.maps_to_display(maps)
        np.testing.assert_allclose(pdff, 0.25, rtol=1e-6)
        np.testing.assert_allclose(r2s, 0.3, rtol=1e-6)
        np.testing.assert_allclose(w_abs, 0.6, rtol=1e-6)

    def test_bias_histogram(self):
        err, within = roi_mod.bias_histogram([0.1, 0.2, 0.5], [0.1, 0.21, 0.4],
                                             envelope=0.03)
        assert within == pytest.approx(2 / 3)


class TestXlsx:
    def test_workbook_readable_by_pandas(self, tmp_path):
        path = str(tmp_path / "out.xlsx")
        wb = XlsxWriter(path)
        ws = wb.add_worksheet("RHL")
        ws.write_row(0, ["Slice", "Value"])
        ws.write_row(1, [0, 0.25])
        ws.write_row(2, [1, 0.5])
        ws2 = wb.add_worksheet("LHL")
        ws2.write(0, 0, "empty & <escaped>")
        wb.close()
        # zip structure valid
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            assert "xl/workbook.xml" in names
            assert "xl/worksheets/sheet1.xml" in names
        # readable end-to-end if an xlsx engine exists
        try:
            import pandas as pd
            df = pd.read_excel(path, sheet_name="RHL")
        except ImportError:
            return
        except ValueError:
            return  # no engine installed
        assert list(df.columns)[:2] == ["Slice", "Value"]
        assert df["Value"].iloc[0] == 0.25

    def test_export_roi_and_phantom(self, tmp_path):
        res_m = roi_mod.ROIResult([0, 1], [0.3, 0.4], [0.2, 0.1])
        res_r = roi_mod.ROIResult([0, 1], [0.31, 0.38], [0.19, 0.12])
        roi_mod.export_roi_xlsx(str(tmp_path / "roi.xlsx"), res_m, res_r)
        per_vial = {0.0: [0.01], 0.1: [0.12, 0.11]}
        bias = {0.0: 0.01, 0.1: 0.015}
        roi_mod.export_phantom_xlsx(str(tmp_path / "ph.xlsx"), per_vial, bias)
        assert (tmp_path / "roi.xlsx").exists()
        assert (tmp_path / "ph.xlsx").exists()


class TestInception:
    def test_feature_shapes(self):
        from ideal_gan_tpu.eval import (InceptionV3Features,
                                        echoes_to_inception_input,
                                        init_inception_v3)
        model, variables = init_inception_v3()
        x = jnp.asarray(RNG.normal(size=(1, 2, 32, 32, 2)).astype(np.float32))
        inp = echoes_to_inception_input(x, size=139)
        assert inp.shape == (2, 139, 139, 3)
        feats = model.apply(variables, inp)
        assert feats.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(feats)))


class TestXlsxReader:
    def test_roundtrip_read(self, tmp_path):
        from ideal_gan_tpu.eval.export import XlsxWriter, read_xlsx
        path = str(tmp_path / "labels.xlsx")
        wb = XlsxWriter(path)
        ws = wb.add_worksheet("grades")
        ws.write_row(0, ["grade", "patient"])
        ws.write_row(1, [2, "p01"])
        ws.write_row(2, [0, "p02"])
        wb.close()
        sheets = read_xlsx(path)
        assert "grades" in sheets
        rows = sheets["grades"]
        assert rows[0][0] == "grade"
        assert rows[1][0] == 2 and rows[2][0] == 0
