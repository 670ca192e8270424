"""Input pipeline + gradient-check CLI tests."""

import numpy as np

from ideal_gan_tpu.data import Dataset, minmax_norm


class TestPipeline:
    def test_shuffle_map_filter_batch(self):
        xs = np.arange(20, dtype=np.float32)
        ys = np.arange(20, dtype=np.float32) * 10
        ds = (Dataset.from_arrays(xs, ys, seed=1)
              .shuffle()
              .filter(lambda r: r[0] % 2 == 0)
              .map(lambda r: (r[0] * 2, r[1]))
              .batch(4))
        batches = list(ds)
        assert len(batches) == 2  # 10 evens -> 2 full batches of 4
        for bx, by in batches:
            assert bx.shape == (4,)
            np.testing.assert_allclose(bx % 4, 0)  # doubled evens

    def test_repeat_and_prefetch(self):
        xs = np.arange(6, dtype=np.float32)
        ds = Dataset.from_arrays(xs).batch(3).repeat(2).prefetch(2)
        batches = list(ds)
        assert len(batches) == 4

    def test_batch_keep_remainder(self):
        xs = np.arange(5, dtype=np.float32)
        ds = Dataset.from_arrays(xs).batch(2, drop_remainder=False)
        sizes = [len(b) for b in ds]
        assert sizes == [2, 2, 1]

    def test_from_image_files(self, tmp_path):
        # disk-image variant (reference disk_image_batch_dataset)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        paths = []
        for i in range(4):
            img = np.full((8, 8), i / 4.0, np.float32)
            p = tmp_path / f"im{i}.png"
            plt.imsave(p, img, cmap="gray", vmin=0, vmax=1)
            paths.append(str(p))
        ds = Dataset.from_image_files(paths, labels=[0, 1, 2, 3]).batch(2)
        batches = list(ds)
        assert len(batches) == 2
        imgs, labels = batches[0]
        assert imgs.shape[0] == 2 and imgs.dtype == np.float32
        assert list(labels) == [0, 1]

    def test_minmax_norm(self):
        x = np.asarray([2.0, 4.0, 6.0])
        np.testing.assert_allclose(minmax_norm(x), [0, 0.5, 1.0], atol=1e-9)


class TestGradCheckCLI:
    def test_runs_and_reports(self, tmp_path):
        from ideal_gan_tpu.cli import test_gradients
        res = test_gradients.main([
            "--dataset", "t-grad", "--synthetic", "2", "--data_size", "64",
            "--downsample", "2", "--n_G_filters", "4",
            "--output_base", str(tmp_path)])
        assert np.isfinite(res["loss"])
        assert res["max_grad"] > 0
