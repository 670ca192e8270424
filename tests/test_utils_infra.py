"""Infra tests: config overlay/backfill, serialization, checkpointing,
summaries, sample grids."""

import os

import numpy as np
import pytest

from ideal_gan_tpu.utils import (Checkpoint, Config, load_json, load_pickle,
                                 load_yaml, parse_flags, run_parallels,
                                 save_json, save_pickle, save_yaml)


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config(a=1, b="x", c=[1, 2], d=True)
        cfg.save(tmp_path / "settings.yml")
        back = Config.load(tmp_path / "settings.yml")
        assert back == cfg
        assert back.a == 1 and back.d is True

    @pytest.mark.smoke
    def test_overlay_and_backfill(self):
        train_cfg = Config(lr=1e-3, epochs=100)
        new_flags = {"epochs": 10, "n_samples": 5}
        merged = train_cfg.overlay(new_flags)
        assert merged.epochs == 10 and merged.lr == 1e-3
        filled = merged.backfill({"legacy_key": 7, "lr": 999})
        assert filled.legacy_key == 7 and filled.lr == 1e-3

    def test_parse_flags_types(self):
        cfg = parse_flags({"n": 3, "f": 0.5, "s": "x", "b": False,
                           "lst": [1, 2]},
                          ["--n", "7", "--b", "true", "--lst", "[3,4]"])
        assert cfg.n == 7 and cfg.b is True and cfg.lst == [3, 4]
        assert cfg.f == 0.5


class TestSerialization:
    def test_json_yaml_pickle(self, tmp_path):
        obj = {"a": 1, "b": [1, 2]}
        p1 = save_json(tmp_path / "o", obj)
        assert p1.endswith(".json") and load_json(p1) == obj
        p2 = save_yaml(tmp_path / "o", obj)
        assert p2.endswith(".yml") and load_yaml(p2) == obj
        p3 = save_pickle(tmp_path / "o", obj)
        assert p3.endswith(".pkl") and load_pickle(p3) == obj

    def test_run_parallels(self):
        out = run_parallels(lambda x: x * 2, range(8))
        assert out == [0, 2, 4, 6, 8, 10, 12, 14]


class TestCheckpoint:
    def test_save_restore_latest(self, tmp_path):
        ckpt = Checkpoint(tmp_path / "ck", max_to_keep=2)
        state = {"w": np.arange(4.0), "step": 0}
        ckpt.save(1, state)
        state2 = {"w": np.arange(4.0) + 1, "step": 1}
        ckpt.save(2, state2)
        assert ckpt.latest_step() == 2
        restored = ckpt.restore({"w": np.zeros(4), "step": 0})
        np.testing.assert_allclose(restored["w"], state2["w"])
        ckpt.close()

    def test_async_save_overlap_then_drain(self, tmp_path):
        # async checkpointing: back-to-back saves without waiting must
        # serialize correctly; close()/restore() drain the in-flight write
        from ideal_gan_tpu.utils.checkpoint import Checkpoint
        ckpt = Checkpoint(tmp_path / "ck2")
        for step in range(1, 4):
            ckpt.save(step, {"w": np.full(8, float(step)), "step": step})
        restored = ckpt.restore({"w": np.zeros(8), "step": 0})
        np.testing.assert_allclose(restored["w"], 3.0)
        assert ckpt.latest_step() == 3
        ckpt.close()

    def test_try_restore_empty(self, tmp_path):
        ckpt = Checkpoint(tmp_path / "ck2")
        template = {"x": np.ones(2)}
        out = ckpt.try_restore(template)
        np.testing.assert_allclose(out["x"], 1.0)
        ckpt.close()

    def test_max_to_keep(self, tmp_path):
        ckpt = Checkpoint(tmp_path / "ck3", max_to_keep=2)
        for i in range(1, 5):
            ckpt.save(i, {"v": np.full((1,), i, np.float32)})
        # only the last 2 remain
        assert ckpt.latest_step() == 4
        with pytest.raises(Exception):
            ckpt.restore({"v": np.zeros((1,), np.float32)}, step=1)
        ckpt.close()


class TestSamples:
    def test_sample_grid_png(self, tmp_path):
        from ideal_gan_tpu.eval import save_sample_grid
        rng = np.random.default_rng(0)
        acqs = rng.normal(size=(1, 6, 16, 16, 2)).astype(np.float32)
        maps = rng.normal(size=(1, 3, 16, 16, 2)).astype(np.float32)
        path = str(tmp_path / "iter-000.png")
        save_sample_grid(path, acqs, maps, maps)
        assert os.path.exists(path) and os.path.getsize(path) > 1000
