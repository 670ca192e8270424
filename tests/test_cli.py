"""End-to-end CLI smoke tests (tiny synthetic runs, CPU mesh)."""

import os

import numpy as np
import pytest

# Full end-to-end CLI chains compile many graphs on the CPU mesh
# (minutes each); keep them out of the fast loop with -m 'not slow'.
pytestmark = pytest.mark.slow


def run_cli(mod, args):
    return mod.main(args)


class TestCLIs:
    def test_train_sup(self, tmp_path):
        from ideal_gan_tpu.cli import train_sup
        run_cli(train_sup, [
            "--dataset", "t-sup", "--synthetic", "16", "--data_size", "32",
            "--n_G_filters", "4", "--batch_size", "8", "--epochs", "1",
            "--epoch_ckpt", "1", "--output_base", str(tmp_path)])
        assert (tmp_path / "t-sup" / "settings.yml").exists()
        assert (tmp_path / "t-sup" / "checkpoints").exists()

    def test_train_unsup(self, tmp_path):
        from ideal_gan_tpu.cli import train_unsup
        run_cli(train_unsup, [
            "--dataset", "t-unsup", "--synthetic", "16", "--data_size", "32",
            "--n_G_filters", "4", "--batch_size", "8", "--epochs", "1",
            "--epoch_ckpt", "1", "--output_base", str(tmp_path)])
        assert (tmp_path / "t-unsup" / "checkpoints").exists()

    def test_train_teaug(self, tmp_path):
        from ideal_gan_tpu.cli import train_teaug
        run_cli(train_teaug, [
            "--dataset", "t-teaug", "--synthetic", "16", "--data_size", "32",
            "--n_G_filters", "4", "--batch_size", "8", "--epochs", "1",
            "--epoch_ckpt", "1", "--output_base", str(tmp_path)])
        assert (tmp_path / "t-teaug" / "checkpoints").exists()

    def test_train_mag(self, tmp_path):
        from ideal_gan_tpu.cli import train_mag
        run_cli(train_mag, [
            "--dataset", "t-mag", "--synthetic", "16", "--data_size", "32",
            "--n_G_filters", "4", "--batch_size", "8", "--epochs", "1",
            "--epoch_ckpt", "1", "--output_base", str(tmp_path)])
        assert (tmp_path / "t-mag" / "checkpoints").exists()

    def test_train_gan_then_ldm_then_gen_then_metrics(self, tmp_path):
        from ideal_gan_tpu.cli import (gen_ldm_dataset, test_genmetrics,
                                       train_gan, train_ldm)
        exp = str(tmp_path / "t-gan")
        run_cli(train_gan, [
            "--dataset", "t-gan", "--synthetic", "8", "--data_size", "32",
            "--n_G_filters", "12", "--n_downsamplings", "2",
            "--n_res_blocks", "1", "--encoded_size", "12",
            "--batch_size", "4", "--epochs", "1", "--epoch_ckpt", "1",
            "--A_loss", "pix-wise", "--output_base", str(tmp_path)])
        assert (tmp_path / "t-gan" / "checkpoints").exists()

        run_cli(train_ldm, [
            "--dataset", "t-gan", "--experiment_dir", exp,
            "--synthetic", "8", "--n_timesteps", "8",
            "--n_ldm_filters", "8", "--dim_mults", "[1,2]",
            "--batch_size", "4", "--epochs", "1", "--epoch_ckpt", "1",
            "--output_base", str(tmp_path)])
        assert (tmp_path / "t-gan" / "checkpoints_ldm").exists()

        run_cli(gen_ldm_dataset, [
            "--dataset", "t-gen", "--experiment_dir", exp,
            "--n_samples", "4", "--sample_batch", "4",
            "--n_timesteps", "8", "--infer_steps", "4", "--method", "ddim",
            "--n_ldm_filters", "8", "--dim_mults", "[1,2]",
            "--output_base", str(tmp_path)])
        gen_dir = tmp_path / "t-gen" / "generated"
        shards = list(gen_dir.glob("*.npz"))
        assert shards
        data = np.load(shards[0])
        assert data["acqs"].shape[1:] == (6, 32, 32, 2)
        assert data["out_maps"].shape[1:] == (3, 32, 32, 2)

        res = run_cli(test_genmetrics, [
            "--dataset", "t-metrics", "--experiment_dir", exp,
            "--synthetic", "8", "--n_samples", "4", "--sample_batch", "4",
            "--output_base", str(tmp_path)])
        assert np.isfinite(res["FID"])
        assert np.isfinite(res["MMD"])
        # provenance flag must be in the OUTPUT, not just a log line —
        # random-feature FID is never literature-comparable
        assert res["features"] in ("imagenet", "random-init")

    def test_roi_realphantom(self, tmp_path):
        from ideal_gan_tpu.cli import roi_realphantom
        from ideal_gan_tpu.eval.export import save_crops
        # synthetic "phantom" with known crops
        crops_path = str(tmp_path / "crops.npy")
        frms = [0] * 11
        crops = [(2 + 2 * i, 4) for i in range(11)]
        save_crops(crops_path, frms, crops, [])
        run_cli(roi_realphantom, [
            "--dataset", "t-phantom", "--synthetic", "4",
            "--data_size", "64", "--crops_file", crops_path,
            "--output_base", str(tmp_path)])
        assert (tmp_path / "t-phantom" / "ROI_phantom.xlsx").exists()

    @pytest.mark.parametrize("model_sel", ["AI-DEAL", "VET-Net", "Mag",
                                           "U-Net", "2D-Net"])
    def test_roi_realphantom_model_zoo(self, tmp_path, model_sel):
        """Model-zoo dispatch on the phantom (reference
        ROI-realPhantom.py:100-250): trained checkpoints (here: fresh
        inits, no checkpoint dir) must be evaluable end-to-end to the
        per-vial xlsx."""
        from ideal_gan_tpu.cli import roi_realphantom
        from ideal_gan_tpu.eval.export import save_crops
        crops_path = str(tmp_path / "crops.npy")
        save_crops(crops_path, [0, 1], [(4, 4), (10, 10)], [])
        run_cli(roi_realphantom, [
            "--dataset", f"t-ph-{model_sel}", "--synthetic", "2",
            "--model_sel", model_sel, "--data_size", "32",
            "--crops_file", crops_path,
            "--experiment_dir", str(tmp_path / "no-such-exp"),
            "--output_base", str(tmp_path)])
        assert (tmp_path / f"t-ph-{model_sel}"
                / "ROI_phantom.xlsx").exists()

    def test_dl_gen_chain(self, tmp_path):
        """gen_ldm_dataset shards feed train_sup --DL_gen."""
        import numpy as np
        from ideal_gan_tpu.cli import train_sup
        from ideal_gan_tpu.data.records import write_shard
        rng = np.random.default_rng(0)
        # mag/phase-layout generated maps + synthesized acqs
        from ideal_gan_tpu import physics as ph
        import jax.numpy as jnp
        ff = rng.uniform(0, 0.6, (16, 32, 32)).astype(np.float32)
        pd = rng.uniform(0.3, 0.9, (16, 32, 32)).astype(np.float32)
        r2s = rng.uniform(0, 0.4, (16, 32, 32)).astype(np.float32)
        pha = rng.uniform(-0.1, 0.1, (16, 32, 32)).astype(np.float32)
        phi = rng.uniform(-0.2, 0.2, (16, 32, 32)).astype(np.float32)
        zeros = np.zeros_like(ff)
        maps_mp = np.stack([
            np.stack([ff, zeros], -1),
            np.stack([pd, r2s], -1),
            np.stack([pha, phi], -1)], 1).astype(np.float32)
        te = ph.te_train(6, bs=16)
        acqs = np.asarray(ph.synthesize_mag(jnp.asarray(maps_mp), te))
        gen_dir = tmp_path / "gen"
        write_shard(str(gen_dir / "LDM_ds_0000"), acqs, maps_mp)
        train_sup.main([
            "--dataset", "t-dlgen", "--DL_gen", "true",
            "--DL_gen_dir", str(gen_dir), "--n_G_filters", "4",
            "--batch_size", "8", "--epochs", "1", "--epoch_ckpt", "1",
            "--output_base", str(tmp_path)])
        assert (tmp_path / "t-dlgen" / "checkpoints").exists()

    def test_crash_resume_fast_forwards(self, tmp_path, capsys):
        # crash-resume (SURVEY §5): a second invocation restores the
        # latest checkpoint and continues from the completed epoch
        # (reference ep_cnt pattern, train-sup.py:456-482)
        from ideal_gan_tpu.cli import train_sup
        common = ["--dataset", "t-resume", "--synthetic", "16",
                  "--data_size", "32", "--n_G_filters", "4",
                  "--batch_size", "8", "--epoch_ckpt", "1",
                  "--output_base", str(tmp_path)]
        train_sup.main(common + ["--epochs", "2"])
        ckdir = tmp_path / "t-resume" / "checkpoints"
        assert ckdir.exists()
        capsys.readouterr()
        train_sup.main(common + ["--epochs", "4"])
        out = capsys.readouterr().out
        assert "resumed from epoch 2" in out
        assert "epoch 3/4" in out and "epoch 4/4" in out
        assert "epoch 1/4" not in out  # completed epochs are skipped
        from ideal_gan_tpu.utils.checkpoint import Checkpoint
        ck = Checkpoint(str(ckdir))
        assert ck.latest_step() == 4
        ck.close()
