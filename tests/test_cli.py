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
                                           "U-Net", "2D-Net", "MDWF"])
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


class TestInfer:
    def test_bulk_serving_e2e(self, tmp_path):
        """cli.infer: cohort in → maps npz + PNG panel out, batched with a
        padded last chunk (6 slices, batch 4). Untrained init (no
        checkpoint dir) must still produce finite maps end-to-end."""
        from ideal_gan_tpu.cli import infer
        maps = run_cli(infer, [
            "--dataset", "t-infer", "--synthetic", "6", "--data_size", "32",
            "--model_sel", "VET-Net", "--infer_batch", "4",
            "--export", "npz,png",
            "--experiment_dir", str(tmp_path / "no-such-exp"),
            "--output_base", str(tmp_path)])
        assert maps.shape[0] == 6 and maps.shape[1] == 3
        assert np.isfinite(maps).all()
        out = tmp_path / "t-infer"
        assert (out / "panels.png").exists()
        z = np.load(out / "maps_pred.npz")
        assert z["maps"].shape == maps.shape
        assert z["pdff"].shape == (6, 32, 32)
        assert float(z["slices_per_s"]) > 0

    def test_batched_sharded_matches_slicewise(self, tmp_path):
        """infer_batch=8 on the 8-device CPU mesh (sharded, padded from 6)
        must equal the reference slice-at-a-time loop exactly."""
        import jax
        from ideal_gan_tpu.cli.common import synthetic_dataset
        from ideal_gan_tpu.cli.roi_analysis import infer_maps
        acqs, _, te = synthetic_dataset(6, h=32, w=32)
        cfg = {"model_sel": "VET-Net", "map": "PDFF", "field": 1.5,
               "rem_R2": False,
               "experiment_dir": str(tmp_path / "no-such-exp")}
        ref, _ = infer_maps({**cfg, "infer_batch": 1}, acqs, te)
        assert jax.device_count() == 8  # conftest virtual mesh
        got, _ = infer_maps({**cfg, "infer_batch": 8}, acqs, te)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    def test_unknown_export_rejected(self, tmp_path):
        # a typo'd --export must fail loudly, not run the whole cohort
        # and exit 0 having written nothing
        from ideal_gan_tpu.cli import infer
        with pytest.raises(SystemExit, match="unknown --export"):
            run_cli(infer, [
                "--dataset", "t-infer-bad", "--synthetic", "2",
                "--data_size", "32", "--export", "npzz",
                "--output_base", str(tmp_path)])

    def test_dicom_export(self, tmp_path):
        from ideal_gan_tpu.cli import infer
        run_cli(infer, [
            "--dataset", "t-infer-dcm", "--synthetic", "2",
            "--data_size", "32", "--model_sel", "VET-Net",
            "--infer_batch", "2", "--export", "dicom",
            "--experiment_dir", str(tmp_path / "no-such-exp"),
            "--output_base", str(tmp_path)])
        vdir = tmp_path / "t-infer-dcm" / "out_dicom" / "Volunteer-000"
        assert (vdir / "PDFF").exists() and (vdir / "R2s").exists()
        # round-trip through the from-scratch DICOM reader
        from ideal_gan_tpu.data.dicom import pixel_array, read_dicom
        tags = read_dicom(str(vdir / "PDFF" / "PDFF_s00.dcm"))
        img = pixel_array(tags)
        assert img.shape == (32, 32)
        assert img.max() <= 255
