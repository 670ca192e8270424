"""CLI: AI-DEAL unsupervised training (reference train-IDEAL-unsup.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..data import random_echo_count, random_geometric
from ..parallel import data_mesh_for_batch, shard_batch
from ..train import unsup
from ..train.common import batch_iterator
from ..utils import Checkpoint, DictSummaryWriter
from ..utils.preempt import PreemptionGuard
from .common import load_cohorts, setup_experiment


def _save_sample(cfg, g_fm, state, a, te_b, gt_maps, epoch, key):
    import jax.numpy as jnp

    from .. import physics
    from ..eval import save_sample_grid

    @jax.jit  # eager complex physics ops are unsupported on the TPU backend
    def infer(params_fm, a, te_b):
        out = g_fm.apply({"params": params_fm}, a, rngs={"bayes": key})
        fm = out.loc if hasattr(out, "loc") else out
        pm = jnp.concatenate([fm, jnp.zeros_like(fm)], axis=-1)
        wf = physics.fit_rho(a, pm, te_b, field=cfg["field"])
        return wf, pm

    wf, pm = infer(state.params_fm, jnp.asarray(a), jnp.asarray(te_b))
    maps = np.concatenate([np.asarray(wf), np.asarray(pm)], axis=1)
    save_sample_grid(f"{cfg['output_dir']}/samples_training/"
                     f"iter-{epoch:04d}.png", a, maps, gt_maps)


def _load_series_folders(cfg):
    """Train directly from DICOM/NIfTI folders (reference
    train-IDEAL-unsup.py:124-156): each subject folder contains an MECSE
    DICOM series or a BIDS nifti set; slices are concatenated."""
    import os

    from .. import physics
    from ..data import load_dicom_series, load_nifti_series
    loader = (load_dicom_series if cfg["train_data"] == "DICOM"
              else load_nifti_series)
    folders = sorted(os.path.join(cfg["dataset_dir"], d)
                     for d in os.listdir(cfg["dataset_dir"])
                     if os.path.isdir(os.path.join(cfg["dataset_dir"], d)))
    vols = [loader(f) for f in folders]
    acqs = np.concatenate(vols)
    ne = acqs.shape[1]
    te = np.asarray(physics.te_train(ne, bs=len(acqs)))
    maps = np.zeros((len(acqs), 3) + acqs.shape[2:4] + (2,), np.float32)
    return acqs, maps, te


def main(argv=None):
    cfg = setup_experiment({**unsup.DEFAULTS, "train_data": "HDF5",
                            "k_fold": 0, "k_folds_total": 5}, argv)
    if cfg["train_data"] in ("DICOM", "NIFTI"):
        acqs, maps, te = _load_series_folders(cfg)
    else:
        acqs, maps, te = load_cohorts(cfg)
    # k-fold split over the cohort (reference k_fold over 5 cohorts,
    # train-IDEAL-unsup.py:92-104): fold k held out for validation. With
    # UQ_calib the tail of the training fold becomes the calibration split
    # (reference calib_divs, train-IDEAL-unsup.py:94-99).
    calib_data = None
    if cfg["k_fold"] > 0:
        k = cfg["k_fold"] - 1
        n_folds = cfg["k_folds_total"]
        fold_sz = max(len(acqs) // n_folds, 1)
        val_idx = np.arange(k * fold_sz, min((k + 1) * fold_sz, len(acqs)))
        train_idx = np.setdiff1d(np.arange(len(acqs)), val_idx)
        acqs, maps, te = acqs[train_idx], maps[train_idx], te[train_idx]
    if cfg["UQ_calib"] and not (cfg["UQ"] or cfg["UQ_R2s"]):
        # Without a Bayesian head the propagated variance is identically
        # zero; var_mse floors σ² and the calib-scale gradient through the
        # floor is zero — the stage would burn epochs training nothing
        # (the reference calib run uses UQ=True, train-IDEAL-unsup.py:94).
        raise SystemExit("--UQ_calib requires --UQ (or --UQ_R2s): the "
                         "calibration stage trains a scale on the "
                         "propagated variance, which is zero without a "
                         "Bayesian head")
    if cfg["UQ_calib"]:
        # carve a calibration split, but never starve the training fold
        # (at least one training batch must remain) and keep ≥2 calib
        # slices (the stage holds one fraction out for the NLL report)
        n_cal = min(max(len(acqs) // 5, cfg["batch_size"]),
                    len(acqs) - cfg["batch_size"])
        if n_cal < 2:
            print("UQ_calib: cohort too small for a calibration split "
                  f"({len(acqs)} slices, batch {cfg['batch_size']}) — "
                  "skipping the calibration stage")
            cfg["UQ_calib"] = False
        else:
            calib_data = (acqs[-n_cal:], te[-n_cal:])
            acqs, maps, te = acqs[:-n_cal], maps[:-n_cal], te[:-n_cal]
    n = len(acqs)
    if n < cfg["batch_size"]:
        raise SystemExit(
            f"training fold has {n} slices < batch_size "
            f"{cfg['batch_size']}; reduce --batch_size (batches drop the "
            "remainder, so no step would run)")
    steps_per_epoch = max(n // cfg["batch_size"], 1)
    cfg["total_steps"] = steps_per_epoch * cfg["epochs"]

    g_fm, g_r2 = unsup.build_models(cfg)
    step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
    r2_step_fn = unsup.make_r2_train_step(cfg, g_fm, g_r2, tx)
    key = jax.random.PRNGKey(0)
    state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])

    mesh = data_mesh_for_batch(cfg["batch_size"])
    ckpt = Checkpoint(f"{cfg['output_dir']}/checkpoints")
    writer = DictSummaryWriter(f"{cfg['output_dir']}/summaries/train")
    start = ckpt.latest_step() or 0
    if start:
        state = ckpt.restore(jax.device_get(state), start)

    rng = np.random.default_rng(0)
    gstep = start * steps_per_epoch
    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        for (A, te_b) in batch_iterator((acqs, te), cfg["batch_size"], rng):
            key, k_aug, k_step = jax.random.split(key, 3)
            # host-side geometric aug + random echo truncation
            if rng.random() <= cfg["data_aug_p"]:
                A = np.asarray(random_geometric(k_aug, A))
            if cfg["remove_ech1"]:
                A = A[:, 1:]
                te_b = te_b[:, 1:]
            if cfg["rand_ne"]:
                ne_sel = random_echo_count(rng)
                A = A[:, :ne_sel]
                te_b = te_b[:, :ne_sel]
            batch = shard_batch((A, te_b), mesh)
            state, metrics = step_fn(state, batch, k_step)
            if cfg["out_vars"] == "PM":
                state, r2m = r2_step_fn(state, batch, k_step)
                metrics.update(r2m)
            gstep += 1
            if gstep % 20 == 0:
                writer.write(jax.device_get(metrics), gstep, name="G_losses")
        if ((ep + 1) % cfg["epoch_ckpt"] == 0 or ep + 1 == cfg["epochs"]
                or guard.should_stop):
            ckpt.save(ep + 1, jax.device_get(state))
            if not guard.should_stop:
                # visual-regression sample grid (reference dumps
                # samples_training/iter-*.png every sampling interval);
                # skipped under preemption — a fresh jit compile would eat
                # into the shutdown grace period
                _save_sample(cfg, g_fm, state, acqs[:1], te[:1], maps[:1],
                             ep + 1, key)
        if guard.should_stop:
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
        print(f"epoch {ep + 1}/{cfg['epochs']} cycle_loss="
              f"{float(metrics['A2B2A_cycle_loss']):.6f}")

    # σ-calibration stage (reference UQ_calib run, train-IDEAL-unsup.py:
    # 272,315-317): nets frozen, per-echo calibration scale trained with
    # SGD on the calibration split; held-out NLL reported before/after.
    if cfg["UQ_calib"] and calib_data is not None and \
            not guard.should_stop:
        import jax.numpy as jnp
        cal_acqs, cal_te = calib_data
        calib_step = unsup.make_calib_train_step(cfg, g_fm, g_r2)
        nll_fn = unsup.eval_calibrated_nll(cfg, g_fm, g_r2)
        # hold out a fraction for the NLL report, keep ≥1 fit slice
        n_hold = min(max(len(cal_acqs) // 4, 1), len(cal_acqs) - 1)
        hold = (jnp.asarray(cal_acqs[:n_hold]), jnp.asarray(cal_te[:n_hold]))
        fit_acqs, fit_te = cal_acqs[n_hold:], cal_te[n_hold:]
        # state is committed to the training mesh; calib batches must
        # live on the SAME device set. Use the largest batch that the
        # mesh divides; if even one per-device row is impossible,
        # replicate the batch instead of sharding it.
        n_dev = mesh.devices.size
        cal_bs = min(cfg["batch_size"], len(fit_acqs))
        if cal_bs >= n_dev:
            cal_bs = (cal_bs // n_dev) * n_dev
            place = lambda b: shard_batch(b, mesh)
        else:
            from ..parallel import replicate as _repl
            import jax as _jax
            place = lambda b: _jax.device_put(b, _repl(mesh))
        nll0 = float(nll_fn(state, *hold, key))
        for cep in range(cfg["epochs"]):
            for (A, te_b) in batch_iterator((fit_acqs, fit_te), cal_bs,
                                            rng):
                key, k_step = jax.random.split(key)
                state, cm = calib_step(
                    state, place((A, te_b)), k_step)
        nll1 = float(nll_fn(state, *hold, key))
        print(f"calibration: held-out NLL {nll0:.5f} → {nll1:.5f}, "
              f"calib={np.asarray(state.calib)}")
        ckpt.save(cfg["epochs"] + 1, jax.device_get(state))

    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
