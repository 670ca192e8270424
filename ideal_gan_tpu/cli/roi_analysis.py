"""CLI: in-vivo ROI bias evaluation (reference ROI-analysis.py), headless.

Runs full-image inference per slice with the selected model family
(reference model zoo dispatch, ROI-analysis.py:183-277), computes
PDFF/R2*/Water maps — or the propagated PDFF variance in PDFF-var mode
(ROI-analysis.py:308-322) — evaluates the committed ROI crops
(ROI_files/*_slices_crops.npy), and exports the RHL/LHL xlsx tables. The
reference's interactive matplotlib picker is available as `--interactive`
(eval.tracker.run_interactive); headless mode requires an existing crops
file.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import physics
from ..eval import roi as roi_mod
from ..utils import Checkpoint
from .common import load_cohorts, load_settings, setup_experiment

DEFAULTS = dict(
    dataset="Unsup-v0", experiment_dir="output/Unsup-v0",
    # U-Net | MDWF | 2D-Net | VET-Net | AI-DEAL | Mag | GraphCuts
    model_sel="AI-DEAL",
    map="PDFF",  # PDFF | R2s | Water | PDFF-var
    n_echoes=6, field=1.5, batch_size=1, crops_file="",
    te1=0.0013, dte=0.0021, out_xlsx="ROI_analysis.xlsx", te_suffix=False,
    interactive=False,
    rem_R2=False,
)


def _restore(cfg, state):
    ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints")
    if ckpt.latest_step():
        state = ckpt.restore(jax.device_get(state))
    return state


def _per_slice(run, acqs, te, batch_size: int = 1):
    """Chunked inference over the cohort.

    batch_size=1 reproduces the reference's slice-at-a-time eval loop
    (ROI-analysis.py per-slice model calls). Larger batches run chunks of
    a fixed static shape (the last chunk is padded by repeating its final
    slice, then trimmed) so jit compiles exactly once; when several
    devices are visible, chunks are laid out batch-sharded over the
    largest 'data' mesh whose size divides batch_size
    (`data_mesh_for_batch`, which warns loudly when devices idle) and
    GSPMD data-parallelizes the jitted model+fit with no code changes —
    the bulk-serving path of cli/infer.py.
    """
    bs = max(int(batch_size), 1)
    sharding = None
    if bs > 1 and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import data_mesh_for_batch
        mesh = data_mesh_for_batch(bs)
        if mesh.shape["data"] > 1:
            sharding = NamedSharding(mesh, P("data"))
    n = len(acqs)
    outs = []
    for i in range(0, n, bs):
        a = np.asarray(acqs[i:i + bs])
        t = np.asarray(te[i:i + bs])
        k = len(a)
        if k < bs:
            a = np.concatenate([a, np.repeat(a[-1:], bs - k, axis=0)])
            t = np.concatenate([t, np.repeat(t[-1:], bs - k, axis=0)])
        aj, tj = jnp.asarray(a), jnp.asarray(t)
        if sharding is not None:
            aj = jax.device_put(aj, sharding)
            tj = jax.device_put(tj, sharding)
        o = run(aj, tj)
        outs.append(jax.tree_util.tree_map(lambda x: np.asarray(x)[:k], o))
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs), *outs)


def make_infer_run(cfg, acqs):
    """Model dispatch → the jitted per-chunk inference closure
    run(a, te_b) -> (maps (nb, 3, H, W, 2), rho_var). Builds the model,
    restores the checkpoint and closes over the params ONCE — callers
    (cli.infer) reuse the closure across chunks so jit traces/compiles a
    single time. `acqs` is used for init shapes only."""
    # ConvLSTM path note (round-5 measurement, docs/DESIGN.md): at the
    # kernel level the fused forward is 1.9–2.3× the XLA recurrence, but
    # the e2e `ideal-infer` pipeline in this environment is
    # host-transfer-bound through the TPU tunnel (±20 % run noise;
    # measured deltas inconclusive except the F=72 low-halo-efficiency
    # case, which HALVED throughput and is now gated off by
    # fused_viable's min_fwd_eff). Inference therefore defaults to the
    # XLA recurrence; on a production host with local PCIe/DMA, set
    # IDEAL_GAN_CONVLSTM_FUSED=1 to engage the fused forward (the
    # module still refuses configs below 0.5 forward halo efficiency).
    sel = cfg["model_sel"]
    try:
        exp_cfg = load_settings(cfg["experiment_dir"])
    except FileNotFoundError:
        exp_cfg = None
    key = jax.random.PRNGKey(0)

    if sel == "AI-DEAL":
        from ..train import unsup
        ucfg = dict(unsup.DEFAULTS)
        if exp_cfg:
            ucfg.update({k: v for k, v in exp_cfg.items() if k in ucfg})
        g_fm, g_r2 = unsup.build_models(ucfg)
        state = _restore(cfg, unsup.init_state(ucfg, g_fm, g_r2,
                                               optax.adam(1e-4), key,
                                               acqs[:1]))

        @jax.jit
        def run(a, te_b):
            out = g_fm.apply({"params": state.params_fm}, a,
                             rngs={"bayes": key})
            if hasattr(out, "loc"):
                fm_mean, fm_var = out.loc, out.variance()
            else:
                fm_mean, fm_var = out, jnp.zeros_like(out)
            fm_mean = fm_mean + state.fm_offset
            a_abs = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
            out_r2 = g_r2.apply({"params": state.params_r2}, a_abs,
                                rngs={"bayes": key})
            if hasattr(out_r2, "nu"):
                r2_mean, r2_var = out_r2.nu, out_r2.variance()
            else:
                r2_mean, r2_var = out_r2, jnp.zeros_like(out_r2)
            if cfg["map"] == "PDFF-var":
                rho, rho_var = physics.pdff_uncertainty(
                    a,
                    physics.Posterior(fm_mean[:, 0, ..., 0],
                                      fm_var[:, 0, ..., 0]),
                    physics.Posterior(r2_mean[:, 0, ..., 0],
                                      r2_var[:, 0, ..., 0]),
                    te_b, field=cfg["field"], rem_r2=cfg["rem_R2"])
            else:
                pm0 = jnp.concatenate([fm_mean, r2_mean], axis=-1)
                rho = physics.fit_rho(a, pm0, te_b, field=cfg["field"])
                rho_var = jnp.zeros(rho.shape[:1] + (4,) + rho.shape[2:4]
                                    + (1,))
            pm = jnp.concatenate([fm_mean, r2_mean], axis=-1)
            return jnp.concatenate([rho, pm], axis=1), rho_var

        return run

    if sel == "VET-Net":
        from ..train import teaug
        tcfg = dict(teaug.DEFAULTS)
        if exp_cfg:
            tcfg.update({k: v for k, v in exp_cfg.items() if k in tcfg})
        model = teaug.build_model(tcfg)
        step_fn, tx = teaug.make_train_step(tcfg, model)
        state = _restore(cfg, teaug.init_state(tcfg, model, tx, key,
                                               h=acqs.shape[2],
                                               w=acqs.shape[3]))

        @jax.jit
        def run(a, te_b):
            pm = model.apply({"params": state.params}, a, te_b[..., 0])
            rho = physics.fit_rho(a, pm, te_b, field=cfg["field"],
                                  phase_constraint=True)
            return jnp.concatenate([rho, pm], axis=1), jnp.zeros(
                rho.shape[:1] + (4,) + rho.shape[2:4] + (1,))

        return run

    if sel == "Mag":
        from ..train import mag
        mcfg = dict(mag.DEFAULTS)
        if exp_cfg:
            mcfg.update({k: v for k, v in exp_cfg.items() if k in mcfg})
        model = mag.build_model(mcfg)
        step_fn, tx = mag.make_train_step(mcfg, model)
        state = _restore(cfg, mag.init_state(mcfg, model, tx, key,
                                             h=acqs.shape[2],
                                             w=acqs.shape[3]))

        @jax.jit
        def run(a, te_b):
            a_mag = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
            if mcfg["training_mode"] == "supervised":
                out = model.apply({"params": state.params}, a_mag,
                                  te_b[..., 0], rngs={"bayes": key})
            else:
                out = model.apply({"params": state.params}, a_mag,
                                  rngs={"bayes": key})
            r2 = out.mean() if hasattr(out, "nu") else out
            res = physics.cse_mag_fit(a_mag, r2, te_b, field=cfg["field"])
            wf = jnp.concatenate([res.rho, jnp.zeros_like(res.rho)], -1)
            pm = jnp.concatenate([jnp.zeros_like(r2), r2], axis=-1)
            var = jnp.concatenate([res.uncertainty] * 4, axis=1)
            return jnp.concatenate([wf, pm], axis=1), var

        return run

    if sel == "2D-Net":
        # Legacy-layout PM net: supervised PM-mode U-Net → (R2*, FM) →
        # get_rho (reference ROI-realPhantom.py:126-139 / ROI-analysis
        # 2D-Net branch).
        from ..data import layouts
        from ..train import sup
        scfg = dict(sup.DEFAULTS)
        scfg.update(G_model="U-Net", out_vars="PM")
        if exp_cfg:
            scfg.update({k: v for k, v in exp_cfg.items() if k in scfg})
        model = sup.build_model(scfg)
        step_fn, tx = sup.make_train_step(scfg, model)
        state = _restore(cfg, sup.init_state(scfg, model, tx, key, acqs[:1]))

        @jax.jit
        def run(a, te_b):
            a_leg = layouts.acqs_from_mebcrn(a)
            out = model.apply({"params": state.params},
                              a_leg).astype(jnp.float32)
            r2 = out[..., :1]
            fm = (out[..., 1:] - 0.5) * 2.0  # sigmoid head → [-1, 1]
            pm_meb = layouts.maps_to_mebcrn(
                jnp.concatenate([r2, fm], axis=-1), mode="PM")
            rho = physics.fit_rho(a, pm_meb, te_b, field=cfg["field"])
            maps = jnp.concatenate([rho, pm_meb], axis=1)
            return maps, jnp.zeros(maps.shape[:1] + (4,) + maps.shape[2:4]
                                   + (1,))

        return run

    if sel in ("U-Net", "MDWF"):
        from ..data import layouts
        from ..train import sup
        scfg = dict(sup.DEFAULTS)
        if exp_cfg:
            scfg.update({k: v for k, v in exp_cfg.items() if k in scfg})
        # the selector DEFINES the architecture (reference ROI-analysis.py
        # builds it from model_sel, not from the experiment settings):
        # MDWF must pin out_vars=WF-PM too, or sup.build_model would hand
        # back the 2-decoder PM generator for a WF-default settings.yml
        # and this branch's [WF, R2*, FM] slicing would read R2*/FM as
        # water/fat
        scfg["G_model"] = "U-Net" if sel == "U-Net" else "multi-decod"
        if sel == "MDWF":
            scfg["out_vars"] = "WF-PM"
        model = sup.build_model(scfg)
        step_fn, tx = sup.make_train_step(scfg, model)
        state = _restore(cfg, sup.init_state(scfg, model, tx, key, acqs[:1]))

        @jax.jit
        def run(a, te_b):
            a_leg = layouts.acqs_from_mebcrn(a)
            out = model.apply({"params": state.params}, a_leg)
            wf_abs = out[..., :2]
            pm = out[..., 2:4] if out.shape[-1] >= 4 else jnp.zeros_like(
                wf_abs)
            w = jnp.stack([wf_abs[..., 0], jnp.zeros_like(wf_abs[..., 0])],
                          -1)[:, None]
            f = jnp.stack([wf_abs[..., 1], jnp.zeros_like(wf_abs[..., 1])],
                          -1)[:, None]
            pm_row = jnp.stack([pm[..., 1], pm[..., 0]], -1)[:, None]
            maps = jnp.concatenate([w, f, pm_row], axis=1)
            return maps, jnp.zeros(maps.shape[:1] + (4,) + maps.shape[2:4]
                                   + (1,))

        return run

    if sel == "GraphCuts":
        raise SystemExit("GraphCuts mode consumes precomputed maps; "
                         "use the library API (eval.roi) directly")
    raise SystemExit(f"unknown model_sel {sel!r}")


def infer_maps(cfg, acqs, te):
    """Model dispatch → (maps (n, 3, H, W, 2), rho_var or None).

    cfg["infer_batch"] (default 1) sets the serving chunk size — see
    `_per_slice` for the batching/sharding semantics. Bulk callers that
    need the closure itself (to warm the compile outside a timed region)
    use `make_infer_run` directly."""
    return _per_slice(make_infer_run(cfg, acqs), acqs, te,
                      int(cfg.get("infer_batch", 1)))


def pdff_variance_map(maps: np.ndarray, rho_var: np.ndarray) -> np.ndarray:
    """PDFF variance via first-order propagation from the W/F covariance
    entries (reference ROI-analysis.py:308-322): rho_var rows are the
    flattened ns² covariance [W_var, WF_var, FW_var, F_var]."""
    w = np.abs(maps[:, 0, ..., 0] + 1j * maps[:, 0, ..., 1])
    f = np.abs(maps[:, 1, ..., 0] + 1j * maps[:, 1, ..., 1])
    tot = np.abs((maps[:, 0, ..., 0] + maps[:, 1, ..., 0])
                 + 1j * (maps[:, 0, ..., 1] + maps[:, 1, ..., 1]))
    w_var = rho_var[:, 0, ..., 0]
    wf_var = rho_var[:, 1, ..., 0]
    f_var = rho_var[:, 3, ..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        pdff_var = f_var / np.where(f > 0, f ** 2, 1.0)
        pdff_var -= 2 * wf_var / np.where(f * tot > 0, f * tot, 1.0)
        pdff_var += (w_var + f_var + 2 * wf_var) / np.where(tot > 0, tot,
                                                            1.0)
        pdff_var *= np.where(tot > 0, f ** 2 / tot ** 2, 0.0)
    return np.nan_to_num(pdff_var)


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv, settings_name="settings_roi.yml")
    acqs, gt_maps, te = load_cohorts(cfg)
    maps, rho_var = infer_maps(cfg, acqs, te)

    pdff, r2s, w_abs = roi_mod.maps_to_display(maps)
    pdff_gt, r2s_gt, w_gt = roi_mod.maps_to_display(gt_maps)
    if cfg["map"] == "PDFF-var":
        stack = pdff_variance_map(maps, rho_var)
        stack_gt, stat, env = pdff_gt, "mean", 0.03
    else:
        stack, stack_gt, stat, env = {
            "PDFF": (pdff, pdff_gt, "median", 0.03),
            "R2s": (r2s * physics.R2_SC, r2s_gt * physics.R2_SC, "mean",
                    10.0),
            "Water": (w_abs, w_gt, "mean", 0.05),
        }[cfg["map"]]

    crops_file = cfg["crops_file"] or str(
        Path("ROI_files") / f"{cfg['dataset']}_slices_crops.npy")
    if cfg["interactive"]:
        from ..eval.tracker import run_interactive
        run_interactive(np.transpose(stack, (1, 2, 0)),
                        lims=(0, 1) if "PDFF" in cfg["map"] else
                        (0, physics.R2_SC), npy_file=crops_file)
    if not Path(crops_file).exists():
        raise SystemExit(f"no crops file at {crops_file}; run with "
                         "--interactive on a workstation or provide one")
    res_m = roi_mod.roi_stats(stack, crops_file, stat=stat)
    res_r = roi_mod.roi_stats(stack_gt, crops_file, stat=stat)
    err, within = roi_mod.bias_histogram(res_m.values_1, res_r.values_1, env)
    print(f"{cfg['map']}: mean bias {np.mean(err):+.4f}, "
          f"{100 * within:.1f}% within ±{env}")
    if cfg.get("te_suffix"):
        # reference per-protocol naming ({map}_ROIs_{te1}_{dte}.xlsx, e.g.
        # PDFF_ROIs_13_21.xlsx — the filenames the offline Wilcoxon/
        # precision analyses enumerate, statistics/wilcox_test_allROI.R)
        suffix = f"{round(cfg['te1'] * 1e4)}_{round(cfg['dte'] * 1e4)}"
        name = f"{cfg['map']}_ROIs_{suffix}.xlsx"
    else:
        name = cfg["out_xlsx"]
    out = Path(cfg["output_dir"]) / name
    roi_mod.export_roi_xlsx(str(out), res_m, res_r, map_name=cfg["map"])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
