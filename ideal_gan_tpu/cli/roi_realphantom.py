"""CLI: multi-site phantom bias evaluation (reference ROI-realPhantom.py),
headless.

Dispatches the full model zoo (reference ROI-realPhantom.py:100-250:
U-Net / MDWF / VET-Net / AI-DEAL / Mag via `roi_analysis.infer_maps`, or
the GraphCuts-as-GT physics LS fit), evaluates the committed vial crops
against the known ground-truth fat fractions (GT_vals,
ROI-realPhantom.py:321), prints per-slice timing (the reference's only
perf instrumentation, ROI-realPhantom.py:250-252), and exports the
per-vial xlsx.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from ..eval import roi as roi_mod
from .common import load_cohorts, setup_experiment

DEFAULTS = dict(
    dataset="phantom_1p5", model_sel="GraphCuts", map="PDFF", n_echoes=6,
    field=1.5, crops_file="", out_xlsx="ROI_phantom.xlsx",
    experiment_dir="", rem_R2=False, batch_size=1,
)


def fit_maps(cfg, acqs, gt_maps, te):
    """model_sel dispatch → (maps (n, ≥3, H, W, 2), elapsed_process_time).

    GraphCuts: physics-only LS fit with the GT (φ, R2*) — the parity
    baseline. Anything else: trained-model inference via the shared
    `roi_analysis.infer_maps` dispatch (reference loads the same model zoo
    in both ROI scripts)."""
    t1 = time.process_time()
    if cfg["model_sel"] == "GraphCuts":
        fit = jax.jit(lambda a, p, t: physics.fit_rho(a, p, t,
                                                      field=cfg["field"]))
        wf = np.asarray(fit(jnp.asarray(acqs), jnp.asarray(gt_maps[:, 2:3]),
                            jnp.asarray(te)))
        maps = np.concatenate([wf, gt_maps[:, 2:3]], axis=1)
    else:
        from .roi_analysis import infer_maps
        maps, _ = infer_maps(cfg, acqs, te)
        maps = np.asarray(maps)
    t2 = time.process_time()
    return maps, t2 - t1


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv)
    if not cfg["experiment_dir"]:
        cfg["experiment_dir"] = f"output/{cfg['dataset']}"
    acqs, gt_maps, te = load_cohorts(cfg)

    maps, elapsed = fit_maps(cfg, acqs, gt_maps, te)
    print("Elapsed time during the whole program in seconds:", elapsed)
    print("Time per slice:", elapsed / max(len(acqs), 1))

    pdff, r2s, _ = roi_mod.maps_to_display(maps)

    crops_file = cfg["crops_file"] or str(
        Path("/root/reference/ROI_files") /
        f"{cfg['dataset']}_slices_crops.npy")
    if not Path(crops_file).exists():
        raise SystemExit(f"no crops file at {crops_file}")
    stack = r2s * physics.R2_SC if cfg["map"] == "R2s" else pdff
    per_vial, bias = roi_mod.phantom_bias(stack, crops_file)
    per_slice = roi_mod.phantom_per_slice(stack, crops_file)
    if cfg["map"] == "R2s":
        # The phantom ground truth is fat fractions; for R2* they only
        # identify vials — a meaningful R2* reference is another
        # measurement (the offline R scripts regress against the
        # GraphCuts column, GC-bias.R), so the GT-bias is suppressed.
        bias = {g: float("nan") for g in bias}
    for g in sorted(per_vial):
        if not per_vial[g]:
            continue
        if cfg["map"] == "R2s":
            print(f"vial id={g:.3f}: mean R2* "
                  f"{float(np.mean(per_vial[g])):.2f} 1/s "
                  f"({len(per_vial[g])} ROIs)")
        elif not np.isnan(bias[g]):
            print(f"vial GT={g:.3f}: bias {bias[g]:+.4f} "
                  f"({len(per_vial[g])} ROIs)")
    out = Path(cfg["output_dir"]) / cfg["out_xlsx"]
    roi_mod.export_phantom_xlsx(str(out), per_vial, bias,
                                per_slice=per_slice)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
