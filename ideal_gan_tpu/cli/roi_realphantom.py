"""CLI: multi-site phantom bias evaluation (reference ROI-realPhantom.py),
headless.

Fits PDFF/R2* maps on phantom acquisitions (the magnitude-fit path or a
trained model), evaluates the committed vial crops against the known
ground-truth fat fractions (GT_vals, ROI-realPhantom.py:321), prints
per-slice timing (the reference's only perf instrumentation,
ROI-realPhantom.py:250-252), and exports the per-vial xlsx.
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
)


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv)
    acqs, gt_maps, te = load_cohorts(cfg)

    # Physics-only map fitting (the GraphCuts-as-GT analogue): fit with
    # the GT (φ, R2*) then derive PDFF — this is the parity baseline.
    t1 = time.process_time()
    fit = jax.jit(lambda a, p, t: physics.fit_rho(a, p, t,
                                                  field=cfg["field"]))
    wf = np.asarray(fit(jnp.asarray(acqs), jnp.asarray(gt_maps[:, 2:3]),
                        jnp.asarray(te)))
    t2 = time.process_time()
    print("Elapsed time during the whole program in seconds:", t2 - t1)
    print("Time per slice:", (t2 - t1) / max(len(acqs), 1))

    maps = np.concatenate([wf, gt_maps[:, 2:3]], axis=1)
    pdff, r2s, _ = roi_mod.maps_to_display(maps)

    crops_file = cfg["crops_file"] or str(
        Path("/root/reference/ROI_files") /
        f"{cfg['dataset']}_slices_crops.npy")
    if not Path(crops_file).exists():
        raise SystemExit(f"no crops file at {crops_file}")
    per_vial, bias = roi_mod.phantom_bias(pdff, crops_file)
    per_slice = roi_mod.phantom_per_slice(pdff, crops_file)
    for g in sorted(bias):
        if not np.isnan(bias[g]):
            print(f"vial GT={g:.3f}: bias {bias[g]:+.4f} "
                  f"({len(per_vial[g])} ROIs)")
    out = Path(cfg["output_dir"]) / cfg["out_xlsx"]
    roi_mod.export_phantom_xlsx(str(out), per_vial, bias,
                                per_slice=per_slice)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
