"""ISMRM fat–water challenge style evaluation (the reference's
ISMRM-challenge.ipynb as a script).

The notebook's flow (reference ISMRM-challenge.ipynb): read a DICOM
multi-echo case, restore a trained VET-Net from an experiment dir, run
`G_A2B` + `get_rho` per case with `process_time` timing, and save a
panel of PDFF maps. Here the same flow runs through the framework's
pieces: `data.load_dicom_series` (native C++ parser when built),
`cli.roi_analysis.infer_maps` (any model of the zoo, GraphCuts LS fit by
default), and a matplotlib panel.

Usage:
    python examples/ismrm_challenge.py [--dicom_dir DIR ...] \
        [--model_sel VET-Net --experiment_dir output/run] [--out out.png]

Without --dicom_dir it demonstrates on synthetic physics phantoms.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ideal_gan_tpu import physics
from ideal_gan_tpu.cli.common import synthetic_dataset
from ideal_gan_tpu.cli.roi_analysis import infer_maps
from ideal_gan_tpu.eval.roi import maps_to_display


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dicom_dir", nargs="*", default=[],
                    help="one directory per case (multi-echo DICOM series)")
    ap.add_argument("--model_sel", default="VET-Net")
    ap.add_argument("--experiment_dir", default="")
    ap.add_argument("--n_echoes", type=int, default=6)
    ap.add_argument("--field", type=float, default=1.5)
    ap.add_argument("--te1", type=float, default=0.0013)
    ap.add_argument("--dte", type=float, default=0.0021)
    ap.add_argument("--out", default="PDFF_results.png")
    args = ap.parse_args(argv)

    cases = []
    if args.dicom_dir:
        from ideal_gan_tpu.data import load_dicom_series
        for d in args.dicom_dir:
            acqs = load_dicom_series(d)
            te = physics.te_train(acqs.shape[1], bs=acqs.shape[0],
                                  te1=args.te1, dte=args.dte)
            cases.append((acqs, np.asarray(te), None))
    else:
        acqs, maps, te = synthetic_dataset(4, h=96, w=96,
                                           ne=args.n_echoes)
        for i in range(acqs.shape[0]):
            cases.append((np.asarray(acqs[i:i + 1]), np.asarray(te[i:i + 1]),
                          np.asarray(maps[i:i + 1])))

    cfg = dict(model_sel=args.model_sel, experiment_dir=args.experiment_dir,
               n_echoes=args.n_echoes, field=args.field, rem_R2=False,
               te1=args.te1, dte=args.dte, map="PDFF")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(figsize=(4 * len(cases), 4), ncols=len(cases),
                            squeeze=False)
    # same-shape cases share ONE infer_maps call (one model build/restore
    # + one jit; inference itself is per-slice inside the dispatch);
    # mixed shapes fall back to per-case calls
    same_shape = len({(a.shape, t.shape) for a, t, _ in cases}) == 1
    t1 = time.process_time()
    if same_shape:
        acqs_all = np.concatenate([a for a, _, _ in cases])
        te_all = np.concatenate([t for _, t, _ in cases])
        maps_all, _ = infer_maps(cfg, acqs_all, te_all)
        preds = [np.asarray(maps_all[i:i + 1]) for i in range(len(cases))]
    else:
        preds = [np.asarray(infer_maps(cfg, a, t)[0]) for a, t, _ in cases]
    for i, (maps_pred, (_, _, gt)) in enumerate(zip(preds, cases)):
        pdff, _, _ = maps_to_display(maps_pred)
        im = axs[0, i].imshow(np.squeeze(pdff[0]), cmap="jet",
                              vmin=0, vmax=1)
        fig.colorbar(im, ax=axs[0, i])
        axs[0, i].axis("off")
        if gt is not None:
            pdff_gt, _, _ = maps_to_display(gt)
            err = float(np.nanmean(np.abs(pdff[0] - pdff_gt[0])))
            axs[0, i].set_title(f"case {i}: |ΔPDFF| {err:.4f}")
    t2 = time.process_time()
    print("Elapsed time during the whole program in seconds:", t2 - t1)
    print("Time per case:", (t2 - t1) / max(len(cases), 1))
    fig.tight_layout()
    fig.savefig(args.out, bbox_inches="tight", pad_inches=0)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
