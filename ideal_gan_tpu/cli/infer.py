"""CLI: bulk inference / batch serving — cohort in, quantitative maps out.

The reference has no production inference entry point: its eval scripts
(ROI-analysis.py, ROI-realPhantom.py, the try-models/ISMRM notebooks) run
slice-at-a-time eager TF and keep results in matplotlib/xlsx. This CLI is
the framework's serving surface: it loads a cohort (HDF5 cohorts or
`--synthetic N`), runs the selected model family through the same zoo
dispatch the ROI tools use (`roi_analysis.make_infer_run`) in fixed-shape
batches — batch-sharded over the `data` device mesh when several chips
are visible — and exports the water/fat/PDFF/R2*/field maps:

  npz    <out>/maps_pred.npz  (maps MEBCRN + pdff/r2s/field planes)
  dicom  <out>/out_dicom/Volunteer-XXX/{PDFF,R2s}/  (series per slice,
         the shared data.dicom.write_map_series convention)
  png    <out>/panels.png     (PDFF | R2* | field rows for --n_plot slices)

Steady-state serving throughput (slices/s: jitted model + LS fit + host
transfer, after a warm-up chunk has paid the one-time trace/compile) is
printed and written into the npz, so serving regressions show up in the
artifact itself.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from ..physics.constants import FM_SC, R2_SC
from .common import load_cohorts, setup_experiment
from .roi_analysis import _per_slice, make_infer_run

EXPORT_FORMATS = ("npz", "dicom", "png")

DEFAULTS = dict(
    dataset="infer", experiment_dir="",
    # U-Net | MDWF | 2D-Net | VET-Net | AI-DEAL | Mag
    model_sel="VET-Net",
    map="PDFF",
    n_echoes=6, field=1.5, infer_batch=8,
    export="npz,png",  # comma list of EXPORT_FORMATS
    method_prefix="m000", n_plot=4,
    rem_R2=False,
)


def _display_planes(maps: np.ndarray):
    from ..eval.roi import maps_to_display
    pdff, r2s, _ = maps_to_display(maps)
    field = maps[:, 2, ..., 0]
    return pdff, r2s, field


def export_npz(out_dir: Path, maps: np.ndarray, planes, slices_per_s: float):
    pdff, r2s, field = planes
    np.savez_compressed(
        out_dir / "maps_pred.npz", maps=maps, pdff=pdff,
        r2s_hz=r2s * R2_SC, field_hz=field * FM_SC,
        slices_per_s=np.float32(slices_per_s))
    return out_dir / "maps_pred.npz"


def export_dicom(out_dir: Path, cfg, planes):
    from ..data.dicom import write_map_series
    pdff, r2s, _ = planes
    for j in range(len(pdff)):
        write_map_series(out_dir / "out_dicom" / f"Volunteer-{j:03d}",
                         j, pdff[j], r2s[j], cfg["method_prefix"])
    return out_dir / "out_dicom"


def export_png(out_dir: Path, cfg, planes):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    pdff, r2s, field = planes
    n = min(int(cfg["n_plot"]), len(pdff))
    fig, axes = plt.subplots(3, n, figsize=(3 * n, 9), squeeze=False)
    rows = [("PDFF", pdff, 0.0, 1.0, "viridis"),
            ("R2* (Hz)", r2s * R2_SC, 0.0, R2_SC, "magma"),
            ("field (Hz)", field * FM_SC, -FM_SC / 2, FM_SC / 2, "RdBu_r")]
    for r, (name, stack, vmin, vmax, cmap) in enumerate(rows):
        for c in range(n):
            ax = axes[r][c]
            im = ax.imshow(stack[c], vmin=vmin, vmax=vmax, cmap=cmap)
            ax.set_axis_off()
            if c == 0:
                ax.set_title(name, loc="left")
        fig.colorbar(im, ax=axes[r][-1], fraction=0.046)
    fig.tight_layout()
    path = out_dir / "panels.png"
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def main(argv=None):
    cfg = setup_experiment(DEFAULTS, argv, settings_name="infer.yml")
    out_dir = Path(cfg["output_dir"])
    exports = [e.strip() for e in str(cfg["export"]).split(",") if e.strip()]
    unknown = sorted(set(exports) - set(EXPORT_FORMATS))
    if unknown:
        raise SystemExit(f"unknown --export format(s) {unknown}; "
                         f"choose from {', '.join(EXPORT_FORMATS)}")
    acqs, _, te = load_cohorts(cfg)
    import jax
    print(f"inference: {len(acqs)} slices, model {cfg['model_sel']}, "
          f"batch {cfg['infer_batch']}, {jax.device_count()} device(s)")

    # Build the model / restore the checkpoint ONCE and reuse the jitted
    # closure across chunks; the warm-up chunk pays the trace+compile so
    # the timed pass measures steady-state serving.
    run = make_infer_run(cfg, acqs)
    bs = max(int(cfg["infer_batch"]), 1)
    nw = min(bs, len(acqs))
    _per_slice(run, acqs[:nw], te[:nw], bs)
    t0 = time.perf_counter()
    maps, rho_var = _per_slice(run, acqs, te, bs)
    dt = time.perf_counter() - t0
    slices_per_s = len(acqs) / max(dt, 1e-9)
    maps = np.asarray(maps)
    planes = _display_planes(maps)

    written = []
    if "npz" in exports:
        written.append(export_npz(out_dir, maps, planes, slices_per_s))
    if "dicom" in exports:
        written.append(export_dicom(out_dir, cfg, planes))
    if "png" in exports:
        written.append(export_png(out_dir, cfg, planes))
    print(f"throughput: {slices_per_s:.1f} slices/s steady-state "
          f"({dt * 1e3 / len(acqs):.1f} ms/slice)")
    print(f"PDFF mean {float(planes[0].mean()):.4f}  "
          f"R2* mean {float(planes[1].mean() * R2_SC):.2f} Hz")
    for p in written:
        print(f"wrote {p}")
    return maps


if __name__ == "__main__":
    main()
