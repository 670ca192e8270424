"""End-to-end phantom PDFF-bias parity harness vs the TF reference.

The driver's accuracy target (BASELINE.json) is "PDFF ROI bias within
±0.5% of the TF reference per phantom vial". This tool measures it
directly: it synthesizes a multi-vial phantom at the reference's GT fat
fractions (GT_vals, /root/reference/ROI-realPhantom.py:321), runs the TF
reference's map-fitting paths (`wflib.get_rho`, wflib/IDEAL_model.py:527,
and `wflib.CSE_mag`, wflib/IDEAL_model.py:314) and this repo's
`physics.fit_rho` / `physics.cse_mag_fit` on IDENTICAL inputs (same
acquisitions, same GT (FM, R2*) maps, same TEs), and reports the per-vial
PDFF difference between the two implementations plus each one's bias vs
ground truth.

Run as a script to (re)generate PHANTOM_PARITY.json at the repo root:

    python tools/phantom_parity.py

`tests/test_phantom_parity.py` asserts the ±0.5%/vial bound on the same
computation (skipped when TF or the reference checkout is absent).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

# Numerical parity comparison, not a benchmark: run on host CPU so the
# harness works identically with or without a TPU attached (and in the
# same process as the TF reference). The TPU image's sitecustomize pins
# the axon backend before this module runs, so the env var alone is not
# enough — update jax.config before any computation.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Ground-truth vial fat fractions (reference ROI-realPhantom.py:321).
GT_VALS = [0.0, 0.026, 0.053, 0.079, 0.105, 0.157, 0.209, 0.312, 0.413,
           0.514, 1.0]

H, W = 192, 128          # phantom protocol image size (ROI-realPhantom.py:44)
NE = 6
FIELD = 1.5
AMP = 0.7                # total |W+F| per vial (units of rho_sc-normalized ρ)
R2S_TRUE = 30.0          # s⁻¹ inside vials
FM_SPAN = 40.0           # Hz peak-to-peak linear field-map ramp
NOISE_STD = 0.005        # complex Gaussian noise per channel
SEED = 1234


def build_phantom(field: float = FIELD):
    """Synthetic multi-vial phantom → (acqs, maps, te, vial_masks).

    acqs: (1, NE, H, W, 2) MEBCRN float32 with additive Gaussian noise;
    maps: (1, 3, H, W, 2) GT [water, fat, (FM, R2*)] rows (normalized);
    te:   (1, NE, 1) seconds; vial_masks: {gt_ff: bool (H, W)}.
    """
    import jax.numpy as jnp

    from ideal_gan_tpu import physics

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    water = np.zeros((H, W), np.float32)
    fat = np.zeros((H, W), np.float32)
    masks = {}
    # 11 vials on a 4×3 grid of radius-12 circles.
    radius = 12.0
    cols = np.linspace(24, W - 24, 3)
    rows = np.linspace(24, H - 24, 4)
    centers = [(r, c) for r in rows for c in cols][: len(GT_VALS)]
    for ff, (cy, cx) in zip(GT_VALS, centers):
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= radius ** 2
        water[disk] = AMP * (1.0 - ff)
        fat[disk] = AMP * ff
        # ROI = vial interior (margin avoids partial-volume edge pixels).
        masks[ff] = (yy - cy) ** 2 + (xx - cx) ** 2 <= (radius - 3.0) ** 2

    support = (water + fat) > 0
    fm = (FM_SPAN * ((xx / W) - 0.5) + 0.25 * FM_SPAN * (yy / H)) * support
    r2s = R2S_TRUE * support

    zeros = np.zeros((H, W), np.float32)
    maps = np.stack([
        np.stack([water, zeros], -1),
        np.stack([fat, zeros], -1),
        np.stack([fm / physics.FM_SC, r2s / physics.R2_SC], -1),
    ])[None].astype(np.float32)  # (1, 3, H, W, 2)

    # field-appropriate protocol TE train (1.5T: 1.3/2.1 ms;
    # 3T: 0.879/0.6623 ms — wflib/IDEAL_model.py:23-24,149)
    te = np.asarray(physics.te_train_for_field(NE, bs=1, field=field),
                    np.float32)
    acqs = np.asarray(physics.synthesize(jnp.asarray(maps), jnp.asarray(te),
                                         field=field), np.float32)
    rng = np.random.default_rng(SEED)
    acqs = acqs + rng.normal(scale=NOISE_STD, size=acqs.shape).astype(
        np.float32) * support[None, None, :, :, None]
    return acqs, maps, te, masks


def _pdff_from_wf_complex(wf_rho: np.ndarray) -> np.ndarray:
    """PDFF = |F| / |W + F| (the reference eval rule,
    ROI-realPhantom.py:215-222: per-species magnitudes over the magnitude
    of the complex sum)."""
    w = wf_rho[:, 0, ..., 0] + 1j * wf_rho[:, 0, ..., 1]
    f = wf_rho[:, 1, ..., 0] + 1j * wf_rho[:, 1, ..., 1]
    tot = np.abs(w + f)
    return np.where(tot > 1e-8, np.abs(f) / np.maximum(tot, 1e-8), 0.0)


def _pdff_from_wf_mag(wf_abs: np.ndarray) -> np.ndarray:
    """PDFF for the magnitude path: F / (W + F) over per-species magnitudes
    (reference Mag branch, ROI-realPhantom.py:217-218)."""
    w = wf_abs[:, 0, ..., 0]
    f = wf_abs[:, 1, ..., 0]
    tot = w + f
    return np.where(tot > 1e-8, f / np.maximum(tot, 1e-8), 0.0)


def run_repo(acqs, maps, te, field: float = FIELD):
    """This repo's complex LS fit + magnitude CSE fit → (pdff_c, pdff_m)."""
    import jax
    import jax.numpy as jnp

    from ideal_gan_tpu import physics

    pm = maps[:, 2:3]
    rho = np.asarray(jax.jit(
        lambda a, p, t: physics.fit_rho(a, p, t, field=field))(
            jnp.asarray(acqs), jnp.asarray(pm), jnp.asarray(te)))
    pdff_c = _pdff_from_wf_complex(rho)

    a_abs = np.sqrt(np.sum(np.square(acqs), axis=-1, keepdims=True))
    r2_only = pm[..., 1:]  # (1,1,H,W,1) normalized R2*
    res = jax.jit(lambda a, r, t: physics.cse_mag_fit(a, r, t,
                                                       field=field))(
        jnp.asarray(a_abs), jnp.asarray(r2_only), jnp.asarray(te))
    pdff_m = _pdff_from_wf_mag(np.asarray(res.rho))
    return pdff_c, pdff_m


def run_reference(acqs, maps, te, field: float = FIELD):
    """The TF reference's get_rho + CSE_mag on the same inputs."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import tensorflow as tf
    import wflib as wf

    a_tf = tf.convert_to_tensor(acqs, tf.float32)
    pm_tf = tf.convert_to_tensor(maps[:, 2:3], tf.float32)
    te_tf = tf.convert_to_tensor(te, tf.float32)

    rho_ref = wf.get_rho(a_tf, pm_tf, field=field, te=te_tf).numpy()
    pdff_c = _pdff_from_wf_complex(rho_ref)

    a_abs = tf.math.sqrt(tf.reduce_sum(tf.square(a_tf), axis=-1,
                                       keepdims=True))
    r2_tf = pm_tf[..., 1:]
    wf_abs, _ = wf.CSE_mag(a_abs, r2_tf, [field, te_tf])
    pdff_m = _pdff_from_wf_mag(wf_abs.numpy())
    return pdff_c, pdff_m


def per_vial(pdff: np.ndarray, masks) -> dict:
    return {ff: float(np.median(pdff[0][mask])) for ff, mask in masks.items()}


def compare(tol: float = 0.005, field: float = FIELD):
    """Run both implementations; return the per-vial comparison dict."""
    acqs, maps, te, masks = build_phantom(field)
    repo_c, repo_m = run_repo(acqs, maps, te, field)
    ref_c, ref_m = run_reference(acqs, maps, te, field)

    out = {"tolerance": tol, "noise_std": NOISE_STD, "field": field,
           "vials": []}
    worst = {"complex": 0.0, "magnitude": 0.0}
    for ff in GT_VALS:
        rc, xc = per_vial(repo_c, masks)[ff], per_vial(ref_c, masks)[ff]
        rm, xm = per_vial(repo_m, masks)[ff], per_vial(ref_m, masks)[ff]
        row = {
            "gt_ff": ff,
            "complex": {"repo": rc, "reference": xc, "delta": rc - xc,
                        "repo_bias": rc - ff, "reference_bias": xc - ff},
            "magnitude": {"repo": rm, "reference": xm, "delta": rm - xm,
                          "repo_bias": rm - ff, "reference_bias": xm - ff},
        }
        worst["complex"] = max(worst["complex"], abs(rc - xc))
        worst["magnitude"] = max(worst["magnitude"], abs(rm - xm))
        out["vials"].append(row)
    out["max_abs_delta"] = worst
    out["pass"] = worst["complex"] <= tol and worst["magnitude"] <= tol
    return out


def main():
    out = {}
    ok = True
    for key, field in (("field_1p5T", 1.5), ("field_3T", 3.0)):
        result = compare(field=field)
        out[key] = result
        ok = ok and result["pass"]
        print(f"== {field} T protocol ==")
        for row in result["vials"]:
            print(f"vial GT={row['gt_ff']:.3f}: "
                  f"Δcomplex={row['complex']['delta']:+.5f} "
                  f"Δmag={row['magnitude']['delta']:+.5f} "
                  f"(repo bias {row['complex']['repo_bias']:+.5f})")
        print(f"max |Δ|: complex={result['max_abs_delta']['complex']:.5f} "
              f"magnitude={result['max_abs_delta']['magnitude']:.5f} "
              f"tol={result['tolerance']} → "
              f"{'PASS' if result['pass'] else 'FAIL'}")
    out["pass"] = ok
    path = REPO / "PHANTOM_PARITY.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
