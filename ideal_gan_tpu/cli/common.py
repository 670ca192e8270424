"""Shared CLI machinery: flag parsing with settings.yml round-trip, data
loading (HDF5 cohorts or on-the-fly synthetic phantoms), and the epoch
runner.

Every entry point keeps the reference workflow (SURVEY §5 config system):
flags → output/<dataset>/settings.yml; downstream tools load that YAML and
overlay their own flags. A `--synthetic N` escape hatch generates N
physics-consistent slices so every pipeline runs end-to-end without the
proprietary cohorts.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .. import physics
from ..utils import Config, parse_flags


def setup_experiment(defaults: dict, argv=None,
                     settings_name: str = "settings.yml") -> Config:
    base = {"data_size": 192, "synthetic": 0,
            "dataset_dir": "../datasets/", "output_base": "output",
            "debug_nans": False, "profile_dir": "",
            "compile_cache": "/tmp/jax_cache"}
    cfg = parse_flags({**base, **defaults}, argv)
    import jax

    from ..parallel import initialize_distributed

    # Multi-host (pod) wiring: no-op on a single host; on a launcher-env
    # or TPU-pod process it joins the distributed runtime BEFORE any
    # device use so jax.devices() spans all hosts (docs/POD.md).
    initialize_distributed()
    if cfg["compile_cache"]:
        jax.config.update("jax_compilation_cache_dir", cfg["compile_cache"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if cfg["debug_nans"]:
        # numeric sanitizer (reference: assert_all_finite sprinkled through
        # trainers, SURVEY §5); aborts on the first NaN-producing op
        jax.config.update("jax_debug_nans", True)
    out_dir = Path(cfg["output_base"]) / cfg["dataset"]
    out_dir.mkdir(parents=True, exist_ok=True)
    # Downstream tools (LDM / generation / metrics) write their own
    # settings file so they never clobber the training run's settings.yml
    # they are about to inherit (reference pattern: settings overlay,
    # train-ldm.py:32-45).
    cfg.save(out_dir / settings_name)
    cfg["output_dir"] = str(out_dir)
    return cfg


def load_settings(experiment_dir: str, overlay: dict | None = None) -> Config:
    """Load a past run's settings.yml and overlay new flags (the
    reference's test-genMetrics/train-ldm pattern)."""
    cfg = Config.load(Path(experiment_dir) / "settings.yml")
    if overlay:
        cfg = cfg.overlay(overlay)
    return cfg


def synthetic_dataset(n: int, h: int = 192, w: int = 192, ne: int = 6,
                      seed: int = 0, field: float = 1.5):
    """Physics-consistent synthetic cohort: smooth water/fat/field maps →
    forward model → acquisitions. Returns (acqs, maps, te) numpy arrays in
    MEBCRN layout."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)

    def smooth(lo, hi, s=8):
        x = rng.normal(size=(n, h, w))
        x = np.stack([gaussian_filter(xi, s) for xi in x])
        x = (x - x.min()) / (np.ptp(x) + 1e-9)
        return (lo + (hi - lo) * x).astype(np.float32)

    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - h / 2) / (0.45 * h)) ** 2
            + ((xx - w / 2) / (0.45 * w)) ** 2) < 1.0
    water = smooth(0.2, 0.8) * mask
    fat = smooth(0.0, 0.5) * mask
    phi = smooth(-0.3, 0.3) * mask
    r2s = smooth(0.02, 0.5) * mask
    pha = smooth(-0.3, 0.3)
    w_c = water * np.exp(1j * pha)
    f_c = fat * np.exp(1j * pha)
    maps = np.stack([
        np.stack([w_c.real, w_c.imag], -1),
        np.stack([f_c.real, f_c.imag], -1),
        np.stack([phi, r2s], -1)], axis=1).astype(np.float32)
    te = np.asarray(physics.te_train(ne, bs=n,
                                     ))
    if field == 3.0:
        te = np.asarray(physics.te_train_for_field(ne, bs=n, field=3.0))
    import jax
    acqs = np.asarray(jax.jit(physics.synthesize)(jnp.asarray(maps),
                                                  jnp.asarray(te)))
    return acqs, maps, te


def load_cohorts(cfg, mebcrn: bool = True, mag_and_phase: bool = False):
    """Load the cfg's HDF5 cohorts (reference filename convention
    `<name>_GC_<size>_complex_2D.hdf5`) or fall back to synthetic data."""
    if cfg.get("synthetic", 0):
        return synthetic_dataset(int(cfg["synthetic"]),
                                 h=cfg.get("data_size", 192),
                                 w=cfg.get("data_size", 192),
                                 ne=cfg.get("n_echoes", 6),
                                 field=cfg.get("field", 1.5))
    from ..data import load_hdf5
    names = ["INTArest", "Volunteers", "Attilio"]
    ech_idx = 2 * cfg.get("n_echoes", 6)
    acqs_list, maps_list = [], []
    for name in names:
        path = os.path.join(cfg["dataset_dir"],
                            f"{name}_GC_{cfg.get('data_size', 192)}"
                            "_complex_2D.hdf5")
        if not os.path.exists(path):
            continue
        d = load_hdf5(path, ech_idx=ech_idx, mebcrn=mebcrn,
                      mag_and_phase=mag_and_phase)
        acqs_list.append(d.acqs)
        maps_list.append(d.maps)
    if not acqs_list:
        raise FileNotFoundError(
            f"no cohorts found under {cfg['dataset_dir']}; use --synthetic N")
    acqs = np.concatenate(acqs_list)
    maps = np.concatenate(maps_list)
    ne = cfg.get("n_echoes", 6)
    te = np.asarray(physics.te_train(ne, bs=len(acqs)))
    return acqs, maps, te


def warn_f32_compiler_crash(cfg):
    """Loud guidance for the known XLA TPU compiler crash class.

    The UNet/VET generator BACKWARD at f32, 384², batch 8 crashes the
    XLA TPU compiler outright (with or without remat; any
    decoder/attention config; 48 and 72 filters alike), while the same
    graph compiles at 256², at batch ≤ 2, in bf16, or forward-only —
    the threshold tracks the unrematerialized backward's temp-buffer
    plan crossing HBM capacity (~28 GB estimated vs the 12.4 GB that
    compiles at 256²). Isolation: tools/xla_crash_repro.py; analysis:
    docs/DESIGN.md "f32 compiler crash". Steer users BEFORE they wait
    out a multi-minute compile that dies."""
    import jax
    if jax.default_backend() != "tpu":
        return
    if cfg.get("bf16") or cfg.get("data_size", 192) < 384:
        return
    if cfg.get("batch_size", 0) * cfg.get("data_size", 0) ** 2 < 8 * 384 ** 2:
        return
    if 0 < int(cfg.get("microbatch", 0) or 0) <= 2:
        return  # grad accumulation keeps the per-scan-body plan small
    import sys
    print(
        "WARNING: f32 training at data_size>=384 / batch>=8 is known to "
        "CRASH the XLA TPU compiler (backward temp-buffer plan exceeds "
        "HBM; see docs/DESIGN.md and tools/xla_crash_repro.py). "
        "Recommended operating point: --microbatch 2 (exact gradient "
        "accumulation, full batch semantics), or --bf16 1 (with --remat 1 "
        "for batch 16), or --batch_size 2, or --data_size 256.",
        file=sys.stderr, flush=True)
