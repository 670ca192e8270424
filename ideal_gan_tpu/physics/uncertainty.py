"""First-order uncertainty propagation through the IDEAL model.

TPU-native rebuild of the reference's delta-method propagation
(wflib/IDEAL_model.py:628-767 `PDFF_uncertainty`/`acq_uncertainty`). The
reference consumed TFP distribution objects; here posteriors are plain
(mean, variance) arrays in normalized units, matching the (μ, σ) pytree
convention used by the Bayesian network heads.

The reference materialized per-voxel (nv, nb, ne, ne) diagonal covariance
matrices and called batched `linalg.inv`; we never build the diagonals —
the per-voxel GLS normal matrix MᴴΣ⁻¹M is a single einsum over the echo
axis and its ns×ns inverse is closed-form (ns=2), which keeps the whole op
elementwise + tiny-matmul and lets XLA fuse it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .constants import FM_SC, R2_SC, RHO_SC, SpeciesModel, WATER_FAT_7PEAK
from . import matrix as mx
from .ops import _flatten_voxels, _phasor, _to_complex, _xi, _from_complex


class Posterior(NamedTuple):
    """A (mean, variance) posterior over a map, in normalized units."""
    mean: jnp.ndarray
    variance: jnp.ndarray


def _rav(x: jnp.ndarray, nb: int) -> jnp.ndarray:
    return x.reshape(nb, 1, -1)


def pdff_uncertainty(acqs: jnp.ndarray, phi: Posterior, r2s: Posterior,
                     te: jnp.ndarray, field: float = 1.5,
                     r2_sc: float = R2_SC, fm_sc: float = FM_SC,
                     rho_sc: float = RHO_SC, rem_r2: bool = False,
                     species: SpeciesModel = WATER_FAT_7PEAK):
    """Water/fat GLS estimate + covariance under (φ, R2*) posteriors
    (reference `PDFF_uncertainty`, wflib/IDEAL_model.py:628-706).

    Per voxel, builds a heteroscedastic per-echo variance Σ_y from the
    first-order variance of the demodulation phasor, then solves the
    generalized LS problem: ρ_cov = (MᴴΣ⁻¹M)⁻¹, ρ̂ = ρ_cov·MᴴΣ⁻¹·(W⁻S).

    acqs: (nb, ne, H, W, 2); phi/r2s posteriors with fields shaped
    (nb, H, W) in normalized units. Returns (rho (nb, ns, H, W, 2),
    rho_var (nb, ns², H, W, 1)).
    """
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)  # (nb, ne, ns)
    m_pinv = mx.pinv_normal(m)
    p0 = mx.null_projector(m, m_pinv)

    smtx = _flatten_voxels(_to_complex(acqs))  # (nb, ne, nv)

    phi_mean = phi.mean * fm_sc
    phi_var = phi.variance * (fm_sc ** 2)
    if rem_r2:
        r2s_mean = jnp.zeros_like(phi_mean)
        r2s_var = jnp.zeros_like(phi_var)
    else:
        r2s_mean = r2s.mean * r2_sc
        r2s_var = r2s.variance * (r2_sc ** 2)

    xi = _xi(phi_mean, r2s_mean)
    wm = _phasor(te, xi, -1.0)
    wp = _phasor(te, xi, +1.0)

    te_r = te.astype(jnp.float32)  # (nb, ne, 1)
    phi_var_rav = _rav(phi_var, nb)
    wm_var = 1.0 - jnp.exp(-jnp.square(2.0 * np.pi * te_r) * phi_var_rav)
    if not rem_r2:
        r2s_mu_rav = _rav(r2s_mean, nb)
        r2s_var_rav = _rav(r2s_var, nb)
        wm_var = wm_var + jnp.exp(te_r * r2s_mu_rav) * (
            jnp.square(te_r) * r2s_var_rav)

    # Per-echo signal variance: phasor variance times the null-space
    # reprojection power plus the raw signal power.
    wp_p0_wm = wp * (p0 @ wm)  # (nb, ne, nv)
    s_var = jnp.square(jnp.abs(wp_p0_wm))
    y_sigma = wm_var * s_var + wm_var * jnp.square(jnp.abs(smtx))
    y_sigma_inv = jnp.where(y_sigma > 0, 1.0 / y_sigma, 0.0)  # (nb, ne, nv)

    # GLS normal matrix per voxel without materializing diagonals:
    # N[b,v,s,t] = Σ_e conj(M)[b,e,s]·Σ⁻¹[b,e,v]·M[b,e,t]
    mc = jnp.conjugate(m)
    normal = jnp.einsum('bes,bev,bet->bvst', mc,
                        y_sigma_inv.astype(jnp.complex64), m)
    rho_cov = mx.small_inv(normal)  # (nb, nv, ns, ns)

    y = wm * smtx  # demodulated signal (nb, ne, nv)
    rhs = jnp.einsum('bes,bev->bvs', mc, y_sigma_inv.astype(jnp.complex64) * y)
    rho_hat = jnp.einsum('bvst,bvt->bsv', rho_cov, rhs) / rho_sc

    res_rho = _from_complex(rho_hat.reshape(nb, ns, hgt, wdt))
    rho_var = jnp.abs(rho_cov).reshape(nb, -1, ns * ns)  # (nb, nv, ns²)
    rho_var = jnp.swapaxes(rho_var, -1, -2).reshape(nb, ns * ns, hgt, wdt)
    res_rho_var = rho_var[..., None] / (rho_sc ** 2)
    return res_rho, res_rho_var


def acq_uncertainty(rho_maps: jnp.ndarray, phi: Posterior, r2s: Posterior,
                    te: jnp.ndarray, field: float = 1.5,
                    r2_sc: float = R2_SC, fm_sc: float = FM_SC,
                    rho_sc: float = RHO_SC, rem_r2: bool = False,
                    only_mag: bool = False,
                    species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """Per-echo signal variance from map posteriors (reference
    `acq_uncertainty`, wflib/IDEAL_model.py:710-767): delta method through
    the forward phasor, Var[S_e] ≈ Wp_var_e · |（Mρ)_e|².

    rho_maps: (nb, ≥2, H, W, 2) water/fat rows; returns
    (nb, ne, H, W, 1 or 2) float32 variance (duplicated across re/im unless
    `only_mag`).
    """
    nb, _, hgt, wdt, _ = rho_maps.shape
    ne = te.shape[1]
    m = mx.model_matrix(te, field, species)

    rho = (rho_maps[:, :2, ..., 0] + 1j * rho_maps[:, :2, ..., 1]) * rho_sc
    rho_mtx = _flatten_voxels(rho.astype(jnp.complex64))

    phi_var = phi.variance * (fm_sc ** 2)
    if rem_r2:
        r2s_mean = jnp.zeros_like(phi_var)
        r2s_var = jnp.zeros_like(phi_var)
    else:
        r2s_mean = r2s.mean * r2_sc
        r2s_var = r2s.variance * (r2_sc ** 2)

    te_r = te.astype(jnp.float32)
    wp_var = 1.0 - jnp.exp(-jnp.square(2.0 * np.pi * te_r) * _rav(phi_var, nb))
    if not rem_r2:
        wp_var = wp_var + jnp.exp(-te_r * _rav(r2s_mean, nb)) * (
            jnp.square(te_r) * _rav(r2s_var, nb))

    mmwms = m @ rho_mtx  # (nb, ne, nv)
    s_var = wp_var * jnp.square(jnp.abs(mmwms))
    res = s_var.reshape(nb, ne, hgt, wdt)[..., None]
    if not only_mag:
        res = jnp.concatenate([res, res], axis=-1)
    return res
