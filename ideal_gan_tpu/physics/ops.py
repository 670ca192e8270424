"""IDEAL signal-model operators: forward synthesis, cycle, map fitting.

TPU-native rebuild of the reference operator suite (wflib/IDEAL_model.py:
142-624): every entry point is a pure jittable function over the MEBCRN
layout — acquisitions (nb, ne, H, W, 2[re,im]) and parameter maps
(nb, n_maps, H, W, 2) — with explicit TE trains and field strength. The
linear algebra is per-voxel: tiny shared (ne × ns) modeling matrices applied
across nv = H·W voxels, expressed as batched matmuls (nb, ns, ne) × (nb, ne,
nv) that XLA maps onto the MXU, with the elementwise phasor/decay factors
fused around them. `ideal_gan_tpu.ops.pallas_ideal` provides hand-fused
Pallas kernels for the hottest paths; these jnp forms are the reference
semantics and the CPU/interpret fallback.

Normalization convention (shared with the reference): field maps are stored
as φ/fm_sc, R2* as r2s/r2_sc, water/fat as ρ/rho_sc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .constants import FM_SC, R2_SC, RHO_SC, SpeciesModel, WATER_FAT_7PEAK
from . import matrix as mx

_2PI = 2.0 * np.pi


def _flatten_voxels(x: jnp.ndarray) -> jnp.ndarray:
    """(nb, k, H, W) → (nb, k, nv)."""
    nb, k = x.shape[0], x.shape[1]
    return x.reshape(nb, k, -1)


def _to_complex(acqs: jnp.ndarray) -> jnp.ndarray:
    """MEBCRN (nb, ne, H, W, 2) → complex (nb, ne, H, W)."""
    return jnp.asarray(acqs[..., 0] + 1j * acqs[..., 1], jnp.complex64)


def _from_complex(s: jnp.ndarray) -> jnp.ndarray:
    """complex (nb, k, H, W) → MEBCRN (nb, k, H, W, 2)."""
    return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1).astype(jnp.float32)


def _phasor(te: jnp.ndarray, xi: jnp.ndarray, sign: float,
            extra: jnp.ndarray | None = None) -> jnp.ndarray:
    """W^± = exp(±2πi·te·ξ [+ extra]) over (nb, ne, nv).

    te: (nb, ne, 1) float; xi: (nb, 1, nv) complex64 with
    ξ = φ + i·R2*/2π so that +i gives decay exp(−te·R2*) on the forward
    phasor and the −i demodulation grows exp(+te·R2*).
    """
    expo = sign * 2j * np.pi * te.astype(jnp.complex64) * xi
    if extra is not None:
        expo = expo + extra
    return jnp.exp(expo)


def _bipolar_phase(pha_bip: jnp.ndarray, ne: int, scale: float) -> jnp.ndarray:
    """Alternating-readout (bipolar) phase exponent i·(−1)ⁿ·scale·φ_bip.

    pha_bip: (nb, H, W) normalized bipolar phase map; returns complex
    exponent (nb, ne, nv) with sign alternating per echo index n = 1..ne
    (wflib/IDEAL_model.py:246-253).
    """
    nb = pha_bip.shape[0]
    signs = jnp.asarray((-1.0) ** np.arange(1, ne + 1), jnp.float32)  # (ne,)
    pha = pha_bip.reshape(nb, 1, -1) * scale  # (nb, 1, nv)
    return 1j * signs[None, :, None].astype(jnp.complex64) * pha.astype(jnp.complex64)


def _xi(phi: jnp.ndarray, r2s: jnp.ndarray) -> jnp.ndarray:
    """ξ = φ + i·R2*/2π, flattened to (nb, 1, nv)."""
    nb = phi.shape[0]
    xi = phi + 1j * r2s / _2PI
    return xi.reshape(nb, 1, -1).astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Forward synthesis: parameter maps → multi-echo signal
# ---------------------------------------------------------------------------

def synthesize(out_maps: jnp.ndarray, te: jnp.ndarray, field: float = 1.5,
               r2_sc: float = R2_SC, fm_sc: float = FM_SC,
               rho_sc: float = RHO_SC,
               species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """Complex-parameterized forward model (reference `IDEAL_model`,
    wflib/IDEAL_model.py:220-299).

    out_maps: (nb, nm, H, W, 2) with rows [water(re,im), fat(re,im),
    (field-map, R2*)] and an optional 4th bipolar-phase row. te: (nb, ne, 1).
    Returns acquisitions (nb, ne, H, W, 2).

    S_e = exp(2πi·te_e·ξ) · Σ_s M[e,s]·ρ_s, ξ = φ + i·relu(R2*)/2π.
    """
    nb, nm, hgt, wdt, _ = out_maps.shape
    ne = te.shape[1]
    ns = species.n_species
    m = mx.model_matrix(te, field, species)  # (nb, ne, ns)

    rho = (out_maps[:, :ns, ..., 0] + 1j * out_maps[:, :ns, ..., 1]) * rho_sc
    rho_mtx = _flatten_voxels(rho.astype(jnp.complex64))  # (nb, ns, nv)

    r2s = jnp.maximum(out_maps[:, ns, ..., 1], 0.0) * r2_sc
    phi = out_maps[:, ns, ..., 0] * fm_sc
    xi = _xi(phi, r2s)

    extra = None
    if nm > ns + 1:
        extra = _bipolar_phase(out_maps[:, -1, ..., 0], ne, np.pi)
    wp = _phasor(te, xi, +1.0, extra)  # (nb, ne, nv)

    smtx = wp * (m @ rho_mtx)  # (nb, ne, nv)
    return _from_complex(smtx.reshape(nb, ne, hgt, wdt))


def synthesize_mag(out_maps: jnp.ndarray, te: jnp.ndarray, field: float = 1.5,
                   r2_sc: float = R2_SC, fm_sc: float = FM_SC,
                   rho_sc: float = RHO_SC,
                   species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """(FF, PD, common-phase) parameterized forward model (reference
    `IDEAL_mag`, wflib/IDEAL_model.py:404-453).

    out_maps rows: [(FF, ·), (PD, R2*), (WF-phase, field-map)]; the common
    water/fat phase is 4π·(row2 ch0). Returns (nb, ne, H, W, 2).
    """
    nb, _, hgt, wdt, _ = out_maps.shape
    ne = te.shape[1]
    m = mx.model_matrix(te, field, species)

    ff = out_maps[:, 0, ..., 0]
    pd = out_maps[:, 1, ..., 0]
    r2s = out_maps[:, 1, ..., 1] * r2_sc
    pha_rho = out_maps[:, 2, ..., 0] * np.pi * 4.0
    phi = out_maps[:, 2, ..., 1] * fm_sc

    common = jnp.exp(1j * pha_rho.astype(jnp.complex64))
    rho_w = ((1.0 - ff) * pd * rho_sc).astype(jnp.complex64) * common
    rho_f = (ff * pd * rho_sc).astype(jnp.complex64) * common
    rho_mtx = _flatten_voxels(jnp.stack([rho_w, rho_f], axis=1))  # (nb, 2, nv)

    wp = _phasor(te, _xi(phi, r2s), +1.0)
    smtx = wp * (m @ rho_mtx)
    return _from_complex(smtx.reshape(nb, ne, hgt, wdt))


def synthesize_mag_phase(out_maps: jnp.ndarray, te: jnp.ndarray,
                         field: float = 1.5, r2_sc: float = R2_SC,
                         fm_sc: float = FM_SC, rho_sc: float = RHO_SC,
                         species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """Separate-magnitude/phase parameterization (reference
    `IDEAL_mag_phase`, wflib/IDEAL_model.py:456-509).

    out_maps rows: [(|W|, |F|, R2*, ·), (φ_W, φ_F, field-map, φ_bip)] with 4
    channels; phases scaled by 4π, bipolar term alternates per echo.
    Returns (nb, ne, H, W, 2).
    """
    nb, _, hgt, wdt, _ = out_maps.shape
    ne = te.shape[1]
    m = mx.model_matrix(te, field, species)

    mag_rho = out_maps[:, 0, ..., :2]  # (nb, H, W, 2)
    pha_rho = out_maps[:, 1, ..., :2] * 4.0 * np.pi
    rho = (mag_rho * rho_sc).astype(jnp.complex64) * jnp.exp(
        1j * pha_rho.astype(jnp.complex64))
    rho = jnp.moveaxis(rho, -1, 1)  # (nb, 2, H, W)
    rho_mtx = _flatten_voxels(rho)

    r2s = out_maps[:, 0, ..., 2] * r2_sc
    phi = out_maps[:, 1, ..., 2] * fm_sc
    extra = _bipolar_phase(out_maps[:, 1, ..., 3], ne, 4.0 * np.pi)

    wp = _phasor(te, _xi(phi, r2s), +1.0, extra)
    smtx = wp * (m @ rho_mtx)
    return _from_complex(smtx.reshape(nb, ne, hgt, wdt))


# ---------------------------------------------------------------------------
# Cycle operator: acquisitions + (φ, R2*) → reprojected acquisitions
# ---------------------------------------------------------------------------

def cycle(acqs: jnp.ndarray, param_maps: jnp.ndarray, te: jnp.ndarray,
          field: float = 1.5, r2_sc: float = R2_SC, fm_sc: float = FM_SC,
          species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """IDEAL cycle Â = W⁺ M M⁺ W⁻ A (reference `acq_to_acq`,
    wflib/IDEAL_model.py:142-200): demodulate the acquired signal by the
    candidate (φ, R2*) phasor, least-squares project onto span(M), and
    remodulate. ‖A − Â‖² is the unsupervised physics loss.

    acqs: (nb, ne, H, W, 2); param_maps: (nb, 1, H, W, 2) with channels
    (field-map, R2*) — or (nb, 1, H, W, 1) holding R2* only. te: (nb, ne, 1).
    """
    nb, ne, hgt, wdt, _ = acqs.shape
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)

    s = _to_complex(acqs)
    smtx = _flatten_voxels(s)  # (nb, ne, nv)

    if param_maps.shape[-1] > 1:
        phi = param_maps[:, 0, ..., 0] * fm_sc
        r2s = param_maps[:, 0, ..., 1] * r2_sc
    else:
        phi = jnp.zeros(param_maps.shape[0:1] + param_maps.shape[2:4],
                        param_maps.dtype)
        r2s = param_maps[:, 0, ..., 0] * r2_sc
    xi = _xi(phi, r2s)

    wm = _phasor(te, xi, -1.0)
    wp = _phasor(te, xi, +1.0)

    smtx_hat = wp * (m @ (m_pinv @ (wm * smtx)))
    return _from_complex(smtx_hat.reshape(nb, ne, hgt, wdt))


def cycle_full(acqs: jnp.ndarray, param_maps: jnp.ndarray, te: jnp.ndarray,
               field: float = 1.5, r2_sc: float = R2_SC, fm_sc: float = FM_SC,
               rho_sc: float = RHO_SC,
               species: SpeciesModel = WATER_FAT_7PEAK):
    """Cycle returning both the LS water/fat maps and the reprojected
    acquisitions — the (A2B_WF, A2B2A) pair the unsupervised trainer
    consumes (train-IDEAL-unsup.py:214-216 expects this two-output form of
    acq_to_acq). Shares all intermediates with `cycle`."""
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)

    smtx = _flatten_voxels(_to_complex(acqs))
    if param_maps.shape[-1] > 1:
        phi = param_maps[:, 0, ..., 0] * fm_sc
        r2s = param_maps[:, 0, ..., 1] * r2_sc
    else:
        phi = jnp.zeros(param_maps.shape[0:1] + param_maps.shape[2:4],
                        param_maps.dtype)
        r2s = param_maps[:, 0, ..., 0] * r2_sc
    xi = _xi(phi, r2s)
    wm = _phasor(te, xi, -1.0)
    wp = _phasor(te, xi, +1.0)

    mwms = m_pinv @ (wm * smtx)          # (nb, ns, nv) LS coefficients
    smtx_hat = wp * (m @ mwms)
    rho = _from_complex(mwms.reshape(nb, ns, hgt, wdt) / rho_sc)
    recon = _from_complex(smtx_hat.reshape(nb, ne, hgt, wdt))
    return rho, recon


# ---------------------------------------------------------------------------
# Map fitting: acquisitions + (φ, R2*) → water/fat maps
# ---------------------------------------------------------------------------

def fit_rho(acqs: jnp.ndarray, param_maps: jnp.ndarray, te: jnp.ndarray,
            field: float = 1.5, r2_sc: float = R2_SC, fm_sc: float = FM_SC,
            rho_sc: float = RHO_SC, phase_constraint: bool = False,
            acq_demod: bool = False,
            species: SpeciesModel = WATER_FAT_7PEAK):
    """Least-squares water/fat inversion ρ̂ = M⁺ W⁻ S / rho_sc (reference
    `get_rho`, wflib/IDEAL_model.py:527-624, MEBCRN layout).

    param_maps: (nb, ≥1, H, W, 2) with row 0 channels (field-map, R2*); an
    optional last row carries the bipolar phase. With `phase_constraint`,
    water and fat share a single phase estimated from the LS solution
    (wflib/IDEAL_model.py:584-592). Returns ρ maps (nb, ns, H, W, 2), plus
    the demodulated echoes (nb, ne, H, W, 2) when `acq_demod`.
    """
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)

    s = _to_complex(acqs)
    smtx = _flatten_voxels(s)

    phi = param_maps[:, 0, ..., 0] * fm_sc
    r2s = param_maps[:, 0, ..., 1] * r2_sc
    xi = _xi(phi, r2s)

    extra = None
    if param_maps.shape[1] > 3:
        extra = _bipolar_phase(param_maps[:, -1, ..., 0], ne, np.pi)
        extra = -extra
    wm = _phasor(te, xi, -1.0, extra)

    wms = wm * smtx
    mwms = m_pinv @ wms  # (nb, ns, nv)

    if phase_constraint:
        h_pinv = mx.phase_constraint_matrix(m, m_pinv)  # (nb, ns, ns)
        hmwms = h_pinv @ mwms
        mhmwms = jnp.sum(mwms * hmwms, axis=1, keepdims=True)  # (nb, 1, nv)
        rho_pha = 0.5 * jnp.angle(mhmwms)
        rho_pha = jnp.broadcast_to(rho_pha, (nb, ns, rho_pha.shape[-1]))
        real_mwms = jnp.real(mwms * jnp.exp(-1j * rho_pha.astype(jnp.complex64)))
        rho_mag = jnp.abs(h_pinv) @ real_mwms
        mwms = rho_mag.astype(jnp.complex64) * jnp.exp(
            1j * rho_pha.astype(jnp.complex64))

    rho_hat = mwms.reshape(nb, ns, hgt, wdt) / rho_sc
    res_rho = _from_complex(rho_hat)
    if acq_demod:
        res_demod = _from_complex(wms.reshape(nb, ne, hgt, wdt))
        return res_rho, res_demod
    return res_rho


class CSEMagResult(NamedTuple):
    """Outputs of the magnitude-domain LS fit (reference `CSE_mag`)."""
    rho: jnp.ndarray        # (nb, ns, H, W, 1) W/F magnitudes / rho_sc
    recon: jnp.ndarray      # (nb, ne, H, W, 1) reconstructed |S|
    demod: jnp.ndarray      # (nb, ne, H, W, 1) demodulated squared signal
    ls_coeffs: jnp.ndarray  # (nb, 3, H, W, 1) LS (a, b, c) / rho_sc²
    uncertainty: jnp.ndarray  # (nb, 1, H, W, 1) rank-1 ratio


def cse_mag_fit(acqs: jnp.ndarray, out_maps: jnp.ndarray, te: jnp.ndarray,
                field: float = 1.5, r2_sc: float = R2_SC,
                rho_sc: float = RHO_SC, r2s_nu: jnp.ndarray | None = None,
                species: SpeciesModel = WATER_FAT_7PEAK) -> CSEMagResult:
    """Magnitude-only water/fat LS fit (reference `CSE_mag`,
    wflib/IDEAL_model.py:314-401).

    Demodulates |S|² by exp(2·te·R2*), fits the 3-parameter quadratic model
    |S|² ≈ A·(a,b,c) per voxel, recovers rank-1 (|W|, |F|) via the
    closed-form 2×2 eigensolver, and reprojects the magnitude signal.

    acqs: magnitude echoes (nb, ne, H, W, 1); out_maps: (nb, 1, H, W, ≥1)
    with channel 0 = normalized R2*. r2s_nu optionally supplies the Rician
    mode parameter ν (normalized) used for the demodulated-signal output
    when training with Rician posteriors (reference `R2_prob` path).
    """
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    a, a_pinv = mx.mag_design_matrix(m)

    smtx = _flatten_voxels(acqs[..., 0])  # (nb, ne, nv)
    r2s = out_maps[:, 0, ..., 0] * r2_sc
    r2s_rav = r2s.reshape(nb, 1, -1)

    te_r = te.astype(jnp.float32)  # (nb, ne, 1)
    wm = jnp.exp(te_r * r2s_rav)   # demodulate the decay
    wp = jnp.exp(-te_r * r2s_rav)

    wms = jnp.square(wm * smtx)
    awms = a_pinv @ wms            # (nb, 3, nv)
    aawms = a @ awms               # (nb, ne, nv)
    # Double-where so the sqrt's untaken branch cannot poison gradients
    # (sqrt'(0) = inf would propagate NaN through a single where).
    aawms_safe = jnp.where(aawms > 1e-6, aawms, 1.0)
    smtx_hat = wp * jnp.where(aawms > 1e-6, jnp.sqrt(aawms_safe), 0.0)

    if r2s_nu is not None:
        nu = (r2s_nu[:, 0, ..., 0] * r2_sc).reshape(nb, 1, -1)
        wm_nu = jnp.exp(te_r * nu)
        demod = jnp.square(wm_nu * smtx)
    else:
        demod = wms

    rho_abc = jnp.swapaxes(awms, -1, -2)  # (nb, nv, 3)
    rho_hat, rho_unc = mx.eigenvals_2x2(rho_abc)

    def _img(x, k):
        return jnp.swapaxes(x, -1, -2).reshape(nb, k, hgt, wdt)[..., None]

    return CSEMagResult(
        rho=_img(rho_hat, ns).astype(jnp.float32) / rho_sc,
        recon=smtx_hat.reshape(nb, ne, hgt, wdt)[..., None],
        demod=demod.reshape(nb, ne, hgt, wdt)[..., None],
        ls_coeffs=_img(rho_abc, 3) / (rho_sc ** 2),
        uncertainty=_img(rho_unc, 1),
    )


def mag_cycle(acqs: jnp.ndarray, out_maps: jnp.ndarray, te: jnp.ndarray,
              **kw) -> jnp.ndarray:
    """Magnitude-domain cycle: acquisitions → LS fit → reconstructed |S|.
    The magnitude analogue of `cycle` (reference `acq_to_acq` n_ch==1 intent,
    realized through `CSE_mag`)."""
    return cse_mag_fit(acqs, out_maps, te, **kw).recon
