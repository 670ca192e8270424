"""Modeling matrices for the IDEAL signal model.

Capability parity with the reference matrix builders (wflib/IDEAL_model.py:
48-97 `gen_M`/`gen_A`), redesigned for TPU: the matrices are tiny
(n_echoes ≤ 12 × n_species ≤ 5) and shared across all voxels of a batch row,
so instead of complex QR (which the reference uses and which lowers poorly on
TPU) we build pseudo-inverses from Hermitian normal equations with
closed-form 2×2 / 3×3 inverses — exact for full-rank matrices, fully
differentiable, and trivially fusable into the Pallas fitting kernel.

All functions are batched over the leading axis (one matrix per batch row,
since TE trains can differ per row) and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import SpeciesModel, WATER_FAT_7PEAK


def _inv_2x2(a: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 2×2 matrices (..., 2, 2), any dtype."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv = jnp.stack(
        [
            jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
            jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def _inv_3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of batched 3×3 matrices."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def small_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched small square matrices, dispatching on static size.

    2×2 and 3×3 use closed forms (TPU-friendly, no LU); larger sizes fall
    back to jnp.linalg.inv.
    """
    n = a.shape[-1]
    if n == 1:
        return 1.0 / a
    if n == 2:
        return _inv_2x2(a)
    if n == 3:
        return _inv_3x3(a)
    return jnp.linalg.inv(a)


def pinv_normal(m: jnp.ndarray) -> jnp.ndarray:
    """Left pseudo-inverse via normal equations: (MᴴM)⁻¹Mᴴ.

    Exact for full-column-rank M; used in place of the reference's complex
    QR pinv (wflib/IDEAL_model.py:62-63). m: (..., ne, ns) → (..., ns, ne).
    """
    mh = jnp.conjugate(jnp.swapaxes(m, -1, -2))
    gram = mh @ m
    return small_inv(gram) @ mh


def model_matrix(te: jnp.ndarray, field: float = 1.5,
                 species: SpeciesModel = WATER_FAT_7PEAK) -> jnp.ndarray:
    """Chemical-shift modeling matrix M, shape (nb, ne, ns) complex64.

    M[e, s] = Σ_p exp(2πi·te_e·(f_p + i·d_p/2π)) · A[p, s], where f_p are the
    peak frequencies at `field` and d_p the optional per-peak decay
    (wflib/IDEAL_model.py:54; falib/FA_model.py:40).

    te: (nb, ne, 1) or (nb, ne) float, seconds.
    """
    if te.ndim == 3:
        te = te[..., 0]
    te_c = te.astype(jnp.complex64)[..., None]  # (nb, ne, 1)
    freqs = jnp.asarray(species.freqs_hz(field), jnp.complex64)  # (np,)
    decay = species.r2_peak_vec()
    if decay is not None:
        freqs = freqs + 1j * jnp.asarray(decay, jnp.float32) / (2.0 * np.pi)
    phase = 2j * np.pi * te_c * freqs[None, None, :]  # (nb, ne, np)
    amps = jnp.asarray(species.amps_matrix(), jnp.complex64)  # (np, ns)
    return jnp.exp(phase) @ amps  # (nb, ne, ns)


def null_projector(m: jnp.ndarray, m_pinv: jnp.ndarray) -> jnp.ndarray:
    """P0 = I − M·M⁺, the projector onto the orthogonal complement of
    span(M), Hermitian-symmetrized as in wflib/IDEAL_model.py:58-59."""
    ne = m.shape[-2]
    p0 = jnp.eye(ne, dtype=m.dtype) - m @ m_pinv
    return 0.5 * (p0 + jnp.conjugate(jnp.swapaxes(p0, -1, -2)))


def phase_constraint_matrix(m: jnp.ndarray, m_pinv: jnp.ndarray) -> jnp.ndarray:
    """H⁺ = pinv(Re(M⁺M)) used by the shared-phase constraint branch of
    map fitting (wflib/IDEAL_model.py:64-68). For full-rank M this is
    numerically ≈ identity; computed exactly for parity. Returns complex64
    (ns, ns) batched."""
    h = jnp.real(m_pinv @ m)
    h_pinv = small_inv(0.5 * (h + jnp.swapaxes(h, -1, -2)))
    return h_pinv.astype(m.dtype)


def mag_design_matrix(m: jnp.ndarray, gen_ata_pinv: bool = False):
    """Design matrix for magnitude-only fitting (wflib/IDEAL_model.py:80-97).

    A = [|M_w|, Re(M_f), |M_f|²] — columns built from the water column
    magnitude, fat column real part, and fat column squared magnitude of M.
    Returns (A, A⁺[, (AᵀA)⁻¹]); all real float32, A: (nb, ne, 3).
    """
    m_abs = jnp.abs(m)
    m_real = jnp.real(m)
    a = jnp.concatenate(
        [m_abs[..., :1], m_real[..., 1:], jnp.square(m_abs[..., 1:])], axis=-1
    ).astype(jnp.float32)
    at = jnp.swapaxes(a, -1, -2)
    gram_inv = small_inv(at @ a)
    a_pinv = gram_inv @ at
    if gen_ata_pinv:
        return a, a_pinv, gram_inv
    return a, a_pinv


def eigenvals_2x2(x: jnp.ndarray, eps: float = 1e-12):
    """Closed-form eigendecomposition of per-voxel symmetric 2×2 matrices
    [[a, b/2], [b/2, c]] packed as (..., 3) = (a, b, c), returning the
    rank-1 (water, fat) magnitude estimate and a rank-1 quality ratio
    (wflib/IDEAL_model.py:100-138).

    Returns (xy_est (..., 2), rank1_ratio (..., 1)).
    """
    a = x[..., :1]
    b = x[..., 1:2]
    c = x[..., 2:]
    adiff_half = 0.5 * (a - c)
    b_half = 0.5 * b
    delta = jnp.sqrt(adiff_half * adiff_half + b_half * b_half + eps)
    lam_max = 0.5 * (a + c) + delta
    lam_min = 0.5 * (a + c) - delta
    lam_max_pos = jnp.maximum(lam_max, 0.0)
    lam_min_pos = jnp.maximum(lam_min, 0.0)
    vx = b_half
    vy = lam_max - a
    norm = jnp.sqrt(vx * vx + vy * vy + eps)
    vx = jnp.where(norm > 0, vx / norm, 0.0)
    vy = jnp.where(norm > 0, vy / norm, 0.0)
    v_max = jnp.concatenate([vx, vy], axis=-1)
    # Double-where keeps sqrt'(0)=inf out of the gradient on masked voxels.
    lam_safe = jnp.where(lam_max_pos > 0, lam_max_pos, 1.0)
    scale = jnp.where(lam_max_pos > 0, jnp.sqrt(lam_safe), 0.0)
    xy_est = scale * v_max
    lam_div = jnp.where(lam_max_pos > 0, lam_max_pos, 1.0)
    rank1_ratio = jnp.where(lam_max_pos > 0, lam_min_pos / lam_div, 0.0)
    return xy_est, rank1_ratio
