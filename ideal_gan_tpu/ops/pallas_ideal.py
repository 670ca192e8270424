"""Fused Pallas TPU kernels for the IDEAL physics operators.

The reference implements these ops as chains of TF linalg calls over
(nb, ne, nv) matrices (wflib/IDEAL_model.py:142-216, 220-311, 527-624);
XLA runs them as several HBM round-trips (phasor exp, complex matmuls,
remodulation). Per voxel the real work is tiny — ne ≤ 12 echoes × ns = 2
species of fused multiply-adds around a complex exponential — so the ops
are purely HBM-bandwidth-bound. These kernels do the whole pipeline in one
pass over VMEM tiles:

  fit:     ρ_s(v)  = Σ_e M⁺[s,e] · e^{−2πi·te_e·ξ(v)} · S_e(v)
  cycle:   Â_e(v)  = e^{+2πi·te_e·ξ(v)} · Σ_s M[e,s] · ρ_s(v)   (ρ from fit)
  forward: S_e(v)  = e^{+2πi·te_e·ξ(v)} · Σ_s M[e,s] · ρ_s(v)   (ρ given)

with ξ = φ + i·R2*/2π. Complex arithmetic is explicit re/im f32 pairs (the
physics must stay f32; Pallas TPU has no complex dtype). The echo and
species loops are unrolled at trace time (static ne, ns), so the kernel is
a straight line of VPU ops; the per-batch-row M / M⁺ / te scalars live in
SMEM.

Gradients: each op is a jax.custom_vjp whose backward re-runs the pure-jnp
reference (ideal_gan_tpu.physics.ops) under jax.vjp — exactly correct, and
the backward is itself one fused XLA computation.

Voxels are flattened and retiled to (rows, 128) lanes; row tiles are chosen
from the static shape (padding if needed), so 384², 192², and 192×128 all
map cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics import matrix as mx
from ..physics import ops as jops
from ..physics.constants import FM_SC, R2_SC, RHO_SC, SpeciesModel, WATER_FAT_7PEAK

_2PI = float(2.0 * np.pi)
LANES = 128


def _row_tile(rows: int) -> int:
    """Largest row-tile ≤ 512 that divides `rows` (multiple of 8)."""
    for cand in (512, 384, 256, 192, 144, 128, 96, 64, 48, 32, 24, 16, 8):
        if rows % cand == 0:
            return cand
    return 8  # caller pads to a multiple of 8


def _pad_rows(x: jnp.ndarray, rows: int, mult: int) -> tuple[jnp.ndarray, int]:
    """Pad the second-to-last axis of (..., rows, LANES) to a multiple."""
    rem = rows % mult
    if rem == 0:
        return x, rows
    pad = mult - rem
    widths = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, widths), rows + pad


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _demod_echo(te_e, phi, r2s, s_re_e, s_im_e):
    """y = e^{−2πi·te·ξ}·S for one echo: returns (re, im) tiles."""
    ang = -_2PI * te_e * phi
    grow = jnp.exp(te_e * r2s)
    c = jnp.cos(ang) * grow
    s = jnp.sin(ang) * grow
    return c * s_re_e - s * s_im_e, c * s_im_e + s * s_re_e


# ---------------------------------------------------------------------------
# Kernel bodies (ne, ns static; python loops unroll at trace time)
# ---------------------------------------------------------------------------

def _fit_kernel(ne, ns, fm_sc, r2_sc, rho_sc,
                te_ref, mp_ref, sre_ref, sim_ref, phi_ref, r2_ref,
                rre_ref, rim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc  # (TR, 128)
    r2s = r2_ref[0, 0] * r2_sc
    inv_rho = 1.0 / rho_sc
    for sp in range(ns):
        acc_re = jnp.zeros_like(phi)
        acc_im = jnp.zeros_like(phi)
        for e in range(ne):
            te_e = te_ref[b, e]
            yre, yim = _demod_echo(te_e, phi, r2s, sre_ref[0, e], sim_ref[0, e])
            mp_re = mp_ref[b, (sp * ne + e) * 2]
            mp_im = mp_ref[b, (sp * ne + e) * 2 + 1]
            acc_re += mp_re * yre - mp_im * yim
            acc_im += mp_re * yim + mp_im * yre
        rre_ref[0, sp] = acc_re * inv_rho
        rim_ref[0, sp] = acc_im * inv_rho


def _cycle_kernel(ne, ns, fm_sc, r2_sc, rho_sc,
                  te_ref, m_ref, mp_ref, sre_ref, sim_ref, phi_ref, r2_ref,
                  ore_ref, oim_ref, rre_ref, rim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc
    r2s = r2_ref[0, 0] * r2_sc
    rho_re = []
    rho_im = []
    for sp in range(ns):
        acc_re = jnp.zeros_like(phi)
        acc_im = jnp.zeros_like(phi)
        for e in range(ne):
            te_e = te_ref[b, e]
            yre, yim = _demod_echo(te_e, phi, r2s, sre_ref[0, e], sim_ref[0, e])
            mp_re = mp_ref[b, (sp * ne + e) * 2]
            mp_im = mp_ref[b, (sp * ne + e) * 2 + 1]
            acc_re += mp_re * yre - mp_im * yim
            acc_im += mp_re * yim + mp_im * yre
        rho_re.append(acc_re)
        rho_im.append(acc_im)
        rre_ref[0, sp] = acc_re * (1.0 / rho_sc)
        rim_ref[0, sp] = acc_im * (1.0 / rho_sc)
    for e in range(ne):
        te_e = te_ref[b, e]
        zre = jnp.zeros_like(phi)
        zim = jnp.zeros_like(phi)
        for sp in range(ns):
            m_re = m_ref[b, (e * ns + sp) * 2]
            m_im = m_ref[b, (e * ns + sp) * 2 + 1]
            zre += m_re * rho_re[sp] - m_im * rho_im[sp]
            zim += m_re * rho_im[sp] + m_im * rho_re[sp]
        ang = _2PI * te_e * phi
        decay = jnp.exp(-te_e * r2s)
        c = jnp.cos(ang) * decay
        s = jnp.sin(ang) * decay
        ore_ref[0, e] = c * zre - s * zim
        oim_ref[0, e] = c * zim + s * zre


def _forward_kernel(ne, ns, fm_sc, r2_sc, rho_sc,
                    te_ref, m_ref, rre_ref, rim_ref, phi_ref, r2_ref,
                    ore_ref, oim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc
    r2s = jnp.maximum(r2_ref[0, 0], 0.0) * r2_sc
    for e in range(ne):
        te_e = te_ref[b, e]
        zre = jnp.zeros_like(phi)
        zim = jnp.zeros_like(phi)
        for sp in range(ns):
            m_re = m_ref[b, (e * ns + sp) * 2]
            m_im = m_ref[b, (e * ns + sp) * 2 + 1]
            rr = rre_ref[0, sp] * rho_sc
            ri = rim_ref[0, sp] * rho_sc
            zre += m_re * rr - m_im * ri
            zim += m_re * ri + m_im * rr
        ang = _2PI * te_e * phi
        decay = jnp.exp(-te_e * r2s)
        c = jnp.cos(ang) * decay
        s = jnp.sin(ang) * decay
        ore_ref[0, e] = c * zre - s * zim
        oim_ref[0, e] = c * zim + s * zre


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _flatten_lanes(x: jnp.ndarray, nb: int, k: int) -> jnp.ndarray:
    """(nb, k, H, W) → (nb, k, rows, LANES)."""
    nv = x.shape[-2] * x.shape[-1]
    assert nv % LANES == 0, f"H*W={nv} must be a multiple of {LANES}"
    return x.reshape(nb, k, nv // LANES, LANES)


def _mat_scalars(m: jnp.ndarray) -> jnp.ndarray:
    """(nb, a, b) complex → (nb, a*b*2) f32 interleaved re/im for SMEM."""
    nb = m.shape[0]
    flat = m.reshape(nb, -1)
    return jnp.stack([jnp.real(flat), jnp.imag(flat)], axis=-1).reshape(
        nb, -1).astype(jnp.float32)


def _smem_spec(k: int):
    del k  # full array in SMEM; kernels index rows by pl.program_id(0)
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _vox_spec(k: int, tr: int):
    return pl.BlockSpec((1, k, tr, LANES), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)


def _prep_common(acqs, param_maps, te, field, species, fm_sc, r2_sc):
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)
    s_re = _flatten_lanes(acqs[..., 0], nb, ne)
    s_im = _flatten_lanes(acqs[..., 1], nb, ne)
    phi = _flatten_lanes(param_maps[:, 0:1, ..., 0], nb, 1)
    r2s = _flatten_lanes(param_maps[:, 0:1, ..., 1], nb, 1)
    te_flat = te.reshape(nb, ne).astype(jnp.float32)
    return nb, ne, ns, hgt, wdt, m, m_pinv, s_re, s_im, phi, r2s, te_flat


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fit_rho_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC,
                  fm_sc=FM_SC, rho_sc=RHO_SC,
                  species: SpeciesModel = WATER_FAT_7PEAK):
    """Fused map fitting ρ̂ = M⁺W⁻S/rho_sc (fast path of physics.fit_rho;
    reference get_rho, wflib/IDEAL_model.py:527-624). Single HBM pass.

    acqs (nb, ne, H, W, 2); param_maps (nb, ≥1, H, W, 2) row 0 = (φ, R2*);
    te (nb, ne, 1). Returns (nb, ns, H, W, 2).
    """
    (nb, ne, ns, hgt, wdt, _m, m_pinv, s_re, s_im, phi, r2s,
     te_flat) = _prep_common(acqs, param_maps, te, field, species, fm_sc, r2_sc)
    rows = s_re.shape[2]
    tr = _row_tile(rows)
    s_re, _ = _pad_rows(s_re, rows, tr)
    s_im, _ = _pad_rows(s_im, rows, tr)
    phi, _ = _pad_rows(phi, rows, tr)
    r2s, prows = _pad_rows(r2s, rows, tr)

    kernel = functools.partial(_fit_kernel, ne, ns, fm_sc, r2_sc, rho_sc)
    out_shape = [jax.ShapeDtypeStruct((nb, ns, prows, LANES), jnp.float32)] * 2
    rre, rim = pl.pallas_call(
        kernel,
        grid=(nb, prows // tr),
        in_specs=[
            _smem_spec(ne),
            _smem_spec(ns * ne * 2),
            _vox_spec(ne, tr), _vox_spec(ne, tr),
            _vox_spec(1, tr), _vox_spec(1, tr),
        ],
        out_specs=[_vox_spec(ns, tr), _vox_spec(ns, tr)],
        out_shape=out_shape,
        interpret=_interpret(),
    )(te_flat, _mat_scalars(m_pinv), s_re, s_im, phi, r2s)
    rre = rre[:, :, :rows].reshape(nb, ns, hgt, wdt)
    rim = rim[:, :, :rows].reshape(nb, ns, hgt, wdt)
    return jnp.stack([rre, rim], axis=-1)


def _fit_fwd(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc, species):
    out = fit_rho_fused(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                        species)
    return out, (acqs, param_maps, te)


def _fit_bwd(field, r2_sc, fm_sc, rho_sc, species, res, g):
    acqs, param_maps, te = res
    def ref(a, p):
        return jops.fit_rho(a, p, te, field, r2_sc, fm_sc, rho_sc,
                            species=species)
    _, vjp = jax.vjp(ref, acqs, param_maps)
    da, dp = vjp(g)
    return da, dp, jnp.zeros_like(te)


fit_rho_fused.defvjp(_fit_fwd, _fit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def cycle_full_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC,
                     fm_sc=FM_SC, rho_sc=RHO_SC,
                     species: SpeciesModel = WATER_FAT_7PEAK):
    """Fused IDEAL cycle producing both the LS water/fat maps and the
    reprojected acquisitions — the (A2B_WF, A2B2A) pair of the unsupervised
    physics loss (physics.cycle_full fast path; reference acq_to_acq,
    wflib/IDEAL_model.py:142-200). Single HBM pass."""
    (nb, ne, ns, hgt, wdt, m, m_pinv, s_re, s_im, phi, r2s,
     te_flat) = _prep_common(acqs, param_maps, te, field, species, fm_sc, r2_sc)
    rows = s_re.shape[2]
    tr = _row_tile(rows)
    s_re, _ = _pad_rows(s_re, rows, tr)
    s_im, _ = _pad_rows(s_im, rows, tr)
    phi, _ = _pad_rows(phi, rows, tr)
    r2s, prows = _pad_rows(r2s, rows, tr)

    kernel = functools.partial(_cycle_kernel, ne, ns, fm_sc, r2_sc, rho_sc)
    out_shape = [
        jax.ShapeDtypeStruct((nb, ne, prows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb, ne, prows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb, ns, prows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb, ns, prows, LANES), jnp.float32),
    ]
    ore, oim, rre, rim = pl.pallas_call(
        kernel,
        grid=(nb, prows // tr),
        in_specs=[
            _smem_spec(ne),
            _smem_spec(ne * ns * 2),
            _smem_spec(ns * ne * 2),
            _vox_spec(ne, tr), _vox_spec(ne, tr),
            _vox_spec(1, tr), _vox_spec(1, tr),
        ],
        out_specs=[_vox_spec(ne, tr), _vox_spec(ne, tr),
                   _vox_spec(ns, tr), _vox_spec(ns, tr)],
        out_shape=out_shape,
        interpret=_interpret(),
    )(te_flat, _mat_scalars(m), _mat_scalars(m_pinv), s_re, s_im, phi, r2s)
    ore = ore[:, :, :rows].reshape(nb, ne, hgt, wdt)
    oim = oim[:, :, :rows].reshape(nb, ne, hgt, wdt)
    rre = rre[:, :, :rows].reshape(nb, ns, hgt, wdt)
    rim = rim[:, :, :rows].reshape(nb, ns, hgt, wdt)
    return (jnp.stack([rre, rim], axis=-1), jnp.stack([ore, oim], axis=-1))


def _cycle_full_fwd(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                    species):
    out = cycle_full_fused(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                           species)
    return out, (acqs, param_maps, te)


def _cycle_full_bwd(field, r2_sc, fm_sc, rho_sc, species, res, g):
    acqs, param_maps, te = res
    def ref(a, p):
        return jops.cycle_full(a, p, te, field, r2_sc, fm_sc, rho_sc, species)
    _, vjp = jax.vjp(ref, acqs, param_maps)
    da, dp = vjp(g)
    return da, dp, jnp.zeros_like(te)


cycle_full_fused.defvjp(_cycle_full_fwd, _cycle_full_bwd)


def cycle_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC, fm_sc=FM_SC,
                species: SpeciesModel = WATER_FAT_7PEAK):
    """Fused IDEAL cycle Â = W⁺MM⁺W⁻A (physics.cycle fast path; reference
    acq_to_acq, wflib/IDEAL_model.py:142-200). Single HBM pass."""
    _, recon = cycle_full_fused(acqs, param_maps, te, field, r2_sc, fm_sc,
                                RHO_SC, species)
    return recon


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def synthesize_fused(out_maps, te, field=1.5, r2_sc=R2_SC, fm_sc=FM_SC,
                     rho_sc=RHO_SC,
                     species: SpeciesModel = WATER_FAT_7PEAK):
    """Fused forward synthesis S = W⁺Mρ (physics.synthesize fast path;
    reference IDEAL_model, wflib/IDEAL_model.py:220-299). out_maps
    (nb, 3, H, W, 2) rows [water, fat, (φ, R2*)]."""
    nb, nm, hgt, wdt, _ = out_maps.shape
    ne = te.shape[1]
    ns = species.n_species
    m = mx.model_matrix(te, field, species)

    rho_re = _flatten_lanes(out_maps[:, :ns, ..., 0], nb, ns)
    rho_im = _flatten_lanes(out_maps[:, :ns, ..., 1], nb, ns)
    phi = _flatten_lanes(out_maps[:, ns:ns + 1, ..., 0], nb, 1)
    r2s = _flatten_lanes(out_maps[:, ns:ns + 1, ..., 1], nb, 1)
    te_flat = te.reshape(nb, ne).astype(jnp.float32)

    rows = rho_re.shape[2]
    tr = _row_tile(rows)
    rho_re, _ = _pad_rows(rho_re, rows, tr)
    rho_im, _ = _pad_rows(rho_im, rows, tr)
    phi, _ = _pad_rows(phi, rows, tr)
    r2s, prows = _pad_rows(r2s, rows, tr)

    kernel = functools.partial(_forward_kernel, ne, ns, fm_sc, r2_sc, rho_sc)
    out_shape = [jax.ShapeDtypeStruct((nb, ne, prows, LANES), jnp.float32)] * 2
    ore, oim = pl.pallas_call(
        kernel,
        grid=(nb, prows // tr),
        in_specs=[
            _smem_spec(ne),
            _smem_spec(ne * ns * 2),
            _vox_spec(ns, tr), _vox_spec(ns, tr),
            _vox_spec(1, tr), _vox_spec(1, tr),
        ],
        out_specs=[_vox_spec(ne, tr), _vox_spec(ne, tr)],
        out_shape=out_shape,
        interpret=_interpret(),
    )(te_flat, _mat_scalars(m), rho_re, rho_im, phi, r2s)
    ore = ore[:, :, :rows].reshape(nb, ne, hgt, wdt)
    oim = oim[:, :, :rows].reshape(nb, ne, hgt, wdt)
    return jnp.stack([ore, oim], axis=-1)


def _synth_fwd(out_maps, te, field, r2_sc, fm_sc, rho_sc, species):
    out = synthesize_fused(out_maps, te, field, r2_sc, fm_sc, rho_sc, species)
    return out, (out_maps, te)


def _synth_bwd(field, r2_sc, fm_sc, rho_sc, species, res, g):
    out_maps, te = res
    def ref(om):
        return jops.synthesize(om, te, field, r2_sc, fm_sc, rho_sc, species)
    _, vjp = jax.vjp(ref, out_maps)
    (dm,) = vjp(g)
    return dm, jnp.zeros_like(te)


synthesize_fused.defvjp(_synth_fwd, _synth_bwd)
