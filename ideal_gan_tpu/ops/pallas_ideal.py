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
import logging

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
    """Row tile dividing `rows`, preferring ~96-128 rows (measured sweet
    spot on v5e: small tiles pipeline HBM↔VMEM best; 1152-row 384² maps
    hit 96)."""
    for cand in (96, 128, 64, 144, 192, 48, 256, 32, 24, 16, 8):
        if rows % cand == 0:
            return cand
    return 8  # caller pads to a multiple of 8


def _tile_rows(hgt: int, wdt: int, min_th: int) -> int:
    """H-tile for blocking the native (H, W) layout: the largest multiple
    of `min_th` (the dtype's physical sublane tile — 8 f32, 16 bf16) that
    divides H, at or under the ~12k-element VMEM row budget. Returns 0
    when H admits no such tile (caller takes the lane-flattening path)."""
    target = max(_row_tile(hgt * max(wdt // LANES, 1)) * LANES
                 // max(wdt, 1), min_th)
    if hgt % min_th:
        return 0
    # min_th itself always qualifies (it divides hgt and ≤ target), so a
    # valid tile exists whenever the guard above passes
    under = [d for d in range(min_th, hgt + 1, min_th)
             if hgt % d == 0 and d <= target]
    return max(under)


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


def _te_is_uniform(te) -> bool:
    """True when `te` is a concrete array with uniform echo spacing (the
    recurrence fast path). Traced values conservatively return False —
    callers inside jit can force the fast path with uniform_te=True."""
    try:
        t = np.asarray(te)
    except Exception:
        return False
    if t.ndim == 3:
        t = t[..., 0]
    d = np.diff(t, axis=-1)
    return bool(np.allclose(d, d[..., :1], rtol=0.0, atol=1e-9))


def _phasors(uniform, sign, ne, te_ref, b, phi, r2s):
    """Per-echo phasor components of e^{sign·2πi·te_e·ξ} as (c, s) tiles
    with the R2* factor folded in (sign=−1 demodulates and grows by
    e^{+te·R2*}; sign=+1 remodulates and decays).

    uniform=True uses the phasor recurrence W_e = W_{e−1}·d with
    d = e^{sign·2πi·Δte·ξ} — two transcendental evaluations total instead
    of one per echo (≈2× kernel speedup; the echo loop unrolls so the
    chain is straight-line FMAs). Valid only for uniformly spaced TE
    trains; callers gate on that.
    """
    if not uniform:
        for e in range(ne):
            te_e = te_ref[b, e]
            ang = sign * _2PI * te_e * phi
            g = jnp.exp(-sign * te_e * r2s)
            yield jnp.cos(ang) * g, jnp.sin(ang) * g
        return
    te1 = te_ref[b, 0]
    dte = te_ref[b, 1] - te_ref[b, 0]
    ang1 = sign * _2PI * te1 * phi
    g1 = jnp.exp(-sign * te1 * r2s)
    c = jnp.cos(ang1) * g1
    s = jnp.sin(ang1) * g1
    angd = sign * _2PI * dte * phi
    gd = jnp.exp(-sign * dte * r2s)
    dc = jnp.cos(angd) * gd
    ds = jnp.sin(angd) * gd
    for e in range(ne):
        yield c, s
        if e < ne - 1:
            c, s = c * dc - s * ds, c * ds + s * dc


# ---------------------------------------------------------------------------
# Kernel bodies (ne, ns static; python loops unroll at trace time)
# ---------------------------------------------------------------------------

def _fit_kernel(ne, ns, fm_sc, r2_sc, rho_sc, uniform,
                te_ref, mp_ref, sre_ref, sim_ref, phi_ref, r2_ref,
                rre_ref, rim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc  # (TR, 128)
    r2s = r2_ref[0, 0] * r2_sc
    inv_rho = 1.0 / rho_sc
    acc = [[jnp.zeros_like(phi), jnp.zeros_like(phi)] for _ in range(ns)]
    for e, (c, s) in enumerate(_phasors(uniform, -1.0, ne, te_ref, b, phi,
                                        r2s)):
        # echo tiles may arrive bf16 (bandwidth mode) — math stays f32
        sre = sre_ref[0, e].astype(jnp.float32)
        sim = sim_ref[0, e].astype(jnp.float32)
        yre = c * sre - s * sim
        yim = c * sim + s * sre
        for sp in range(ns):
            mp_re = mp_ref[b, (sp * ne + e) * 2]
            mp_im = mp_ref[b, (sp * ne + e) * 2 + 1]
            acc[sp][0] += mp_re * yre - mp_im * yim
            acc[sp][1] += mp_re * yim + mp_im * yre
    for sp in range(ns):
        # stores honour the out-ref dtype (f32 normally; bf16 in the
        # bandwidth-saving serving mode — math above is always f32)
        rre_ref[0, sp] = (acc[sp][0] * inv_rho).astype(rre_ref.dtype)
        rim_ref[0, sp] = (acc[sp][1] * inv_rho).astype(rim_ref.dtype)


def _cycle_kernel(ne, ns, fm_sc, r2_sc, rho_sc, uniform,
                  te_ref, m_ref, mp_ref, sre_ref, sim_ref, phi_ref, r2_ref,
                  ore_ref, oim_ref, rre_ref, rim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc
    r2s = r2_ref[0, 0] * r2_sc
    acc = [[jnp.zeros_like(phi), jnp.zeros_like(phi)] for _ in range(ns)]
    for e, (c, s) in enumerate(_phasors(uniform, -1.0, ne, te_ref, b, phi,
                                        r2s)):
        yre = c * sre_ref[0, e] - s * sim_ref[0, e]
        yim = c * sim_ref[0, e] + s * sre_ref[0, e]
        for sp in range(ns):
            mp_re = mp_ref[b, (sp * ne + e) * 2]
            mp_im = mp_ref[b, (sp * ne + e) * 2 + 1]
            acc[sp][0] += mp_re * yre - mp_im * yim
            acc[sp][1] += mp_re * yim + mp_im * yre
    for sp in range(ns):
        rre_ref[0, sp] = acc[sp][0] * (1.0 / rho_sc)
        rim_ref[0, sp] = acc[sp][1] * (1.0 / rho_sc)
    for e, (c, s) in enumerate(_phasors(uniform, +1.0, ne, te_ref, b, phi,
                                        r2s)):
        zre = jnp.zeros_like(phi)
        zim = jnp.zeros_like(phi)
        for sp in range(ns):
            m_re = m_ref[b, (e * ns + sp) * 2]
            m_im = m_ref[b, (e * ns + sp) * 2 + 1]
            zre += m_re * acc[sp][0] - m_im * acc[sp][1]
            zim += m_re * acc[sp][1] + m_im * acc[sp][0]
        ore_ref[0, e] = c * zre - s * zim
        oim_ref[0, e] = c * zim + s * zre


def _forward_kernel(ne, ns, fm_sc, r2_sc, rho_sc, uniform,
                    te_ref, m_ref, rre_ref, rim_ref, phi_ref, r2_ref,
                    ore_ref, oim_ref):
    b = pl.program_id(0)
    phi = phi_ref[0, 0] * fm_sc
    r2s = jnp.maximum(r2_ref[0, 0], 0.0) * r2_sc
    for e, (c, s) in enumerate(_phasors(uniform, +1.0, ne, te_ref, b, phi,
                                        r2s)):
        zre = jnp.zeros_like(phi)
        zim = jnp.zeros_like(phi)
        for sp in range(ns):
            m_re = m_ref[b, (e * ns + sp) * 2]
            m_im = m_ref[b, (e * ns + sp) * 2 + 1]
            rr = rre_ref[0, sp] * rho_sc
            ri = rim_ref[0, sp] * rho_sc
            zre += m_re * rr - m_im * ri
            zim += m_re * ri + m_im * rr
        ore_ref[0, e] = c * zre - s * zim
        oim_ref[0, e] = c * zim + s * zre


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

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


def _launch(kernel, smem_args, vox_inputs, out_ks):
    """Run an elementwise voxel kernel over (nb, k, H, W) planar inputs,
    partitionable along the batch axis under GSPMD.

    Every operand and result is batch-led and the kernels are
    batch-elementwise, so the whole launch is wrapped in
    `ops.partition.dp_partitioned`: inside a pjit'ed step with
    batch-sharded inputs each device runs the kernel on its local shard
    (zero collectives) instead of GSPMD's replicate-after-all-gather
    fallback for opaque pallas_calls. See partition.py for the design
    rule.
    """
    from .partition import dp_partitioned
    n_smem = len(smem_args)
    ks = tuple(k for _, k in vox_inputs)

    def impl(*arrs):
        vox = list(zip(arrs[n_smem:], ks))
        return tuple(_launch_body(kernel, arrs[:n_smem], vox, out_ks))

    arrays = tuple(smem_args) + tuple(x for x, _ in vox_inputs)
    wrapped = dp_partitioned(impl, (True,) * len(arrays),
                             (True,) * len(out_ks))
    return list(wrapped(*arrays))


def _launch_body(kernel, smem_args, vox_inputs, out_ks):
    """The actual pallas launch (see `_launch`): when W is a multiple of
    128 the grid blocks the native (H, W) tiling directly — flattening
    to (H·W/128, 128) physically relayouts the (8, 128) tiles (a full
    HBM copy). Otherwise inputs are flattened to lane rows and padded.
    Returns one (nb, k, H, W) array per out_ks.
    """
    nb, _, hgt, wdt = vox_inputs[0][0].shape
    smem_specs = [_smem_spec(0) for _ in smem_args]
    # bf16 inputs need 16-row blocks (the (16, 128) physical tile);
    # shapes that can't provide them are upcast to f32 up front — the
    # kernels upcast per-tile anyway, this just moves it ahead of the
    # layout decision so no path emits a fractional-tile bf16 block.
    any_bf16 = any(x.dtype == jnp.bfloat16 for x, _ in vox_inputs)
    min_th = 16 if any_bf16 else 8
    th = _tile_rows(hgt, wdt, min_th) if wdt % LANES == 0 else 0
    if not th and any_bf16:
        # loud, like fit_rho_planar's fallbacks: the caller asked for the
        # bandwidth-saving mode and is getting f32 performance
        logging.getLogger(__name__).warning(
            "pallas launch: bf16 inputs but shape (H=%d, W=%d) cannot "
            "block on the (16, 128) bf16 tile — upcasting to f32 "
            "(no bandwidth saving)", hgt, wdt)
        vox_inputs = [(x.astype(jnp.float32), k) for x, k in vox_inputs]
        th = _tile_rows(hgt, wdt, 8) if wdt % LANES == 0 else 0
    if th:

        def hw_spec(k):
            return pl.BlockSpec((1, k, th, wdt), lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=(nb, hgt // th),
            in_specs=smem_specs + [hw_spec(k) for _, k in vox_inputs],
            out_specs=[hw_spec(k) for k in out_ks],
            out_shape=[jax.ShapeDtypeStruct((nb, k, hgt, wdt), jnp.float32)
                       for k in out_ks],
            interpret=_interpret(),
        )(*smem_args, *[x for x, _ in vox_inputs])
        return outs

    rows = (hgt * wdt) // LANES
    tr = _row_tile(rows)
    flat = []
    for x, k in vox_inputs:
        xf = x.reshape(nb, k, rows, LANES)
        xf, prows = _pad_rows(xf, rows, tr)
        flat.append((xf, k))
    outs = pl.pallas_call(
        kernel,
        grid=(nb, prows // tr),
        in_specs=smem_specs + [_vox_spec(k, tr) for _, k in flat],
        out_specs=[_vox_spec(k, tr) for k in out_ks],
        out_shape=[jax.ShapeDtypeStruct((nb, k, prows, LANES), jnp.float32)
                   for k in out_ks],
        interpret=_interpret(),
    )(*smem_args, *[x for x, _ in flat])
    return [o[:, :, :rows].reshape(nb, k, hgt, wdt)
            for o, k in zip(outs, out_ks)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fit_rho_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC,
                  fm_sc=FM_SC, rho_sc=RHO_SC,
                  species: SpeciesModel = WATER_FAT_7PEAK,
                  uniform_te: bool | None = None):
    """Fused map fitting ρ̂ = M⁺W⁻S/rho_sc (fast path of physics.fit_rho;
    reference get_rho, wflib/IDEAL_model.py:527-624). Single HBM pass.

    acqs (nb, ne, H, W, 2); param_maps (nb, ≥1, H, W, 2) row 0 = (φ, R2*);
    te (nb, ne, 1). Returns (nb, ns, H, W, 2).
    """
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m_pinv = mx.pinv_normal(mx.model_matrix(te, field, species))
    te_flat = te.reshape(nb, ne).astype(jnp.float32)
    uniform = _te_is_uniform(te) if uniform_te is None else uniform_te
    kernel = functools.partial(_fit_kernel, ne, ns, fm_sc, r2_sc, rho_sc,
                               uniform)
    rre, rim = _launch(
        kernel, (te_flat, _mat_scalars(m_pinv)),
        [(acqs[..., 0], ne), (acqs[..., 1], ne),
         (param_maps[:, 0:1, ..., 0], 1), (param_maps[:, 0:1, ..., 1], 1)],
        [ns, ns])
    return jnp.stack([rre, rim], axis=-1)


def _fit_fwd(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc, species,
             uniform_te):
    out = fit_rho_fused(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                        species, uniform_te)
    return out, (acqs, param_maps, te)


def _fit_bwd(field, r2_sc, fm_sc, rho_sc, species, uniform_te, res, g):
    acqs, param_maps, te = res
    def ref(a, p):
        return jops.fit_rho(a, p, te, field, r2_sc, fm_sc, rho_sc,
                            species=species)
    _, vjp = jax.vjp(ref, acqs, param_maps)
    da, dp = vjp(g)
    return da, dp, jnp.zeros_like(te)


fit_rho_fused.defvjp(_fit_fwd, _fit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def cycle_full_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC,
                     fm_sc=FM_SC, rho_sc=RHO_SC,
                     species: SpeciesModel = WATER_FAT_7PEAK,
                     uniform_te: bool | None = None):
    """Fused IDEAL cycle producing both the LS water/fat maps and the
    reprojected acquisitions — the (A2B_WF, A2B2A) pair of the unsupervised
    physics loss (physics.cycle_full fast path; reference acq_to_acq,
    wflib/IDEAL_model.py:142-200). Single HBM pass."""
    nb, ne, hgt, wdt, _ = acqs.shape
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)
    te_flat = te.reshape(nb, ne).astype(jnp.float32)
    uniform = _te_is_uniform(te) if uniform_te is None else uniform_te
    kernel = functools.partial(_cycle_kernel, ne, ns, fm_sc, r2_sc, rho_sc,
                               uniform)
    ore, oim, rre, rim = _launch(
        kernel, (te_flat, _mat_scalars(m), _mat_scalars(m_pinv)),
        [(acqs[..., 0], ne), (acqs[..., 1], ne),
         (param_maps[:, 0:1, ..., 0], 1), (param_maps[:, 0:1, ..., 1], 1)],
        [ne, ne, ns, ns])
    return (jnp.stack([rre, rim], axis=-1), jnp.stack([ore, oim], axis=-1))


def _cycle_full_fwd(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                    species, uniform_te):
    out = cycle_full_fused(acqs, param_maps, te, field, r2_sc, fm_sc, rho_sc,
                           species, uniform_te)
    return out, (acqs, param_maps, te)


def _cycle_full_bwd(field, r2_sc, fm_sc, rho_sc, species, uniform_te, res,
                    g):
    acqs, param_maps, te = res
    def ref(a, p):
        return jops.cycle_full(a, p, te, field, r2_sc, fm_sc, rho_sc, species)
    _, vjp = jax.vjp(ref, acqs, param_maps)
    da, dp = vjp(g)
    return da, dp, jnp.zeros_like(te)


cycle_full_fused.defvjp(_cycle_full_fwd, _cycle_full_bwd)


def cycle_fused(acqs, param_maps, te, field=1.5, r2_sc=R2_SC, fm_sc=FM_SC,
                species: SpeciesModel = WATER_FAT_7PEAK,
                uniform_te: bool | None = None):
    """Fused IDEAL cycle Â = W⁺MM⁺W⁻A (physics.cycle fast path; reference
    acq_to_acq, wflib/IDEAL_model.py:142-200). Single HBM pass."""
    _, recon = cycle_full_fused(acqs, param_maps, te, field, r2_sc, fm_sc,
                                RHO_SC, species, uniform_te)
    return recon


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def synthesize_fused(out_maps, te, field=1.5, r2_sc=R2_SC, fm_sc=FM_SC,
                     rho_sc=RHO_SC,
                     species: SpeciesModel = WATER_FAT_7PEAK,
                     uniform_te: bool | None = None):
    """Fused forward synthesis S = W⁺Mρ (physics.synthesize fast path;
    reference IDEAL_model, wflib/IDEAL_model.py:220-299). out_maps
    (nb, 3, H, W, 2) rows [water, fat, (φ, R2*)]."""
    nb, nm, hgt, wdt, _ = out_maps.shape
    ne = te.shape[1]
    ns = species.n_species
    m = mx.model_matrix(te, field, species)
    te_flat = te.reshape(nb, ne).astype(jnp.float32)
    uniform = _te_is_uniform(te) if uniform_te is None else uniform_te
    kernel = functools.partial(_forward_kernel, ne, ns, fm_sc, r2_sc, rho_sc,
                               uniform)
    ore, oim = _launch(
        kernel, (te_flat, _mat_scalars(m)),
        [(out_maps[:, :ns, ..., 0], ns), (out_maps[:, :ns, ..., 1], ns),
         (out_maps[:, ns:ns + 1, ..., 0], 1),
         (out_maps[:, ns:ns + 1, ..., 1], 1)],
        [ne, ne])
    return jnp.stack([ore, oim], axis=-1)


def _synth_fwd(out_maps, te, field, r2_sc, fm_sc, rho_sc, species,
               uniform_te):
    out = synthesize_fused(out_maps, te, field, r2_sc, fm_sc, rho_sc,
                           species, uniform_te)
    return out, (out_maps, te)


def _synth_bwd(field, r2_sc, fm_sc, rho_sc, species, uniform_te, res, g):
    out_maps, te = res
    def ref(om):
        return jops.synthesize(om, te, field, r2_sc, fm_sc, rho_sc, species)
    _, vjp = jax.vjp(ref, out_maps)
    (dm,) = vjp(g)
    return dm, jnp.zeros_like(te)


synthesize_fused.defvjp(_synth_fwd, _synth_bwd)


def precompute_fit_matrices(te, field=1.5,
                            species: SpeciesModel = WATER_FAT_7PEAK):
    """Precompute the SMEM operands of the fitting kernel for a TE train
    (serving pipelines reuse one protocol across thousands of batches; the
    tiny complex M⁺ build otherwise dominates per-call overhead)."""
    m = mx.model_matrix(te, field, species)
    m_pinv = mx.pinv_normal(m)
    nb, ne = te.shape[0], te.shape[1]
    return (_mat_scalars(m_pinv), te.reshape(nb, ne).astype(jnp.float32))


def fit_rho_planar(s_re, s_im, phi, r2s, te, field=1.5, r2_sc=R2_SC,
                   fm_sc=FM_SC, rho_sc=RHO_SC,
                   species: SpeciesModel = WATER_FAT_7PEAK,
                   uniform_te: bool | None = None,
                   precomputed=None, out_dtype=jnp.float32):
    """Maximum-throughput map fitting on planar buffers.

    The MEBCRN channel-last layout costs a full HBM round-trip to split
    re/im around the kernel (measured ≈40 % of fit time at 384²). A
    production inference pipeline converts once at ingest and keeps data
    planar; this entry point consumes that layout directly:

      s_re, s_im : (nb, ne, H, W) float32 — or bfloat16 for the
                   bandwidth-saving serving mode (echo bytes halve; the
                   kernel upcasts each tile and all math stays f32)
      phi, r2s   : (nb, H, W) normalized field-map / R2*
      out_dtype  : jnp.float32 (default) or jnp.bfloat16 — bf16 halves
                   the ρ output bytes of the bandwidth-bound kernel; the
                   accumulation stays f32 and only the final store
                   narrows. PDFF from bf16 ρ deviates ≲0.3 % (the ratio
                   cancels most of the rounding); callers gate on their
                   own accuracy envelope (bench.py re-checks every run).

    Returns (rho_re, rho_im), each (nb, ns, H, W) in `out_dtype`. Same
    kernel as `fit_rho_fused`; only the layout shims differ. Forward-only
    (no VJP) — training paths use the MEBCRN entry points.
    """
    nb, ne, hgt, wdt = s_re.shape
    ns = species.n_species
    if precomputed is None:
        precomputed = precompute_fit_matrices(te, field, species)
    mp_scalars, te_flat = precomputed
    uniform = _te_is_uniform(te) if uniform_te is None else uniform_te

    bf16_in = s_re.dtype == jnp.bfloat16
    if bf16_in and (wdt % LANES != 0 or hgt % 16 != 0):
        # bf16 native tiling is (16, 128); shapes that can't block on it
        # fall back to f32 inputs. Loud: the caller asked for the 1.18×
        # bandwidth-saving mode and is getting f32 performance.
        logging.getLogger(__name__).warning(
            "fit_rho_planar: bf16 echo mode requested but shape "
            "(H=%d, W=%d) cannot block on the (16, 128) bf16 tile — "
            "upcasting to f32 (no bandwidth saving)", hgt, wdt)
        s_re, s_im = s_re.astype(jnp.float32), s_im.astype(jnp.float32)
        bf16_in = False
    bf16_out = out_dtype == jnp.bfloat16
    if bf16_out and (wdt % LANES != 0 or hgt % 16 != 0):
        # same (16, 128) tiling constraint on the output side — loud
        # fallback to f32 stores rather than a silent slow path.
        logging.getLogger(__name__).warning(
            "fit_rho_planar: bf16 output requested but shape "
            "(H=%d, W=%d) cannot block on the (16, 128) bf16 tile — "
            "storing f32 (no bandwidth saving)", hgt, wdt)
        out_dtype, bf16_out = jnp.float32, False

    phi = phi[:, None]
    r2s = r2s[:, None]
    kernel = functools.partial(_fit_kernel, ne, ns, fm_sc, r2_sc, rho_sc,
                               uniform)
    # Pick the H-tile for the native-(H, W) path: block sublane counts
    # must be whole MULTIPLES of the dtype's physical tile (8 rows f32,
    # 16 rows bf16 — a 24-row bf16 block is 1.5 tiles and does not lower
    # on TPU) and must divide H; take the largest such divisor at or
    # under the VMEM row budget. If H has none (e.g. H=12 f32), the
    # native path can't tile it — use the lane-flattening fallback,
    # which relayouts+pads and is correct for any shape.
    min_th = 16 if (bf16_in or bf16_out) else 8
    th = _tile_rows(hgt, wdt, min_th)
    if wdt % LANES == 0 and th:
        # Block straight over (H, W): flattening a (H, W) f32 array to
        # (H·W/128, 128) physically relayouts the (8, 128) tiling (a full
        # HBM copy, measured ≈40 % of fit time) — blocking the native
        # layout avoids it.

        def hw_spec(k):
            return pl.BlockSpec((1, k, th, wdt), lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)

        out_shape = [jax.ShapeDtypeStruct((nb, ns, hgt, wdt),
                                          out_dtype)] * 2
        return pl.pallas_call(
            kernel,
            grid=(nb, hgt // th),
            in_specs=[_smem_spec(ne), _smem_spec(ns * ne * 2),
                      hw_spec(ne), hw_spec(ne), hw_spec(1), hw_spec(1)],
            out_specs=[hw_spec(ns), hw_spec(ns)],
            out_shape=out_shape,
            interpret=_interpret(),
        )(te_flat, mp_scalars, s_re, s_im, phi, r2s)

    # Generic fallback: flatten to lanes (relayout) + pad. Unreachable
    # with bf16 in/out given the (16, 128) guards above, but if a future
    # edit re-opens a route here, degrade loudly to f32, never silently.
    if bf16_out:
        logging.getLogger(__name__).warning(
            "fit_rho_planar: bf16 output requested but shape (H=%d, W=%d) "
            "reached the lane-flattening fallback — storing f32 "
            "(no bandwidth saving)", hgt, wdt)
        out_dtype = jnp.float32
    if bf16_in:
        logging.getLogger(__name__).warning(
            "fit_rho_planar: bf16 echo mode reached the lane-flattening "
            "fallback for shape (H=%d, W=%d) — upcasting to f32 "
            "(no bandwidth saving)", hgt, wdt)
        s_re, s_im = s_re.astype(jnp.float32), s_im.astype(jnp.float32)
    s_re = s_re.reshape(nb, ne, -1, LANES)
    s_im = s_im.reshape(nb, ne, -1, LANES)
    phi = phi.reshape(nb, 1, -1, LANES)
    r2s = r2s.reshape(nb, 1, -1, LANES)
    rows = s_re.shape[2]
    tr = _row_tile(rows)
    s_re, _ = _pad_rows(s_re, rows, tr)
    s_im, _ = _pad_rows(s_im, rows, tr)
    phi, _ = _pad_rows(phi, rows, tr)
    r2s, prows = _pad_rows(r2s, rows, tr)
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
    )(te_flat, mp_scalars, s_re, s_im, phi, r2s)
    rre = rre[:, :, :rows].reshape(nb, ns, hgt, wdt)
    rim = rim[:, :, :rows].reshape(nb, ns, hgt, wdt)
    return rre, rim


def _mag_fit_kernel(ne, r2_sc, rho_sc, uniform,
                    te_ref, a_ref, ap_ref, s_ref, r2_ref,
                    rho_ref, rec_ref, ls_ref, unc_ref):
    """Magnitude-domain LS fit (reference CSE_mag,
    wflib/IDEAL_model.py:314-401): demodulate |S|² by e^{2·te·R2*}, fit the
    3-parameter quadratic model through A⁺, rank-1 (|W|, |F|) via the
    closed-form 2×2 eigensolver, reproject |Ŝ|."""
    b = pl.program_id(0)
    r2s = r2_ref[0, 0] * r2_sc
    if uniform:
        te1 = te_ref[b, 0]
        dte = te_ref[b, 1] - te_ref[b, 0]
        w = jnp.exp(te1 * r2s)
        wd = jnp.exp(dte * r2s)
    # LS coefficients (a, b, c) per voxel.
    acc = [jnp.zeros_like(r2s) for _ in range(3)]
    ws = []
    for e in range(ne):
        if uniform:
            w_e = w
            if e < ne - 1:
                w = w * wd
        else:
            w_e = jnp.exp(te_ref[b, e] * r2s)
        ws.append(w_e)
        wms = jnp.square(w_e * s_ref[0, e])
        for k in range(3):
            acc[k] += ap_ref[b, k * ne + e] * wms
    for k in range(3):
        ls_ref[0, k] = acc[k] * (1.0 / (rho_sc * rho_sc))
    # Reprojection: |Ŝ|_e = sqrt(max(A·(a,b,c), 0)) / w_e (masked).
    for e in range(ne):
        aawms = (a_ref[b, e * 3] * acc[0] + a_ref[b, e * 3 + 1] * acc[1]
                 + a_ref[b, e * 3 + 2] * acc[2])
        pos = aawms > 1e-6
        safe = jnp.where(pos, aawms, 1.0)
        rec_ref[0, e] = jnp.where(pos, jnp.sqrt(safe), 0.0) / ws[e]
    # Closed-form 2×2 eigensolver (matrix.eigenvals_2x2 math).
    a_c, b_c, c_c = acc
    adiff_half = 0.5 * (a_c - c_c)
    b_half = 0.5 * b_c
    delta = jnp.sqrt(adiff_half * adiff_half + b_half * b_half + 1e-12)
    lam_max = 0.5 * (a_c + c_c) + delta
    lam_min = 0.5 * (a_c + c_c) - delta
    lam_max_pos = jnp.maximum(lam_max, 0.0)
    lam_min_pos = jnp.maximum(lam_min, 0.0)
    vx = b_half
    vy = lam_max - a_c
    norm = jnp.sqrt(vx * vx + vy * vy + 1e-12)
    vx = jnp.where(norm > 0, vx / norm, 0.0)
    vy = jnp.where(norm > 0, vy / norm, 0.0)
    lam_safe = jnp.where(lam_max_pos > 0, lam_max_pos, 1.0)
    scale = jnp.where(lam_max_pos > 0, jnp.sqrt(lam_safe), 0.0)
    rho_ref[0, 0] = scale * vx * (1.0 / rho_sc)
    rho_ref[0, 1] = scale * vy * (1.0 / rho_sc)
    lam_div = jnp.where(lam_max_pos > 0, lam_max_pos, 1.0)
    unc_ref[0, 0] = jnp.where(lam_max_pos > 0, lam_min_pos / lam_div, 0.0)


def cse_mag_fused(acqs, out_maps, te, field=1.5, r2_sc=R2_SC,
                  rho_sc=RHO_SC, species: SpeciesModel = WATER_FAT_7PEAK,
                  uniform_te: bool | None = None):
    """Fused magnitude-domain fit (physics.cse_mag_fit fast path;
    reference CSE_mag). Forward-only (the training path differentiates the
    jnp reference). acqs (nb, ne, H, W, 1) magnitudes; out_maps
    (nb, 1, H, W, ≥1) with channel 0 = normalized R2*. Returns
    (rho (nb,2,H,W,1), recon (nb,ne,H,W,1), ls (nb,3,H,W,1),
    unc (nb,1,H,W,1))."""
    nb, ne, hgt, wdt, _ = acqs.shape
    m = mx.model_matrix(te, field, species)
    a, a_pinv = mx.mag_design_matrix(m)
    te_flat = te.reshape(nb, ne).astype(jnp.float32)
    uniform = _te_is_uniform(te) if uniform_te is None else uniform_te
    kernel = functools.partial(_mag_fit_kernel, ne, r2_sc, rho_sc, uniform)
    rho, rec, ls, unc = _launch(
        kernel,
        (te_flat, a.reshape(nb, -1), a_pinv.reshape(nb, -1)),
        [(acqs[..., 0], ne), (out_maps[:, 0:1, ..., 0], 1)],
        [2, ne, 3, 1])
    return (rho[..., None], rec[..., None], ls[..., None], unc[..., None])
