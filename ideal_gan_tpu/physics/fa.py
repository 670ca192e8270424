"""Fatty-acid (9-peak, 5-species) model operators (rebuild of
falib/FA_model.py).

The FA variant shares the core machinery (`model_matrix` with the
FATTY_ACID_9PEAK species and its per-peak decay) and differs in three
behaviors preserved here:
- the legacy channel-interleaved 4-D layout (re/im per species),
- R2* forced to zero inside the cycle and forward operators
  (falib/FA_model.py:87,161 — only the field map demodulates), and
- the species count ns=5 (water/fat/ndb/nmidb/cl).

Divergence, documented: the reference's legacy `acq_to_acq`/`IDEAL_model`
reshape (nv, ns) buffers in a way that is only shape-consistent for ns=2 —
left over from the water/fat version (falib/FA_model.py:83,157). Here the
layouts are handled correctly for any ns via the shared MEBCRN core.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import FATTY_ACID_9PEAK, FM_SC, R2_SC, RHO_SC
from . import ops as core

NS = FATTY_ACID_9PEAK.n_species


def _acqs_to_mebcrn(a: jnp.ndarray) -> jnp.ndarray:
    nb, h, w, ch = a.shape
    x = a.reshape(nb, h, w, ch // 2, 2)
    return jnp.moveaxis(x, 3, 1)


def _mebcrn_to_legacy(x: jnp.ndarray) -> jnp.ndarray:
    nb, k, h, w, _ = x.shape
    return jnp.moveaxis(x, 1, 3).reshape(nb, h, w, 2 * k)


def _maps_rows(param_maps: jnp.ndarray) -> jnp.ndarray:
    """Legacy (nb, H, W, [R2*, FM]) → MEBCRN row (nb, 1, H, W, [FM, R2*])
    with R2* zeroed (the FA quirk)."""
    fm = param_maps[..., 1:]
    return jnp.concatenate([fm, jnp.zeros_like(fm)], axis=-1)[:, None]


def fa_cycle(acqs: jnp.ndarray, param_maps: jnp.ndarray,
             te: jnp.ndarray, field: float = 1.5):
    """(ρ̂, Â) for legacy-layout acquisitions under the FA model
    (falib/FA_model.py:59-127): field-map-only demodulation, 5-species LS
    projection. acqs (nb, H, W, 2·ne); param_maps (nb, H, W, 2) = (R2*,FM);
    te (nb, ne, 1). Returns legacy (nb, H, W, 2·ns), (nb, H, W, 2·ne)."""
    a_meb = _acqs_to_mebcrn(acqs)
    rho, recon = core.cycle_full(a_meb, _maps_rows(param_maps), te,
                                 field=field, species=FATTY_ACID_9PEAK)
    return _mebcrn_to_legacy(rho), _mebcrn_to_legacy(recon)


def fa_forward(out_maps: jnp.ndarray, te: jnp.ndarray, field: float = 1.5):
    """Legacy forward synthesis (falib/FA_model.py:130-185): out_maps
    (nb, H, W, 2·ns + 2) = interleaved species re/im + (R2*, FM), with R2*
    ignored. Returns legacy acquisitions (nb, H, W, 2·ne)."""
    nb, h, w, ch = out_maps.shape
    rho_leg = out_maps[..., :2 * NS]
    params = out_maps[..., 2 * NS:]
    rho = _acqs_to_mebcrn(rho_leg)  # (nb, ns, H, W, 2)
    fm = params[..., 1]
    row = jnp.stack([fm, jnp.zeros_like(fm)], -1)[:, None]
    maps = jnp.concatenate([rho, row], axis=1)
    acqs = core.synthesize(maps, te, field=field, species=FATTY_ACID_9PEAK)
    return _mebcrn_to_legacy(acqs)


def fa_get_rho(acqs: jnp.ndarray, param_maps: jnp.ndarray,
               te: jnp.ndarray, field: float = 1.5) -> jnp.ndarray:
    """MEBCRN-layout FA map inversion (falib/FA_model.py:188-228):
    acqs (nb, ne, H, W, 2); param_maps (nb, H, W, [FM, R2*]) — this
    variant *does* use R2*. Returns (nb, ns, H, W, 2)."""
    row = param_maps[:, None]
    return core.fit_rho(acqs, row, te, field=field,
                        species=FATTY_ACID_9PEAK)
