"""MEBCRN ↔ legacy layout converters.

The framework's canonical tensor layout is MEBCRN — acquisitions
(batch, n_echoes, H, W, 2[re, im]) and maps (batch, n_maps, H, W, 2) — with
map rows [water, fat, (field-map, R2*)] (SURVEY.md §1). The legacy 4-D
channel-interleaved layout (batch, H, W, 2·ne) survives in older models;
these converters preserve parity with the reference (data.py:262-329).

Pure jnp; jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def acqs_from_mebcrn(a: jnp.ndarray) -> jnp.ndarray:
    """(nb, ne, H, W, 2) → legacy (nb, H, W, 2·ne) with channels
    interleaved [re1, im1, re2, im2, ...] (reference `A_from_MEBCRN`,
    data.py:262-276)."""
    nb, ne, hgt, wdt, _ = a.shape
    x = jnp.moveaxis(a, 1, 3)  # (nb, H, W, ne, 2)
    return x.reshape(nb, hgt, wdt, 2 * ne)


def acqs_to_mebcrn(a: jnp.ndarray) -> jnp.ndarray:
    """Legacy (nb, H, W, 2·ne) interleaved → (nb, ne, H, W, 2)."""
    nb, hgt, wdt, ch = a.shape
    x = a.reshape(nb, hgt, wdt, ch // 2, 2)
    return jnp.moveaxis(x, 3, 1)


def maps_from_mebcrn(b: jnp.ndarray, mag_and_phase: bool = False,
                     c_pha: float = 3.0) -> jnp.ndarray:
    """MEBCRN maps → legacy (nb, H, W, 6) = [Wr, Wi, Fr, Fi, R2*, FM]
    (reference `B_from_MEBCRN`, data.py:279-294).

    With `mag_and_phase`, rows are the [(FF,·),(PD,R2*),(pha,FM)]
    parameterization and water/fat are rebuilt from magnitude and the
    common phase scaled by c_pha·π.
    """
    if mag_and_phase:
        pha = c_pha * b[:, 1, :, :, 1:2] * np.pi
        w_r = b[:, 0, :, :, :1] * jnp.cos(pha)
        w_i = b[:, 0, :, :, :1] * jnp.sin(pha)
        f_r = b[:, 0, :, :, 1:2] * jnp.cos(pha)
        f_i = b[:, 0, :, :, 1:2] * jnp.sin(pha)
        r2 = b[:, 0, :, :, 2:]
        fm = b[:, 1, :, :, 2:]
        return jnp.concatenate([w_r, w_i, f_r, f_i, r2, fm], axis=-1)
    w = b[:, 0]
    f = b[:, 1]
    pm = b[:, 2]
    return jnp.concatenate([w, f, pm[..., 1:], pm[..., :1]], axis=-1)


def maps_to_mebcrn(b: jnp.ndarray, mode: str = "All") -> jnp.ndarray:
    """Legacy maps → MEBCRN (reference `B_to_MEBCRN`, data.py:297-329).

    mode 'WF':    (nb,H,W,2)=[|W|,|F|] → (nb,2,H,W,2) with zero imag.
    mode 'PM':    (nb,H,W,2)=[R2*,FM] → (nb,1,H,W,2)=(FM,R2*).
    mode 'WF-PM': (nb,H,W,4)=[|W|,|F|,R2*,FM] → (nb,3,H,W,2).
    mode 'All':   (nb,H,W,6)=[Wr,Wi,Fr,Fi,R2*,FM] → (nb,3,H,W,2).
    """
    if mode == "WF":
        w = b[..., :1][:, None]
        f = b[..., 1:][:, None]
        zw = jnp.zeros_like(w)
        return jnp.concatenate([
            jnp.concatenate([w, zw], -1),
            jnp.concatenate([f, jnp.zeros_like(f)], -1)], axis=1)
    if mode == "PM":
        r2 = b[..., :1][:, None]
        fm = b[..., 1:][:, None]
        return jnp.concatenate([fm, r2], axis=-1)
    if mode == "WF-PM":
        w = b[..., :1]
        f = b[..., 1:2]
        r2 = b[..., 2:3]
        fm = b[..., 3:]
        w = jnp.concatenate([w, jnp.zeros_like(w)], -1)[:, None]
        f = jnp.concatenate([f, jnp.zeros_like(f)], -1)[:, None]
        pm = jnp.concatenate([fm, r2], -1)[:, None]
        return jnp.concatenate([w, f, pm], axis=1)
    if mode == "All":
        w = b[..., :2][:, None]
        f = b[..., 2:4][:, None]
        pm = jnp.concatenate([b[..., 5:], b[..., 4:5]], -1)[:, None]
        return jnp.concatenate([w, f, pm], axis=1)
    raise ValueError(f"unknown mode {mode!r}")


def mag_phase_to_complex_mebcrn(b: jnp.ndarray) -> jnp.ndarray:
    """Mag/phase MEBCRN rows [(FF,0),(PD,R2*),(pha,FM)] → complex rows
    [water, fat, (FM, R2*)] — inverse of the loader's mag_and_phase
    derivation with the 4π phase convention (data.py:99-115 +
    wflib/IDEAL_model.py:421)."""
    ff = b[:, 0, ..., 0]
    pd = b[:, 1, ..., 0]
    r2s = b[:, 1, ..., 1]
    pha = b[:, 2, ..., 0] * 4.0 * np.pi
    fm = b[:, 2, ..., 1]
    water = (1.0 - ff) * pd
    fat = ff * pd
    w_row = jnp.stack([water * jnp.cos(pha), water * jnp.sin(pha)], -1)
    f_row = jnp.stack([fat * jnp.cos(pha), fat * jnp.sin(pha)], -1)
    pm_row = jnp.stack([fm, r2s], -1)
    return jnp.stack([w_row, f_row, pm_row], axis=1)
