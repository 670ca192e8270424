"""Echo-time (TE) train generation.

Parity with the reference TE generator (wflib/IDEAL_model.py:21-45), rebuilt
around explicit randomness: the deterministic trains are pure functions and
the randomized train takes a `jax.random` key (the reference used global
numpy RNG). Shapes follow the reference convention: TE arrays are
(batch, n_echoes, 1) float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .constants import DTE_1p5T, DTE_3T, TE1_1p5T, TE1_3T


def te_train(n_ech: int, bs: int = 1, te1: float = TE1_1p5T,
             dte: float = DTE_1p5T) -> jnp.ndarray:
    """Deterministic uniformly-spaced TE train, shape (bs, n_ech, 1)."""
    te = te1 + dte * np.arange(n_ech, dtype=np.float32)
    te = jnp.asarray(te, jnp.float32)[None, :, None]
    return jnp.broadcast_to(te, (bs, n_ech, 1))


def te_train_for_field(n_ech: int, bs: int = 1, field: float = 1.5) -> jnp.ndarray:
    """The reference protocol TE train for a field strength (1.5 T or 3 T)."""
    if float(field) == 3.0:
        return te_train(n_ech, bs, TE1_3T, DTE_3T)
    return te_train(n_ech, bs, TE1_1p5T, DTE_1p5T)


def sample_te_train(key: jax.Array, n_ech: int, bs: int = 1,
                    te1_min: float = 1.0e-3, te1_d: float = 1.4e-3,
                    dte_min: float = 1.6e-3, dte_d: float = 1.0e-3,
                    dte_jitter: float = 1e-4) -> jnp.ndarray:
    """Randomized TE train matching the reference distribution.

    TE1 ~ U(te1_min, te1_min + te1_d); a common echo spacing
    dTE_c ~ U(dte_min, dte_min + dte_d); per-echo spacings
    dTE_n ~ N(dTE_c, dte_jitter²) (wflib/IDEAL_model.py:32-40). The same
    train is tiled across the batch, as in the reference. Returns
    (bs, n_ech, 1) float32.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    te1 = te1_min + jax.random.uniform(k1, ()) * te1_d
    dte_c = dte_min + jax.random.uniform(k2, ()) * dte_d
    dte = dte_c + dte_jitter * jax.random.normal(k3, (n_ech - 1,))
    steps = jnp.concatenate([jnp.zeros((1,)), dte])
    te = jnp.cumsum(steps) + te1
    te = te.astype(jnp.float32)[None, :, None]
    return jnp.broadcast_to(te, (bs, n_ech, 1))
