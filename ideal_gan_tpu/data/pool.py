"""GAN replay buffer (reference `ItemPool`, data.py:18-42).

Host-side by design: the pool mutates python state between jitted train
steps (the reference had the same eager boundary, SURVEY.md §3.4)."""

from __future__ import annotations

import numpy as np


class ItemPool:
    """Keeps a pool of past generator outputs; each incoming item either
    passes through or swaps with a random stored item (50 %)."""

    def __init__(self, pool_size: int = 50, seed: int | None = None):
        self.pool_size = pool_size
        self.items: list[np.ndarray] = []
        self._rng = np.random.default_rng(seed)

    def __call__(self, in_items) -> np.ndarray:
        in_items = np.asarray(in_items)
        if self.pool_size == 0:
            return in_items
        out = []
        for item in in_items:
            if len(self.items) < self.pool_size:
                self.items.append(np.array(item))
                out.append(item)
            elif self._rng.random() > 0.5:
                idx = self._rng.integers(0, len(self.items))
                stored = self.items[idx]
                self.items[idx] = np.array(item)
                out.append(stored)
            else:
                out.append(item)
        return np.stack(out, axis=0)
