"""Exponential moving average of model state.

Functional re-design of callbacks/ema.py (ModelEMA/EMACallback): the decay
ramps as ``decay * (1 - exp(-t / 2000))`` (ema.py:36-63) and — like the
reference, which EMAs the whole state_dict — both params and batch_stats are
averaged. The reference defines EMA but never registers it (SURVEY quirks);
here it is a first-class trainer option (Config.use_ema).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['ema_update']


def ema_update(ema_tree, new_tree, updates: jnp.ndarray, decay: float = 0.9999):
    """One EMA step; ``updates`` is the post-increment update counter."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(e.dtype)
        return p

    return jax.tree_util.tree_map(upd, ema_tree, new_tree)
