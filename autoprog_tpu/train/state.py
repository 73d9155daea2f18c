"""Training state pytree.

One immutable pytree carries everything the reference scatters across
mutable objects (model.parameters(), optimizer state, AMP scaler, the EMA
model list, BN buffers): params, batch_stats (VOLO stem BN), optax state,
a *tuple* of EMA trees (one per decay, `main_prog.py:507-514`), and the
step counter. Stage growth builds a brand-new TrainState from remapped
params with fresh optimizer state (moments intentionally reset,
`main_prog.py:1301-1440`).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array                 # int32 scalar, global update count
    params: Any
    batch_stats: Any                # {} for models without BN
    opt_state: Any
    ema_params: Tuple[Any, ...]     # one tree per EMA decay (may be empty)

    @classmethod
    def create(cls, *, params, batch_stats, tx, ema_decays=(),
               ema_dtype=None):
        import jax.numpy as jnp
        opt_state = tx.init(params)
        # EMA trees start as *copies* (not aliases) of the params so buffer
        # donation in the train step never sees the same buffer twice.
        # ema_dtype=bfloat16 stores them half-width (see ops/rounding.py);
        # the initial cast is exact enough deterministically (the SR path
        # only matters for the small per-step increments).
        # astype to the SAME dtype returns the same array object; aliased
        # EMA trees would break the train step's donation on TPU exactly
        # like the growth-remap aliasing (prog/growth.py:_dedupe_buffers)
        cast = (lambda p: jnp.copy(p)) if ema_dtype is None \
            else (lambda p: jnp.copy(p) if p.dtype == ema_dtype
                  else p.astype(ema_dtype))
        ema = tuple(jax.tree.map(cast, params) for _ in ema_decays)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=opt_state,
                   ema_params=ema)
