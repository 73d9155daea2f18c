"""BatchNorm stat utilities for the VOLO conv stem.

Reference parity (SURVEY §2.3.4, §7.3.7):
  * `recalibrate_bn` (`main_prog.py:1533-1555`): reset running stats and
    re-estimate them from `max_steps` train-mode forwards — used after
    growth when carrying stats over is not desired;
  * `distribute_bn` (`main_prog.py:883-887`) has no work to do here: batch
    statistics are computed over the *globally sharded* batch axis, so the
    running stats every replica accumulates are already identical
    (XLA inserts the cross-replica reduction) — sync-BN by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from autoprog_tpu.ops.interpolate import resize_bilinear
from autoprog_tpu.parallel.mesh import shard_batch


def reset_batch_stats(batch_stats):
    """Fresh BN stats (mean 0, var 1), like torch reset_running_stats."""
    def reset(path, leaf):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "var":
            return jnp.ones_like(leaf)
        return jnp.zeros_like(leaf)
    return jax.tree_util.tree_map_with_path(reset, batch_stats)


def make_bn_update_step(model, *, r: int, keep=None):
    """Jitted train-mode forward that only advances BN running stats."""
    def step(params, batch_stats, images, rng):
        images = resize_bilinear(images, r)
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, keep=keep,
            rngs={"dropout": jax.random.fold_in(rng, 1),
                  "mixtoken": jax.random.fold_in(rng, 2)},
            mutable=["batch_stats"])
        return mutated["batch_stats"]
    from autoprog_tpu.train.steps import _sync_compiled
    return _sync_compiled(jax.jit(step), f"bn:{r}:{keep}")


def recalibrate_bn(ctx, loader, *, r: int, keep=None,
                   max_steps: int = 100) -> None:
    """Re-estimate the stem BN running stats in ctx.state."""
    if not ctx.state.batch_stats:
        return
    stats = reset_batch_stats(ctx.state.batch_stats)
    step = make_bn_update_step(ctx.model, r=r, keep=keep)
    rng = jax.random.fold_in(ctx.rng, 909)
    it = iter(loader)
    for i in range(max_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        batch = shard_batch(ctx.mesh, batch)
        stats = step(ctx.state.params, stats, batch["image"],
                     jax.random.fold_in(rng, i))
    # abandoning a mid-epoch iterator leaves the worker pool grinding the
    # rest of the epoch (imap has no consumer backpressure) — shut it
    # down; the next full iteration re-spawns it
    close = getattr(loader, "close", None)
    if close is not None:
        close()
    ctx.state = ctx.state.replace(batch_stats=stats)
