"""Optimizer and LR schedule (optax).

Replaces `timm.create_optimizer` / `timm.create_scheduler`
(`main_prog.py:484,553`; SURVEY §2.2):

  * AdamW with decoupled weight decay, masking out 1-D params (biases,
    norm scales) and the model's no-weight-decay set {pos_embed, cls_token,
    dist_token} (`models/volo.py:568-570`);
  * cosine schedule with linear warmup, stepped per *epoch* (timm 0.4.5
    `t_in_epochs=True` semantics) plus a cooldown tail at min_lr — so total
    scheduled epochs = epochs + cooldown_epochs, matching
    `create_scheduler`'s return at `main_prog.py:553`.

The learning rate is a *runtime scalar argument* of the train step (the
schedule is evaluated on host per epoch). This is the TPU-native analogue
of `lr_scheduler.step(epoch)` fast-forwarding on stage rebuild
(`main_prog.py:1429-1430`): rebuilding a stage never recompiles or mutates
a scheduler object — moments reset, the global schedule just keeps being
evaluated at the current epoch.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

NO_WD_NAMES = ("pos_embed", "cls_token", "dist_token")


def wd_mask(params) -> dict:
    """True where weight decay applies: >=2-D kernels not in the
    no-weight-decay set."""
    def decide(path) -> bool:
        names = [getattr(p, "key", str(p)) for p in path]
        return not any(n in NO_WD_NAMES for n in names)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: decide(path) and leaf.ndim > 1, params)


def create_optimizer(args, params) -> optax.GradientTransformation:
    """Build the gradient transformation (sans LR — see module docstring).

    The returned chain maps raw grads -> *descent* updates to be multiplied
    by -lr in the step.
    """
    opt = args.opt.lower()
    betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    eps = args.opt_eps if args.opt_eps is not None else 1e-8
    parts = []
    if args.clip_grad is not None:
        if args.clip_mode == "norm":
            parts.append(optax.clip_by_global_norm(args.clip_grad))
        elif args.clip_mode == "value":
            parts.append(optax.clip(args.clip_grad))
        elif args.clip_mode == "agc":
            parts.append(optax.adaptive_grad_clip(args.clip_grad))
        else:
            raise ValueError(f"unknown clip mode {args.clip_mode}")
    if opt in ("adamw", "adam"):
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if opt == "adamw" and args.weight_decay:
            parts.append(optax.add_decayed_weights(
                args.weight_decay, mask=wd_mask(params)))
    elif opt in ("sgd", "momentum"):
        parts.append(optax.trace(decay=args.momentum, nesterov=True))
        if args.weight_decay:
            parts.append(optax.add_decayed_weights(
                args.weight_decay, mask=wd_mask(params)))
    else:
        raise ValueError(f"unsupported optimizer {args.opt!r}")
    return optax.chain(*parts)


class Schedule(NamedTuple):
    fn: Callable[[float], float]   # epoch (float) -> lr
    num_epochs: int                # total epochs to run (incl. cooldown)


def create_scheduler(args) -> Schedule:
    sched = args.sched
    base_lr, min_lr, warmup_lr = args.lr, args.min_lr, args.warmup_lr
    warmup_t = args.warmup_epochs
    t_initial = args.epochs

    if sched == "cosine":
        def fn(epoch: float) -> float:
            if epoch < warmup_t:
                return warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_t, 1)
            if epoch >= t_initial:
                return min_lr  # cooldown tail
            t = (epoch - warmup_t) / max(t_initial - warmup_t, 1)
            return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * t))
        return Schedule(fn, t_initial + args.cooldown_epochs)

    if sched == "step":
        def fn(epoch: float) -> float:
            if epoch < warmup_t:
                return warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_t, 1)
            return base_lr * (args.decay_rate ** (int(epoch) // int(args.decay_epochs)))
        return Schedule(fn, t_initial + args.cooldown_epochs)

    if sched == "tanh":
        def fn(epoch: float) -> float:
            if epoch < warmup_t:
                return warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_t, 1)
            if epoch >= t_initial:
                return min_lr
            t = (epoch - warmup_t) / max(t_initial - warmup_t, 1)
            # timm TanhLRScheduler with lb=-7, ub=3 (upper half of tanh)
            lb, ub = -7.0, 3.0
            return min_lr + 0.5 * (base_lr - min_lr) * (
                1 - math.tanh(lb + t * (ub - lb)))
        return Schedule(fn, t_initial + args.cooldown_epochs)

    if sched in ("none", "constant"):
        return Schedule(lambda e: base_lr, t_initial)

    raise ValueError(f"unsupported scheduler {sched!r}")


def apply_lr(updates, lr) -> dict:
    """Scale descent updates by -lr (updates enter as +gradient-direction
    from the chain; this produces the final additive step)."""
    neg = -jnp.asarray(lr, dtype=jnp.float32)
    return jax.tree.map(lambda u: u * neg.astype(u.dtype), updates)
