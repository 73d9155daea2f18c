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
        mu_dtype = jnp.bfloat16 if getattr(args, "adam_mu_bf16", False) \
            else None
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                         mu_dtype=mu_dtype))
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


def _noise_wrap(schedule: Schedule, args, t_initial: int) -> Schedule:
    """timm-0.4.5 `--lr-noise` semantics (scheduler.py `_add_noise`,
    wired by the reference at `/root/reference/main_prog.py:141-146`):
    from epoch `lr_noise[0]*epochs` (optionally until `lr_noise[1]*epochs`),
    perturb the epoch's LR multiplicatively by `lr * (1 + noise)` where
    noise ~ trunc-normal resampled until |noise| < noise_pct, seeded
    `seed + epoch` through torch's generator — reproduced here with the
    SAME torch RNG so the noise stream is bit-identical to timm's.
    (0.4.5 stores noise_std but never applies it in the normal path;
    replicated literally.)"""
    lr_noise = getattr(args, "lr_noise", None)
    if not lr_noise:
        return schedule
    try:
        # import at SCHEDULE-CREATION time: a missing torch must fail the
        # run at startup, not hours in when the noise window first opens
        import torch
    except ImportError as e:
        raise RuntimeError(
            "--lr-noise reproduces timm's exact torch RNG noise stream "
            "and needs torch installed (the [parity] extra)") from e
    rng_range = [n * t_initial for n in lr_noise]
    lo = rng_range[0]
    hi = rng_range[1] if len(rng_range) > 1 else None
    noise_pct = getattr(args, "lr_noise_pct", 0.67)
    # timm: getattr(args, 'seed', 42) — seed=0 is a legitimate stream
    seed = getattr(args, "seed", None)
    noise_seed = 42 if seed is None else seed
    base_fn = schedule.fn

    def fn(epoch: float) -> float:
        lr = base_fn(epoch)
        t = int(epoch)
        apply = (lo <= t < hi) if hi is not None else t >= lo
        if apply:
            g = torch.Generator()
            g.manual_seed(noise_seed + t)
            while True:
                noise = torch.randn(1, generator=g).item()
                if abs(noise) < noise_pct:
                    break
            lr = lr + lr * noise
        return lr

    return Schedule(fn, schedule.num_epochs)


def create_scheduler(args) -> Schedule:
    sched = args.sched
    base_lr, min_lr, warmup_lr = args.lr, args.min_lr, args.warmup_lr
    warmup_t = args.warmup_epochs
    t_initial = args.epochs

    if sched == "cosine":
        # timm 0.4.5 CosineLRScheduler (SGDR restarts): `--lr-cycle-mul`
        # multiplies each successive cycle's length, `--lr-cycle-limit`
        # caps the number of cycles (LR pins to min_lr after), decay_rate
        # shrinks each cycle's amplitude by gamma=decay_rate^i
        # (`/root/reference/main_prog.py:148-166` via create_scheduler).
        t_mul = float(getattr(args, "lr_cycle_mul", 1.0) or 1.0)
        cycle_limit = int(getattr(args, "lr_cycle_limit", 1))
        decay_rate = float(getattr(args, "decay_rate", 0.1))

        def fn(epoch: float) -> float:
            if epoch < warmup_t:
                return warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_t, 1)
            # timm 0.4.5 default warmup_prefix=False: the cosine phase
            # counts warmup epochs, i.e. cos(pi*epoch/T)
            t = epoch
            if t_mul != 1.0:
                # with t_mul < 1 the cycle lengths form a convergent
                # series summing to t_initial/(1-t_mul); past that point
                # (e.g. the cooldown tail) the log argument hits <= 0 —
                # every cycle is over, pin to min_lr
                log_arg = 1 - t / t_initial * (1 - t_mul)
                if log_arg <= 0:
                    return min_lr
                i = int(math.floor(math.log(log_arg, t_mul)))
                t_i = t_mul ** i * t_initial
                t_curr = t - (1 - t_mul ** i) / (1 - t_mul) * t_initial
            else:
                i = int(t // t_initial)
                t_i = t_initial
                t_curr = t - t_initial * i
            gamma = decay_rate ** i
            if cycle_limit == 0 or i < cycle_limit:
                lr_min_i = min_lr * gamma
                lr_max_i = base_lr * gamma
                return lr_min_i + 0.5 * (lr_max_i - lr_min_i) * (
                    1 + math.cos(math.pi * t_curr / max(t_i, 1e-9)))
            return min_lr

        # timm get_cycle_length(): total scheduled epochs over all cycles
        cycles = max(1, cycle_limit)
        if t_mul == 1.0:
            total = t_initial * cycles
        else:
            total = int(math.floor(
                -t_initial * (t_mul ** cycles - 1) / (1 - t_mul)))
        return _noise_wrap(Schedule(fn, total + args.cooldown_epochs),
                           args, t_initial)

    if sched == "step":
        def fn(epoch: float) -> float:
            if epoch < warmup_t:
                return warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_t, 1)
            return base_lr * (args.decay_rate ** (int(epoch) // int(args.decay_epochs)))
        return _noise_wrap(Schedule(fn, t_initial + args.cooldown_epochs),
                           args, t_initial)

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
        return _noise_wrap(Schedule(fn, t_initial + args.cooldown_epochs),
                           args, t_initial)

    if sched == "plateau":
        return PlateauSchedule(
            base_lr=base_lr, min_lr=min_lr, warmup_lr=warmup_lr,
            warmup_t=warmup_t, num_epochs=t_initial + args.cooldown_epochs,
            decay_rate=args.decay_rate, patience=args.patience_epochs,
            mode="min" if args.eval_metric == "loss" else "max")

    if sched in ("none", "constant"):
        return Schedule(lambda e: base_lr, t_initial)

    raise ValueError(f"unsupported scheduler {sched!r}")


class PlateauSchedule:
    """Metric-driven LR decay (timm 0.4.5 `--sched plateau`,
    PlateauLRScheduler wrapping ReduceLROnPlateau; selected at
    `main_prog.py:135` via the `--sched` flag).

    Stateful by necessity — the LR depends on the eval-metric history, not
    just the epoch. Exposes the same `fn(epoch)`/`num_epochs` surface as
    `Schedule`, plus `observe(metric)` which the trainers call once per
    epoch after validation. The object lives in the engine context and
    survives stage rebuilds, so progressive growth keeps the global decay
    state (mirroring the reference's scheduler fast-forward semantics at
    `main_prog.py:1429-1430`).
    """

    def __init__(self, base_lr, min_lr, warmup_lr, warmup_t, num_epochs,
                 decay_rate=0.1, patience=10, mode="max"):
        self.base_lr = base_lr
        self.min_lr = min_lr
        self.warmup_lr = warmup_lr
        self.warmup_t = warmup_t
        self.num_epochs = num_epochs
        self.decay_rate = decay_rate
        self.patience = patience
        self.mode = mode
        self._lr = base_lr
        self._best = None
        self._bad_epochs = 0

    def fn(self, epoch: float) -> float:
        if epoch < self.warmup_t:
            return self.warmup_lr + (self.base_lr - self.warmup_lr) * (
                epoch / max(self.warmup_t, 1))
        return self._lr

    def observe(self, metric: float) -> None:
        """Record one epoch's eval metric; decay LR after `patience`
        consecutive non-improving epochs (torch ReduceLROnPlateau
        semantics: strict improvement resets the counter)."""
        better = (self._best is None
                  or (self.mode == "max" and metric > self._best)
                  or (self.mode == "min" and metric < self._best))
        if better:
            self._best = metric
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self._lr = max(self._lr * self.decay_rate, self.min_lr)
                self._bad_epochs = 0

    # checkpoint round-trip (payload mirrors the reference saving the
    # scheduler state inside the checkpoint, prog/checkpoint_saver.py:110)
    def state_dict(self) -> dict:
        return {"lr": self._lr, "best": self._best,
                "bad_epochs": self._bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self._lr = d["lr"]
        self._best = d["best"]
        self._bad_epochs = d["bad_epochs"]


def apply_lr(updates, lr) -> dict:
    """Scale descent updates by -lr (updates enter as +gradient-direction
    from the chain; this produces the final additive step)."""
    neg = -jnp.asarray(lr, dtype=jnp.float32)
    return jax.tree.map(lambda u: u * neg.astype(u.dtype), updates)
