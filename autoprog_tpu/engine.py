"""Training engine: setup, epoch loops, evaluation, stage rebuilds.

The shared machinery behind the three entry points (reference `main.py`,
`main_prog.py`, `validate.py` — SURVEY §2.1 L5). The reference's mutable
object soup (model.cuda(), DDP wrap, optimizer/scheduler/scaler/EMA
rebuilds) becomes explicit data: a `TrainContext` owns the current
ModelDef + StepBuilder + TrainState, and `create_stage_model_and_state`
(mirroring `create_stage_model_and_optimizer`, `main_prog.py:1301-1440`)
returns a *new* context entry with remapped params and fresh optimizer
moments.

Epoch loops keep metrics as device arrays and only materialize them at log
intervals, so the host never blocks the TPU between steps (the reference
pays a `loss.item()` sync every step, SURVEY §3.1 device boundaries).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoprog_tpu.config import resolve_data_config
from autoprog_tpu.data.dataset import create_dataset
from autoprog_tpu.data.loader import Loader, create_loader, pad_eval_batch
from autoprog_tpu.data.mixup import Mixup
from autoprog_tpu.losses import build_train_loss
from autoprog_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from autoprog_tpu.prog.growth import grow_batch_stats, grow_params, shrink_params
from autoprog_tpu.registry import create_model
from autoprog_tpu.train.checkpoint import (
    CheckpointSaver,
    build_payload,
    load_checkpoint_file,
    restore_state,
)
from autoprog_tpu.train.optim import Schedule, create_optimizer, create_scheduler
from autoprog_tpu.train.state import TrainState
from autoprog_tpu.train.steps import StepBuilder
from autoprog_tpu.utils.meters import AverageMeter

_logger = logging.getLogger("autoprog_tpu")


def _stage_layers(mdef) -> Tuple[int, ...]:
    return tuple(mdef.arch.layers)


@dataclasses.dataclass
class TrainContext:
    args: Any
    mesh: Any
    data_config: Dict[str, Any]
    schedule: Schedule
    ema_decays: Tuple[float, ...]
    train_loss: Any
    mdef: Any = None
    model: Any = None
    sb: Optional[StepBuilder] = None
    state: Optional[TrainState] = None
    tx: Any = None
    saver: Optional[CheckpointSaver] = None
    args_text: str = ""
    output_dir: str = ""
    rng: Any = None

    @property
    def is_primary(self) -> bool:
        return jax.process_index() == 0

    def compute_dtype(self):
        return jnp.float32 if self.args.no_bf16 else jnp.bfloat16


def model_kwargs(args, dp: float, dtype) -> Dict[str, Any]:
    kw = dict(num_classes=args.num_classes or 1000,
              img_size=(args.img_size or 224), drop_rate=args.drop,
              drop_path_rate=dp, dtype=dtype,
              mix_token=bool(args.token_label),
              return_dense=bool(args.token_label),
              remat=getattr(args, "remat", False))
    # --bn-momentum follows the torch convention the reference CLI uses
    # (new = (1-m)*old + m*batch); flax BatchNorm's is the complement
    if getattr(args, "bn_momentum", None) is not None:
        kw["bn_momentum"] = 1.0 - args.bn_momentum
    if getattr(args, "bn_eps", None) is not None:
        kw["bn_eps"] = args.bn_eps
    return kw


def init_model_state(ctx: TrainContext, model_name: str, dp: float,
                     seed: int) -> None:
    """Create model + params + optimizer + StepBuilder for `model_name` and
    install them in ctx (fresh optimizer state)."""
    args = ctx.args
    mdef = create_model(model_name)
    model = mdef.make(**model_kwargs(args, dp, ctx.compute_dtype()))
    img = args.img_size or 224
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "mixtoken": jax.random.PRNGKey(seed + 2)}
    variables = jax.jit(
        lambda: model.init(rngs, jnp.zeros((1, img, img, 3)), train=False))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = create_optimizer(args, params)
    ema_dtype = jnp.bfloat16 if getattr(args, "model_ema_bf16", False) \
        else None
    state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx,
                              ema_decays=ctx.ema_decays if args.model_ema
                              else (), ema_dtype=ema_dtype)
    state = replicate(ctx.mesh, state)
    if getattr(args, "model_parallel", 1) > 1:
        from autoprog_tpu.parallel.tp import shard_state_tp, validate_tp
        heads = mdef.arch.num_heads
        validate_tp(ctx.mesh, tuple(heads) if isinstance(heads, (tuple, list))
                    else (heads,))
        state = shard_state_tp(ctx.mesh, state)
    sb = StepBuilder(
        model=model, tx=tx, train_loss=ctx.train_loss,
        ema_decays=ctx.ema_decays if args.model_ema else (),
        num_classes=args.num_classes or 1000, smoothing=args.smoothing,
        token_label=args.token_label,
        has_token_label_data=bool(args.token_label_data),
        norm_mean=ctx.data_config["mean"], norm_std=ctx.data_config["std"],
        re_count=getattr(args, "recount", 1), ema_dtype=ema_dtype)
    ctx.mdef, ctx.model, ctx.sb, ctx.state, ctx.tx = mdef, model, sb, state, tx
    if ctx.is_primary:
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        _logger.info("Model %s created, param count: %d", model_name, n)


def setup(args, args_text: str, *, prog: bool, output_dir: str = "",
          initial_model: Optional[str] = None) -> TrainContext:
    """Common setup mirroring `main()` (`main_prog.py:334-751`)."""
    if getattr(args, "model_parallel", 1) > 1:
        # pallas_call is opaque to the SPMD partitioner — the fused MHSA
        # kernel would force gathers of head-sharded activations under TP
        # (hard off: the kernel is default-on, correctness beats the flag)
        os.environ["AUTOPROG_FUSED_ATTN"] = "0"
    mesh = make_mesh(model_parallel=getattr(args, "model_parallel", 1))
    if args.num_classes is None:
        args.num_classes = 1000 if not args.data_dir.startswith("synthetic") \
            else args.num_classes or 1000
    name0 = initial_model or args.model
    ctx = TrainContext(
        args=args, mesh=mesh,
        data_config=resolve_data_config(args,
                                        create_model(name0).default_cfg),
        schedule=create_scheduler(args),
        ema_decays=tuple(args.model_ema_decay) if args.model_ema else (),
        train_loss=build_train_loss(args),
        args_text=args_text, output_dir=output_dir,
        rng=jax.random.PRNGKey(args.seed + jax.process_index()))
    name = initial_model or args.model
    init_model_state(ctx, name, args.drop_path or 0.0, args.seed)
    return ctx


# ------------------------- loaders ---------------------------------------


def make_train_loader(ctx: TrainContext, *, aa: str, re_prob: float,
                      resize, batch_size: Optional[int] = None) -> Loader:
    """Stage train loader (`create_stage_loader`, `main_prog.py:1443-1530`).
    Always decodes at the full eval resolution; the train step downscales
    on device to the stage resolution."""
    args = ctx.args
    ds = create_dataset(
        args.dataset, args.data_dir, split=args.train_split,
        is_training=True, token_label_root=args.token_label_data,
        num_classes=args.num_classes, fake_size=args.fake_data_size,
        image_size=ctx.data_config["input_size"][-1], seed=args.seed,
        dataset_size=getattr(args, "dataset_size", 0))
    mixup_active = args.mixup > 0 or args.cutmix > 0 or \
        args.cutmix_minmax is not None
    mixup = Mixup(mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                  cutmix_minmax=args.cutmix_minmax,
                  prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
                  label_smoothing=args.smoothing,
                  num_classes=args.num_classes, mode=args.mixup_mode,
                  token_label=bool(args.token_label_data)) \
        if mixup_active else None
    per_host = (batch_size or args.batch_size) // jax.process_count()
    loader = create_loader(
        ds, input_size=ctx.data_config["input_size"][-1],
        batch_size=per_host, is_training=True, re_prob=re_prob,
        re_mode=args.remode, re_count=args.recount, scale=resize,
        ratio=args.ratio, hflip=args.hflip, vflip=args.vflip,
        color_jitter=args.color_jitter, auto_augment=aa,
        interpolation=args.train_interpolation,
        mean=ctx.data_config["mean"], std=ctx.data_config["std"],
        num_workers=args.workers, mixup=mixup, seed=args.seed,
        no_aug=args.no_aug, process_index=jax.process_index(),
        process_count=jax.process_count())
    if getattr(args, "uint8_pipe", False):
        # uint8 to the device; normalize + random-erase happen in-step
        loader.transform.emit_uint8 = True
        loader.transform.re_prob = 0.0
    if getattr(args, "aug_splits", 0) > 1:
        from autoprog_tpu.data.transforms import TrainTransform
        loader.aug_splits = args.aug_splits
        loader.clean_transform = TrainTransform(
            size=ctx.data_config["input_size"][-1], scale=tuple(resize),
            ratio=tuple(args.ratio), hflip=args.hflip, vflip=args.vflip,
            interpolation=args.train_interpolation,
            mean=ctx.data_config["mean"], std=ctx.data_config["std"])
        if getattr(args, "uint8_pipe", False):
            # both splits must emit the same dtype — a float32 clean split
            # stacked with uint8 aug splits would skip in-step normalize
            loader.clean_transform.emit_uint8 = True
    return loader


def make_eval_loader(ctx: TrainContext) -> Loader:
    args = ctx.args
    ds = create_dataset(args.dataset, args.data_dir, split=args.val_split,
                        is_training=False, num_classes=args.num_classes,
                        fake_size=max(args.fake_data_size // 4, 64),
                        image_size=ctx.data_config["input_size"][-1],
                        seed=args.seed,
                        dataset_size=getattr(args, "dataset_size", 0))
    loader = create_loader(
        ds, input_size=ctx.data_config["input_size"][-1],
        batch_size=(args.validation_batch_size_multiplier * args.batch_size)
        // jax.process_count(),
        is_training=False, crop_pct=ctx.data_config["crop_pct"],
        interpolation=ctx.data_config["interpolation"],
        mean=ctx.data_config["mean"], std=ctx.data_config["std"],
        num_workers=args.workers, process_index=jax.process_index(),
        process_count=jax.process_count())
    if getattr(args, "uint8_pipe", False):
        loader.transform.emit_uint8 = True
    return loader


def make_search_loader(ctx: TrainContext) -> Loader:
    """Fixed-augmentation loader for comparable search loss probes
    (`loader_search`, `main_prog.py:683-708`)."""
    args = ctx.args
    ds = create_dataset(
        args.dataset, args.data_dir, split=args.train_split,
        is_training=True, fixed_aug=True,
        token_label_root=args.token_label_data,
        num_classes=args.num_classes, fake_size=args.fake_data_size,
        image_size=ctx.data_config["input_size"][-1], seed=args.seed,
        dataset_size=getattr(args, "dataset_size", 0))
    per_host = max(args.batch_size // max(args.batch_splits_list[-1], 1), 1) \
        // jax.process_count() if hasattr(args, "batch_splits_list") else \
        args.batch_size // jax.process_count()
    return create_loader(
        ds, input_size=ctx.data_config["input_size"][-1],
        batch_size=max(per_host, 1), is_training=True, re_prob=0.0,
        scale=args.scale, ratio=args.ratio, hflip=args.hflip,
        vflip=args.vflip, auto_augment=args.aa,
        interpolation=args.train_interpolation,
        mean=ctx.data_config["mean"], std=ctx.data_config["std"],
        # inline (no worker pool): the search loader only ever
        # materializes ~search_probe_steps fixed batches once per stage
        # boundary (take_probe_batches), then gets torn down mid-imap —
        # the exact access pattern that armed the Pool.terminate()
        # deadlock (see Loader.close). Generating ~20 batches inline
        # costs seconds once per boundary and is bit-deterministic.
        num_workers=0, seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count())


# ------------------------- epoch loops -----------------------------------


def train_one_epoch(ctx: TrainContext, epoch: int, loader: Loader, *,
                    r: int, keep=None, splits: int = 1,
                    epoch_time_m: Optional[AverageMeter] = None,
                    log_suffix: str = "", re_prob: float = 0.0) -> Dict[str, float]:
    """One epoch of the hot loop (`train_one_epoch`, `main_prog.py:933`)."""
    args = ctx.args
    device_re = re_prob if getattr(args, "uint8_pipe", False) else 0.0
    step = ctx.sb.train_step(r=r, keep=keep, splits=splits,
                             re_prob=device_re)
    lr = ctx.schedule.fn(epoch)
    loader.set_epoch(epoch)
    if args.mixup_off_epoch and epoch >= args.mixup_off_epoch and \
            loader.mixup is not None:
        loader.mixup.enabled = False

    batch_time = AverageMeter()
    data_time = AverageMeter()
    loss_sum = None  # device-side running sum; no per-step host sync
    n_steps = 0
    nb = len(loader)
    end = time.time()
    epoch_start = end
    last_log_idx, last_log_t = 0, end
    state = ctx.state
    last_metrics = None
    profiling = bool(getattr(args, "profile", "")) and epoch == 0
    for batch_idx, batch in enumerate(loader):
        if profiling and batch_idx == 1:  # skip the compile step
            jax.profiler.start_trace(args.profile)
        data_time.update(time.time() - end)
        batch = shard_batch(ctx.mesh, batch)
        state, metrics = step(state, batch, lr, ctx.rng)
        last_metrics = metrics
        loss_sum = metrics["loss"] if loss_sum is None \
            else loss_sum + metrics["loss"]
        n_steps += 1
        if profiling and batch_idx == min(args.profile_steps,
                                          max(nb - 2, 1)):
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = False
            _logger.info("profiler trace written to %s", args.profile)
        if batch_idx % args.log_interval == 0 or batch_idx == nb - 1:
            jax.block_until_ready(last_metrics["loss"])
            now = time.time()
            if ctx.is_primary:
                steps = batch_idx - last_log_idx
                rate = (batch["label"].shape[0] * jax.process_count() * steps
                        / max(now - last_log_t, 1e-9)) if steps else 0.0
                _logger.info(
                    "Train%s: %d [%4d/%d]  Loss: %.4f  LR: %.3e  "
                    "%.1f img/s  Data: %.3fs", log_suffix, epoch, batch_idx,
                    nb, float(metrics["loss"]), lr, rate, data_time.avg)
            last_log_idx, last_log_t = batch_idx, now
            if args.save_images and ctx.output_dir and batch_idx == 0 \
                    and ctx.is_primary:
                _save_image_grid(batch["image"],
                                 f"{ctx.output_dir}/train-batch-{epoch}.jpg",
                                 ctx.data_config)
            if ctx.saver is not None and args.recovery_interval and \
                    (batch_idx + 1) % args.recovery_interval == 0:
                ctx.state = state
                save_ckpt_recovery(ctx, epoch, batch_idx)
        end = time.time()
    ctx.state = state
    mean_loss = float(loss_sum) / n_steps if n_steps else float("nan")
    if epoch_time_m is not None:
        epoch_time_m.update(time.time() - epoch_start)
    return {"loss": mean_loss}


def _save_image_grid(images, path: str, data_config) -> None:
    """Debug dump of the (normalized) input batch (`--save-images`,
    `main_prog.py:1069-1075`)."""
    import numpy as np
    from PIL import Image
    x = np.asarray(images[:16]).astype(np.float32)
    x = x * np.asarray(data_config["std"]) + np.asarray(data_config["mean"])
    x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    n, h, w, _ = x.shape
    cols = 4
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = x[i]
    Image.fromarray(grid).save(path, quality=90)


def evaluate(ctx: TrainContext, loader: Loader, *, keep=None,
             params=None, batch_stats=None, log_suffix: str = ""
             ) -> Dict[str, float]:
    """Validation loop (`validate`, `main_prog.py:1096-1173`): top-1/top-5/
    loss; the cross-replica metric mean is implicit in the sharded
    reductions."""
    step = ctx.sb.eval_step(keep=keep)
    params = params if params is not None else ctx.state.params
    batch_stats = batch_stats if batch_stats is not None else \
        ctx.state.batch_stats
    # accumulate metric sums as device scalars — one host readback per
    # epoch instead of 4 D2H syncs per batch (pure latency on a remote
    # chip); partial final batches pad to the compiled shape
    acc = None
    for batch in loader:
        batch = pad_eval_batch(batch, loader.batch_size)
        batch = shard_batch(ctx.mesh, batch)
        m = step(params, batch_stats, batch)
        acc = m if acc is None else jax.tree.map(jnp.add, acc, m)
    sums = {k: float(v) for k, v in acc.items()} if acc is not None else \
        {"loss_sum": 0.0, "top1_sum": 0.0, "top5_sum": 0.0, "count": 0.0}
    n = max(sums["count"], 1.0)
    metrics = {"loss" + log_suffix: sums["loss_sum"] / n,
               "top1" + log_suffix: 100.0 * sums["top1_sum"] / n,
               "top5" + log_suffix: 100.0 * sums["top5_sum"] / n}
    if ctx.is_primary:
        _logger.info("Test%s: loss %.4f  Acc@1 %.4f  Acc@5 %.4f",
                     log_suffix, metrics["loss" + log_suffix],
                     metrics["top1" + log_suffix],
                     metrics["top5" + log_suffix])
    return metrics


def evaluate_all(ctx: TrainContext, loader: Loader, *, keep=None
                 ) -> Tuple[Dict[str, float], List[str]]:
    """Model + every EMA tree (`main_prog.py:889-907`). Returns metrics and
    the metric names eligible for checkpoint ranking."""
    eval_metric = ctx.args.eval_metric
    metrics = evaluate(ctx, loader, keep=keep)
    names = [eval_metric]
    for i, d in enumerate(ctx.ema_decays):
        suffix = f"_EMA_{d}"
        metrics.update(evaluate(ctx, loader, keep=keep,
                                params=ctx.state.ema_params[i],
                                log_suffix=suffix))
        names.append(eval_metric + suffix)
    return metrics, names


# ------------------------- stage rebuild ---------------------------------


def create_stage_model_and_state(ctx: TrainContext, new_model_name: str, *,
                                 dp: float, load: str, origin_l: int = 0,
                                 seed_offset: int = 0) -> None:
    """Grow/shrink into a new architecture (`create_stage_model_and_optimizer`,
    `main_prog.py:1301-1440`): build the new model, remap weights + every
    EMA tree, reset optimizer moments, keep the global LR schedule."""
    args = ctx.args
    prev_mdef = ctx.mdef
    prev_state = ctx.state
    prev_layers = _stage_layers(prev_mdef)
    prev_l = sum(prev_layers)

    init_model_state(ctx, new_model_name, dp,
                     args.seed + 1000 + seed_offset)
    new_layers = _stage_layers(ctx.mdef)
    template = ctx.state.params
    stats_template = ctx.state.batch_stats

    if load == "slice":
        explicit = getattr(args, "grow_mode", "")
        if explicit:
            _logger.info("growing model with explicit mode %r", explicit)
            kw = {}
            if explicit == "clone_ema":
                if len(prev_state.ema_params) <= 3:
                    raise SystemExit("--grow-mode clone_ema needs >= 4 EMA "
                                     "decays (`prog/helpers.py:616`)")
                kw = dict(ema_trees=list(prev_state.ema_params[:3]))
                src = prev_state.ema_params[3]
            else:
                src = prev_state.params
            if explicit == "clone_noise":
                kw = dict(rng=jax.random.fold_in(ctx.rng, 777))
            new_params = grow_params(src, template, src_layers=prev_layers,
                                     dst_layers=new_layers, mode=explicit,
                                     **kw)
        elif args.load_with_clone_ema and len(prev_state.ema_params) > 3:
            _logger.info("growing model with clone-ema stitching")
            new_params = grow_params(
                prev_state.ema_params[3], template,
                src_layers=prev_layers, dst_layers=new_layers,
                mode="clone_ema",
                ema_trees=list(prev_state.ema_params[:3]))
        elif args.load_with_clone or args.load_with_clone_ema:
            _logger.info("growing model with clone+noise")
            new_params = grow_params(
                prev_state.params, template, src_layers=prev_layers,
                dst_layers=new_layers, mode="clone_noise",
                rng=jax.random.fold_in(ctx.rng, 777))
        else:
            new_params = grow_params(
                prev_state.params, template, src_layers=prev_layers,
                dst_layers=new_layers, mode="clone")
        # each EMA tree grows against its OWN template (same storage
        # dtype — bf16 under --model-ema-bf16): the remappers cast to
        # the template's dtype, so no recast pass is needed
        new_ema = tuple(
            grow_params(e, ctx.state.ema_params[i], src_layers=prev_layers,
                        dst_layers=new_layers, mode="clone")
            for i, e in enumerate(prev_state.ema_params))
    elif load == "super":
        super_l = prev_l
        dst_l = sum(new_layers)
        fam = getattr(ctx.mdef.arch, "family", "volo")
        new_params = shrink_params(
            prev_state.params, template, base_layers=new_layers,
            super_layers=prev_layers, dst_layers=new_layers,
            base_l=origin_l, super_l=super_l, dst_l=dst_l, family=fam)
        new_ema = tuple(
            shrink_params(e, ctx.state.ema_params[i], base_layers=new_layers,
                          super_layers=prev_layers, dst_layers=new_layers,
                          base_l=origin_l, super_l=super_l, dst_l=dst_l,
                          family=fam)
            for i, e in enumerate(prev_state.ema_params))
    elif load == "":
        return  # fresh init (resume path fills weights afterwards)
    else:
        raise ValueError(f"unknown load mode {load!r}")

    new_stats = grow_batch_stats(prev_state.batch_stats, stats_template,
                                 src_layers=prev_layers,
                                 dst_layers=new_layers)
    ctx.state = ctx.state.replace(params=replicate(ctx.mesh, new_params),
                                  batch_stats=replicate(ctx.mesh, new_stats),
                                  ema_params=replicate(ctx.mesh, new_ema))
    if getattr(args, "model_parallel", 1) > 1:
        from autoprog_tpu.parallel.tp import shard_state_tp
        ctx.state = shard_state_tp(ctx.mesh, ctx.state)


# ------------------------- checkpointing ---------------------------------


def ckpt_payload(ctx: TrainContext, stage_info: Dict[str, Any]):
    payload = build_payload(state=ctx.state, args_text=ctx.args_text,
                            arch_name=ctx.mdef.name, stage_info=stage_info,
                            ema_decays=ctx.ema_decays)
    if hasattr(ctx.schedule, "state_dict"):  # plateau schedule state
        payload["lr_schedule"] = ctx.schedule.state_dict()
    return payload


def save_ckpt_recovery(ctx: TrainContext, epoch: int, batch_idx: int):
    if ctx.saver is not None and ctx.is_primary:
        ctx.saver.save_recovery(ckpt_payload(ctx, {}), epoch, batch_idx)


def resume_from(ctx: TrainContext, path: str) -> int:
    """Progressive-aware resume: read the arch record, rebuild that model,
    restore weights/optimizer/EMA. Returns the epoch to resume at."""
    ckpt = load_checkpoint_file(path)
    arch = ckpt.get("arch")
    if arch and arch != ctx.mdef.name:
        stage_info = ckpt.get("stage_info", {})
        init_model_state(ctx, arch, float(stage_info.get("dp", 0.0)),
                         ctx.args.seed)
    ctx.state = restore_state(ckpt, ctx.state,
                              restore_opt=not ctx.args.no_resume_opt)
    ctx.state = replicate(ctx.mesh, ctx.state)
    if hasattr(ctx.schedule, "load_state_dict") and "lr_schedule" in ckpt:
        ctx.schedule.load_state_dict(ckpt["lr_schedule"])
    return int(ckpt.get("epoch", -1)) + 1
