"""Fixed-schedule ImageNet trainer (reference `main.py:314-1009`).

The timm-style training script, TPU-native: YAML+argparse config, bf16
SPMD training over a data mesh, multi-decay EMA, token-labeling losses,
mixup/cutmix, in-step gradient accumulation (`--batch-splits`), CSV
summary, top-k checkpointing.
"""

from __future__ import annotations

import logging
import os
import sys

import jax

from autoprog_tpu import engine
from autoprog_tpu.config import parse_args
from autoprog_tpu.parallel.mesh import maybe_init_distributed
from autoprog_tpu.train.checkpoint import CheckpointSaver
from autoprog_tpu.utils.logging import make_output_dir, setup_logging, update_summary
from autoprog_tpu.utils.meters import AverageMeter

_logger = logging.getLogger("autoprog_tpu")


def main(argv=None):
    from autoprog_tpu.platform import apply_platform_env
    apply_platform_env()
    args, args_text = parse_args(argv, prog=False)
    maybe_init_distributed()
    output_dir = ""
    if jax.process_index() == 0:
        output_dir = make_output_dir(args.output, args.model, suffix="fixed")
    setup_logging(os.path.join(output_dir, "log.txt") if output_dir else "")

    per_host = args.batch_size // jax.process_count()
    if per_host % args.batch_splits != 0:
        raise SystemExit(
            f"per-host batch size {per_host} must be divisible by "
            f"--batch-splits {args.batch_splits}")
    # the reference overwrites token_label_size from the resolution
    # (`main_prog.py:639`) BEFORE loss selection — with the stale default
    # of 1 the loss builder would pick the relabel-style loss against a
    # dense token map (setup() builds the loss, so this must precede it)
    from autoprog_tpu.config import resolve_data_config
    from autoprog_tpu.registry import create_model
    img_size = args.img_size or resolve_data_config(
        args, create_model(args.model).default_cfg)["input_size"][-1]
    args.token_label_size = img_size // 16
    ctx = engine.setup(args, args_text, prog=False, output_dir=output_dir)

    loader_train = engine.make_train_loader(
        ctx, aa=args.aa, re_prob=args.reprob, resize=args.scale)
    loader_eval = engine.make_eval_loader(ctx)

    eval_metric = args.eval_metric
    ctx.saver = CheckpointSaver(
        checkpoint_dir=output_dir or ".", decreasing=(eval_metric == "loss"),
        max_history=args.checkpoint_hist, enabled=ctx.is_primary
        and bool(output_dir))
    if output_dir:
        with open(os.path.join(output_dir, "args.yaml"), "w") as f:
            f.write(args_text)

    start_epoch = 0
    if args.resume:
        start_epoch = engine.resume_from(ctx, args.resume)
        if args.start_epoch is not None:
            start_epoch = args.start_epoch
        engine.evaluate_all(ctx, loader_eval)
    elif args.start_epoch is not None:
        start_epoch = args.start_epoch
    # --finetune adapts head/pos-embed; --initial-checkpoint is timm's
    # load-at-create (same shape-safe loader; identical-shape leaves load
    # exactly). --finetune wins when both are given.
    init_ckpt = args.finetune or getattr(args, "initial_checkpoint", "")
    if init_ckpt:
        from autoprog_tpu.finetune import load_pretrained_weights
        from autoprog_tpu.parallel.mesh import replicate
        ctx.state = ctx.state.replace(params=replicate(
            ctx.mesh, load_pretrained_weights(
                ctx.state.params, init_ckpt, use_ema=args.model_ema,
                num_classes=args.num_classes)))
        engine.evaluate_all(ctx, loader_eval)

    num_epochs = ctx.schedule.num_epochs
    _logger.info("Scheduled epochs: %d", num_epochs)
    epoch_time_m = AverageMeter()
    best_metric = best_epoch = None
    try:
        for epoch in range(start_epoch, num_epochs):
            train_metrics = engine.train_one_epoch(
                ctx, epoch, loader_train, r=img_size,
                splits=args.batch_splits, epoch_time_m=epoch_time_m,
                re_prob=args.reprob)
            eval_metrics, names = engine.evaluate_all(ctx, loader_eval)
            if hasattr(ctx.schedule, "observe"):  # plateau schedule
                ctx.schedule.observe(max(eval_metrics[n] for n in names))
            if ctx.is_primary and output_dir:
                update_summary(epoch, train_metrics, eval_metrics,
                               os.path.join(output_dir, "summary.csv"),
                               write_header=best_metric is None)
            if ctx.saver.enabled:
                save_metric = max(eval_metrics[n] for n in names)
                payload = engine.ckpt_payload(
                    ctx, {"r": img_size, "stage": 0})
                best_metric, best_epoch = ctx.saver.save_checkpoint(
                    payload, epoch, metric=save_metric)
    except KeyboardInterrupt:
        pass
    if best_metric is not None:
        _logger.info("*** Best metric: %s (epoch %s)", best_metric,
                     best_epoch)
    _logger.info("total train time: %.1fs", epoch_time_m.sum)
    return best_metric


if __name__ == "__main__":
    main(sys.argv[1:])
