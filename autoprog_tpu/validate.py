"""Standalone checkpoint evaluator (reference `validate.py:111-344`).

Single or bulk evaluation of checkpoints: top-1/top-5, per-EMA-tree
selection, CSV results, retry-on-OOM batch halving, directory / wildcard /
'all' bulk sweeps. Reproduces the train loop's validator bit-exactly (both
share `StepBuilder.eval_step`).
"""

from __future__ import annotations

import argparse
import csv
import glob
import logging
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp

from autoprog_tpu.config import resolve_data_config
from autoprog_tpu.data.dataset import create_dataset
from autoprog_tpu.data.loader import create_loader, pad_eval_batch
from autoprog_tpu.parallel.mesh import make_mesh, shard_batch
from autoprog_tpu.registry import create_model
from autoprog_tpu.train.checkpoint import load_checkpoint_file
from autoprog_tpu.train.steps import StepBuilder
from autoprog_tpu.utils.logging import setup_logging
from flax import serialization

_logger = logging.getLogger("autoprog_tpu.validate")


def build_parser():
    p = argparse.ArgumentParser(description="autoprog_tpu validation")
    p.add_argument("data_dir", metavar="DIR", nargs="?",
                   default="synthetic://")
    p.add_argument("--dataset", "-d", default="")
    p.add_argument("--split", default="validation")
    p.add_argument("--model", default="volo_d1")
    p.add_argument("--checkpoint", default="")
    p.add_argument("-b", "--batch-size", type=int, default=256)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--crop-pct", type=float, default=None)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--interpolation", default="", type=str)
    p.add_argument("--mean", type=float, nargs="+", default=None)
    p.add_argument("--std", type=float, nargs="+", default=None)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--ema-idx", type=int, default=None)
    p.add_argument("--workers", "-j", type=int, default=4)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--results-file", default="")
    p.add_argument("--no-bf16", action="store_true", default=False)
    p.add_argument("--test-pool", action="store_true", default=False,
                   help="test-time pooling: fuse mean-pooled dense class "
                        "logits instead of max (reference validate.py "
                        "--test-pool via timm TestTimePoolHead; no-op for "
                        "models without a dense aux head)")
    p.add_argument("--tta", type=int, default=0,
                   help="average logits over groups of N consecutive "
                        "samples (augmentation reduction, validate.py:228)")
    p.add_argument("--real-labels", default="", type=str, metavar="JSON",
                   help="ImageNet-Real relabeled eval: JSON list mapping "
                        "the sorted val images to acceptable label sets")
    p.add_argument("--fake-data-size", type=int, default=256)
    p.add_argument("--input-size", default=None, nargs=3, type=int)
    return p


def _restore_params(ckpt, template, use_ema: bool, ema_idx: Optional[int]):
    key = "state_dict"
    if use_ema:
        if ema_idx is not None and f"state_dict_ema_{ema_idx}" in ckpt:
            key = f"state_dict_ema_{ema_idx}"
        elif "state_dict_ema_0" in ckpt:
            key = "state_dict_ema_0"
        else:
            _logger.info("no EMA weights found, using online weights")
    # NOTE: from_state_dict keeps the STORED dtype, so bf16-stored EMA
    # trees (--model-ema-bf16) evaluate here at exactly the dtype the
    # training loop evaluated them — the bit-match e2e test covers both
    return serialization.from_state_dict(template, ckpt[key])


def validate(args) -> dict:
    mesh = make_mesh()
    model_name = args.model
    ckpt = None
    if args.checkpoint:
        ckpt = load_checkpoint_file(args.checkpoint)
        model_name = ckpt.get("arch", model_name)
    mdef = create_model(model_name)
    data_config = resolve_data_config(args, mdef.default_cfg)
    img = args.img_size or data_config["input_size"][-1]
    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    # a VOLO trained without token labels has no aux head (the trainer
    # builds return_dense=args.token_label, engine.py:85) — adapt the eval
    # model to what the checkpoint actually contains
    return_dense = None
    if ckpt is not None and "state_dict" in ckpt:
        return_dense = "aux_head" in ckpt["state_dict"]
    model = mdef.make(num_classes=args.num_classes, img_size=img,
                      dtype=dtype, return_dense=return_dense,
                      aux_fusion="mean" if args.test_pool else "max")
    if args.test_pool and not getattr(model, "return_dense", False):
        _logger.info("--test-pool: model has no dense aux head; ignored")
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, img, img, 3)), train=False))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if ckpt is not None:
        params = _restore_params(ckpt, params, args.use_ema, args.ema_idx)
        if "batch_stats" in ckpt and batch_stats:
            batch_stats = serialization.from_state_dict(
                batch_stats, ckpt["batch_stats"])

    ds = create_dataset(args.dataset, args.data_dir, split=args.split,
                        is_training=False, num_classes=args.num_classes,
                        fake_size=args.fake_data_size, image_size=img)
    sb = StepBuilder(model=model, tx=None, train_loss=None,
                     num_classes=args.num_classes)
    tta = int(args.tta or 0)
    use_preds = tta > 1 or bool(args.real_labels)
    # one compiled forward serves metrics, TTA group-averaging AND
    # real-label predictions (the reference derives all three from one
    # `model(input)`, `validate.py:228-238`); no eager per-batch apply
    step = sb.logits_eval_step(tta=max(tta, 1)) if use_preds \
        else sb.eval_step()

    # the batch must divide into both TTA view-groups (never split a
    # group across batches) and the mesh data axis (shard_batch)
    import math
    align = math.lcm(max(tta, 1), int(mesh.shape["data"]))
    batch_size = max(align, (args.batch_size // align) * align)
    while True:
        try:
            loader = create_loader(
                ds, input_size=img, batch_size=batch_size,
                is_training=False,
                crop_pct=args.crop_pct or data_config["crop_pct"],
                interpolation=data_config["interpolation"],
                mean=data_config["mean"], std=data_config["std"],
                num_workers=args.workers, tta=tta)
            acc = None
            real = _RealLabels(args.real_labels, ds) if args.real_labels \
                else None
            src_idx = 0
            for i, batch in enumerate(loader):
                orig_n = int(batch["label"].shape[0])
                batch = pad_eval_batch(batch, loader.batch_size)
                batch = shard_batch(mesh, batch)
                if use_preds:
                    m, preds = step(params, batch_stats, batch)
                    n_groups = orig_n // max(tta, 1)
                    if real is not None:
                        real.add_preds(src_idx, preds[:n_groups])
                    src_idx += n_groups
                else:
                    m = step(params, batch_stats, batch)
                    src_idx += orig_n
                # device-side accumulation: one D2H readback per epoch,
                # plus one per log interval for the progress line
                acc = m if acc is None else jax.tree.map(jnp.add, acc, m)
                if i % args.log_interval == 0:
                    _logger.info(
                        "Test: [%4d/%d]  Acc@1 %.4f", i, len(loader),
                        100 * float(acc["top1_sum"]) /
                        max(float(acc["count"]), 1))
            sums = {k: float(v) for k, v in acc.items()} if acc is not None \
                else {"loss_sum": 0.0, "top1_sum": 0.0, "top5_sum": 0.0,
                      "count": 0.0}
            break
        except jax.errors.JaxRuntimeError as e:
            # retry-on-OOM batch halving (`validate.py:311-322`), keeping
            # the tta-group / data-axis alignment on every retry
            if "RESOURCE_EXHAUSTED" in str(e) and batch_size > align:
                batch_size = max(align,
                                 ((batch_size // 2) // align) * align)
                _logger.warning("OOM — retrying with batch size %d",
                                batch_size)
                continue
            raise
    n = max(sums["count"], 1.0)
    result = {
        "model": model_name,
        "checkpoint": args.checkpoint,
        "top1": round(100.0 * sums["top1_sum"] / n, 4),
        "top5": round(100.0 * sums["top5_sum"] / n, 4),
        "loss": round(sums["loss_sum"] / n, 4),
        "img_size": img,
        "crop_pct": args.crop_pct or data_config["crop_pct"],
        "count": int(n),
    }
    if args.real_labels and real is not None:
        # a positionally-applied list-form mapping (no filename hits) is
        # reported under a distinct key so a misaligned folder ordering
        # can never masquerade as a verified real-labels score
        key = "top1_real_positional" if real.positional else "top1_real"
        result[key] = round(real.top1, 4)
    _logger.info("Result: %s", result)
    return result


class _RealLabels:
    """ImageNet-Real relabeled accuracy (reference uses timm
    RealLabelsImagenet via `dataset.filenames(basename=True)`,
    `/root/reference/validate.py:186-187`): acceptable label sets are
    keyed by each sample's actual FILENAME, so the dataset's iteration
    order — not a sorted-name assumption — drives the lookup. Accepts
    both JSON forms: a dict {basename: [labels]} or the original
    real.json list (implicitly ILSVRC2012_val_%08d.JPEG order). Images
    with empty sets are excluded, as in timm."""

    def __init__(self, json_path: str, dataset):
        import json
        import os as _os
        self.positional = False
        with open(json_path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            by_name = data
        else:
            by_name = {f"ILSVRC2012_val_{i + 1:08d}.JPEG": s
                       for i, s in enumerate(data)}
        names = [_os.path.basename(p)
                 for p, _ in getattr(dataset, "samples", [])]
        if names:
            self.sets = [by_name.get(nm) or [] for nm in names]
            if isinstance(data, list) and not any(self.sets):
                # a list-form real.json against a custom val folder whose
                # filenames are not ILSVRC2012_val_%08d.JPEG: zero name
                # hits — fall back to positional order instead of
                # silently reporting 0/0
                _logger.warning(
                    "--real-labels: no dataset filename matched the "
                    "list-form JSON; applying labels positionally")
                self.sets = data
                self.positional = True
        elif isinstance(data, list):
            self.sets = data  # no filenames (synthetic/iterable): by order
        else:
            self.sets = []
        self.correct = 0
        self.total = 0

    def add(self, start_idx: int, logits) -> None:
        self.add_preds(start_idx, logits.argmax(-1))

    def add_preds(self, start_idx: int, preds) -> None:
        import numpy as np
        preds = np.asarray(preds)
        for j, p in enumerate(preds):
            idx = start_idx + j
            if idx >= len(self.sets) or not self.sets[idx]:
                continue
            self.total += 1
            self.correct += int(p in self.sets[idx])

    @property
    def top1(self) -> float:
        return 100.0 * self.correct / max(self.total, 1)


def write_results(results_file: str, results: List[dict]) -> None:
    with open(results_file, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        w.writeheader()
        for r in results:
            w.writerow(r)


def main(argv=None):
    from autoprog_tpu.platform import apply_platform_env
    apply_platform_env()
    setup_logging()
    args = build_parser().parse_args(argv)
    # bulk modes: directory of checkpoints, wildcard, or every registered
    # model (`validate.py:282-297`; the reference's `--model all` sweeps
    # the timm registry)
    checkpoints: List[str] = []
    if args.checkpoint and os.path.isdir(args.checkpoint):
        checkpoints = sorted(glob.glob(
            os.path.join(args.checkpoint, "*.ckpt")))
    elif "*" in args.checkpoint:
        checkpoints = sorted(glob.glob(args.checkpoint))
    results = []
    if args.model == "all":
        from autoprog_tpu.registry import list_models
        names = [n for n in list_models() if n != "model_variant"]
        ckpt_by_arch = {}
        for c in checkpoints:
            try:
                arch = load_checkpoint_file(c).get("arch")
            except Exception:
                continue
            ckpt_by_arch.setdefault(arch, c)
        for name in names:
            sub = argparse.Namespace(**vars(args))
            sub.model = name
            sub.checkpoint = ckpt_by_arch.get(name, "")
            try:
                results.append(validate(sub))
            except Exception as e:  # keep sweeping (`validate.py:323-326`)
                _logger.warning("model %s failed: %s", name, e)
        results.sort(key=lambda r: r["top1"], reverse=True)
    elif checkpoints:
        for c in checkpoints:
            sub = argparse.Namespace(**vars(args))
            sub.checkpoint = c
            results.append(validate(sub))
        results.sort(key=lambda r: r["top1"], reverse=True)
    else:
        results.append(validate(args))
    if args.results_file and results:
        write_results(args.results_file, results)
    if results:
        print(f"--result\n{results[0]}")
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
