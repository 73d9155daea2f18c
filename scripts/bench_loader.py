#!/usr/bin/env python
"""End-to-end host input-pipeline throughput: native C++ decode vs PIL.

Closes the PERF.md open item ("native decode path measured 1.8x PIL per
worker; not yet benchmarked end-to-end"): drives the REAL Loader
(fork worker pool + prefetch thread + full train augmentation at 224px)
over a generated JPEG ImageFolder and reports imgs/s with the fused C++
decode+crop+resize (`native/fastimage.cpp`) on and off. Compare against
the TPU step rate (bench.py) to see whether the host pipeline can feed
the chip. Reference analogue: timm loader + `--workers` processes
(`/root/reference/main_prog.py:640-708`).

Usage: python scripts/bench_loader.py [--workers N] [--images N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_jpeg_folder(root: str, n: int, classes: int = 8,
                     size=(500, 400)) -> None:
    from PIL import Image
    if os.path.exists(os.path.join(root, "DONE")):
        return
    rs = np.random.RandomState(0)
    for i in range(n):
        c = i % classes
        d = os.path.join(root, "train", str(c))
        os.makedirs(d, exist_ok=True)
        arr = rs.randint(0, 255, (size[1], size[0], 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"), quality=90)
    open(os.path.join(root, "DONE"), "w").close()


def drive(root: str, *, workers: int, use_native: bool,
          batch_size: int = 128, img: int = 224,
          auto_augment: str = "rand-m9-mstd0.5-inc1") -> float:
    from autoprog_tpu.data.dataset import ImageFolderDataset
    from autoprog_tpu.data.loader import create_loader

    ds = ImageFolderDataset(os.path.join(root, "train"))
    ds.use_native = use_native
    loader = create_loader(
        ds, input_size=img, batch_size=batch_size, is_training=True,
        scale=(0.08, 1.0), hflip=0.5, auto_augment=auto_augment,
        re_prob=0.25, num_workers=workers)
    loader.set_epoch(0)
    n = 0
    # one warmup batch (pool spin-up), then time the rest of the epoch
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for batch in it:
        n += batch["label"].shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def make_tfrecords(root: str, n: int, shards: int = 4,
                   size=(500, 400)) -> str:
    import io
    import tensorflow as tf
    from PIL import Image
    out = os.path.join(root, "tfrecord")
    if os.path.exists(os.path.join(out, "DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    rs = np.random.RandomState(0)
    per = n // shards
    for s in range(shards):
        path = os.path.join(out, f"train-{s:05d}-of-{shards:05d}")
        with tf.io.TFRecordWriter(path) as w:
            for _ in range(per):
                # low-frequency noise upsampled: JPEG-compresses to
                # ~100-120 KB like real ImageNet photos (pure noise is
                # incompressible and lands at ~235 KB — 2x pessimistic)
                small = rs.randint(0, 255, (size[1] // 8, size[0] // 8, 3),
                                   np.uint8)
                arr = np.asarray(Image.fromarray(small).resize(
                    size, Image.BILINEAR))
                arr = np.clip(arr.astype(np.int16) +
                              rs.randint(-8, 8, arr.shape), 0,
                              255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "JPEG", quality=90)
                ex = tf.train.Example(features=tf.train.Features(feature={
                    "image/encoded": tf.train.Feature(
                        bytes_list=tf.train.BytesList(
                            value=[buf.getvalue()])),
                    "image/class/label": tf.train.Feature(
                        int64_list=tf.train.Int64List(
                            value=[rs.randint(0, 8)]))}))
                w.write(ex.SerializeToString())
    open(os.path.join(out, "DONE"), "w").close()
    return out


def drive_tfrecord(root: str, epochs: int = 3) -> float:
    """Record-supply rate (raw JPEG bytes + label, decode excluded) —
    the number a chip consuming ~1.1k img/s must stay well under."""
    from autoprog_tpu.data.dataset import TFRecordImageDataset

    ds = TFRecordImageDataset(root, split="train", is_training=True)
    # warm the page cache
    for _ in ds.iter_samples(0, 0, 1):
        pass
    n = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        for _ in ds.iter_samples(e, 0, 1):
            n += 1
    return n / (time.perf_counter() - t0)


def drive_tfrecord_e2e(root: str, *, workers: int, use_native: bool,
                       batch_size: int = 128, img: int = 224,
                       auto_augment: str = "rand-m9-mstd0.5-inc1") -> float:
    """The ONE number VERDICT r3 asked for: records -> decode -> full
    train augmentation -> uint8 batches, through the real Loader (parent
    streams raw JPEG records, fork workers decode+augment). This is the
    host supply rate a chip eating ~1.1k img/s must stay under."""
    from autoprog_tpu.data.dataset import TFRecordImageDataset
    from autoprog_tpu.data.loader import create_loader

    ds = TFRecordImageDataset(root, split="train", is_training=True)
    # RawJpeg samples route to native inside the transform; the only
    # honest off-switch is the library kill-switch (workers inherit the
    # env at fork)
    os.environ["AUTOPROG_NO_NATIVE"] = "" if use_native else "1"
    loader = create_loader(
        ds, input_size=img, batch_size=batch_size, is_training=True,
        scale=(0.08, 1.0), hflip=0.5, auto_augment=auto_augment,
        re_prob=0.25, num_workers=workers)
    loader.transform.emit_uint8 = True  # the uint8-pipe production path
    loader.set_epoch(0)
    it = iter(loader)
    next(it)  # pool spin-up + page-cache warm
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += batch["label"].shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--images", type=int, default=2048)
    p.add_argument("--root", default="/tmp/bench_loader_data")
    p.add_argument("--tfrecord", action="store_true",
                   help="benchmark raw TFRecord record-supply rate instead "
                        "of the decode/augment loader")
    p.add_argument("--tfrecord-e2e", action="store_true",
                   help="records -> native decode -> RandAugment -> uint8 "
                        "batches through the real Loader, one measured "
                        "img/s number")
    args = p.parse_args()
    if args.tfrecord:
        troot = make_tfrecords(args.root, args.images)
        rate = drive_tfrecord(troot)
        print(f"tfrecord supply: {rate:8.1f} records/s "
              f"({args.images} records)", flush=True)
        return
    if args.tfrecord_e2e:
        troot = make_tfrecords(args.root, args.images)
        for nat in (True, False):
            best = 0.0
            for _ in range(args.repeats):
                best = max(best, drive_tfrecord_e2e(
                    troot, workers=args.workers, use_native=nat))
            name = "native C++" if nat else "PIL"
            print(f"tfrecord e2e {name:<10s} randaug workers="
                  f"{args.workers}: {best:7.1f} img/s "
                  f"(best of {args.repeats})", flush=True)
        return
    make_jpeg_folder(args.root, args.images)
    # interleaved repeats, best-of: page cache, fork-pool spin-up, and
    # host drift otherwise dominate a single epoch-length measurement
    configs = [(aug, nat) for aug in ("rand-m9-mstd0.5-inc1", "")
               for nat in (False, True)]
    best = {c: 0.0 for c in configs}
    for _ in range(args.repeats):
        for c in configs:
            aug, nat = c
            best[c] = max(best[c], drive(args.root, workers=args.workers,
                                         use_native=nat, auto_augment=aug))
    for (aug, nat), rate in best.items():
        name = "native C++" if nat else "PIL"
        aug_s = aug or "no-randaug"
        print(f"{name:<10s} {aug_s:<22s} workers={args.workers}: "
              f"{rate:7.1f} img/s (best of {args.repeats})", flush=True)


if __name__ == "__main__":
    main()
