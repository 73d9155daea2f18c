"""Input pipeline: multiprocess decode/augment workers + device prefetch.

TPU-native replacement for the timm/tlt loader stack (`create_loader` /
`create_token_label_loader` + prefetcher, `main_prog.py:640-708`; native
component 6 in SURVEY §2.3). Differences by design:

  * per-host sharding of a globally-shuffled index stream replaces
    DistributedSampler (`set_epoch` reshuffles with a seed every epoch so
    all hosts derive the same permutation, `main_prog.py:861-862`);
  * workers are a fork Pool decoding with PIL/numpy; batches prefetch
    through a background thread so host aug overlaps device compute
    (pinned-memory H2D prefetch has no TPU analogue — `shard_batch` does
    the transfer);
  * token-label maps are cropped/flipped with the image's own crop params
    and resampled to a fixed grid, keeping batch shapes static for XLA.

A libjpeg-turbo C++ decode path can slot in behind the same worker fn.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from autoprog_tpu.data.dataset import FixedAugDataset
from autoprog_tpu.data.mixup import Mixup
from autoprog_tpu.data.transforms import CropParams, EvalTransform, TrainTransform

_WORKER_STATE = {}


def _worker_init(dataset, transform, label_map_hw, clean_transform=None,
                 aug_splits=0):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["transform"] = transform
    _WORKER_STATE["label_map_hw"] = label_map_hw
    _WORKER_STATE["clean_transform"] = clean_transform
    _WORKER_STATE["aug_splits"] = aug_splits


def crop_label_maps(scores: np.ndarray, inds: np.ndarray, cp: CropParams,
                    out_hw: int) -> tuple:
    """Nearest-resample the top-K maps to the crop region at a fixed grid."""
    K, Hm, Wm = scores.shape
    ys = (cp.top + (np.arange(out_hw) + 0.5) * cp.height / out_hw)
    xs = (cp.left + (np.arange(out_hw) + 0.5) * cp.width / out_hw)
    yi = np.clip((ys * Hm / cp.src_h).astype(np.int64), 0, Hm - 1)
    xi = np.clip((xs * Wm / cp.src_w).astype(np.int64), 0, Wm - 1)
    s = scores[:, yi][:, :, xi]
    ix = inds[:, yi][:, :, xi]
    if cp.hflip:
        s, ix = s[:, :, ::-1], ix[:, :, ::-1]
    if cp.vflip:
        s, ix = s[:, ::-1], ix[:, ::-1]
    return np.ascontiguousarray(s), np.ascontiguousarray(ix)


def _transform_sample(img, label, maps, seed, rng=None):
    tf = _WORKER_STATE["transform"]
    map_hw = _WORKER_STATE["label_map_hw"]
    if isinstance(tf, EvalTransform):
        return tf(img), label, None
    if rng is None:
        rng = np.random.default_rng(seed)
    splits = _WORKER_STATE.get("aug_splits") or 0
    if splits > 1:
        # AugMix-style views: one clean + N-1 augmented of the same sample
        clean_tf = _WORKER_STATE["clean_transform"]
        xs = [clean_tf(img, np.random.default_rng(seed))[0]]
        for k in range(1, splits):
            xs.append(tf(img, np.random.default_rng((seed, k)))[0])
        return np.stack(xs), label, None
    x, cp = tf(img, rng)
    out_maps = None
    if maps is not None:
        out_maps = crop_label_maps(maps[0], maps[1], cp, map_hw)
    return x, label, out_maps


def _load_one(args):
    idx, seed = args
    ds = _WORKER_STATE["dataset"]
    img, label, maps = ds.load(idx)
    rng = ds.aug_rng(idx, 0) if isinstance(ds, FixedAugDataset) else None
    return _transform_sample(img, label, maps, seed, rng)


def _transform_stream_item(args):
    """Worker fn for iterable datasets: the parent streams (sample, seed)
    pairs (raw JPEG bytes travel cheaply through the pool's pipe); decode
    + augment happen here."""
    (img, label, maps), seed = args
    return _transform_sample(img, label, maps, seed)


class Loader:
    def __init__(self, dataset, *, batch_size: int, is_training: bool,
                 transform, mixup: Optional[Mixup] = None,
                 num_workers: int = 4, seed: int = 42,
                 label_map_hw: int = 14, drop_last: Optional[bool] = None,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 3, aug_splits: int = 0,
                 clean_transform=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.is_training = is_training
        self.transform = transform
        self.mixup = mixup
        self.num_workers = num_workers
        self.seed = seed
        self.label_map_hw = label_map_hw
        self.drop_last = is_training if drop_last is None else drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.aug_splits = aug_splits
        self.clean_transform = clean_transform
        self.epoch = 0
        self._pool = None

    # -- sampler -----------------------------------------------------------

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def is_iterable(self) -> bool:
        return bool(getattr(self.dataset, "is_iterable", False))

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.is_training:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        mine = order[self.process_index::self.process_count]
        if self.drop_last:
            usable = (len(mine) // self.batch_size) * self.batch_size
            mine = mine[:usable]
        return mine

    def __len__(self) -> int:
        if self.is_iterable:
            # iterable datasets report the GLOBAL count; per-shard counts
            # under file-level sharding are an estimate (+/- one batch)
            mine = len(self.dataset) // self.process_count
        else:
            mine = len(self._indices())
        if self.drop_last:
            return mine // self.batch_size
        return (mine + self.batch_size - 1) // self.batch_size

    # -- workers -----------------------------------------------------------

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            import multiprocessing as mp
            # spawn, not fork: fork children of a jax-initialized trainer
            # inherit every open fd — including the TPU tunnel sockets —
            # and if the trainer dies uncleanly the orphaned workers keep
            # those sockets open, wedging the next client's attach
            # (observed live; see also the CPython warning about forking
            # multithreaded processes). Workers never import jax, so
            # spawn costs only the one-time interpreter start.
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init,
                initargs=(self.dataset, self.transform, self.label_map_hw,
                          self.clean_transform, self.aug_splits))
        if self.num_workers == 0 and not _WORKER_STATE.get("inline"):
            _worker_init(self.dataset, self.transform, self.label_map_hw,
                         self.clean_transform, self.aug_splits)
            _WORKER_STATE["inline"] = True

    def close(self):
        pool, self._pool = self._pool, None
        if pool is None:
            return
        # Pool.terminate() deadlocks when called mid-imap: an idle worker
        # blocks in inqueue.recv() HOLDING the queue's process-shared
        # rlock, and terminate's _help_stuff_finish() then blocks forever
        # acquiring that same rlock (observed live: the flagship rehearsal
        # hung 2h at a stage boundary, main thread + one worker parked on
        # the same shared futex). Teardown order that cannot deadlock the
        # trainer:
        #   1. stop the worker-handler thread first so it cannot respawn
        #      workers we are about to kill;
        #   2. SIGKILL the worker processes — the only other holders of
        #      the queue locks;
        #   3. run the Pool's own terminate() on a daemon thread with a
        #      bounded join: if a killed worker died holding a lock, the
        #      acquire inside terminate can still hang, but it hangs a
        #      disposable thread, not the trainer. Finalize pops itself
        #      from the registry at call entry, so interpreter exit will
        #      not re-run (and re-hang) the teardown.
        try:
            import multiprocessing.pool as mpp
            pool._worker_handler._state = mpp.TERMINATE
        except Exception:
            pass
        for p in list(getattr(pool, "_pool", [])):
            try:
                p.kill()
            except Exception:
                pass
        for p in list(getattr(pool, "_pool", [])):
            try:
                p.join(timeout=2)
            except Exception:
                pass
        t = threading.Thread(target=pool.terminate, daemon=True)
        t.start()
        t.join(timeout=10)

    def __del__(self):
        # stage rebuilds replace loaders; make sure worker pools die with
        # them instead of accumulating across stages
        try:
            self.close()
        except Exception:
            pass

    # -- iteration ---------------------------------------------------------

    def _collate(self, samples, batch_idx: int = 0) -> Dict[str, np.ndarray]:
        xs, labels, maps = zip(*samples)
        if self.aug_splits > 1:
            # [B, splits, H, W, C] -> concatenated splits [splits*B, ...]
            # (clean split first — the timm AugMixDataset batch layout);
            # uint8 stays uint8 so the in-step normalize still triggers
            stacked = np.stack(xs)
            if stacked.dtype != np.uint8:
                stacked = stacked.astype(np.float32)
            image = np.concatenate(
                [stacked[:, k] for k in range(self.aug_splits)], axis=0)
            return {"image": image, "label": np.asarray(labels, np.int32)}
        stacked = np.stack(xs)
        batch: Dict[str, np.ndarray] = {
            "image": stacked if stacked.dtype == np.uint8
            else stacked.astype(np.float32),
            "label": np.asarray(labels, np.int32),
        }
        if maps[0] is not None:
            batch["label_scores"] = np.stack([m[0] for m in maps])
            batch["label_inds"] = np.stack([m[1] for m in maps])
        if self.is_training and self.mixup is not None:
            # keyed by batch index, not batch contents — content-derived
            # seeds collide (birthday bound) and repeat lambda/cut boxes
            rng = np.random.default_rng(
                (self.seed, self.epoch, batch_idx, len(samples)))
            batch = self.mixup(batch, rng)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._ensure_pool()
        if self.num_workers == 0:
            # refresh inline state (transform may have changed between stages)
            _worker_init(self.dataset, self.transform, self.label_map_hw,
                         self.clean_transform, self.aug_splits)
        base = np.random.SeedSequence([self.seed, self.epoch]).generate_state(1)[0]
        if self.is_iterable:
            stream = self.dataset.iter_samples(
                self.epoch if self.is_training else 0,
                self.process_index, self.process_count)
            args = ((s, int(base) + j) for j, s in enumerate(stream))
            work_fn = _transform_stream_item
        else:
            idxs = self._indices()
            args = [(int(i), int(base) + int(i)) for i in idxs]
            work_fn = _load_one
        nb = len(self)

        def batches_of(it):
            buf = []
            bidx = 0
            for s in it:
                buf.append(s)
                if len(buf) == self.batch_size:
                    yield self._collate(buf, bidx)
                    buf = []
                    bidx += 1
            if buf and not self.drop_last:
                yield self._collate(buf, bidx)

        if self.num_workers == 0:
            yield from batches_of(map(work_fn, args))
            return

        it = self._pool.imap(work_fn, args, chunksize=8)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def feeder():
            try:
                for b in batches_of(it):
                    q.put(b)
            finally:
                q.put(DONE)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        produced = 0
        while True:
            b = q.get()
            if b is DONE:
                break
            produced += 1
            yield b
        t.join()
        # per-shard counts are only estimated for iterable datasets
        assert self.is_iterable or not self.drop_last or produced == nb


def pad_eval_batch(batch: Dict[str, np.ndarray], to_size: int
                   ) -> Dict[str, np.ndarray]:
    """Pad a partial final eval batch up to the compiled batch size.

    Padding rows get label -1 (masked out of every metric sum by
    `StepBuilder.eval_step`) and zero images. Keeps eval shapes static —
    one compiled program regardless of dataset-size remainders — and keeps
    the batch axis divisible by the mesh's data-axis size (the reference
    never hits this because torch tolerates ragged final batches)."""
    n = int(batch["label"].shape[0])
    if n >= to_size:
        return batch
    pad = to_size - n
    out: Dict[str, np.ndarray] = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k == "label":
            out[k] = np.concatenate([v, np.full((pad,), -1, v.dtype)])
        else:
            out[k] = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
    return out


def create_loader(dataset, *, input_size: int, batch_size: int,
                  is_training: bool, re_prob: float = 0.0,
                  re_mode: str = "pixel", re_count: int = 1,
                  scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3), hflip: float = 0.5,
                  vflip: float = 0.0, color_jitter: float = 0.0,
                  auto_augment: str = "", interpolation: str = "random",
                  mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                  num_workers: int = 4, crop_pct: float = 0.96,
                  mixup: Optional[Mixup] = None, seed: int = 42,
                  no_aug: bool = False, process_index: int = 0,
                  process_count: int = 1, tta: int = 0) -> Loader:
    """Loader factory mirroring `create_token_label_loader`/`create_loader`
    call sites (`main_prog.py:640-708`, `main_prog.py:1443-1530`).

    tta > 1 (eval only): each sample is emitted `tta` times adjacently
    with deterministic augmentation variants (TTAEvalTransform) — the
    input pipeline the reference's `--tta` group-averaging assumes but
    never ships (`/root/reference/main.py:961-964`)."""
    from autoprog_tpu.data.transforms import RandAugment

    if is_training and not no_aug:
        tf = TrainTransform(
            size=input_size, scale=tuple(scale), ratio=tuple(ratio),
            hflip=hflip, vflip=vflip, color_jitter=color_jitter,
            rand_augment=RandAugment.from_policy(auto_augment),
            re_prob=re_prob, re_mode=re_mode, re_count=re_count,
            interpolation=interpolation, mean=tuple(mean), std=tuple(std))
    elif tta and tta > 1:
        from autoprog_tpu.data.dataset import TTADataset
        from autoprog_tpu.data.transforms import TTAEvalTransform
        dataset = TTADataset(dataset, tta)
        tf = TTAEvalTransform(size=input_size, crop_pct=crop_pct,
                              interpolation="bicubic" if interpolation in
                              ("", "random") else interpolation,
                              mean=tuple(mean), std=tuple(std))
    else:
        tf = EvalTransform(size=input_size, crop_pct=crop_pct,
                           interpolation="bicubic" if interpolation in
                           ("", "random") else interpolation,
                           mean=tuple(mean), std=tuple(std))
    return Loader(dataset, batch_size=batch_size, is_training=is_training,
                  transform=tf, mixup=mixup, num_workers=num_workers,
                  seed=seed, process_index=process_index,
                  process_count=process_count)
