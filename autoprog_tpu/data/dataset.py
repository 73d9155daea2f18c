"""Dataset readers.

Replaces `prog/dataset.py` (`create_dataset` / `StoredImageDataset`) and
tlt's `create_token_label_dataset` (SURVEY §2.2):

  * `ImageFolderDataset` — class-per-directory layout with split
    auto-discovery like `_search_split` (`prog/dataset.py:66-77`);
  * `TokenLabelDataset` — ImageFolder plus per-image dense top-K label
    maps (.npz with 'scores' [K,H,W] f32 + 'indices' [K,H,W] int, or .npy
    stacked [2,K,H,W]);
  * `SyntheticDataset` — deterministic generated images for tests/benches
    (`synthetic://` data_dir);
  * `FixedAugDataset` — the *search* dataset: deterministic per-index
    augmentation seeds so candidate loss probes see identical batches
    across configs and epochs. (The reference's `StoredImageDataset`
    intended to cache transformed samples but never writes its storage,
    `prog/dataset.py:33-54`; deterministic seeds achieve the comparability
    goal without pinning GBs of pixels — SURVEY §7.4.)
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _find_split(root: str, split: str) -> str:
    """Split directory auto-discovery: try the name, then common aliases."""
    cand = [split]
    if split == "validation":
        cand += ["val", "valid", "validation"]
    if split == "train":
        cand += ["training"]
    for c in cand:
        p = os.path.join(root, c)
        if os.path.isdir(p):
            return p
    if os.path.isdir(root):
        return root
    raise FileNotFoundError(f"no split dir for {split!r} under {root}")


class ImageFolderDataset:
    #: decode JPEGs in the native C++ pipeline when the library is present
    use_native: bool = True

    def __init__(self, root: str, split: str = "train"):
        self.root = _find_split(root, split)
        classes = sorted(d for d in os.listdir(self.root)
                         if os.path.isdir(os.path.join(self.root, d)))
        if not classes:
            raise FileNotFoundError(f"no class dirs under {self.root}")
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(self.root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))
        self.num_classes = len(classes)

    def __len__(self):
        return len(self.samples)

    def _load_image(self, path: str):
        if self.use_native and path.lower().endswith((".jpg", ".jpeg")):
            from autoprog_tpu.data import native
            from autoprog_tpu.data.raw import RawJpeg
            if native.available():
                with open(path, "rb") as f:
                    return RawJpeg(f.read())
        from PIL import Image
        with Image.open(path) as im:
            return im.convert("RGB")

    def load(self, i: int):
        path, label = self.samples[i]
        return self._load_image(path), label, None


class TokenLabelDataset(ImageFolderDataset):
    """ImageFolder + per-image dense label maps mirrored in `label_root`
    with the same relative paths (tlt layout, `main_prog.py:576-578`)."""

    def __init__(self, root: str, label_root: str, split: str = "train"):
        super().__init__(root, split)
        self.label_root = label_root

    def _label_path(self, img_path: str) -> Optional[str]:
        rel = os.path.relpath(img_path, self.root)
        base = os.path.splitext(os.path.join(self.label_root, rel))[0]
        for ext in (".npz", ".npy"):
            if os.path.isfile(base + ext):
                return base + ext
        return None

    def load(self, i: int):
        path, label = self.samples[i]
        img = self._load_image(path)
        lp = self._label_path(path)
        if lp is None:
            return img, label, None
        if lp.endswith(".npz"):
            z = np.load(lp)
            maps = (z["scores"].astype(np.float32),
                    z["indices"].astype(np.int32))
        else:
            arr = np.load(lp)
            maps = (arr[0].astype(np.float32), arr[1].astype(np.int32))
        return img, label, maps


class SyntheticDataset:
    """Deterministic generated images; index i always yields the same
    sample. Used for tests, benches and `synthetic://` runs."""

    def __init__(self, size: int = 1024, num_classes: int = 1000,
                 image_size: int = 224, token_label_hw: Optional[int] = None,
                 seed: int = 0):
        self.size = size
        self.num_classes = num_classes
        self.image_size = image_size
        self.token_label_hw = token_label_hw
        self.seed = seed

    def __len__(self):
        return self.size

    def load(self, i: int):
        from PIL import Image
        rng = np.random.default_rng(self.seed * 1_000_003 + i)
        label = int(rng.integers(self.num_classes))
        # class-dependent mean so learning is actually possible
        base = rng.normal(0.45 + 0.1 * (label % 7 - 3) / 3.0, 0.2,
                          (self.image_size, self.image_size, 3))
        img = Image.fromarray(
            (np.clip(base, 0, 1) * 255).astype(np.uint8))
        maps = None
        if self.token_label_hw:
            hw = self.token_label_hw
            scores = rng.random((5, hw, hw)).astype(np.float32)
            scores /= scores.sum(0, keepdims=True) * 1.25
            inds = rng.integers(0, self.num_classes,
                                (5, hw, hw)).astype(np.int32)
            inds[0] = label
            maps = (scores, inds)
        return img, label, maps


class FixedAugDataset:
    """Wrap a dataset so augmentation randomness is a pure function of the
    sample index (see module docstring)."""

    def __init__(self, dataset, seed: int = 1234):
        self.dataset = dataset
        self.seed = seed
        self.num_classes = getattr(dataset, "num_classes", None)

    def __len__(self):
        return len(self.dataset)

    def load(self, i: int):
        return self.dataset.load(i)

    def aug_rng(self, i: int, epoch: int) -> np.random.Generator:
        del epoch  # fixed across epochs by design
        return np.random.default_rng(self.seed * 7_777_777 + i)


def create_dataset(name: str, root: str, split: str = "train",
                   is_training: bool = False, fixed_aug: bool = False,
                   token_label_root: str = "", num_classes: int = 1000,
                   fake_size: int = 1024, image_size: int = 224,
                   **_):
    """Dataset factory (`prog/dataset.py:79-94` + tlt dataset)."""
    if name == "synthetic" or root.startswith("synthetic://"):
        ds = SyntheticDataset(
            size=fake_size, num_classes=num_classes, image_size=image_size,
            token_label_hw=14 if token_label_root else None)
    elif token_label_root and is_training:
        ds = TokenLabelDataset(root, token_label_root, split)
    else:
        ds = ImageFolderDataset(root, split)
    if fixed_aug:
        ds = FixedAugDataset(ds)
    return ds


def get_mean_and_std(dataset, max_samples: int = 256):
    """Per-channel mean/std of a dataset (reference `utils/utils.py:145`)."""
    import numpy as np
    acc = np.zeros(3)
    acc2 = np.zeros(3)
    n = 0
    for i in range(min(len(dataset), max_samples)):
        img = dataset.load(i)[0]
        if not hasattr(img, "mode"):  # RawJpeg bytes -> decode
            from io import BytesIO
            from PIL import Image
            img = Image.open(BytesIO(img)).convert("RGB")
        x = np.asarray(img, np.float64) / 255.0
        acc += x.mean(axis=(0, 1))
        acc2 += (x ** 2).mean(axis=(0, 1))
        n += 1
    mean = acc / n
    std = np.sqrt(np.maximum(acc2 / n - mean ** 2, 0))
    return mean, std
