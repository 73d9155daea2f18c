"""Mixup / CutMix collate (host-side numpy).

Replaces timm `Mixup` / tlt `TokenLabelMixup` (`main_prog.py:604-625`;
SURVEY §2.2). Batch mode only (the shipped configs never use pair/elem
mode): one lambda per batch, mixing with the batch-flipped samples.

For token-label batches the same cut box (rescaled) is applied to the dense
label maps so per-token targets stay aligned with the pixels, and the mixed
ground-truth row is emitted as `gt_soft` for the loss's slot-0
(tlt's mixup mixes label maps the same way).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np


def one_hot_np(labels: np.ndarray, num_classes: int,
               smoothing: float = 0.0) -> np.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    out = np.full((labels.shape[0], num_classes), off, np.float32)
    out[np.arange(labels.shape[0]), labels] = on
    return out


def _cut_box(h: int, w: int, lam: float, rng: np.random.Generator):
    cut_rat = np.sqrt(1.0 - lam)
    ch, cw = int(h * cut_rat), int(w * cut_rat)
    cy, cx = int(rng.integers(h)), int(rng.integers(w))
    y1, y2 = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
    x1, x2 = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
    return int(y1), int(y2), int(x1), int(x2)


@dataclass
class Mixup:
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000
    token_label: bool = False
    mode: str = "batch"          # batch | elem (timm --mixup-mode)
    enabled: bool = True

    @property
    def active(self) -> bool:
        return self.enabled and (self.mixup_alpha > 0 or self.cutmix_alpha > 0)

    def __call__(self, batch: Dict[str, np.ndarray],
                 rng: np.random.Generator) -> Dict[str, np.ndarray]:
        labels = batch["label"]
        if not self.active or rng.random() > self.prob:
            if not self.token_label:
                batch["soft_target"] = one_hot_np(
                    labels, self.num_classes, self.label_smoothing)
            return batch
        if self.mode == "elem" and not self.token_label:
            return self._elem(batch, rng)

        use_cutmix = self.cutmix_alpha > 0 and (
            self.mixup_alpha <= 0 or rng.random() < self.switch_prob)
        alpha = self.cutmix_alpha if use_cutmix else self.mixup_alpha
        lam = float(rng.beta(alpha, alpha))

        x = batch["image"]
        if use_cutmix:
            H, W = x.shape[1:3]
            y1, y2, x1, x2 = _cut_box(H, W, lam, rng)
            x[:, y1:y2, x1:x2] = x[::-1, y1:y2, x1:x2]
            lam = 1.0 - (y2 - y1) * (x2 - x1) / (H * W)
            if self.token_label and "label_scores" in batch:
                s = batch["label_scores"]
                mh, mw = s.shape[2:]
                my1, my2 = int(y1 * mh / H), int(np.ceil(y2 * mh / H))
                mx1, mx2 = int(x1 * mw / W), int(np.ceil(x2 * mw / W))
                for k in ("label_scores", "label_inds"):
                    m = batch[k]
                    m[:, :, my1:my2, mx1:mx2] = m[::-1, :, my1:my2, mx1:mx2]
        else:
            if x.dtype == np.uint8:
                # FastCollateMixup-style uint8 blend (round back)
                blended = x.astype(np.float32) * lam + \
                    x[::-1].astype(np.float32) * (1.0 - lam)
                x[:] = np.clip(blended + 0.5, 0, 255).astype(np.uint8)
            else:
                x_flip = x[::-1] * (1.0 - lam)
                x *= lam
                x += x_flip
            # token-label maps cannot be alpha-blended in sparse form; the
            # shipped VOLO recipes use token_label without mixup, so plain
            # mixup on maps degrades to the dominant side
            lam_maps = lam

        target = (lam * one_hot_np(labels, self.num_classes,
                                   self.label_smoothing)
                  + (1 - lam) * one_hot_np(labels[::-1], self.num_classes,
                                           self.label_smoothing))
        if self.token_label:
            batch["gt_soft"] = target
        else:
            batch["soft_target"] = target
        return batch

    def _elem(self, batch: Dict[str, np.ndarray],
              rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """Per-sample lambdas / cut boxes (timm mixup_mode='elem')."""
        x = batch["image"]
        orig = x.copy()  # partners mix with the un-mixed originals
        labels = batch["label"]
        B, H, W = x.shape[:3]
        lam = np.ones(B, np.float32)
        for i in range(B):
            use_cutmix = self.cutmix_alpha > 0 and (
                self.mixup_alpha <= 0 or rng.random() < self.switch_prob)
            alpha = self.cutmix_alpha if use_cutmix else self.mixup_alpha
            li = float(rng.beta(alpha, alpha))
            j = B - 1 - i
            if use_cutmix:
                y1, y2, x1, x2 = _cut_box(H, W, li, rng)
                x[i, y1:y2, x1:x2] = orig[j, y1:y2, x1:x2]
                lam[i] = 1.0 - (y2 - y1) * (x2 - x1) / (H * W)
            else:
                x[i] = orig[i] * li + orig[j] * (1 - li)
                lam[i] = li
        t = one_hot_np(labels, self.num_classes, self.label_smoothing)
        batch["soft_target"] = (lam[:, None] * t
                                + (1 - lam[:, None]) * t[::-1])
        return batch
