"""Token-labeling dense targets (device-side).

TPU-native equivalent of tlt's `create_token_label_target`
(used at `main_prog.py:983-1004`; SURVEY §2.2): converts stored top-K dense
label maps into the [B, C, 2+N] target layout the token-label losses index
(`loss/cross_entropy.py:72-79`):

  slot 0: smoothed one-hot of the ground-truth class;
  slot 1: the "relabel" cls target — the normalized mean of the dense map
          over the crop (what the machine annotator saw inside this crop);
  slot 2..2+N: per-token class distributions at the current token grid.

Built inside the jitted train step so the token grid follows the stage
resolution (label_size = r // 16, `main_prog.py:639`) with no recompiles of
the host pipeline. The dense map is scattered from the sparse top-K store
and bilinearly resized to the token grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_one_hot(labels: jax.Array, num_classes: int,
                   smoothing: float = 0.1) -> jax.Array:
    """Label-smoothed one-hot rows [B, C]."""
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def dense_from_topk(scores: jax.Array, inds: jax.Array,
                    num_classes: int) -> jax.Array:
    """Scatter top-K maps [B, K, H, W] into a dense [B, H, W, C] map."""
    B, K, H, W = scores.shape
    dense = jnp.zeros((B, H, W, num_classes), scores.dtype)
    b = jax.lax.broadcasted_iota(jnp.int32, (B, K, H, W), 0)
    h = jax.lax.broadcasted_iota(jnp.int32, (B, K, H, W), 2)
    w = jax.lax.broadcasted_iota(jnp.int32, (B, K, H, W), 3)
    return dense.at[b, h, w, inds].add(scores)


def build_token_label_target(labels: jax.Array, scores: jax.Array,
                             inds: jax.Array, *, num_classes: int,
                             smoothing: float, label_size: int,
                             gt_soft=None) -> jax.Array:
    """[B, C, 2+N] token-label target with N = label_size**2.

    `gt_soft` (optional [B, C]) overrides the slot-0 row with an
    already-mixed ground-truth distribution (host mixup path).
    """
    B = labels.shape[0]
    dense = dense_from_topk(scores.astype(jnp.float32), inds, num_classes)
    dense = jax.image.resize(
        dense, (B, label_size, label_size, num_classes),
        method="bilinear", antialias=False)
    dense = jnp.clip(dense, 0.0, 1.0)

    # per-token distributions with smoothing mass spread uniformly
    tok = (1.0 - smoothing) * dense + smoothing / num_classes
    # renormalize each token (top-K truncation can lose a little mass)
    tok = tok / jnp.clip(tok.sum(-1, keepdims=True), 1e-6, None)
    tok = tok.reshape(B, label_size * label_size, num_classes)

    gt = gt_soft if gt_soft is not None else smooth_one_hot(
        labels, num_classes, smoothing)

    mean_map = dense.mean(axis=(1, 2))                     # [B, C]
    mass = mean_map.sum(-1, keepdims=True)
    # crop-aware cls target; falls back toward the GT row when the crop
    # missed the object (near-zero relabel mass)
    relabel = jnp.where(mass > 0.05, mean_map / jnp.clip(mass, 1e-6, None),
                        jax.nn.one_hot(labels, num_classes))
    cls_target = (1.0 - smoothing) * relabel + smoothing / num_classes

    tokens_cf = jnp.swapaxes(tok, 1, 2)                    # [B, C, N]
    return jnp.concatenate(
        [gt[:, :, None], cls_target[:, :, None], tokens_cf], axis=2)
