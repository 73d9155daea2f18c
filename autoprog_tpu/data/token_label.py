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


# ---------------- sparse target path (AUTOPROG_SPARSE_TL=1) ----------------
#
# The dense layout above materializes [B, C, 2+N] (~100 MB f32 at the
# flagship shape) plus two full-C resize passes, only for the loss to
# contract it against log-probabilities. The top-K store makes the per-token
# target ≤ 4K-sparse even after bilinear regridding (each destination token
# mixes ≤ 2x2 source positions x K ranks), so the aux CE can gather K'
# log-probs per token instead of reading a dense map. Same math — see
# losses.sparse paths; parity is test-asserted (tests/test_sparse_tl.py).

def _resize_taps(src: int, dst: int):
    """Static bilinear taps matching jax.image.resize(antialias=False):
    output i samples x = (i+0.5)*src/dst - 0.5, linear between floor/ceil,
    edge-clamped. Returns (i0, i1, w0, w1) as numpy int/float arrays."""
    import numpy as np
    if src == dst:
        idx = np.arange(src)
        return idx, idx, np.ones(src, np.float32), np.zeros(src, np.float32)
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    i0 = np.floor(x).astype(np.int64)
    w1 = (x - i0).astype(np.float32)
    i1 = np.clip(i0 + 1, 0, src - 1)
    i0 = np.clip(i0, 0, src - 1)
    return i0, i1, 1.0 - w1, w1


def sparse_token_label_target(labels: jax.Array, scores: jax.Array,
                              inds: jax.Array, *, num_classes: int,
                              smoothing: float, label_size: int,
                              gt_soft=None) -> dict:
    """Sparse equivalent of `build_token_label_target`:

      {"gt": [B, C], "cls": [B, C],
       "vals": [B, N, K'], "inds": [B, N, K'], "u": [B, N]}

    where per token t[c] = sum_k vals[k]*[inds[k]==c] + u (the smoothing
    floor), i.e. vals carry the (1-s)/Z renormalized top-K mass and
    u = s/(C*Z). K' = K when the stored grid equals the token grid,
    else 4K (2x2 bilinear taps, duplicate class inds simply add)."""
    B, K, H, W = scores.shape
    n = label_size
    scores = scores.astype(jnp.float32)
    if (H, W) == (n, n):
        v = scores                                     # [B, K, n, n]
        ix = inds
    else:
        h0, h1, wh0, wh1 = _resize_taps(H, n)
        w0, w1, ww0, ww1 = _resize_taps(W, n)
        taps = []
        for hi, hw in ((h0, wh0), (h1, wh1)):
            for wi, ww in ((w0, ww0), (w1, ww1)):
                wt = jnp.asarray(hw)[:, None] * jnp.asarray(ww)[None, :]
                taps.append((scores[:, :, hi][:, :, :, wi] * wt,
                             inds[:, :, hi][:, :, :, wi]))
        v = jnp.concatenate([t[0] for t in taps], axis=1)  # [B, 4K, n, n]
        ix = jnp.concatenate([t[1] for t in taps], axis=1)
    Kp = v.shape[1]
    # [B, Kp, n, n] -> [B, N, Kp]
    v = v.reshape(B, Kp, n * n).transpose(0, 2, 1)
    ix = ix.reshape(B, Kp, n * n).transpose(0, 2, 1)

    # cls "relabel" row: mean of the (resized) dense map over tokens,
    # normalized — identical sums to the dense path's dense.mean((1, 2))
    b_iota = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    mean_map = jnp.zeros((B, num_classes), jnp.float32).at[
        b_iota, ix].add(v) / (n * n)
    mass = mean_map.sum(-1, keepdims=True)
    relabel = jnp.where(mass > 0.05, mean_map / jnp.clip(mass, 1e-6, None),
                        jax.nn.one_hot(labels, num_classes))
    cls_target = (1.0 - smoothing) * relabel + smoothing / num_classes

    gt = gt_soft if gt_soft is not None else smooth_one_hot(
        labels, num_classes, smoothing)

    z = jnp.clip((1.0 - smoothing) * v.sum(-1) + smoothing, 1e-6, None)
    return {"gt": gt, "cls": cls_target,
            "vals": (1.0 - smoothing) * v / z[..., None], "inds": ix,
            "u": smoothing / num_classes / z}
