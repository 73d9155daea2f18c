"""MixToken (token-level CutMix) as traced JAX ops.

The reference draws lambda/bbox with host numpy inside `VOLO.forward`
(`models/volo.py:319-339,649-658`) and swaps a spatial rectangle of tokens
with the batch-flipped tokens; the loss reconstructs lambda from the bbox
(`loss/cross_entropy.py:149`). Host RNG inside a forward is impossible (and
undesirable) under jit, so here the bbox is drawn from a `jax.random` key
and the rectangle swap is a broadcasted-iota mask + `jnp.where` — fully
fused by XLA, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_bbox(key: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Draw (bbx1, bby1, bbx2, bby2) over a grid_h x grid_w token grid.

    lambda ~ Beta(1,1) = U(0,1); cut size = floor(grid * sqrt(1-lam));
    box centered at a uniform point, clipped. Mirrors
    `rand_bbox` (`models/volo.py:319-339`) with size given in tokens.
    Returns an int32 [4] array.
    """
    k_lam, k_cx, k_cy = jax.random.split(key, 3)
    lam = jax.random.uniform(k_lam)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (grid_w * cut_rat).astype(jnp.int32)
    cut_h = (grid_h * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (), 0, grid_w)
    cy = jax.random.randint(k_cy, (), 0, grid_h)
    bbx1 = jnp.clip(cx - cut_w // 2, 0, grid_w)
    bby1 = jnp.clip(cy - cut_h // 2, 0, grid_h)
    bbx2 = jnp.clip(cx + cut_w // 2, 0, grid_w)
    bby2 = jnp.clip(cy + cut_h // 2, 0, grid_h)
    return jnp.stack([bbx1, bby1, bbx2, bby2]).astype(jnp.int32)


def region_mask(bbox: jax.Array, grid_h: int, grid_w: int,
                scale: int = 1) -> jax.Array:
    """Boolean [grid_h*scale, grid_w*scale] mask, True inside the bbox
    (bbox coordinates are in unscaled token units; `scale` mirrors the
    pooling_scale upscale at `models/volo.py:655-657`)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (grid_h * scale, grid_w * scale), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (grid_h * scale, grid_w * scale), 1)
    bbx1, bby1, bbx2, bby2 = bbox[0] * scale, bbox[1] * scale, bbox[2] * scale, bbox[3] * scale
    return (rows >= bbx1) & (rows < bbx2) & (cols >= bby1) & (cols < bby2)


def mix_tokens(x: jax.Array, bbox: jax.Array, scale: int = 1) -> jax.Array:
    """Swap the bbox region of [B,H,W,C] tokens with the batch-flipped
    tokens (CutMix across the batch-reversal pairing)."""
    mask = region_mask(bbox, x.shape[1] // scale, x.shape[2] // scale, scale)
    return jnp.where(mask[None, :, :, None], jnp.flip(x, axis=0), x)


def unmix_tokens(x: jax.Array, bbox: jax.Array) -> jax.Array:
    """Reverse the mix on the aux-token grid (`models/volo.py:684-691`);
    identical operation — swapping with flip(0) is an involution per-region."""
    return mix_tokens(x, bbox, scale=1)


def mix_lambda(bbox: jax.Array, num_tokens: int) -> jax.Array:
    """lambda = 1 - box_area / N, as the loss reconstructs it
    (`loss/cross_entropy.py:149`)."""
    area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
    return 1.0 - area.astype(jnp.float32) / float(num_tokens)
