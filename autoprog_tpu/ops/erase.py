"""On-device random erasing (timm `--remode pixel` semantics).

Used by the uint8 input pipeline: when images travel to the device as
uint8 (4x less host->device traffic than normalized f32), normalization
and random erasing move inside the jitted train step. Per-sample erase
boxes are drawn with `jax.random` and applied as iota masks — static
shapes, fully vectorized over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_erase(images: jax.Array, rng: jax.Array, *, prob: float,
                 count: int = 1, area: tuple = (0.02, 1 / 3),
                 aspect: tuple = (0.3, 10 / 3)) -> jax.Array:
    """Erase `count` random rectangles per image with N(0,1) pixels.

    images: [B, H, W, C] normalized floats. Unlike the host version (which
    rejects out-of-bounds draws and retries), boxes are clipped to the
    image — the area distribution tails differ negligibly.
    """
    if prob <= 0:
        return images
    B, H, W, C = images.shape
    out = images
    for k in range(count):
        key = jax.random.fold_in(rng, k)
        ks = jax.random.split(key, 6)
        do = jax.random.uniform(ks[0], (B,)) < prob
        a = jax.random.uniform(ks[1], (B,), minval=area[0],
                               maxval=area[1]) * (H * W)
        log_r = jax.random.uniform(ks[2], (B,),
                                   minval=jnp.log(aspect[0]),
                                   maxval=jnp.log(aspect[1]))
        r = jnp.exp(log_r)
        eh = jnp.clip(jnp.round(jnp.sqrt(a * r)), 1, H).astype(jnp.int32)
        ew = jnp.clip(jnp.round(jnp.sqrt(a / r)), 1, W).astype(jnp.int32)
        top = (jax.random.uniform(ks[3], (B,))
               * (H - eh + 1).astype(jnp.float32)).astype(jnp.int32)
        left = (jax.random.uniform(ks[4], (B,))
                * (W - ew + 1).astype(jnp.float32)).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
        inside = ((rows >= top[:, None, None])
                  & (rows < (top + eh)[:, None, None])
                  & (cols >= left[:, None, None])
                  & (cols < (left + ew)[:, None, None])
                  & do[:, None, None])
        noise = jax.random.normal(ks[5], images.shape, images.dtype)
        out = jnp.where(inside[..., None], noise, out)
    return out


def normalize_uint8(images: jax.Array, mean, std, dtype) -> jax.Array:
    """uint8 [B,H,W,C] -> normalized compute-dtype floats."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = images.astype(jnp.float32) / 255.0
    return ((x - m) / s).astype(dtype)
