"""On-device image / positional-embedding resizing.

TPU-native replacement for the reference's per-batch `F.interpolate` input
downscale (`main_prog.py:973`, `main_prog.py:1910`) and the bicubic
pos-embed resize (`models/volo.py:580-596`). Target shapes are always
static (the progressive schedule picks from a tiny set of resolutions), so
each resolution compiles once and XLA fuses the resize into the input
pipeline of the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: int | tuple) -> jax.Array:
    """Bilinear resize of NHWC images to (size, size).

    Half-pixel centers, no antialiasing — matches
    `F.interpolate(mode='bilinear', align_corners=False)`.
    """
    if isinstance(size, int):
        size = (size, size)
    if x.shape[1:3] == tuple(size):
        return x
    out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def resize_bicubic(x: jax.Array, size: tuple) -> jax.Array:
    """Bicubic resize of a [1, H, W, C] grid (pos embeddings).

    Matches the role of `F.interpolate(mode='bicubic')` in
    `VOLO.interpolate_pos_encoding`; jax's cubic kernel (Keys a=-0.5) vs
    torch's (a=-0.75) differ slightly, which only perturbs initialization
    of resized pos-embeds — training is self-consistent either way.
    """
    if x.shape[1:3] == tuple(size):
        return x
    out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    # cast up for the interpolation; cubic in bf16 loses too much
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="cubic",
                         antialias=False)
    return y.astype(x.dtype)
