"""DeiT / plain ViT as an elastic Flax module.

Parity with reference `models/deit.py` (stock timm VisionTransformer +
DistilledVisionTransformer registrations, `models/deit.py:20-179`), with two
TPU-side generalizations used by the progressive engine:
  * static per-layer keep-mask (elastic depth) like VOLO, so DeiT variants
    can run manual progressive depth growth (BASELINE config 2);
  * pos-embed grid interpolation for resolution elasticity (the reference
    only resizes pos-embeds at finetune-load time, `utils/utils.py:31-74`).

Block params are named `s0b{i}` (a single stage) so the growth remappers in
prog/growth.py treat VOLO and DeiT uniformly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from autoprog_tpu.models.layers import (TransformerBlock, dense,
                                        remat_wrap, trunc_init)
from autoprog_tpu.ops.interpolate import resize_bicubic


class VisionTransformer(nn.Module):
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_classes: int = 1000
    distilled: bool = False
    img_size: int = 224
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    remat: Any = False  # False | True/"full" | "dots" (layers.remat_wrap)

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 keep: Optional[Tuple[Tuple[bool, ...], ...]] = None):
        if keep is None:
            keep_flat: Tuple[bool, ...] = tuple(True for _ in range(self.depth))
        else:
            keep_flat = tuple(keep[0])
        assert len(keep_flat) == self.depth

        B = x.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="patch_embed")(x)  # [B, g, g, C]
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dim)

        n_prefix = 2 if self.distilled else 1
        g0 = self.img_size // self.patch_size
        pos_embed = self.param("pos_embed", trunc_init,
                               (1, g0 * g0 + n_prefix, self.embed_dim),
                               jnp.float32)
        cls_token = self.param("cls_token", trunc_init,
                               (1, 1, self.embed_dim), jnp.float32)
        tokens = [jnp.broadcast_to(cls_token.astype(self.dtype),
                                   (B, 1, self.embed_dim))]
        if self.distilled:
            dist_token = self.param("dist_token", trunc_init,
                                    (1, 1, self.embed_dim), jnp.float32)
            tokens.append(jnp.broadcast_to(dist_token.astype(self.dtype),
                                           (B, 1, self.embed_dim)))
        x = jnp.concatenate(tokens + [x], axis=1)

        pe_prefix = pos_embed[:, :n_prefix]
        pe_grid = pos_embed[:, n_prefix:].reshape(1, g0, g0, self.embed_dim)
        pe_grid = resize_bicubic(pe_grid, (gh, gw)).reshape(
            1, gh * gw, self.embed_dim)
        pe = jnp.concatenate([pe_prefix, pe_grid], axis=1)
        x = x + pe.astype(self.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)

        BlockCls = remat_wrap(TransformerBlock, self.remat)
        for i in range(self.depth):
            if keep_flat[i]:
                dp = (self.drop_path_rate * i / max(self.depth - 1, 1))
                x = BlockCls(
                    num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, attn_drop=self.attn_drop_rate,
                    drop_path=dp, dtype=self.dtype,
                    name=f"s0b{i}")(x, deterministic=not train)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x_cls = dense(self.num_classes, dtype=self.dtype, name="head")(x[:, 0])
        if not self.distilled:
            return x_cls
        x_dist = dense(self.num_classes, dtype=self.dtype,
                       name="head_dist")(x[:, 1])
        if train:
            return x_cls, x_dist
        return (x_cls + x_dist) / 2
