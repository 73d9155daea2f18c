"""VOLO (Vision Outlooker) as an elastic Flax module.

Capability parity with reference `models/volo.py:444-694`:
  * conv stem PatchEmbed -> outlooker stage -> 2x downsample -> pos-embed
    -> transformer stages -> class-attention post-network -> dual heads
    (cls + dense aux) with MixToken during training and the
    `cls + 0.5 * max(aux)` fusion at eval (`models/volo.py:681-682`);
  * resolution elasticity via bicubic pos-embed interpolation
    (`models/volo.py:580-596`);
  * depth elasticity ("supernet") via static per-layer keep-masks — the
    TPU-native replacement for `set_sample_config` mutation
    (`models/volo.py:598-616`): a skipped layer is simply not traced, so
    each sampled sub-network is its own lean XLA program instead of a
    runtime branch. Masks come from prog/depth.py:elastic_keep_masks.

Params for *all* layers always exist (init runs with every layer kept), so
one parameter pytree serves every sub-network — exactly the weight-sharing
the supernet search needs.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from autoprog_tpu.models.layers import (
    ClassBlock,
    Downsample,
    Outlooker,
    PatchEmbed,
    TransformerBlock,
    remat_wrap,
    trunc_init,
    dense,
)
from autoprog_tpu.ops.interpolate import resize_bicubic
from autoprog_tpu.ops.mixtoken import mix_tokens, rand_bbox, unmix_tokens

KeepMasks = Tuple[Tuple[bool, ...], ...]


class VOLO(nn.Module):
    layers: Tuple[int, ...]
    embed_dims: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    mlp_ratios: Tuple[int, ...] = (3, 3, 3, 3)
    downsamples: Tuple[bool, ...] = (True, False, False, False)
    outlook_attention: Tuple[bool, ...] = (True, False, False, False)
    post_layers: Optional[Tuple[str, ...]] = ("ca", "ca")
    img_size: int = 224
    patch_size: int = 8
    stem_hidden_dim: int = 64
    num_classes: int = 1000
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    return_mean: bool = False
    return_dense: bool = True
    mix_token: bool = True
    pooling_scale: int = 2
    out_kernel: int = 3
    out_stride: int = 2
    out_padding: int = 1
    aux_fusion: str = "max"  # eval fusion over aux tokens: "max" | "mean"
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.9   # flax convention: ra = m*ra + (1-m)*batch
    bn_eps: float = 1e-5
    sync_bn_axis: Optional[str] = None
    remat: Any = False  # False | True/"full" | "dots" (layers.remat_wrap)

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 keep: Optional[KeepMasks] = None):
        num_stages = len(self.layers)
        total_layers = sum(self.layers)
        if keep is None:
            keep = tuple(tuple(True for _ in range(l)) for l in self.layers)
        else:
            keep = tuple(tuple(k) for k in keep) + tuple(
                tuple(True for _ in range(l))
                for l in self.layers[len(keep):])
        assert all(len(keep[i]) == self.layers[i] for i in range(num_stages)), \
            f"keep mask lengths {[len(k) for k in keep]} != layers {self.layers}"

        # --- step 1: patch embedding (conv stem) ----------------------------
        x = PatchEmbed(embed_dim=self.embed_dims[0],
                       patch_size=self.patch_size, stem_stride=2,
                       hidden_dim=self.stem_hidden_dim, dtype=self.dtype,
                       bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                       sync_bn_axis=self.sync_bn_axis,
                       name="patch_embed")(x, train=train)  # [B, r/8, r/8, C0]

        # --- MixToken on embeddings (training only) -------------------------
        use_mix = self.mix_token and train
        if use_mix:
            grid_h = x.shape[1] // self.pooling_scale
            grid_w = x.shape[2] // self.pooling_scale
            bbox = rand_bbox(self.make_rng("mixtoken"), grid_h, grid_w)
            x = mix_tokens(x, bbox, scale=self.pooling_scale)
        else:
            bbox = jnp.zeros((4,), jnp.int32)

        # --- step 2: token stages ------------------------------------------
        def dpr(block_idx_global: int) -> float:
            if total_layers <= 1:
                return 0.0
            return self.drop_path_rate * block_idx_global / (total_layers - 1)

        pos_added = False
        global_idx = 0
        for s in range(num_stages):
            if not self.outlook_attention[s] and not pos_added:
                # positional encoding right before the first transformer
                # stage (reference adds it at network idx==2, volo.py:627-629)
                g = self.img_size // self.patch_size // self.pooling_scale
                pos_embed = self.param(
                    "pos_embed", trunc_init,
                    (1, g, g, self.embed_dims[-1]), jnp.float32)
                pe = resize_bicubic(pos_embed, (x.shape[1], x.shape[2]))
                x = x + pe.astype(self.dtype)
                x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
                pos_added = True
            for i in range(self.layers[s]):
                if keep[s][i]:
                    OutlookerCls = remat_wrap(Outlooker, self.remat,
                                              static_argnums=())
                    TransformerCls = remat_wrap(TransformerBlock, self.remat)
                    if self.outlook_attention[s]:
                        x = OutlookerCls(
                            num_heads=self.num_heads[s],
                            kernel_size=self.out_kernel,
                            padding=self.out_padding,
                            stride=self.out_stride,
                            mlp_ratio=self.mlp_ratios[s],
                            qkv_bias=self.qkv_bias,
                            attn_drop=self.attn_drop_rate,
                            drop_path=dpr(global_idx), dtype=self.dtype,
                            name=f"s{s}b{i}")(x, deterministic=not train)
                    else:
                        B, H, W, C = x.shape
                        x = x.reshape(B, H * W, C)
                        x = TransformerCls(
                            num_heads=self.num_heads[s],
                            mlp_ratio=self.mlp_ratios[s],
                            qkv_bias=self.qkv_bias,
                            attn_drop=self.attn_drop_rate,
                            drop_path=dpr(global_idx), dtype=self.dtype,
                            name=f"s{s}b{i}")(x, deterministic=not train)
                        x = x.reshape(B, H, W, C)
                global_idx += 1
            if self.downsamples[s]:
                x = Downsample(self.embed_dims[s + 1], 2, dtype=self.dtype,
                               name=f"ds{s}")(x)

        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)

        # --- step 3: post network (class attention) ------------------------
        if self.post_layers:
            cls_token = self.param("cls_token", trunc_init,
                                   (1, 1, self.embed_dims[-1]), jnp.float32)
            cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                                   (B, 1, C))
            x = jnp.concatenate([cls, x], axis=1)
            for pi, kind in enumerate(self.post_layers):
                assert kind == "ca", f"unknown post layer {kind}"
                x = ClassBlock(num_heads=self.num_heads[-1],
                               mlp_ratio=self.mlp_ratios[-1],
                               qkv_bias=self.qkv_bias,
                               attn_drop=self.attn_drop_rate,
                               dtype=self.dtype,
                               name=f"post{pi}")(x, deterministic=not train)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)

        if self.return_mean:
            return dense(self.num_classes, dtype=self.dtype,
                         name="head")(x.mean(axis=1))

        x_cls = dense(self.num_classes, dtype=self.dtype, name="head")(x[:, 0])
        if not self.return_dense:
            return x_cls

        x_aux = dense(self.num_classes, dtype=self.dtype,
                      name="aux_head")(x[:, 1:])  # [B, N, classes]

        if not train:
            # "mean" = test-time pooling over the dense class logits
            # (the ViT analogue of timm's TestTimePoolHead used by
            # reference `validate.py` --test-pool)
            pooled = (x_aux.max(axis=1) if self.aux_fusion == "max"
                      else x_aux.mean(axis=1))
            return x_cls + 0.5 * pooled

        if use_mix:
            x_aux = x_aux.reshape(B, H, W, self.num_classes)
            x_aux = unmix_tokens(x_aux, bbox)
            x_aux = x_aux.reshape(B, H * W, self.num_classes)

        return x_cls, x_aux, bbox
