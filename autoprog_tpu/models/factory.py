"""Model descriptions, variant grammar and registry entries.

A `ModelDef` bundles the architecture record (needed by the growth
remappers), a Flax-module builder, and the eval data config — the
TPU-native analogue of timm's registered constructor + default_cfg
(`models/volo.py:697-821`, `models/submodels.py:9-41`, `models/deit.py`).

The general `model_variant` factory is implemented *ungated* (the reference
asserts variant == 'volo_h12_l18' at `models/submodels.py:14`; SURVEY §7.4
says to fix that): any `volo_h{H}_l{L}` / `deit_h{H}_l{L}` builds.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from autoprog_tpu.config import parse_variant_name
from autoprog_tpu.models.vit import VisionTransformer
from autoprog_tpu.models.volo import VOLO
from autoprog_tpu.prog.depth import volo_depth_split
from autoprog_tpu.registry import register_model

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _volo_cfg(crop_pct: float = 0.96) -> Dict[str, Any]:
    return dict(num_classes=1000, input_size=(3, 224, 224),
                crop_pct=crop_pct, interpolation="bicubic",
                mean=IMAGENET_MEAN, std=IMAGENET_STD)


def _deit_cfg() -> Dict[str, Any]:
    return dict(num_classes=1000, input_size=(3, 224, 224), crop_pct=0.9,
                interpolation="bicubic", mean=IMAGENET_MEAN, std=IMAGENET_STD)


@dataclasses.dataclass(frozen=True)
class VoloArch:
    """Static architecture record for a VOLO model."""
    layers: Tuple[int, ...]
    embed_dims: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    mlp_ratios: Tuple[int, ...] = (3, 3, 3, 3)
    downsamples: Tuple[bool, ...] = (True, False, False, False)
    outlook_attention: Tuple[bool, ...] = (True, False, False, False)
    post_layers: Tuple[str, ...] = ("ca", "ca")
    stem_hidden_dim: int = 64
    patch_size: int = 8
    family: str = "volo"

    @property
    def total_layers(self) -> int:
        return sum(self.layers)


@dataclasses.dataclass(frozen=True)
class DeitArch:
    """Static architecture record for a DeiT/ViT model (single stage)."""
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 16
    mlp_ratio: float = 4.0
    distilled: bool = False
    family: str = "deit"

    @property
    def layers(self) -> Tuple[int, ...]:
        return (self.depth,)

    @property
    def embed_dims(self) -> Tuple[int, ...]:
        return (self.embed_dim,)

    @property
    def total_layers(self) -> int:
        return self.depth


@dataclasses.dataclass(frozen=True)
class ModelDef:
    name: str
    arch: Any                       # VoloArch | DeitArch
    default_cfg: Dict[str, Any]

    def make(self, *, num_classes: int = 1000, img_size: int = 224,
             drop_rate: float = 0.0, drop_path_rate: float = 0.0,
             attn_drop_rate: float = 0.0, dtype=jnp.bfloat16,
             mix_token: Optional[bool] = None,
             return_dense: Optional[bool] = None,
             sync_bn_axis: Optional[str] = None,
             bn_momentum: Optional[float] = None,
             bn_eps: Optional[float] = None,
             remat: bool = False,
             aux_fusion: str = "max",
             **unused):
        a = self.arch
        bn_kw = {}
        if bn_momentum is not None:
            bn_kw["bn_momentum"] = bn_momentum
        if bn_eps is not None:
            bn_kw["bn_eps"] = bn_eps
        if isinstance(a, VoloArch):
            return VOLO(
                layers=a.layers, embed_dims=a.embed_dims,
                num_heads=a.num_heads, mlp_ratios=a.mlp_ratios,
                downsamples=a.downsamples,
                outlook_attention=a.outlook_attention,
                post_layers=a.post_layers, img_size=img_size,
                patch_size=a.patch_size, stem_hidden_dim=a.stem_hidden_dim,
                num_classes=num_classes, drop_rate=drop_rate,
                attn_drop_rate=attn_drop_rate,
                drop_path_rate=drop_path_rate,
                mix_token=True if mix_token is None else mix_token,
                return_dense=True if return_dense is None else return_dense,
                dtype=dtype, sync_bn_axis=sync_bn_axis, remat=remat,
                aux_fusion=aux_fusion, **bn_kw)
        if isinstance(a, DeitArch):
            return VisionTransformer(
                embed_dim=a.embed_dim, depth=a.depth, num_heads=a.num_heads,
                patch_size=a.patch_size, mlp_ratio=a.mlp_ratio,
                num_classes=num_classes, distilled=a.distilled,
                img_size=img_size, drop_rate=drop_rate,
                attn_drop_rate=attn_drop_rate,
                drop_path_rate=drop_path_rate, dtype=dtype, remat=remat)
        raise TypeError(f"unknown arch {type(a)}")


def volo_variant_arch(h: int, l: int) -> VoloArch:
    """Parameterized VOLO supernet family from the `volo_h{H}_l{L}` name:
    embed_dims = [16h, 32h, 32h, 32h], heads = [h/2, h, h, h], depth split
    [l0, l-l0, 0, 0] (reference `models/submodels.py:16-39`)."""
    if h % 2 != 0:
        raise ValueError("h must be divisible by 2")
    l0, l1 = volo_depth_split(l)
    return VoloArch(
        layers=(l0, l1, 0, 0),
        embed_dims=(h * 16, h * 32, h * 32, h * 32),
        num_heads=(h // 2, h, h, h),
    )


def deit_variant_arch(h: int, l: int) -> DeitArch:
    """`deit_h{H}_l{L}`: embed_dim = 64h (timm head_dim 64), depth l."""
    return DeitArch(embed_dim=64 * h, depth=l, num_heads=h)


def volo_fixed_width_arch(h: int, l: int, *, dims, heads, mlp, stem,
                          family: str) -> VoloArch:
    """Elastic-DEPTH variant family for the big VOLO shapes whose head
    widths the `[h/2, h, h, h]` grammar cannot express (D4/D5: stage-0
    head_dim 32 but transformer head_dim 48, `models/volo.py:776-821`).
    Width is pinned: the `h` token must equal the family's transformer
    head count (AutoProg never grows width — `main_prog.py:1561` asserts
    a single h candidate — so depth/resolution progression is the whole
    search space for these families)."""
    if h != heads[1]:
        raise ValueError(
            f"{family} has fixed width (transformer heads {heads[1]}); "
            f"got h{h} — width growth is not supported for this family")
    l0, l1 = volo_depth_split(l)
    return VoloArch(layers=(l0, l1, 0, 0), embed_dims=dims,
                    num_heads=heads, mlp_ratios=mlp, stem_hidden_dim=stem)


#: fixed-width grammar families: name prefix -> (dims, heads, mlp, stem,
#: crop_pct). `volod4_h16_l36` is the 2-stage collapse of volo_d4 (stages
#: 1-3 share dim/heads/resolution, so the collapse is exact), and
#: analogously volod5_h16_l48 for volo_d5.
_FIXED_WIDTH_FAMILIES = {
    "volod4": ((384, 768, 768, 768), (12, 16, 16, 16), (3, 3, 3, 3), 64,
               1.15),
    "volod5": ((384, 768, 768, 768), (12, 16, 16, 16), (4, 4, 4, 4), 128,
               1.15),
}


@register_model
def model_variant(variant: str = "", **kwargs) -> ModelDef:
    family, h, l = parse_variant_name(variant)
    if family == "volo":
        return ModelDef(variant, volo_variant_arch(h, l), _volo_cfg())
    if family == "deit":
        return ModelDef(variant, deit_variant_arch(h, l), _deit_cfg())
    if family in _FIXED_WIDTH_FAMILIES:
        dims, heads, mlp, stem, crop = _FIXED_WIDTH_FAMILIES[family]
        return ModelDef(variant,
                        volo_fixed_width_arch(h, l, dims=dims, heads=heads,
                                              mlp=mlp, stem=stem,
                                              family=family),
                        _volo_cfg(crop))
    raise ValueError(f"unknown variant family {family!r}")


# ---- VOLO D1-D5 (reference models/volo.py:697-821) ------------------------

def _volo(name, layers, dims, heads, mlp, crop_pct=0.96, stem=64):
    return ModelDef(name, VoloArch(layers=layers, embed_dims=dims,
                                   num_heads=heads, mlp_ratios=mlp,
                                   stem_hidden_dim=stem),
                    _volo_cfg(crop_pct))


@register_model
def volo_d1(**kw):
    return _volo("volo_d1", (4, 4, 8, 2), (192, 384, 384, 384),
                 (6, 12, 12, 12), (3, 3, 3, 3))


@register_model
def volo_d2(**kw):
    return _volo("volo_d2", (6, 4, 10, 4), (256, 512, 512, 512),
                 (8, 16, 16, 16), (3, 3, 3, 3))


@register_model
def volo_d3(**kw):
    return _volo("volo_d3", (8, 8, 16, 4), (256, 512, 512, 512),
                 (8, 16, 16, 16), (3, 3, 3, 3))


@register_model
def volo_d4(**kw):
    return _volo("volo_d4", (8, 8, 16, 4), (384, 768, 768, 768),
                 (12, 16, 16, 16), (3, 3, 3, 3), crop_pct=1.15)


@register_model
def volo_d5(**kw):
    return _volo("volo_d5", (12, 12, 20, 4), (384, 768, 768, 768),
                 (12, 16, 16, 16), (4, 4, 4, 4), crop_pct=1.15, stem=128)


# ---- DeiT family (reference models/deit.py:62-179) ------------------------

def _deit(name, dim, depth, heads, distilled=False):
    return ModelDef(name, DeitArch(embed_dim=dim, depth=depth,
                                   num_heads=heads, distilled=distilled),
                    _deit_cfg())


@register_model
def deit_tiny_patch16_224(**kw):
    return _deit("deit_tiny_patch16_224", 192, 12, 3)


@register_model
def deit_small_patch16_224(**kw):
    return _deit("deit_small_patch16_224", 384, 12, 6)


@register_model
def deit_base_patch16_224(**kw):
    return _deit("deit_base_patch16_224", 768, 12, 12)


@register_model
def deit_tiny_distilled_patch16_224(**kw):
    return _deit("deit_tiny_distilled_patch16_224", 192, 12, 3, True)


@register_model
def deit_small_distilled_patch16_224(**kw):
    return _deit("deit_small_distilled_patch16_224", 384, 12, 6, True)


@register_model
def deit_base_distilled_patch16_224(**kw):
    return _deit("deit_base_distilled_patch16_224", 768, 12, 12, True)


@register_model
def deit_base_patch16_384(**kw):
    d = _deit("deit_base_patch16_384", 768, 12, 12)
    return dataclasses.replace(d, default_cfg={**d.default_cfg,
                                               "input_size": (3, 384, 384),
                                               "crop_pct": 1.0})


@register_model
def deit_base_distilled_patch16_384(**kw):
    d = _deit("deit_base_distilled_patch16_384", 768, 12, 12, True)
    return dataclasses.replace(d, default_cfg={**d.default_cfg,
                                               "input_size": (3, 384, 384),
                                               "crop_pct": 1.0})
