"""Transfer-learning utilities (reference `utils/utils.py:31-160`).

Loads pretrained params into a (possibly different-resolution /
different-class-count) model:
  * pos-embed grids resized bicubically — the 4-D VOLO grid
    (`resize_pos_embed_4d`, :76) and the 1-D ViT token layout with cls/dist
    prefix (`resize_pos_embed`, :31);
  * classifier heads dropped when the class count changes (:109-114);
  * everything else matched by path.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from autoprog_tpu.ops.interpolate import resize_bicubic
from autoprog_tpu.train.checkpoint import load_checkpoint_file

_logger = logging.getLogger(__name__)


def resize_pos_embed_4d(src: jax.Array, dst_shape) -> jax.Array:
    """[1, h, w, C] -> [1, H, W, C] bicubic (`utils/utils.py:76-88`)."""
    return resize_bicubic(jnp.asarray(src), tuple(dst_shape[1:3]))


def resize_pos_embed_tokens(src: jax.Array, dst_shape, n_prefix: int
                            ) -> jax.Array:
    """[1, p+g*g, C] -> [1, p+G*G, C] keeping the prefix tokens
    (`utils/utils.py:31-53`)."""
    src = jnp.asarray(src)
    C = src.shape[-1]
    g = int(np.sqrt(src.shape[1] - n_prefix))
    G = int(np.sqrt(dst_shape[1] - n_prefix))
    grid = src[:, n_prefix:].reshape(1, g, g, C)
    grid = resize_bicubic(grid, (G, G)).reshape(1, G * G, C)
    return jnp.concatenate([src[:, :n_prefix], grid], axis=1)


def adapt_state_dict(src_flat: Dict, dst_params, *, num_classes: int
                     ) -> Any:
    dst_flat = flatten_dict(dst_params)
    out = {}
    for path, tmpl in dst_flat.items():
        key = path
        if key not in src_flat:
            _logger.info("finetune: no pretrained value for %s", path)
            out[path] = tmpl
            continue
        src = jnp.asarray(src_flat[key])
        if path[-1] in ("head", "aux_head", "head_dist") or (
                len(path) >= 2 and path[-2] in ("head", "aux_head",
                                                "head_dist")):
            if src.shape != tmpl.shape:
                _logger.info("finetune: dropping %s (classes changed)", path)
                out[path] = tmpl
                continue
        if path[-1] == "pos_embed" and src.shape != tmpl.shape:
            if src.ndim == 4:
                out[path] = resize_pos_embed_4d(src, tmpl.shape).astype(
                    tmpl.dtype)
            else:
                n_prefix = 1 if tmpl.shape[1] % 2 == 1 else 2
                out[path] = resize_pos_embed_tokens(
                    src, tmpl.shape, n_prefix).astype(tmpl.dtype)
            continue
        if src.shape != tmpl.shape:
            _logger.warning("finetune: shape mismatch at %s: %s vs %s — "
                            "keeping init", path, src.shape, tmpl.shape)
            out[path] = tmpl
            continue
        out[path] = src.astype(tmpl.dtype)
    return unflatten_dict(out)


def load_pretrained_weights(dst_params, checkpoint_path: str, *,
                            use_ema: bool = False, ema_idx: int = 0,
                            num_classes: int = 1000):
    """`load_pretrained_weights` (`utils/utils.py:120-142`)."""
    ckpt = load_checkpoint_file(checkpoint_path)
    key = "state_dict"
    if use_ema and f"state_dict_ema_{ema_idx}" in ckpt:
        key = f"state_dict_ema_{ema_idx}"
    src = ckpt.get(key, ckpt)
    return adapt_state_dict(flatten_dict(src), dst_params,
                            num_classes=num_classes)
