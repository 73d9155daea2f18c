from autoprog_tpu.ops.interpolate import resize_bilinear, resize_bicubic  # noqa: F401
from autoprog_tpu.ops.unfold import unfold_nhwc, fold_nhwc, avg_pool_ceil  # noqa: F401
from autoprog_tpu.ops.mixtoken import rand_bbox, region_mask, mix_tokens, unmix_tokens  # noqa: F401
from autoprog_tpu.ops.outlook import outlook_attention  # noqa: F401
