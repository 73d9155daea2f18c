from autoprog_tpu.prog.schedule import (  # noqa: F401
    ProgressiveSchedule,
    progressive_schedule,
    make_divisible,
    get_divisor,
    no_repeats,
)
from autoprog_tpu.prog.depth import (  # noqa: F401
    new_idx,
    get_new_layer_idx,
    depth_source_index,
    elastic_keep_masks,
    volo_depth_split,
)
