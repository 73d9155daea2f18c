from autoprog_tpu.models import factory  # noqa: F401  (registers models)
from autoprog_tpu.models.factory import (  # noqa: F401
    DeitArch,
    ModelDef,
    VoloArch,
    deit_variant_arch,
    volo_variant_arch,
)
from autoprog_tpu.models.vit import VisionTransformer  # noqa: F401
from autoprog_tpu.models.volo import VOLO  # noqa: F401
