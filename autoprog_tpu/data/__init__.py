from autoprog_tpu.data.dataset import create_dataset  # noqa: F401
from autoprog_tpu.data.loader import create_loader  # noqa: F401
