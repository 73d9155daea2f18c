from autoprog_tpu.utils.meters import AverageMeter, SmoothMeter  # noqa: F401
from autoprog_tpu.utils.logging import setup_logging, update_summary  # noqa: F401
