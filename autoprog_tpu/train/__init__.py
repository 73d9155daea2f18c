from autoprog_tpu.train.optim import (  # noqa: F401
    create_optimizer,
    create_scheduler,
    wd_mask,
)
from autoprog_tpu.train.state import TrainState  # noqa: F401
from autoprog_tpu.train.steps import StepBuilder  # noqa: F401
