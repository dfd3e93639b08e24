from .logger import setup_logger  # noqa: F401
from .misc import (  # noqa: F401
    AverageMeter,
    BestRecorder,
    ProgressMeter,
    cal_mean_and_std,
    dump_config,
    increment_path,
    prefetch_iter,
)
