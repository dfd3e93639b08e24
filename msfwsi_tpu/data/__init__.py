from . import datasets, loader, pipeline, prepare  # noqa: F401
from .pipeline import AugConfig, make_seg_train_views, make_seg_val_views, make_ssl_views  # noqa: F401
