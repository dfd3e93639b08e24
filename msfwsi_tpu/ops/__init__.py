from . import augment, geometry, losses, metrics  # noqa: F401
