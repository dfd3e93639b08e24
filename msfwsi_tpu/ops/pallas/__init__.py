from . import blur  # noqa: F401
