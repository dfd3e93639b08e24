from . import ssl  # noqa: F401
