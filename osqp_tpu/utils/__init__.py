from . import printing  # noqa: F401
