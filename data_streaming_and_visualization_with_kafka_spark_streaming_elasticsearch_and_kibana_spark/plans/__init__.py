from . import explain  # noqa: F401
