from . import checkpoint, loop, loss  # noqa: F401
