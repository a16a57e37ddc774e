from . import params, rope, attention, block, vit  # noqa: F401
