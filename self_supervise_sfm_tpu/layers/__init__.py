from . import params, rope, attention, block, swiglu, vit  # noqa: F401
