from . import imc2021, preprocess, synthetic  # noqa: F401
