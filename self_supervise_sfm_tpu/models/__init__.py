from . import aggregator, sailrecon  # noqa: F401
