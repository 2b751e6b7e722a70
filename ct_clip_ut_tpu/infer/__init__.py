from . import zeroshot  # noqa: F401
