from . import attention, layers, posbias, transformer, vq  # noqa: F401
