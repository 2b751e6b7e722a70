from . import bert, ctclip, ctvit  # noqa: F401
