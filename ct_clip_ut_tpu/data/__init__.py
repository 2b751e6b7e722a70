from . import datasets, loader, nifti, preprocess  # noqa: F401
