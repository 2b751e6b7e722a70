from . import collectives, mesh, pipeline, sharding  # noqa: F401
