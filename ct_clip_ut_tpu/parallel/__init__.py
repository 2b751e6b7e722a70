from . import collectives, mesh, sharding  # noqa: F401
