from . import spatial, hashing  # noqa: F401
