from . import vec, color  # noqa: F401
