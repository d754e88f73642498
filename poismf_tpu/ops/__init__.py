from . import objective  # noqa: F401
