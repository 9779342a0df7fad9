from . import gather  # noqa: F401
