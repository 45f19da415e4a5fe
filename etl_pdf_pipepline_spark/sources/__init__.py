from . import catalog  # noqa: F401
