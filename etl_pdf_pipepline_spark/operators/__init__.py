from . import chunker  # noqa: F401
