from . import bm25, embedder, hybrid, vector_search  # noqa: F401
