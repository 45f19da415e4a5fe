"""REST surface parity with the reference's FastAPI app (SURVEY.md M4 /
reference src/api/). See api/app.py for the route table."""

from .app import HAVE_FASTAPI, create_flask_app
from .engine import BadRequest, NotFound, SparkEngine

__all__ = ["SparkEngine", "NotFound", "BadRequest", "create_flask_app", "HAVE_FASTAPI"]

if HAVE_FASTAPI:  # pragma: no cover - environment-dependent
    from .app import create_app  # noqa: F401

    __all__.append("create_app")
