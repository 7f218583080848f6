from .session import build_session  # noqa: F401
