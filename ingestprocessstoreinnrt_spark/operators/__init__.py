from . import bi  # noqa: F401
