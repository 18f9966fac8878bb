from . import pipelines, upsert  # noqa: F401
