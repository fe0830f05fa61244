from . import connect_schema, text, vectors  # noqa: F401
