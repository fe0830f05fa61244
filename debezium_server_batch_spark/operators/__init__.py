from . import dedup, dedup_fuzzy, envelope, multimodal, normalize, relational, similarity  # noqa: F401
