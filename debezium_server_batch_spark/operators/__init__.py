from . import dedup, dedup_fuzzy, envelope, multimodal, normalize, similarity  # noqa: F401
