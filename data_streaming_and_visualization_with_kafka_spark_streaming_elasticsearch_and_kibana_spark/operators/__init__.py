from . import dedup, fusion, multimodal, relational, similarity  # noqa: F401
