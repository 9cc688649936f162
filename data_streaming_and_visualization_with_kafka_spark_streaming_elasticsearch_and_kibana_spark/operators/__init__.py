from . import (  # noqa: F401
    dedup,
    fusion,
    multimodal,
    relational,
    similarity,
    temporal,
)
