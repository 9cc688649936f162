from . import (  # noqa: F401
    dashboards,
    dedup,
    fusion,
    multimodal,
    quality,
    relational,
    rollup,
    similarity,
    temporal,
)
