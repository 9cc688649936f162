from . import (  # noqa: F401
    dashboards,
    dedup,
    fusion,
    multimodal,
    relational,
    rollup,
    similarity,
    temporal,
)
