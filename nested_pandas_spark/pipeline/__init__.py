from . import (
    classifier,
    corpus,
    dedup,
    gif,
    jpeg,
    multimodal,
    pii,
    png,
    search,
    similarity,
    text,
    web,
)
