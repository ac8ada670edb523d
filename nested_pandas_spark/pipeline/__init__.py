from . import (
    classifier,
    corpus,
    dedup,
    gif,
    jpeg,
    multimodal,
    png,
    search,
    similarity,
    text,
    web,
)
