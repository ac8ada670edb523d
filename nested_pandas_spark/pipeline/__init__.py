from . import (
    classifier,
    corpus,
    dedup,
    jpeg,
    multimodal,
    png,
    search,
    similarity,
    text,
    web,
)
