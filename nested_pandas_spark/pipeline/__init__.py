from . import corpus, dedup, multimodal, similarity, text, web
