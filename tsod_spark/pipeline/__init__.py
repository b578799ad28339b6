from . import curate, dedup, multimodal, similarity, text  # noqa: F401
