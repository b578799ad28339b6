from .detect import stream_detect, stream_detect_stateless  # noqa: F401
