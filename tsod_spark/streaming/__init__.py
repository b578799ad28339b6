from .detect import stream_detect, stream_detect_stateless, stream_rollup  # noqa: F401
