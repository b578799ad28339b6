from .detect import (  # noqa: F401
    stream_dedup_exact,
    stream_dedup_minhash,
    stream_detect,
    stream_detect_stateless,
    stream_rollup,
    stream_sessionize,
)
