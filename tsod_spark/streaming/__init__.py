from .detect import (  # noqa: F401
    stream_dedup_exact,
    stream_dedup_minhash,
    stream_detect,
    stream_detect_stateless,
    stream_heavy_hitters,
    stream_rollup,
    stream_sessionize,
    stream_winnow_overlap,
)
from .temporal import (  # noqa: F401
    stream_attribution_join,
    stream_cusum,
    stream_dispersion,
    stream_ewma,
    stream_histogram_drift,
    stream_holt,
    stream_holt_winters,
    stream_latest_by_key,
    stream_peaks,
    stream_rollup_hierarchy,
    stream_time_weighted_avg,
    stream_type_entropy,
)
