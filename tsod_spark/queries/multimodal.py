"""Multimodal plumbing (pipeline/multimodal.py).

Part of the driver-facing query registry (see ``tsod_spark.registry``,
the facade that imports every family module in registration order and
owns the verification rotation). Registration side-effects populate
``tsod_spark.queries._base.QUERIES`` / ``ORACLE``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..analytics import temporal, tpch  # noqa: F401
from ..detectors import (  # noqa: F401
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)
from ..detectors.gradient import gradient_col  # noqa: F401
from ..expressions import as_pred  # noqa: F401
from ..features import create_dataset, lag_time_series  # noqa: F401
from ..frame import TimeSeriesFrame  # noqa: F401
from ..pipeline import dedup, multimodal, similarity, text  # noqa: F401
from ._base import (  # noqa: F401
    DTOKS,
    E_CTE,
    HIGH_HEX,
    P,
    TOKS,
    W,
    _shingle_sql,
    duck_round6,
    events_tsf,
    register,
    table,
)


# multimodal plumbing (pipeline/multimodal.py). The decode kernel runs
# through the real mapInPandas/Arrow path; because the stub derives its
# pseudo-metadata from md5(payload), a full SQL oracle can replay it —
# so even the Python-UDF plumbing is value-checked, not just row-counted.

MM_DECODE_SQL = """WITH a AS (SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       md5(text) AS h, octet_length(encode(text)) AS n_bytes FROM documents),
    d AS (SELECT asset_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(16 + ('0x' || substr(h, 1, 2))::INT % 240 AS INT) AS width,
       CAST(16 + ('0x' || substr(h, 3, 2))::INT % 240 AS INT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + ('0x' || substr(h, 5, 2))::INT % 100 END AS INT) AS n_frames,
       CAST(('0x' || substr(h, 7, 2))::INT AS INT) AS mean_brightness
       FROM a)"""


@register("mm_decode", f"{MM_DECODE_SQL} SELECT * FROM d")
def mm_decode(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    return multimodal.decode_assets(assets)


@register(
    "mm_resize",
    f"""{MM_DECODE_SQL}
    SELECT asset_id, width, height,
           CAST(ceil(width * least(1.0, 64 / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_width,
           CAST(ceil(height * least(1.0, 64 / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_height
    FROM d""",
)
def mm_resize(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    out = multimodal.resize_images(multimodal.decode_assets(assets))
    return out.select("asset_id", "width", "height", "target_width", "target_height")


@register(
    "mm_frames",
    f"""{MM_DECODE_SQL}
    SELECT asset_id, CAST(unnest(generate_series(0, greatest(n_frames - 1, 0), 10)) AS BIGINT) AS frame_idx
    FROM d WHERE kind = 'video'""",
)
def mm_frames(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    out = multimodal.sample_frames(multimodal.decode_assets(assets))
    return out.select("asset_id", F.col("frame_idx").cast("long").alias("frame_idx"))


@register(
    "mm_resize_pixels",
    """WITH a AS (SELECT doc_id AS asset_id,
        CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 13 ELSE 5 + doc_id % 9 END AS w,
        CASE doc_id % 3 WHEN 0 THEN 3 + doc_id % 11 ELSE 2 + doc_id % 7 END AS h,
        CASE doc_id % 3 WHEN 0 THEN doc_id % 256 ELSE (7 * doc_id) % 256 END AS v
      FROM documents WHERE doc_id % 3 IN (0, 1)),
    s AS (SELECT asset_id, w, h, v,
                 least(1.0, 8.0 / greatest(w, h)) AS sc FROM a)
    SELECT asset_id, 'image' AS kind,
           CAST(ceil(w * sc) AS INT) AS width,
           CAST(ceil(h * sc) AS INT) AS height,
           CAST(1 AS INT) AS n_frames,
           CAST(v AS INT) AS mean_brightness
    FROM s""",
)
def mm_resize_pixels(spark, sf_dir):
    """REAL pixel thumbnailing end-to-end: decode BMP/PPM pixels,
    nearest-neighbor resample to max side 8, re-encode as P6, then
    RE-DECODE the produced bytes with the stdlib codec. The oracle
    predicts the resized dimensions arithmetically and the brightness
    invariance (constant-gray sources) — value parity through two real
    byte-level codec passes and an actual pixel transform."""
    assets = multimodal.synthetic_assets(table(spark, sf_dir, "documents"))
    resized = multimodal.resize_images_pixels(assets, max_side=8)
    return multimodal.decode_assets(resized, decode_stub=False).select(
        "asset_id", "kind", "width", "height", "n_frames", "mean_brightness"
    )


@register(
    "mm_audio_energy",
    """WITH a AS (SELECT doc_id AS asset_id, 50 + doc_id % 100 AS n,
                        doc_id % 128 AS amp8
           FROM documents WHERE doc_id % 3 = 2),
    w AS (SELECT asset_id, CAST(u.w AS INT) AS win_id, n, amp8
          FROM a, unnest(range(0, CAST(ceil(n / 25.0) AS BIGINT))) AS u(w))
    SELECT asset_id, win_id,
           CAST(CASE WHEN (win_id + 1) * 25 <= n THEN 25
                     ELSE n - win_id * 25 END AS INT) AS n_samples,
           CAST(amp8 AS INT) AS rms_q
    FROM w""",
)
def mm_audio_energy(spark, sf_dir):
    """Windowed RMS energy over REAL PCM WAV payloads (stdlib decode in
    Arrow mapInPandas). The synthetic WAVs hold constant amplitude
    256*(id%128) over 50+id%100 samples, so the oracle predicts every
    window's quantized RMS arithmetically — full value parity through
    actual byte-level DSP."""
    assets = multimodal.synthetic_assets(table(spark, sf_dir, "documents"))
    return multimodal.audio_energy_windows(assets)




@register(
    "mm_real_decode",
    """WITH ids AS (SELECT doc_id AS asset_id FROM documents),
    d AS (
      SELECT asset_id,
        CASE WHEN asset_id % 3 IN (0, 1) THEN 'image' ELSE 'audio' END AS kind,
        CASE asset_id % 3
          WHEN 0 THEN 4 + asset_id % 13
          WHEN 1 THEN 5 + asset_id % 9
          ELSE 1 END AS width,
        CASE asset_id % 3
          WHEN 0 THEN 3 + asset_id % 11
          WHEN 1 THEN 2 + asset_id % 7
          ELSE 16 END AS height,
        CASE asset_id % 3 WHEN 2 THEN 50 + asset_id % 100 ELSE 1 END AS n_frames,
        CASE asset_id % 3
          WHEN 0 THEN asset_id % 256
          WHEN 1 THEN (7 * asset_id) % 256
          ELSE asset_id % 128 END AS mean_brightness
      FROM ids)
    SELECT asset_id, kind,
      CAST(CASE asset_id % 3
        WHEN 0 THEN 54 + ((3 * width + 3) // 4 * 4) * height
        WHEN 1 THEN 3 + length(CAST(width AS VARCHAR)) + 1
                     + length(CAST(height AS VARCHAR)) + 5 + 3 * width * height
        ELSE 44 + 2 * n_frames END AS BIGINT) AS n_bytes,
      CAST(width AS INT) AS width, CAST(height AS INT) AS height,
      CAST(n_frames AS INT) AS n_frames,
      CAST(mean_brightness AS INT) AS mean_brightness
    FROM d""",
)
def mm_real_decode(spark, sf_dir):
    """REAL decode end-to-end: generate valid BMP/PPM/WAV payloads per
    doc_id, parse them with the actual stdlib codecs inside Arrow
    mapInPandas, and let the oracle predict every metadata field
    arithmetically — full value parity through real byte-level
    decoding, not a stub."""
    ids = table(spark, sf_dir, "documents")
    assets = multimodal.synthetic_assets(ids)
    return multimodal.decode_assets(assets, decode_stub=False)


