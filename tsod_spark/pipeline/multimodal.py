"""Multimodal column plumbing — binary assets with typed metadata.

Treats image/audio/video payloads as opaque ``BINARY`` columns plus a
typed metadata struct, processed with Arrow-batched ``mapInPandas``
(the right shape for per-asset decode at scale: batches stream through
Python with zero row-at-a-time overhead, and partitioning/pushdown stay
intact because metadata lives in ordinary columns).

Two decode paths:

- ``decode_stub=True`` — deterministic fake decode (hash-derived
  dimensions and stats) with the real schema/batch shape, for plumbing
  over arbitrary payloads (heavyweight codecs like PIL/ffmpeg are not
  in this container).
- ``decode_stub=False`` — REAL decoders for the container-independent
  formats this module can parse with the stdlib: BMP (24-bit
  uncompressed), binary PPM (P6), and PCM WAV. Dimensions come from
  actual header parsing and brightness from the actual pixel/sample
  bytes (numpy). ``synthetic_assets`` builds valid payloads in these
  formats whose metadata is arithmetically derivable from the asset
  id, so a real end-to-end decode is testable — and oracle-checkable —
  without external fixtures. Unsupported payloads raise ValueError.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_brightness", IntegerType()),
    ]
)


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic binary assets for plumbing tests: text bytes as
    payload, kind assigned round-robin."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


# ---------------------------------------------------------------------------
# real pure-stdlib codecs (BMP 24-bit, binary PPM, PCM WAV)


def build_bmp(width: int, height: int, value: int) -> bytes:
    """Minimal valid 24-bit uncompressed BMP filled with gray ``value``."""
    import struct

    row = (3 * width + 3) // 4 * 4  # rows pad to 4 bytes
    data_size = row * height
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    px = (bytes([value] * (3 * width)) + b"\x00" * (row - 3 * width)) * height
    return header + dib + px


def build_ppm(width: int, height: int, value: int) -> bytes:
    """Binary PPM (P6), max 255, filled with gray ``value``."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes([value] * 3) * (width * height)


def build_wav(n_samples: int, amplitude: int, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV holding ``n_samples`` of constant ``amplitude``."""
    import struct

    data = struct.pack(f"<{n_samples}h", *([amplitude] * n_samples))
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode_payload(payload: bytes) -> tuple[int, int, int, int]:
    """Parse one payload -> (width, height, n_frames, mean_brightness).

    Dispatch on magic bytes; dimensions are read from the actual
    headers and brightness from the actual pixel/sample bytes.
    """
    import struct

    import numpy as np

    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if bpp != 24:
            raise ValueError(f"only 24-bit BMP supported, got {bpp}")
        row = (3 * width + 3) // 4 * 4
        px = np.frombuffer(payload, dtype=np.uint8, offset=data_off).reshape(
            abs(height), row
        )[:, : 3 * width]
        return width, abs(height), 1, int(px.mean())
    if payload[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
        parts = payload.split(maxsplit=4)
        width, height = int(parts[1]), int(parts[2])
        px = np.frombuffer(payload[-3 * width * height:], dtype=np.uint8)
        return width, height, 1, int(px.mean())
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        channels, rate = struct.unpack_from("<HI", payload, 22)
        bits = struct.unpack_from("<H", payload, 34)[0]
        # find the data chunk (fmt may be followed by extension chunks)
        off = 12
        while off < len(payload):
            cid, csize = payload[off:off + 4], struct.unpack_from("<I", payload, off + 4)[0]
            if cid == b"data":
                n = csize // (channels * bits // 8)
                samples = np.frombuffer(payload, dtype=np.int16, offset=off + 8, count=csize // 2)
                return channels, bits, n, int(np.abs(samples.astype(np.int64)).mean()) >> 8
            off += 8 + csize
        raise ValueError("WAV without data chunk")
    raise ValueError("unsupported payload format (expect BMP, P6 PPM, or PCM WAV)")


def decode_assets(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    ``decode_stub=False`` runs the real stdlib codecs above;
    ``decode_stub=True`` derives deterministic pseudo-metadata from the
    payload bytes so the full Spark plumbing (schema, batching,
    partition preservation) is exercised on arbitrary payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                decoded = [
                    _decode_payload(bytes(p)) for p in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "kind": pdf["kind"],
                        "n_bytes": [len(p) for p in pdf["payload"]],
                        "width": [d[0] for d in decoded],
                        "height": [d[1] for d in decoded],
                        "n_frames": [d[2] for d in decoded],
                        "mean_brightness": [d[3] for d in decoded],
                    }
                )
                continue
            digests = [
                hashlib.md5(bytes(p)).digest() if p is not None else b"\x00" * 16
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [16 + d[0] % 240 for d in digests],
                    "height": [16 + d[1] % 240 for d in digests],
                    "n_frames": [
                        1 if k == "image" else 1 + d[2] % 100
                        for k, d in zip(pdf["kind"], digests)
                    ],
                    "mean_brightness": [d[3] for d in digests],
                }
            )
            yield out

    return assets.mapInPandas(batches, DECODED_SCHEMA)


def synthetic_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Valid BMP/PPM/WAV payloads generated per id (round-robin kind).

    Every metadata field is an arithmetic function of the id, so a SQL
    oracle can predict the REAL decoder's output exactly:

    - id % 3 == 0 -> BMP  w=4+id%13, h=3+id%11, gray v=id%256
    - id % 3 == 1 -> PPM  w=5+id%9,  h=2+id%7,  gray v=(7*id)%256
    - id % 3 == 2 -> WAV  mono 16-bit, n=50+id%100 samples of
      constant amplitude 256*(id%128) -> mean |sample| >> 8 = id%128
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                if i % 3 == 0:
                    payload = build_bmp(4 + i % 13, 3 + i % 11, i % 256)
                    kind, mime = "image", "image/bmp"
                elif i % 3 == 1:
                    payload = build_ppm(5 + i % 9, 2 + i % 7, (7 * i) % 256)
                    kind, mime = "image", "image/x-portable-pixmap"
                else:
                    payload = build_wav(50 + i % 100, 256 * (i % 128))
                    kind, mime = "audio", "audio/wav"
                rows.append((i, kind, payload, mime))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "mime"])

    # NO spread here, deliberately (r14): these stub assets are tiny
    # (4x13-px BMPs, 50-sample WAVs — microseconds per asset), so the
    # generation kernel is NOT compute-bound and the spread exchange
    # plus 32 micro-tasks through the chained Python stages cost more
    # than the parallelism buys (measured: mm_resize_pixels 0.9 ->
    # 2.5 s with the spread, recovered on revert). The EXPENSIVE
    # generators (textured/audio/video renders, seconds of numpy per
    # partition) keep _spread_ids.
    return ids.select(id_col).mapInPandas(gen, ASSET_SCHEMA)


def resize_images(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize planning is plain column algebra; the pixel work would be
    another mapInPandas stage over the payload column."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.withColumn("target_width", F.ceil(F.col("width") * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int")
    )


def sample_frames(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per kept
    frame index (sequence + explode keeps it JVM-side)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        decoded.where(F.col("kind") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("win_id", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms_q", IntegerType()),
    ]
)


def audio_energy_windows(assets: DataFrame, window_samples: int = 25) -> DataFrame:
    """Windowed audio energy over REAL WAV payloads: parse the PCM
    stream with the stdlib codec and emit per-window quantized RMS
    (``floor(rms) >> 8`` — the 16-bit→8-bit energy envelope a
    silence/music/speech gate thresholds on).

    Same Arrow ``mapInPandas`` shape as decode: batches stream through
    Python, numpy does the per-window math (no per-row Python), and
    non-audio payloads are skipped — at scale the upstream ``kind``
    filter prunes them before the bytes ever ship.
    """
    import struct

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                    continue
                # locate the data chunk (fmt parsing mirrors _decode_payload)
                pos = 12
                samples = None
                while pos + 8 <= len(p):
                    cid = p[pos : pos + 4]
                    sz = struct.unpack_from("<I", p, pos + 4)[0]
                    if cid == b"data":
                        samples = np.frombuffer(p, "<i2", sz // 2, pos + 8)
                        break
                    pos += 8 + sz + (sz & 1)
                if samples is None:
                    continue
                n = len(samples)
                for w in range((n + window_samples - 1) // window_samples):
                    chunk = samples[w * window_samples : (w + 1) * window_samples]
                    rms = float(np.sqrt(np.mean(chunk.astype("f8") ** 2)))
                    out.append((int(aid), w, len(chunk), int(rms) >> 8))
            yield pd.DataFrame(
                out, columns=["asset_id", "win_id", "n_samples", "rms_q"]
            )

    return assets.where(F.col("kind") == "audio").select(
        "asset_id", "payload"
    ).mapInPandas(batches, AUDIO_ENERGY_SCHEMA)


def _decode_pixels(payload: bytes):
    """BMP/P6 payload -> HxWx3 uint8 array (full pixel decode)."""
    import struct

    import numpy as np

    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        row = (3 * width + 3) // 4 * 4
        px = np.frombuffer(payload, np.uint8, abs(height) * row, data_off)
        px = px.reshape(abs(height), row)[:, : 3 * width]
        return px.reshape(abs(height), width, 3)
    if payload[:2] == b"P6":
        parts = payload.split(maxsplit=4)
        width, height = int(parts[1]), int(parts[2])
        px = np.frombuffer(payload[-3 * width * height :], np.uint8)
        return px.reshape(height, width, 3)
    raise ValueError("pixel decode supports BMP and P6 PPM")


def resize_images_pixels(assets: DataFrame, max_side: int = 8) -> DataFrame:
    """REAL pixel resampling (nearest neighbor) of image payloads:
    decode -> numpy index-sample -> re-encode as binary PPM. The pixel
    companion to :func:`resize_images`' metadata planning — the full
    decode→transform→re-encode loop a thumbnailing/vision-preproc
    stage runs, on the same Arrow ``mapInPandas`` plumbing. Output
    payloads are themselves decodable by the stdlib codec, so
    downstream stages (and tests) verify the bytes, not just metadata.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = _decode_pixels(bytes(payload))
                h, w = px.shape[:2]
                scale = min(1.0, max_side / max(w, h))
                tw, th = int(np.ceil(w * scale)), int(np.ceil(h * scale))
                ri = np.minimum((np.arange(th) * (h / th)).astype(int), h - 1)
                ci = np.minimum((np.arange(tw) * (w / tw)).astype(int), w - 1)
                out_px = px[ri][:, ci]
                payload_out = (
                    f"P6\n{tw} {th}\n255\n".encode() + out_px.tobytes()
                )
                rows.append((int(aid), "image", payload_out,
                             "image/x-portable-pixmap"))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "mime"]
            )

    return assets.where(F.col("kind") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(batches, ASSET_SCHEMA)


def build_bmp_pixels(px) -> bytes:
    """24-bit uncompressed BMP from an HxWx3 uint8 array (rows written
    in array order — the symmetric counterpart of `_decode_pixels`,
    which returns rows in buffer order)."""
    import struct

    import numpy as np

    h, w = px.shape[:2]
    row = (3 * w + 3) // 4 * 4
    data_size = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row - 3 * w)
    body = b"".join(
        np.ascontiguousarray(px[r]).tobytes() + pad for r in range(h)
    )
    return header + dib + body


def build_ppm_pixels(px) -> bytes:
    """Binary PPM (P6) from an HxWx3 uint8 array."""
    import numpy as np

    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(px).tobytes()


def synthetic_textured_assets(
    ids: DataFrame,
    id_col: str = "doc_id",
    twin_every: int = 5,
    base_h: int = 32,
    base_w: int = 36,
) -> DataFrame:
    """TEXTURED image corpus with PLANTED near-duplicates — the
    fixture the image-dedup certificate needs (flat-gray
    `synthetic_assets` images all dHash to zero, a degenerate corpus
    for near-dup work). Deterministic per id, id-arithmetic-
    predictable (the synthetic_assets oracle contract):

    - every id renders a seeded random texture (RandomState(id),
      values in [0, 200] so the twin brightness shift cannot clip);
      even ids encode as 24-bit BMP, odd as binary PPM;
    - ids with ``id % twin_every == 1`` are PLANTED TWINS of id-1's
      CONTENT: the base texture 2x nearest-upscaled, +20 brightness,
      re-encoded as PPM — resized + re-encoded + brightness-shifted,
      the three transforms an image-dedup pass must see through.
      Block-mean dHash (:func:`image_dhash`) is EXACTLY invariant to
      all three (integer argument in its docstring), so twin pairs
      land at Hamming distance 0 by construction.

    Dimensions are multiples of the dHash grid (8 rows x 9 cols) so
    block boundaries align exactly across the 2x resize."""
    import numpy as np

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                twin = i % twin_every == 1
                content = i - 1 if twin else i
                px = np.random.RandomState(content % (2**31)).randint(
                    0, 201, (base_h, base_w, 3)
                ).astype(np.uint8)
                if twin:
                    px = (
                        np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
                        + np.uint8(20)
                    )
                    payload = build_ppm_pixels(px)
                    mime = "image/x-portable-pixmap"
                elif i % 2 == 0:
                    payload = build_bmp_pixels(px)
                    mime = "image/bmp"
                else:
                    payload = build_ppm_pixels(px)
                    mime = "image/x-portable-pixmap"
                rows.append((i, "image", payload, mime))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "mime"]
            )

    return _spread_ids(ids.select(id_col), id_col).mapInPandas(
        gen, ASSET_SCHEMA
    )


def _spread_ids(ids: DataFrame, id_col: str) -> DataFrame:
    """Repartition an id frame across the cluster's cores before a
    CPU-bound generate/fingerprint ``mapInPandas`` stage — the dedup
    family's ``spread`` idiom (dedup.py:95): a small corpus arrives as
    one parquet file = ONE scan task, and per-asset render/decode/hash
    work is compute-bound, so scan-partition count must not cap
    parallelism (measured: the near-dup trio's generation kernels ran
    single-threaded off the 1-file fixture). Hash-partitioning on the
    id keeps the split deterministic; generation itself is per-id
    deterministic, so results are partition-independent."""
    from ..util import default_parallelism

    return ids.repartition(default_parallelism(ids.sparkSession), id_col)


def _dhash_pixels(px, grid_rows: int = 8, grid_cols: int = 9) -> int:
    """The block-mean dHash arithmetic over one decoded (h, w, 3)
    uint8 array — exact-integer (cross-multiplied block sums; see
    :func:`image_dhash`'s invariance docstring), shared by the
    single-image and per-video-frame fingerprint kernels. Returns the
    signed-int64 reinterpretation of the 64 bits."""
    import numpy as np

    gray = px.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    rb = (np.arange(grid_rows + 1) * h) // grid_rows
    cb = (np.arange(grid_cols + 1) * w) // grid_cols
    P = integ[np.ix_(rb, cb)]
    S = P[1:, 1:] - P[:-1, 1:] - P[1:, :-1] + P[:-1, :-1]
    area = np.outer(np.diff(rb), np.diff(cb))
    bits = (S[:, 1:] * area[:, :-1] > S[:, :-1] * area[:, 1:]).reshape(-1)
    # packbits is big-endian within bytes, so this equals the MSB-first
    # shift-or loop it replaces (differential-pinned in tests)
    return int.from_bytes(
        np.packbits(bits).tobytes(), "big", signed=True
    )


def image_dhash(
    assets: DataFrame,
    grid_rows: int = 8,
    grid_cols: int = 9,
) -> DataFrame:
    """64-bit difference hash (dHash) over DECODED bitmaps —
    perceptual fingerprints for image near-dup dedup, Arrow-batched
    over the same stdlib codecs the mm_* decode family uses. Per
    image: integer gray (R+G+B per pixel), block sums over an
    8x9 grid via an integral image, then the horizontal gradient sign
    between adjacent blocks packs to 64 bits (8 rows x 8 comparisons).

    EXACT-INTEGER invariances (why planted twins land at Hamming 0):
    comparisons are cross-multiplied integer block sums
    (``S1 * area2 > S2 * area1`` — no float means anywhere), so the
    hash is invariant to (a) integer upscales — every block sum
    scales by the same factor; (b) uniform brightness shifts without
    clipping — every block sum shifts by ``3 * delta * area``, equal
    across equal-area blocks; (c) lossless re-encoding (BMP <-> PPM
    carry identical pixel bytes). Block sums <= 255*3*w*h and areas
    <= w*h keep the cross products far inside int64.

    Returns ``(asset_id, dhash)`` with dhash a signed int64
    reinterpretation of the 64 bits — ready for
    :func:`tsod_spark.pipeline.dedup.hamming_near_pairs`."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_fps = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = _decode_pixels(bytes(payload))
                out_ids.append(int(aid))
                out_fps.append(_dhash_pixels(px, grid_rows, grid_cols))
            yield pd.DataFrame({"asset_id": out_ids, "dhash": out_fps})

    return assets.where(F.col("kind") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(kernel, "asset_id long, dhash long")


def build_wav_samples(samples, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV around an arbitrary int16 sample array —
    the waveform sibling of :func:`build_wav`'s constant tone."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synthetic_audio_assets(
    ids: DataFrame,
    id_col: str = "doc_id",
    twin_every: int = 5,
    n_windows: int = 65,
    samples_per_window: int = 20,
) -> DataFrame:
    """Waveform audio corpus with PLANTED near-duplicates — the audio
    sibling of :func:`synthetic_textured_assets` (flat-tone
    ``build_wav`` clips all fingerprint to one value, a degenerate
    corpus for near-dup work). Deterministic per id,
    id-arithmetic-predictable:

    - every id renders a seeded random int16 waveform
      (RandomState(id), samples in [-8000, 8000) so the twin's 2x gain
      cannot clip int16) of ``n_windows * samples_per_window`` samples
      at 8 kHz;
    - ids with ``id % twin_every == 1`` are PLANTED TWINS of id-1's
      CONTENT: the base waveform at 2x GAIN, 2x sample-repeat
      upsampled, re-encoded with a 16 kHz rate header — louder,
      resampled, re-encoded: the three transforms an audio-dedup pass
      must see through. The energy-difference fingerprint
      (:func:`audio_energy_fingerprint`) is EXACTLY invariant to all
      three (integer argument in its docstring), so twin pairs land at
      Hamming distance 0 by construction.

    Sample counts are multiples of ``n_windows`` so window boundaries
    align exactly across the 2x upsample."""
    import numpy as np

    n = n_windows * samples_per_window

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                twin = i % twin_every == 1
                content = i - 1 if twin else i
                s = np.random.RandomState(
                    (content * 2 + 1) % (2**31)
                ).randint(-8000, 8000, n).astype(np.int16)
                if twin:
                    s = np.repeat(s * np.int16(2), 2)
                    payload = build_wav_samples(s, sample_rate=16000)
                else:
                    payload = build_wav_samples(s, sample_rate=8000)
                rows.append((i, "audio", payload, "audio/wav"))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "mime"]
            )

    return _spread_ids(ids.select(id_col), id_col).mapInPandas(
        gen, ASSET_SCHEMA
    )


def audio_energy_fingerprint(
    assets: DataFrame,
    n_windows: int = 65,
) -> DataFrame:
    """64-bit energy-difference fingerprint over DECODED PCM streams —
    the audio perceptual hash (the Haitsma-Kalker energy-band sign
    idea collapsed to one band over time), Arrow-batched through the
    same stdlib WAV parser the mm_* decode family uses. Per clip:
    samples split into ``n_windows`` proportional windows, INTEGER
    energy (sum of squared int64 samples) per window, then the sign of
    each adjacent-window energy gradient packs to
    ``n_windows - 1 = 64`` bits.

    EXACT-INTEGER invariances (why planted twins land at Hamming 0):
    comparisons are cross-multiplied integer window energies
    (``E1 * len2 > E2 * len1`` — no float ever) so the hash is
    invariant to (a) uniform gain — every energy scales by gain^2;
    (b) integer sample-repeat upsampling when window boundaries align
    — each window's energy and length scale by the same factor;
    (c) re-encoding/rate-header changes (the parser reads the data
    chunk, not the rate). Energies <= 32767^2 * len and len <= clip
    keep the cross products far inside int64 for any clip under ~2^19
    samples per window.

    Returns ``(asset_id, afp)`` with afp a signed int64
    reinterpretation of the 64 bits — ready for
    :func:`tsod_spark.pipeline.dedup.hamming_near_pairs`."""
    import struct

    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_fps = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                    continue
                pos = 12
                samples = None
                while pos + 8 <= len(p):
                    cid = p[pos : pos + 4]
                    sz = struct.unpack_from("<I", p, pos + 4)[0]
                    if cid == b"data":
                        samples = np.frombuffer(p, "<i2", sz // 2, pos + 8)
                        break
                    pos += 8 + sz + (sz & 1)
                if samples is None or len(samples) < n_windows + 1:
                    continue
                s = samples.astype(np.int64)
                cum = np.zeros(len(s) + 1, dtype=np.int64)
                np.cumsum(s * s, out=cum[1:])
                b = (np.arange(n_windows + 1) * len(s)) // n_windows
                E = cum[b[1:]] - cum[b[:-1]]
                L = np.diff(b)
                bits = E[1:] * L[:-1] > E[:-1] * L[1:]
                out_ids.append(int(aid))
                out_fps.append(
                    int.from_bytes(
                        np.packbits(bits).tobytes(), "big", signed=True
                    )
                )
            yield pd.DataFrame({"asset_id": out_ids, "afp": out_fps})

    return assets.where(F.col("kind") == "audio").select(
        "asset_id", "payload"
    ).mapInPandas(kernel, "asset_id long, afp long")


def synthetic_video_assets(
    ids: DataFrame,
    id_col: str = "doc_id",
    twin_every: int = 5,
    n_frames: int = 8,
    base_h: int = 16,
    base_w: int = 18,
) -> DataFrame:
    """Multi-frame video corpus with PLANTED near-duplicates — the
    video sibling of :func:`synthetic_textured_assets` /
    :func:`synthetic_audio_assets`, completing the modality triangle.
    Container: a PPM STREAM (consecutive binary P6 frames
    back-to-back — the netpbm/ffmpeg ``image2pipe`` raw-video idiom,
    parseable with the same stdlib P6 codec the image path uses).
    Deterministic per id, id-arithmetic-predictable:

    - every id renders ``n_frames`` seeded random textured frames
      (RandomState(content * n_frames + f), values in [0, 200]);
    - ids with ``id % twin_every == 1`` are PLANTED TWINS of id-1's
      CONTENT: every frame 2x nearest-upscaled and +20 brightness
      (the dHash-invariant image transforms) AND the LAST FRAME
      DROPPED — a temporal trim, the transform frame-vote matching
      must see through and whole-payload hashing cannot.

    Frame dimensions are multiples of the dHash grid so block
    boundaries align across the 2x upscale."""
    import numpy as np

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                twin = i % twin_every == 1
                content = i - 1 if twin else i
                # ONE seeded draw for the whole clip (a per-frame
                # RandomState init dominates generation cost at 8
                # frames x 5k videos); frame f is the f-th slab, so
                # the twin reproduces the base's frames exactly by
                # drawing the same (n_frames, h, w, 3) block
                block = np.random.RandomState(content % (2**31)).randint(
                    0, 201, (n_frames, base_h, base_w, 3)
                ).astype(np.uint8)
                nf = n_frames - 1 if twin else n_frames
                frames = []
                for f in range(nf):
                    px = block[f]
                    if twin:
                        px = (
                            np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
                            + np.uint8(20)
                        )
                    frames.append(build_ppm_pixels(px))
                rows.append(
                    (i, "video", b"".join(frames), "video/x-ppm-stream")
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "mime"]
            )

    return _spread_ids(ids.select(id_col), id_col).mapInPandas(
        gen, ASSET_SCHEMA
    )


def video_frame_dhashes(
    assets: DataFrame,
    grid_rows: int = 8,
    grid_cols: int = 9,
) -> DataFrame:
    """Per-frame perceptual fingerprints over PPM-stream videos: walk
    the concatenated P6 frames with the stdlib codec and emit one
    64-bit block-mean dHash per frame (``asset_id, frame_idx,
    dhash``) — the frame-sampling half of video near-dup dedup, one
    Arrow pass, same exact-integer dHash arithmetic as the image path
    (:func:`_dhash_pixels`). At 100 TB the PPM walk is the
    frame-decode stage of the fleet-ingest pipeline; everything
    downstream (banded Hamming join + frame vote) is
    fingerprint-width work, independent of pixel volume."""
    import numpy as np

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                pos, f = 0, 0
                while pos < len(p) and p[pos : pos + 2] == b"P6":
                    # header: P6 <ws> w <ws> h <ws> maxval <1 ws> data
                    j = pos + 2
                    fields = []
                    while len(fields) < 3:
                        while p[j] in b" \t\r\n":
                            j += 1
                        if p[j : j + 1] == b"#":
                            while p[j] not in b"\r\n":
                                j += 1
                            continue
                        k = j
                        while p[k] not in b" \t\r\n":
                            k += 1
                        fields.append(int(p[j:k]))
                        j = k
                    w, h, _maxval = fields
                    j += 1  # the single whitespace after maxval
                    px = np.frombuffer(
                        p, dtype=np.uint8, count=3 * w * h, offset=j
                    ).reshape(h, w, 3)
                    out.append(
                        (
                            int(aid),
                            f,
                            _dhash_pixels(px, grid_rows, grid_cols),
                        )
                    )
                    pos = j + 3 * w * h
                    f += 1
            yield pd.DataFrame(
                out, columns=["asset_id", "frame_idx", "dhash"]
            )

    return assets.where(F.col("kind") == "video").select(
        "asset_id", "payload"
    ).mapInPandas(kernel, "asset_id long, frame_idx int, dhash long")


def video_near_dups(
    frame_fps: DataFrame,
    min_frame_share: float = 0.6,
    max_hamming: int = 3,
    frame_stride: int = 1_000_000,
) -> DataFrame:
    """Video-level near-dup pairs from per-frame fingerprints — the
    FRAME VOTE: two videos are near-dups when matching frames cover at
    least ``min_frame_share`` of the SHORTER video (robust to temporal
    trims, which whole-payload hashing cannot see through). Frame
    matching rides the generic pigeonhole Hamming engine
    (:func:`tsod_spark.pipeline.dedup.hamming_near_pairs`) on
    composite ``asset_id * frame_stride + frame_idx`` ids — one banded
    equi-join over all frames of all videos, no all-pairs at either
    the frame or the video level; the vote is one ``groupBy`` over the
    frame-pair hits counting DISTINCT matched frame indexes per side
    (a frame matching 3 frames of the other video votes once).

    Returns ``(video_a, video_b, n_matched, matched_share)`` with
    video_a < video_b. ``frame_stride`` bounds frames per video."""
    from . import dedup
    from ..util import tracked_cache

    # The fingerprint frame is consumed by THREE subtrees (the banded
    # chunk join's cache fill + the two per-side frame-count joins);
    # uncached, each re-runs the whole generate/parse/hash Python
    # chain upstream (measured: 3 full generation passes in the
    # before-plan — plans/r14/mm_video_near_dups_before.txt shows the
    # MapInPandas pair three times). Caching ~n_frames rows of
    # (asset_id, frame_idx, dhash) longs makes generation run ONCE.
    frame_fps = tracked_cache(frame_fps)

    composite = frame_fps.select(
        (
            F.col("asset_id") * F.lit(frame_stride) + F.col("frame_idx")
        ).alias("fid"),
        "dhash",
    )
    fpairs = dedup.hamming_near_pairs(
        composite, id_col="fid", fp_col="dhash",
        bits=64, max_hamming=max_hamming,
    )
    va = F.floor(F.col("id_a") / frame_stride)
    vb = F.floor(F.col("id_b") / frame_stride)
    hits = (
        fpairs.select(
            F.least(va, vb).alias("video_a"),
            F.greatest(va, vb).alias("video_b"),
            F.when(va < vb, F.col("id_a") % frame_stride)
            .otherwise(F.col("id_b") % frame_stride)
            .alias("frame_a"),
            F.when(va < vb, F.col("id_b") % frame_stride)
            .otherwise(F.col("id_a") % frame_stride)
            .alias("frame_b"),
        )
        .where(F.col("video_a") != F.col("video_b"))
    )
    counts = frame_fps.groupBy(F.col("asset_id").alias("__vid")).agg(
        F.count(F.lit(1)).cast("long").alias("__nf")
    )
    votes = hits.groupBy("video_a", "video_b").agg(
        F.countDistinct("frame_a").alias("__ma"),
        F.countDistinct("frame_b").alias("__mb"),
    )
    return (
        votes.join(
            F.broadcast(counts).withColumnRenamed("__vid", "video_a")
            .withColumnRenamed("__nf", "__nf_a"),
            "video_a",
        )
        .join(
            F.broadcast(counts)
            .withColumnRenamed("__vid", "video_b")
            .withColumnRenamed("__nf", "__nf_b"),
            "video_b",
        )
        # matched frames counted on the SHORTER side, so the share is a
        # true coverage fraction in [0, 1] — counting the longer side
        # would let one short frame matching many long frames push the
        # share past 1
        .withColumn(
            "n_matched",
            F.when(
                F.col("__nf_a") <= F.col("__nf_b"), F.col("__ma")
            ).otherwise(F.col("__mb")),
        )
        .withColumn(
            "matched_share",
            F.round(
                F.col("n_matched").cast("double")
                / F.least("__nf_a", "__nf_b").cast("double"),
                6,
            ),
        )
        .where(F.col("matched_share") >= min_frame_share)
        .select("video_a", "video_b", "n_matched", "matched_share")
    )
