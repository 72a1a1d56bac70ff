"""Multimodal columns (north-star): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed with
Arrow-batched ``mapInPandas``.

The image decode seam is REAL for PNG / PPM / PGM payloads: the codec
dispatch (`_decode_full`) sniffs magic bytes and runs the pure-Python
decoders in ``functions/imagecodec.py`` (stdlib zlib inflate, CRC
verification, all five PNG scanline filters) — the same non-stub
discipline the PCM16 audio path established. Payloads in any OTHER
format fall back to ``_fake_decode`` — a deterministic, documented
stand-in that derives (width, height, format) from the payload bytes
— because this container has no PIL/cv2 for JPEG-class formats; when
PIL is present, unrecognized payloads route through it instead.

Scale notes: all operators are NARROW (mapInPandas over whatever
partitioning the scan produced) — no shuffle; 100 TB of images stream
through executors one Arrow batch at a time. Payload bytes should live
in parquet binary columns colocated with their metadata, so column
pruning lets metadata-only queries skip the heavy bytes entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.spread import spread
from eeg_data_lake_spark.functions.imagecodec import (
    decode_image,
    encode_png,
    sniff,
    to_gray,
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

#: schema of the decoded-feature rows appended by decode_image_features
DECODE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "n_bytes int, mean_byte double, std_byte double, "
    "px_sum long, corner_px int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    With no real media on disk, the deterministic payload is the UTF-8
    encoding of the text column — byte-for-byte reproducible in the
    DuckDB oracle via encode(). Real pipelines read parquet binary
    columns directly; everything downstream only sees ``payload``.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_meta",
        F.struct(
            F.lit("fake/utf8").alias("fmt"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload) with a deterministic REAL PNG per id: width =
    8 + id % 9, height = 8 + (id·7) % 9, pixel[i][j] = (id·31 + i·17 +
    j·7) % 256, scanline filter = id % 5 — so a table scan exercises
    every PNG filter type through the production decode path. Ids with
    id % 3 == 2 are PALETTE-encoded (color type 3, the common
    real-world web/icon encoding): the same pixel grid becomes palette
    INDICES into palette[k] = (perm(k),)*3 with perm(k) = (k·37 + 11)
    % 256 — a gray but NON-identity palette, so a decoder that skipped
    the PLTE expansion would return wrong pixels, while luma stays an
    exact integer. The whole generator is deliberately
    SQL-expressible: a DuckDB oracle re-derives exact pixel sums from
    the formulas, turning encode→deflate→inflate→unfilter→PLTE-expand
    into a hash-checkable query (z16). Narrow mapInPandas; real media
    pipelines read parquet binary columns instead."""
    perm = ((np.arange(256, dtype=np.int64) * 37 + 11) % 256).astype(
        np.uint8
    )
    pal = np.stack([perm, perm, perm], axis=1)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w = 8 + d % 9
                h = 8 + (d * 7) % 9
                i = np.arange(h, dtype=np.int64)[:, None]
                j = np.arange(w, dtype=np.int64)[None, :]
                px = ((d * 31 + i * 17 + j * 7) % 256).astype(np.uint8)
                palette = pal if d % 3 == 2 else None
                out.append(
                    (d, encode_png(px, filter_type=d % 5, palette=palette))
                )
            yield pd.DataFrame(out, columns=[id_col, "payload"])

    # the id projection is the lightweight proxy (8 bytes/row): spread
    # it BEFORE the codec chain so the encode (and every narrow decode
    # stage above) runs at full task-slot parallelism when the scan's
    # file layout under-fills the cluster (operators/spread.py;
    # identity at scale)
    ids = spread(df.select(id_col), by=[id_col])
    return ids.mapInPandas(fn, f"{id_col} long, payload binary")


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image codec (STUB — see module
    docstring): pretends the payload is a tiny image whose dimensions
    are functions of the byte content. Replace with PIL when present.
    """
    n = len(payload)
    checksum = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    width = 16 + checksum % 48
    height = 16 + (checksum >> 8) % 48
    return ("fake/utf8", width, height) if n else ("empty", 0, 0)


def _decode_full(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """(fmt, width, height, float64 gray grid) — the ONE decode seam
    every image operator goes through. PNG/PPM/PGM payloads decode for
    REAL (imagecodec.py: zlib inflate + CRC + filter reversal + PLTE
    expansion, nothing stubbed); unrecognized payloads go to PIL when
    available — which it is NOT in this container, so the stdlib codec
    is the only decode path any test or query here ever exercises and
    the PIL branch exists purely as the documented swap seam for
    formats the pure-Python codec doesn't cover (JPEG/WebP) — else the
    deterministic ``_fake_decode`` stand-in. A payload that SNIFFS as
    a real format but fails to decode (corrupt stream, bad CRC,
    zero-dimension header) also drops to the fallback rather than
    raising — at 100 TB one malformed payload must not abort the whole
    mapInPandas job; callers that want strictness call
    ``imagecodec.decode_image`` directly."""
    fmt = sniff(payload) if payload else None
    if fmt is not None:
        try:
            g = to_gray(decode_image(payload))
            return fmt, g.shape[1], g.shape[0], g
        except ValueError:
            pass  # corrupt/unsupported: fall through to the stand-in
    if _HAVE_PIL and payload:  # pragma: no cover - PIL absent here
        import io

        try:
            im = Image.open(io.BytesIO(payload)).convert("L")
            g = np.asarray(im, dtype=np.float64)
            return (im.format or "pil").lower(), g.shape[1], g.shape[0], g
        except Exception:
            pass
    f, w, h = _fake_decode(payload)
    return f, w, h, _fake_pixels(payload, max(w, 1), max(h, 1))


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract each payload: format/dimensions/pixels
    from the REAL codec for PNG/PPM/PGM (fake stand-in for other
    formats — see ``_decode_full``), byte statistics with numpy, plus
    pixel-level evidence that the decode is genuine: ``px_sum`` (exact
    integer sum of the decoded gray grid) and ``corner_px`` (the
    bottom-right decoded pixel) — both re-derivable in a SQL oracle
    when the payload generator is SQL-expressible, which is how z16
    hash-checks the whole encode→inflate→unfilter→decode loop.
    Narrow mapInPandas, no shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                fmt, width, height, grid = _decode_full(raw)
                arr = np.frombuffer(raw, dtype=np.uint8)
                out.append(
                    (
                        doc_id,
                        fmt,
                        width,
                        height,
                        len(raw),
                        float(arr.mean()) if len(arr) else 0.0,
                        float(arr.std()) if len(arr) else 0.0,
                        int(round(float(grid.sum()))) if grid.size else 0,
                        int(round(float(grid[-1, -1]))) if grid.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "n_bytes", "mean_byte", "std_byte",
                    "px_sum", "corner_px",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling over a binary payload: split the byte
    stream into ``n_frames`` equal chunks and emit one scalar row per
    frame — (id, n_bytes, frame_idx, frame_sig). Pure JVM expression —
    the byte slicing/sampling pattern for real video is identical, with
    the checksum swapped for a frame decode.

    The signature is ``md5(hex(frame_bytes))``: hex-ing first keeps the
    checksum portable (an oracle engine whose md5 only accepts text can
    slice the hex string at 2× byte offsets and get the identical
    digest). Scalar output rows — never an array column — so downstream
    consumers (and row canonicalizers) see only sortable primitives."""
    n_bytes = F.length(F.col(payload_col))
    step = F.greatest(F.floor(n_bytes / n_frames).cast("int"), F.lit(1))
    return (
        df.select(
            id_col,
            n_bytes.alias("n_bytes"),
            F.col(payload_col).alias("__payload"),
            step.alias("__step"),
            F.posexplode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias(
                "frame_idx", "__i"
            ),
        )
        .select(
            id_col,
            "n_bytes",
            "frame_idx",
            F.md5(
                F.hex(
                    F.substring(
                        F.col("__payload"),
                        (F.col("frame_idx") * F.col("__step") + 1).cast("int"),
                        F.col("__step"),
                    )
                )
            ).alias("frame_sig"),
        )
    )


#: schema of the resize rows appended by resize_image_features
RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, out_width int, "
    "out_height int, mean_px double, resized_md5 string"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic (h, w) float array standing in for decoded pixels:
    the payload bytes tiled to the fake-decoded dimensions (STUB — a
    real codec returns the actual pixel grid; everything downstream of
    this function is real math)."""
    if not len(payload):
        return np.zeros((1, 1), dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.resize(arr, (height, width))


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real vectorized bilinear resampling (align_corners=False, the
    OpenCV/PIL convention): output pixel centers map to source
    coordinates, the four neighbors blend by fractional distance.
    This is the production resize kernel — nothing stubbed."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0[:, None], x0[None, :]] * (1 - wx) + img[y0[:, None], x1[None, :]] * wx
    bot = img[y1[:, None], x0[None, :]] * (1 - wx) + img[y1[:, None], x1[None, :]] * wx
    return top * (1 - wy) + bot * wy


def resize_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Decode (real codec for PNG/PPM/PGM, fake stand-in otherwise) →
    resize (real bilinear) → emit resized stats
    and a checksum of the uint8-quantized resized grid. Narrow
    mapInPandas like the other multimodal ops — 100 TB of payloads
    stream through one Arrow batch at a time, no shuffle; the checksum
    keeps results comparable without shipping pixel arrays around."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                _fmt, _w, _h, img = _decode_full(raw)
                resized = resize_bilinear(img, out_h, out_w)
                q = np.clip(np.rint(resized), 0, 255).astype(np.uint8)
                out.append(
                    (
                        doc_id,
                        img.shape[1],
                        img.shape[0],
                        out_w,
                        out_h,
                        float(resized.mean()),
                        hashlib.md5(q.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "mean_px", "resized_md5",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, RESIZE_SCHEMA)


#: schema of the per-document PCM feature rows (decode_pcm_features)
PCM_SCHEMA = (
    "doc_id long, n_samples long, rms double, peak int, "
    "mean_crossings long, mean_sample double"
)

#: schema of the per-frame PCM energy rows (pcm_frame_rms)
PCM_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, n_frame_samples long, frame_rms double"
)


def decode_pcm_samples(raw: bytes) -> np.ndarray:
    """REAL audio decode — PCM16LE, the codec WAV data chunks use: each
    consecutive byte pair is one little-endian signed 16-bit sample (a
    trailing odd byte is dropped, as a truncated stream would be).
    Unlike the image path there is nothing to stub: PCM is pure numpy,
    so this is the one codec in the container that runs end-to-end and
    can be checked bit-for-bit against an oracle."""
    return np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.int64)


def decode_pcm_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode each binary payload as PCM16LE and emit per-document audio
    features: sample count, RMS level, peak amplitude, mean-crossing
    count (zero crossings after DC removal — text-derived payloads sit
    far above zero, so raw zero crossings would be degenerate; real
    audio features subtract the DC offset first for the same reason),
    and DC offset (mean sample). Narrow mapInPandas — the same
    streaming batch shape as the image/video operators, but with a real
    decoder in the codec slot.

    Numeric discipline for oracle bit-equality: RMS and mean divide an
    EXACT integer sum (int64 accumulation, values < 2^53) by the count,
    so the only floating-point ops are one division (and one sqrt) that
    any IEEE-754 engine evaluates identically. Rounding is left to the
    caller (Spark-side F.round == oracle-side round, both half-away).
    Documents too short to hold one sample (< 2 bytes) are skipped —
    mirroring the oracle's empty group vanishing under GROUP BY."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                v = decode_pcm_samples(raw)
                n = int(v.size)
                if n == 0:
                    continue
                sum_sq = int(np.sum(v * v))
                sum_v = int(np.sum(v))
                mean = sum_v / n
                # crossings of the DC-removed signal: sign test on a
                # product of exact IEEE doubles — both engines multiply
                # the same values, so the < 0 outcome is deterministic
                c = v.astype(np.float64) - mean
                out.append(
                    (
                        doc_id,
                        n,
                        float(np.sqrt(sum_sq / n)),
                        int(np.max(np.abs(v))),
                        int(np.count_nonzero(c[:-1] * c[1:] < 0.0)),
                        mean,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "rms", "peak",
                    "mean_crossings", "mean_sample",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, PCM_SCHEMA)


def pcm_frame_rms(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 8,
) -> DataFrame:
    """Audio frame sampling: decode PCM16LE, split the sample stream
    into ``n_frames`` fixed-stride frames (stride = floor(n/frames),
    min 1 — the q49 video-frame convention, trailing remainder
    dropped), and emit one (doc_id, frame_idx, n, rms) row per
    non-empty frame. This is the windowed-energy primitive real audio
    pipelines run before VAD/segmentation; same exact-integer-sum
    discipline as decode_pcm_features."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                v = decode_pcm_samples(raw)
                n = int(v.size)
                if n == 0:
                    continue
                step = max(n // n_frames, 1)
                for f in range(n_frames):
                    seg = v[f * step : (f + 1) * step]
                    if not seg.size:
                        break
                    out.append(
                        (
                            doc_id,
                            f,
                            int(seg.size),
                            float(np.sqrt(int(np.sum(seg * seg)) / seg.size)),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "n_frame_samples", "frame_rms"],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, PCM_FRAME_SCHEMA)


# ------------------------------------------------ WAV/RIFF container

#: canonical PCM16 WAV header size this module writes (RIFF + fmt + data)
WAV_HEADER_BYTES = 44

#: schema of the per-document WAV feature rows (decode_wav_features)
WAV_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, n_frames long, "
    "rms double, peak int"
)


def encode_wav(
    pcm: bytes, n_channels: int = 1, sample_rate: int = 16000
) -> bytes:
    """Wrap raw PCM16LE bytes in a canonical RIFF/WAVE container
    (16-byte PCM fmt chunk, then the data chunk — the 44-byte layout
    every minimal WAV writer produces). Trailing bytes that do not
    fill a whole frame (2 bytes x channels) are dropped, as an audio
    writer would. Used to build deterministic WAV fixtures the DuckDB
    oracle can re-derive arithmetically (data bytes == truncated
    source bytes at a fixed 44-byte offset)."""
    import struct

    block = 2 * n_channels
    data = pcm[: len(pcm) // block * block]
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            1,
            n_channels,
            sample_rate,
            sample_rate * block,
            block,
            16,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav(raw: bytes) -> tuple[int, int, bytes]:
    """STRICT RIFF/WAVE parser → (n_channels, sample_rate, pcm bytes).

    Walks the chunk list (word-aligned: odd-sized chunks are padded),
    accepts extra chunks (LIST/INFO etc.) by skipping them, tolerates
    trailer bytes appended BEYOND the declared RIFF extent (ID3/LIST
    tags common tools write there), and raises ValueError — never
    returns garbage — on every malformation class a crawl actually
    ships: short/missing RIFF or WAVE magic, a declared RIFF size
    exceeding the payload (truncated file), a chunk body cut short,
    stray bytes inside the extent, missing fmt/data chunks, non-PCM
    format codes (compressed WAV needs a real codec — refuse, don't
    misread), bit depths other than 16, zero channels, and a
    block-align inconsistent with the declared layout. The errors feed ``with_wav_status`` → the z21
    expectations quarantine, the same path corrupt PNGs take.
    Reference capability: the reference decodes arbitrary containers
    via PIL/torchaudio (/root/reference/test_train.py:66-93); this is
    the dependency-free container half with the PCM codec real."""
    import struct

    if len(raw) < 12:
        raise ValueError("WAV: truncated RIFF header")
    if raw[0:4] != b"RIFF":
        raise ValueError("WAV: missing RIFF magic")
    declared = struct.unpack("<I", raw[4:8])[0]
    if declared + 8 > len(raw):
        raise ValueError(
            f"WAV: RIFF declares {declared + 8} bytes but payload has "
            f"{len(raw)} — truncated"
        )
    # bytes PAST the declared RIFF extent are tolerated: common tools
    # append ID3/LIST trailer tags beyond the RIFF size, and real-world
    # files carrying them must survive ingest (the round-7 strict
    # refusal quarantined them — reverted on review). ONE trailer class
    # stays refused: a trailer that is itself another RIFF form means
    # the payload is two concatenated WAV files, and returning the
    # first's samples as "the" decode would silently misrepresent the
    # row (duration/byte stats wrong, second recording dropped) —
    # that's a malformation, not a tag. Strictness is kept where it
    # protects the decode: the chunk walk below is bounded by the
    # declared extent and must consume it EXACTLY, so intra-extent
    # truncation/stray-byte malformations still raise.
    trailer = raw[8 + declared :]
    if trailer[:4] == b"RIFF":
        raise ValueError(
            "WAV: trailer begins another RIFF form — concatenated "
            "WAV files, refusing to return only the first"
        )
    if raw[8:12] != b"WAVE":
        raise ValueError("WAV: not a WAVE form")
    fmt = data = None
    # the walk is bounded by the RIFF chunk's own declared extent
    # (<= len(raw); anything past it is tolerated trailer) and must
    # consume it EXACTLY: 1-7 stray bytes after the last chunk are a
    # malformation, not slack — the old `while pos + 8 <= len` exit
    # accepted them.
    end = 8 + declared
    pos = 12
    while pos + 8 <= end:
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(
                f"WAV: chunk {cid!r} declares {size} bytes, "
                f"{end - pos - 8} available — truncated"
            )
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data" and data is None:
            data = body
        pos += 8 + size
        if (size & 1) and pos < end:
            pos += 1  # word-aligned: odd chunks carry a pad byte
    if pos != end:
        raise ValueError(
            f"WAV: {end - pos} stray bytes after the last chunk"
        )
    if fmt is None:
        raise ValueError("WAV: missing fmt chunk")
    if data is None:
        raise ValueError("WAV: missing data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV: fmt chunk too short")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = (
        struct.unpack("<HHIIHH", fmt[:16])
    )
    if audio_format != 1:
        raise ValueError(
            f"WAV: unsupported format code {audio_format} (PCM=1 only)"
        )
    if bits != 16:
        raise ValueError(f"WAV: unsupported bit depth {bits}")
    if n_channels < 1:
        raise ValueError("WAV: zero channels")
    if block_align != 2 * n_channels:
        raise ValueError(
            f"WAV: block align {block_align} inconsistent with "
            f"{n_channels} x 16-bit channels"
        )
    return n_channels, sample_rate, data


def decode_wav_samples(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Parse + decode: (n_channels, sample_rate, samples[frame, ch])
    — the de-interleaved frame matrix real audio code consumes.
    Raises ValueError on malformed containers (parse_wav)."""
    n_channels, sample_rate, data = parse_wav(raw)
    v = decode_pcm_samples(data)
    frames = v.size // n_channels
    return (
        n_channels,
        sample_rate,
        v[: frames * n_channels].reshape(frames, n_channels),
    )


def decode_wav_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Container-aware audio features: parse the RIFF/WAVE header
    (channels, sample rate), decode the data chunk as PCM16LE, and
    emit per-document (n_channels, sample_rate, n_frames, rms, peak).
    Same exact-integer-sum discipline as decode_pcm_features so the
    DuckDB oracle hash-matches bit for bit. Documents whose container
    fails to parse, or with zero whole frames, are SKIPPED here —
    route them through ``with_wav_status`` + the expectations
    quarantine when they must be accounted for, not dropped (z27).
    Narrow Arrow-batched mapInPandas — no shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    ch, rate, frames = decode_wav_samples(raw)
                except ValueError:
                    continue
                if frames.shape[0] == 0:
                    continue
                v = frames.reshape(-1)
                out.append(
                    (
                        doc_id,
                        ch,
                        rate,
                        int(frames.shape[0]),
                        float(np.sqrt(int(np.sum(v * v)) / v.size)),
                        int(np.max(np.abs(v))),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_channels", "sample_rate", "n_frames",
                    "rms", "peak",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, WAV_SCHEMA)


def with_wav_status(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``wav_ok boolean`` + ``wav_err string`` from the strict
    RIFF/WAVE parser — the audio twin of ``with_decode_status``:
    feed the boolean to ``operators/expectations.enforce(
    mode='quarantine')`` so malformed containers land tagged with the
    parser's own error text instead of being silently skipped."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("wav_ok", T.BooleanType()),
            T.StructField("wav_err", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, err = [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                try:
                    parse_wav(raw)
                    ok.append(True)
                    err.append(None)
                except ValueError as exc:
                    ok.append(False)
                    err.append(str(exc))
            pdf = pdf.copy()
            pdf["wav_ok"] = ok
            pdf["wav_err"] = err
            yield pdf

    return df.mapInPandas(fn, schema)


def attach_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic WAV fixture corpus: each document's payload is a
    canonical RIFF/WAVE file whose PCM data is the UTF-8 text bytes
    (truncated to whole frames) — stereo at 8 kHz for ``id % 3 == 0``,
    mono at 16 kHz otherwise, so channel handling is exercised and a
    DuckDB oracle re-derives everything from doc_id arithmetic plus
    the same hex decoding the r45 oracle uses (the data chunk is the
    text bytes at a fixed 44-byte offset). NULL text becomes a valid
    zero-frame file."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                d = int(doc_id)
                pcm = (text or "").encode("utf-8")
                if d % 3 == 0:
                    out.append((d, encode_wav(pcm, 2, 8000)))
                else:
                    out.append((d, encode_wav(pcm, 1, 16000)))
            yield pd.DataFrame(out, columns=[id_col, "payload"])

    return df.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, payload binary"
    )


def plant_wav_corruption(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministically malform a SQL-expressible slice of WAV
    payloads (the z27 planted-fault fixture):

    - ``id % 5 == 1`` → payload truncated to 20 bytes (the RIFF size
      check must flag the cut file);
    - ``id % 5 == 3`` → the fmt chunk's format code bytes become
      0xAA55 (a compressed/unknown codec the parser must refuse);
    - everything else untouched.

    Membership is pure doc_id arithmetic, so the z27 oracle re-derives
    expected quarantine counts with no parser at all."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                raw = bytes(payload) if payload is not None else b""
                if d % 5 == 1:
                    raw = raw[:20]
                elif d % 5 == 3 and len(raw) >= 22:
                    raw = raw[:20] + b"\x55\xaa" + raw[22:]
                out.append((d, raw))
            yield pd.DataFrame(out, columns=[id_col, payload_col])

    return df.select(id_col, payload_col).mapInPandas(
        fn, f"{id_col} long, {payload_col} binary"
    )


def dhash64(img: np.ndarray) -> int:
    """Difference hash (dHash) of a pixel grid: resize to 8×9 with the
    REAL bilinear kernel, then bit k = 1 iff pixel[row][col] >
    pixel[row][col+1] — 64 horizontal-gradient bits. Gradients survive
    brightness/contrast shifts, which is why dHash is the standard
    cheap perceptual fingerprint for image near-dup."""
    small = resize_bilinear(img.astype(np.float64), 8, 9)
    bits = (small[:, :-1] > small[:, 1:]).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    # interpret as signed 64-bit (Spark LongType)
    return out - (1 << 64) if out >= (1 << 63) else out


def phash_column(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, phash) per payload: decode (real codec for PNG/PPM/PGM,
    fake stand-in otherwise — see module docstring),
    REAL bilinear downsample, REAL dHash bit extraction. Narrow
    mapInPandas; only the 8-byte hash leaves the executor."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                _fmt, _w, _h, img = _decode_full(raw)
                out.append((doc_id, dhash64(img)))
        yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return df.select(id_col, payload_col).mapInPandas(fn, "doc_id long, phash long")


# --------------------------------------------------------------------
# decode-status / quarantine integration (r4 verdict task 6)
# --------------------------------------------------------------------

def with_decode_status(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``decode_ok boolean`` + ``decode_err string`` columns from the
    STRICT codec (``imagecodec.decode_image`` — unlike the
    fallback-happy ``_decode_full``, every ValueError the codec raises
    surfaces here: bad signature, CRC mismatch, truncation, malformed
    PLTE, and the decode-bomb guard's declared-gigapixel refusal).
    This is the bridge between the per-row Python codec and the
    JVM-side expectations layer: feed the boolean to
    ``operators/expectations.enforce(mode='quarantine')`` and corrupt
    payloads land in the quarantine table tagged with the failed rule
    and the codec's own error text, instead of being silently skipped.
    Narrow Arrow-batched map — no shuffle."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("decode_ok", T.BooleanType()),
            T.StructField("decode_err", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, err = [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                try:
                    decode_image(raw)
                    ok.append(True)
                    err.append(None)
                except ValueError as exc:
                    ok.append(False)
                    err.append(str(exc))
            pdf = pdf.copy()
            pdf["decode_ok"] = ok
            pdf["decode_err"] = err
            yield pdf

    return df.mapInPandas(fn, schema)


def plant_payload_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministically corrupt a SQL-expressible slice of payloads —
    the planted-fault fixture for quarantine tests/oracles:

    - ``id % 7 == 3`` → one IDAT byte XOR 0xFF (CRC mismatch class);
    - ``id % 7 == 5`` → the payload becomes a DECODE BOMB: a valid
      header declaring a 100000x100000 image whose allocation the
      codec's MAX_DECODE_PIXEL_BYTES guard must refuse;
    - everything else untouched.

    Because membership in each class is pure doc_id arithmetic, a
    DuckDB oracle can re-derive the expected quarantine counts with no
    codec at all (z21)."""
    import struct
    import zlib
    from binascii import crc32

    from eeg_data_lake_spark.functions.imagecodec import PNG_MAGIC

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF)
        )

    bomb = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 100000, 100000, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = int(doc_id)
                raw = bytes(payload) if payload is not None else b""
                if d % 7 == 3 and len(raw) > 45:
                    # flip one byte inside the first IDAT's data
                    # (offset 44: past magic 8 + IHDR 25 + IDAT len/
                    # type 8) — XOR guarantees a change, so the chunk
                    # CRC check must fire
                    raw = raw[:44] + bytes([raw[44] ^ 0xFF]) + raw[45:]
                elif d % 7 == 5:
                    raw = bomb
                out.append((d, raw))
            yield pd.DataFrame(out, columns=[id_col, payload_col])

    return df.select(id_col, payload_col).mapInPandas(
        fn, f"{id_col} long, {payload_col} binary"
    )
