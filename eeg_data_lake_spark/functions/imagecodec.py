"""Pure-Python image codecs (PNG via stdlib zlib, PPM/PGM) — the REAL
decode step for the multimodal pipeline.

The container has no PIL/cv2/torchvision, so the round-3 image path
decoded through a documented stub. This module removes the stub for
two real container-runnable formats:

- **PNG** (``encode_png`` / ``decode_png``): full chunk parsing with
  CRC-32 verification, zlib inflate, and all five scanline filters
  (None/Sub/Up/Average/Paeth) un-applied exactly per the PNG spec;
  grayscale (color type 0), truecolor RGB (color type 2) and
  palette-indexed (color type 3, PLTE chunk — how real-world web/icon
  PNG corpora are frequently encoded), bit depth 8, non-interlaced.
  The encoder can emit any fixed filter type so tests exercise every
  unfilter branch, and emits palette images via ``palette=``.
- **PPM/PGM** (``encode_ppm`` / ``decode_ppm``): the binary P6/P5
  netpbm formats, with spec-correct comment and whitespace handling.

Only stdlib (zlib, struct, binascii) + numpy — nothing to install,
so the decode seam (`functions/multimodal.py::_decode_pixels`) runs
NON-STUB code end-to-end in this container, mirroring what the PCM16
path (r45) did for audio. Reference capability: the reference decodes
images for training batches in ``/root/reference/test_train.py:66-93``
(PIL there; same role here, Spark-side via mapInPandas).

Scale notes: codecs are per-row CPU work inside Arrow-batched
``mapInPandas`` — narrow, no shuffle; 100 TB of payloads stream
through executors batch by batch, and only small decoded features
leave the worker.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: refuse PNG decodes whose DECLARED pixel grid exceeds this many
#: bytes (256 MB) — a valid header claiming a multi-gigapixel image
#: must fail with ValueError (skippable per-row) rather than OOM the
#: executor mid-batch
MAX_DECODE_PIXEL_BYTES = 1 << 28


# ------------------------------------------------------------------
# PNG
# ------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int64 arrays (the ENCODER can
    vectorize freely: its neighbors are raw bytes, not just-decoded
    outputs, so there is no sequential dependency)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (uint8 1-D)."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    a = np.concatenate([np.zeros(bpp, np.int64), r[:-bpp]])
    c = np.concatenate([np.zeros(bpp, np.int64), p[:-bpp]])
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - a
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - (a + p) // 2
    elif ftype == 4:
        out = r - _paeth_vec(a, p, c)
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def encode_png(
    img: np.ndarray,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal spec-conformant PNG writer: uint8 (h, w) grayscale or
    (h, w, 3) RGB, bit depth 8, non-interlaced, every scanline
    filtered with ``filter_type`` (0–4) — varying it exercises every
    decoder unfilter branch. With ``palette`` (uint8 (n, 3), n <= 256)
    the image must be (h, w) palette INDICES and the file is written
    as color type 3 with a PLTE chunk."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if palette is not None:
        palette = np.ascontiguousarray(palette, dtype=np.uint8)
        if palette.ndim != 2 or palette.shape[1] != 3 or not (
            1 <= palette.shape[0] <= 256
        ):
            raise ValueError(
                f"palette must be (1..256, 3) uint8, got {palette.shape}"
            )
        if img.ndim != 2:
            raise ValueError("palette PNG takes (h, w) index array")
        if img.max(initial=0) >= palette.shape[0]:
            raise ValueError("palette index out of range")
        color_type, channels = 3, 1
        h, w = img.shape
    elif img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    flat = img.reshape(h, w * channels)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        raw.append(filter_type)
        raw += _filter_row(filter_type, flat[y], prev, channels)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    plte = (
        [_chunk(b"PLTE", palette.tobytes())] if palette is not None else []
    )
    return b"".join(
        [PNG_MAGIC, _chunk(b"IHDR", ihdr)]
        + plte
        + [_chunk(b"IDAT", zlib.compress(bytes(raw))), _chunk(b"IEND", b"")]
    )


def decode_png(raw: bytes) -> np.ndarray:
    """Decode a PNG byte string to uint8 (h, w) or (h, w, 3): chunk
    walk with CRC-32 verification, IDAT concat + inflate, all five
    filters reversed; palette images (color type 3) are expanded
    through their PLTE to (h, w, 3). Raises ValueError on corruption
    or unsupported features (non-8-bit depth, alpha, interlace,
    malformed/missing/late PLTE, out-of-range palette index)."""
    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos < len(raw):
        if pos + 8 > len(raw):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(raw):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", raw[pos + 8 + length : pos + 12 + length])
        if crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"bad IHDR length {len(data)} (want 13)")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if idat:
                raise ValueError("PLTE after IDAT violates chunk order")
            if plte is not None:
                raise ValueError("duplicate PLTE chunk")
            if length == 0 or length % 3 != 0 or length > 768:
                raise ValueError(
                    f"malformed PLTE length {length} "
                    "(need a multiple of 3, 3..768)"
                )
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG (need 8-bit, non-interlaced)")
    if color_type in (0, 3):
        channels = 1
    elif color_type == 2:
        channels = 3
    else:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if w < 1 or h < 1:
        raise ValueError("zero-dimension PNG refused")
    stride = w * channels
    if h * stride > MAX_DECODE_PIXEL_BYTES:
        raise ValueError(
            f"PNG declares {h * stride} pixel bytes "
            f"(cap {MAX_DECODE_PIXEL_BYTES}); refusing executor-OOM-sized "
            "allocation — raise MAX_DECODE_PIXEL_BYTES for genuinely "
            "giant images"
        )
    expected = h * (stride + 1)
    # bounded inflate: a deflate bomb (tiny IDAT declaring a tiny image
    # but inflating to GBs) must not allocate past the declared pixel
    # size — cap at expected+1 so an oversized stream is detectable as
    # a length mismatch instead of an OOM
    d = zlib.decompressobj()
    try:
        plain = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:  # keep the documented ValueError contract
        raise ValueError(f"PNG deflate stream corrupt: {exc}") from exc
    if len(plain) < expected and not d.eof:
        raise ValueError("PNG deflate stream corrupt: truncated")
    if len(plain) != expected or d.unconsumed_tail:
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        off = y * (stride + 1)
        ftype = plain[off]
        if ftype in (0, 1, 2):
            line = np.frombuffer(plain, np.uint8, stride, off + 1).astype(
                np.int64
            )
        if ftype == 0:
            cur = line
        elif ftype == 1:
            # Sub unfilters to a running sum per channel lane:
            # out[x] = (Σ line[x, x-bpp, x-2bpp, …]) mod 256 — one
            # vectorized cumsum per lane instead of a Python loop
            cur = line
            for ch in range(channels):
                cur[ch::channels] = np.cumsum(cur[ch::channels]) % 256
        elif ftype == 2:
            cur = (line + prev) % 256
        elif ftype == 3:
            # sequential through the left neighbor — run the recurrence
            # over plain Python lists (≈10× numpy scalar indexing)
            lp, pv = list(plain[off + 1 : off + 1 + stride]), prev.tolist()
            out_l = [0] * stride
            for x in range(stride):
                a = out_l[x - channels] if x >= channels else 0
                out_l[x] = (lp[x] + (a + pv[x]) // 2) % 256
            cur = np.asarray(out_l, dtype=np.int64)
        elif ftype == 4:
            lp, pv = list(plain[off + 1 : off + 1 + stride]), prev.tolist()
            out_l = [0] * stride
            for x in range(stride):
                a = out_l[x - channels] if x >= channels else 0
                b = pv[x]
                c = pv[x - channels] if x >= channels else 0
                pa = abs(b - c)          # |p - a| with p = a + b - c
                pb = abs(a - c)
                pc = abs(a + b - c - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out_l[x] = (lp[x] + pred) % 256
            cur = np.asarray(out_l, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    if color_type == 3:
        if int(out.max(initial=0)) >= plte.shape[0]:
            raise ValueError(
                f"palette index {int(out.max())} out of range "
                f"(PLTE has {plte.shape[0]} entries)"
            )
        return plte[out]  # (h, w) indices -> (h, w, 3) RGB
    return out if channels == 1 else out.reshape(h, w, 3)


# ------------------------------------------------------------------
# PPM / PGM (binary netpbm)
# ------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """Binary netpbm writer: (h, w) → P5 (PGM), (h, w, 3) → P6 (PPM),
    maxval 255."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic, (h, w) = b"P5", img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, (h, w) = b"P6", img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Decode binary P5/P6 netpbm with spec-correct whitespace and
    ``#`` comment handling in the header. Non-numeric header tokens,
    zero dimensions, a non-whitespace maxval terminator, and truncated
    pixel data all raise ValueError. A '\\r' maxval terminator followed
    by '\\n' is inherently ambiguous (Windows CR-LF separator vs a
    spec-exact bare-CR file whose first pixel is 0x0A); it is resolved
    by the declared raster length — the LF stays pixel data only when
    that reading fits exactly, else it is consumed as separator. The
    one undecidable corner (a CR-LF file truncated by exactly one
    byte, or a bare-CR file with trailing bytes) decodes per this rule
    rather than raising."""
    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    channels = 1 if raw[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        # '#' terminates a token too: netpbm allows a comment to start
        # immediately after a number with no intervening whitespace
        # (b"2#comment\n" is token 2 + comment, not token b"2#comment")
        while (
            pos < len(raw)
            and not raw[pos : pos + 1].isspace()
            and raw[pos : pos + 1] != b"#"
        ):
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        try:
            fields.append(int(raw[start:pos]))
        except ValueError as exc:
            raise ValueError(
                f"non-numeric netpbm header token {raw[start:pos]!r}"
            ) from exc
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    if w < 1 or h < 1:
        raise ValueError("zero-dimension netpbm refused")
    n = w * h * channels
    # exactly one whitespace byte separates maxval from pixel data.
    # A '\r' followed by '\n' is ambiguous: a Windows CR-LF writer's
    # two-byte separator, or a spec-exact bare-CR separator whose
    # first pixel happens to be 0x0A. Resolve with the raster length:
    # keep the LF as pixel data when doing so fits the declared size
    # exactly (the only reading that decodes the bare-CR file at all);
    # otherwise consume it as the LF of a CR-LF pair.
    sep = raw[pos : pos + 1]
    if not sep.isspace():
        raise ValueError("netpbm maxval not followed by whitespace")
    pos += 1
    if (
        sep == b"\r"
        and raw[pos : pos + 1] == b"\n"
        and len(raw) - pos != n
    ):
        pos += 1
    body = raw[pos : pos + n]
    if len(body) != n:
        raise ValueError("truncated netpbm pixel data")
    arr = np.frombuffer(body, dtype=np.uint8)
    return arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, 3)


# ------------------------------------------------------------------
# dispatch
# ------------------------------------------------------------------

def sniff(raw: bytes) -> str | None:
    """'png' / 'ppm' / 'pgm' from magic bytes, else None. The netpbm
    magics require a following whitespace byte (per spec) so ordinary
    text that merely STARTS with "P5"/"P6" isn't misclassified."""
    if raw[:8] == PNG_MAGIC:
        return "png"
    if raw[:2] == b"P6" and raw[2:3].isspace():
        return "ppm"
    if raw[:2] == b"P5" and raw[2:3].isspace():
        return "pgm"
    return None


def decode_image(raw: bytes) -> np.ndarray:
    """Decode any supported format (dispatch on magic bytes)."""
    fmt = sniff(raw)
    if fmt == "png":
        return decode_png(raw)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(raw)
    raise ValueError("unrecognized image format")


def to_gray(img: np.ndarray) -> np.ndarray:
    """float64 (h, w) luma: grayscale passthrough; RGB via integer
    BT.601 weights (299R + 587G + 114B) / 1000 — exact in doubles."""
    if img.ndim == 2:
        return img.astype(np.float64)
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    return (299.0 * r + 587.0 * g + 114.0 * b) / 1000.0
