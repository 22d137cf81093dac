"""Multimodal column operators (north-star extension; SURVEY.md §2.6 W4/W5).

Media lives in DataFrames as an opaque ``binary`` payload column plus typed
metadata -- the standard large-scale layout (payload stays columnar/Parquet,
never round-trips through the driver). All per-item compute runs as
Arrow-batched ``mapInPandas`` so the Spark-side plumbing (schema, batch
shape, partitioning) is the production path.

Codec status: raster images decode, resize, and feature-extract FOR REAL
with no external libraries via ``image_stats`` / ``resize_images``:
PPM ``P6`` and 24-bit uncompressed BMP in pure numpy, and PNG (8-bit
depth, all five scanline filters, gray/RGB/palette/alpha color types,
non-interlaced) via stdlib ``zlib`` + numpy unfiltering, GIF87a/89a via a
pure-Python 12-bit LZW decoder (encoder too), and JPEG (baseline SOF0 and
lossless SOF3, ``operators/jpeg.py``) in pure numpy. Audio decodes for
real via ``audio_stats``: RIFF WAV (8/16-bit PCM) and compressed FLAC
(``operators/flac.py`` -- lossless, bit-exact). AVI video parses and
frame-samples for real via ``video_frame_stats`` -- both uncompressed
DIB frames and Motion-JPEG '00dc' frames. Only truly library-bound
kernels (MP3/AAC audio, inter-frame video codecs) stay stubbed: ``decode_media`` raises
``NotImplementedError`` per unsupported kind unless
``deterministic_fake=True``, which produces seeded fake features with the
exact schema/shape real decoders would emit. Everything around the stubs --
batching, schema, fan-out of frame samples -- is the production path.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed-metadata schema for a media table (payload: binary, not parsed here).
MEDIA_COLUMNS = "media_id bigint, kind string, payload binary"

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id bigint, kind string, payload_bytes bigint, checksum string, "
    f"feature array<float>"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_checksum string"

# Exception surface of every native codec on malformed input. The stats
# operators accept on_error="skip" to drop undecodable payloads instead of
# failing the job -- at corpus scale some fraction of scraped media is
# always corrupt, and one bad payload must not kill a 100 TB pass.
DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    IndexError,
    KeyError,
    OverflowError,
    struct.error,
    zlib.error,
)


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real embedding model: seed an RNG from
    the payload digest. Same payload -> same vector, any executor."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


def _real_feature(payload: bytes, kind: str) -> np.ndarray | None:
    """Decode the payload with the REAL codecs and summarize it into a
    FEATURE_DIM vector (per-channel means/extrema -- a deterministic
    hand-rolled embedding). Returns None when no native codec applies."""
    try:
        if kind == "image":
            arr = decode_image_array(payload).astype(np.float32)
            px = arr.reshape(-1, 3)
            stats = np.concatenate(
                [px.mean(0), px.min(0), px.max(0), px.std(0),
                 np.array([arr.shape[0], arr.shape[1]], np.float32)]
            )
        elif kind == "audio":
            _rate, samples = decode_audio(payload)
            s = samples.astype(np.float32)
            stats = np.array(
                [s.mean(), s.min(), s.max(), s.std(), s.shape[0], s.shape[1]],
                np.float32,
            )
        elif kind == "video":
            w, h, frames = _parse_avi(payload)
            first = decode_video_frame(frames[0], w, h).astype(np.float32)
            px = first.reshape(-1, 3)
            stats = np.concatenate(
                [px.mean(0), px.min(0), px.max(0),
                 np.array([w, h, len(frames)], np.float32)]
            )
        else:
            return None
    except (NotImplementedError, ValueError, IndexError, struct.error, zlib.error):
        # no native codec, or the payload only looked like a known container
        return None
    out = np.zeros(FEATURE_DIM, np.float32)
    out[: min(len(stats), FEATURE_DIM)] = stats[:FEATURE_DIM]
    return out


def decode_media(
    media: DataFrame,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas (Arrow batches).

    Payloads the native codecs handle (PPM/BMP/PNG images, PCM WAV audio,
    uncompressed AVI video) get REAL features -- deterministic per-channel
    statistics from the decoded samples. For the rest (JPEG, MP3, ...),
    ``deterministic_fake`` emits seeded stand-in features; otherwise the
    codec-missing NotImplementedError marks where Pillow/ffmpeg/torchaudio
    plug in with zero changes to the Spark plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            features = []
            for payload, kind in zip(payloads, pdf["kind"]):
                feat = _real_feature(payload, kind)
                if feat is None:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            f"no native codec for this {kind} payload; install "
                            "decoders or pass deterministic_fake=True"
                        )
                    feat = _fake_feature(payload)
                features.append(feat.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": features,
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame-sampling fan-out (video -> N frame rows). The stub derives each
    frame checksum from (payload digest, frame index); a real implementation
    swaps the kernel, the 1->N Arrow fan-out shape stays."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video frame extraction needs ffmpeg; pass deterministic_fake=True"
                )
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(hashlib.md5(f"{digest}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Real pure-numpy codecs for uncompressed raster formats. PPM P6 and 24-bit
# BMP need no compression library, so decode/resize/stats are fully real;
# anything else raises the codec-missing marker.
# --------------------------------------------------------------------------


def _decode_ppm(data: bytes) -> np.ndarray:
    """PPM ``P6`` -> HxWx3 uint8 (maxval <= 255; comments supported)."""
    if not data.startswith(b"P6"):
        raise NotImplementedError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB (handles bottom-up rows,
    row padding, and BGR channel order)."""
    if not data.startswith(b"BM"):
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) // 4 * 4
    hh = abs(h)
    rows = np.frombuffer(data, np.uint8, count=stride * hh, offset=off).reshape(hh, stride)
    arr = rows[:, : w * 3].reshape(hh, w, 3)[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(arr[::-1] if h > 0 else arr)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type: 0 gray, 2 RGB, 3 palette index, 4 gray+alpha,
# 6 RGBA (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = len(_PNG_SIG)
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        yield typ, data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + payload + crc
        if typ == b"IEND":
            break


def _unfilter_scanline(
    ft: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §9.2). None/Up/Sub are
    vectorized (Sub is a cumulative sum mod 256 per byte lane); Average and
    Paeth carry a left-neighbor dependency, so they run as a per-byte loop --
    correctness path, only taken when the encoder chose those filters."""
    if ft == 0:
        return line
    if ft == 2:
        return line + prev  # uint8 addition wraps mod 256
    if ft == 1:
        lanes = line.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
    ln = line.astype(np.int32)
    pv = prev.astype(np.int32)
    out = np.zeros(len(line), np.int32)
    for x in range(len(line)):
        a = out[x - bpp] if x >= bpp else 0
        b = pv[x]
        if ft == 3:
            out[x] = (ln[x] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:
            c = pv[x - bpp] if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (ln[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {ft}")
    return out.astype(np.uint8)


def _decode_png(data: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB, stdlib zlib + numpy only. Supports bit depth
    8, color types 0/2/3/4/6, all five scanline filters, non-interlaced.
    Gray replicates to 3 channels, palette indices resolve through PLTE,
    alpha is dropped (stats/resize operate on color planes)."""
    if not data.startswith(_PNG_SIG):
        raise NotImplementedError("not a PNG payload")
    ihdr, plte, idat = None, None, []
    for typ, chunk in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
    if ihdr is None or len(ihdr) != 13:
        raise NotImplementedError("malformed PNG: missing IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("truncated PNG pixel data")
    rows = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
        prev = _unfilter_scanline(raw[off], line, prev, ch)
        rows[y] = prev
    arr = rows.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise NotImplementedError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return np.ascontiguousarray(pal[arr[..., 0]])
    if color in (0, 4):
        return np.ascontiguousarray(np.repeat(arr[..., :1], 3, axis=2))
    return np.ascontiguousarray(arr[..., :3])


def _filter_scanline(
    ft: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply a PNG scanline filter on encode (inverse of
    ``_unfilter_scanline``); recon values are the inputs, so every filter
    vectorizes."""
    ln = line.astype(np.int32)
    pv = prev.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), ln[:-bpp]]) if len(ln) > bpp else np.zeros_like(ln)
    if ft == 0:
        out = ln
    elif ft == 1:
        out = ln - a
    elif ft == 2:
        out = ln - pv
    elif ft == 3:
        out = ln - ((a + pv) >> 1)
    elif ft == 4:
        c = np.concatenate([np.zeros(bpp, np.int32), pv[:-bpp]]) if len(pv) > bpp else np.zeros_like(pv)
        p = a + pv - c
        pa, pb, pc = np.abs(p - a), np.abs(p - pv), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, pv, c))
        out = ln - pred
    else:
        raise NotImplementedError(f"unknown PNG filter type {ft}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWx3 uint8 RGB -> real PNG (IHDR/IDAT/IEND, zlib, CRCs).
    ``filter_type`` selects the per-scanline filter (0-4), exercising every
    unfilter path on round-trip."""
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape[:2]
    stride = w * 3
    flat = arr.reshape(h, stride)
    prev = np.zeros(stride, np.uint8)
    parts = []
    for y in range(h):
        parts.append(bytes([filter_type]))
        parts.append(_filter_scanline(filter_type, flat[y], prev, 3).tobytes())
        prev = flat[y]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big")
            + typ
            + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + chunk(b"IEND", b"")
    )


# --- TIFF (baseline 6.0: uncompressed + PackBits, both byte orders) -------

def _packbits_decode(b: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9 / the classic Apple RLE): n in [0,127] copies
    the next n+1 literal bytes; n in [129,255] repeats the next byte
    257-n times; 128 is a no-op."""
    out = bytearray()
    i, ln = 0, len(b)
    while i < ln:
        n = b[i]
        i += 1
        if n < 128:
            out += b[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([b[i]]) * (257 - n)
            i += 1
    return bytes(out)


def _packbits_encode(b: bytes) -> bytes:
    """Greedy PackBits encoder: runs of >= 3 identical bytes become
    replicate packets, everything else literal packets (max 128 each)."""
    out = bytearray()
    i, ln = 0, len(b)
    while i < ln:
        # find run length at i
        j = i + 1
        while j < ln and j - i < 128 and b[j] == b[i]:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes([257 - run, b[i]])
            i = j
            continue
        # literal: until the next >=3 run or 128 bytes
        j = i
        while j < ln and j - i < 128:
            if j + 2 < ln and b[j] == b[j + 1] == b[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + b[i:j]
        i = j
    return bytes(out)


_TIFF_COMP_NONE, _TIFF_COMP_PACKBITS = 1, 32773


def _decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF -> HxWx3 uint8 RGB: II and MM byte orders, 8-bit
    grayscale (replicated to 3 channels) or RGB, multi-strip, compression
    none or PackBits. Fail-closed on anything else (tiled TIFFs, LZW,
    16-bit) — same contract as the other codecs."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise NotImplementedError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(bo + "HHI", data, off)
        if typ not in _SZ:
            continue
        total = _SZ[typ] * count
        src = off + 8 if total <= 4 else struct.unpack_from(bo + "I", data, off + 8)[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, data, src))
    try:
        w, h = tags[256][0], tags[257][0]
        spp = tags.get(277, [1])[0]
        bits = tags.get(258, [8] * spp)
        comp = tags.get(259, [_TIFF_COMP_NONE])[0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError("only 8-bit gray/RGB TIFFs decode")
    if comp not in (_TIFF_COMP_NONE, _TIFF_COMP_PACKBITS):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    raw = bytearray()
    for o, c in zip(offsets, counts):
        strip = bytes(data[o:o + c])
        raw += _packbits_decode(strip) if comp == _TIFF_COMP_PACKBITS else strip
    expect = w * h * spp
    if len(raw) < expect:
        raise ValueError("TIFF strip data short of width*height*samples")
    arr = np.frombuffer(bytes(raw[:expect]), np.uint8).reshape(h, w, spp)
    if spp == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_tiff(arr: np.ndarray, compression: str = "packbits") -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) -> little-endian baseline TIFF, one
    strip per row, compression 'none' or 'packbits'."""
    arr = np.ascontiguousarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    comp = _TIFF_COMP_PACKBITS if compression == "packbits" else _TIFF_COMP_NONE
    rows = [arr[r].tobytes() for r in range(h)]
    if comp == _TIFF_COMP_PACKBITS:
        rows = [_packbits_encode(r) for r in rows]
    data_start = 8
    offsets, counts, pos = [], [], data_start
    for r in rows:
        offsets.append(pos)
        counts.append(len(r))
        pos += len(r)
    ifd_off = pos + (pos & 1)  # word-align the IFD
    body = b"".join(rows) + (b"\x00" if pos & 1 else b"")

    entries = []
    extra = bytearray()
    extra_base = 0  # patched once the entry count is known

    def entry(tag, typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack("<" + str(len(values)) + fmt, *values)
        if len(packed) <= 4:
            entries.append(
                struct.pack("<HHI", tag, typ, len(values))
                + packed.ljust(4, b"\x00")
            )
        else:
            entries.append(
                struct.pack("<HHII", tag, typ, len(values),
                            extra_base + len(extra))
            )
            extra.extend(packed)

    n_pre = 10  # fixed entry count below
    extra_base = ifd_off + 2 + 12 * n_pre + 4
    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [comp])
    entry(262, 3, [1 if gray else 2])
    entry(273, 4, offsets)
    entry(277, 3, [spp])
    entry(278, 4, [1])
    entry(279, 4, counts)
    entry(282, 3, [72])  # XResolution as SHORT is nonstandard but inert
    assert len(entries) == n_pre
    ifd = (
        struct.pack("<H", n_pre) + b"".join(entries) + struct.pack("<I", 0)
        + bytes(extra)
    )
    return b"II*\x00" + struct.pack("<I", ifd_off) + body + ifd


def decode_image_array(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; NotImplementedError marks the formats a
    real Pillow install would add (JPEG)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    if payload[:2] == b"\xff\xd8":
        from phageclouds_graphdatabase_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "no native codec for this payload; "
        "PPM P6 / 24-bit BMP / 8-bit PNG / GIF / TIFF / JPEG decode natively"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, np.uint8).tobytes()


def _resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ri = np.arange(height, dtype=np.int64) * h // height
    ci = np.arange(width, dtype=np.int64) * w // width
    return arr[ri][:, ci]


IMAGE_STATS_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def image_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL image decode + per-channel statistics (pure numpy, Arrow
    batches): width/height and exact float64 channel means for every
    natively-decodable payload. The Spark shape (filter to images,
    mapInPandas) is the same one a Pillow-backed decoder would use.
    ``on_error="skip"`` drops undecodable payloads instead of failing."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image_array(bytes(payload))
                except DECODE_ERRORS:
                    if on_error == "skip":
                        continue
                    raise
                means = arr.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["media_id"].append(mid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for uncompressed rasters: decode (PPM/BMP),
    nearest-neighbor index in numpy, re-encode as PPM. Compressed payloads
    raise the codec-missing marker; the Spark plan is final either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image_array(bytes(payload))
                ids.append(mid)
                payloads.append(encode_ppm(_resize_nearest(arr, width, height)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema="media_id bigint, payload binary"
    )


# --------------------------------------------------------------------------
# Real GIF codec -- pure-Python LZW (12-bit, clear/end codes, dynamic code
# width) + palette lookup. GIF87a/89a, first frame, non-interlaced; local
# and global color tables. The encoder emits real LZW so round-trips
# exercise every decoder path (dictionary growth, width bumps, the
# code==next_code corner, dictionary-full resets).
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[int] = []  # (code, width) flattened as bit stream

    state = {"acc": 0, "nbits": 0, "bytes": bytearray()}

    def emit(code: int, width: int) -> None:
        state["acc"] |= code << state["nbits"]
        state["nbits"] += width
        while state["nbits"] >= 8:
            state["bytes"].append(state["acc"] & 0xFF)
            state["acc"] >>= 8
            state["nbits"] -= 8

    def reset() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # one add LATER than the decoder's bump: the decoder lags the
        # encoder by exactly one dictionary entry, so widths line up at
        # the same position in the code stream.
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        w = (k,)
        if next_code >= 4096:
            emit(clear, code_size)
            table, next_code, code_size = reset()
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if state["nbits"]:
        state["bytes"].append(state["acc"] & 0xFF)
    return bytes(state["bytes"])


def _decode_gif(data: bytes) -> np.ndarray:
    """GIF -> HxWx3 uint8 RGB (first frame). Interlaced images raise the
    codec-missing marker; transparency is ignored (palette color used)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    pos = 6
    packed = data[pos + 4]
    pos += 7  # logical screen descriptor
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data, np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise NotImplementedError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(lzw), min_code)
        if len(idx) < w * h:
            raise NotImplementedError("truncated GIF pixel data")
        arr = np.asarray(idx[: w * h], np.int32).reshape(h, w)
        return np.ascontiguousarray(pal[arr])
    raise NotImplementedError("GIF contains no image block")


def encode_gif(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB (<= 256 distinct colors) -> real GIF89a with LZW
    compression and a global color table."""
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape[:2]
    pal, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    if len(pal) > 256:
        raise NotImplementedError("GIF encoder needs <= 256 distinct colors")
    depth = max(1, int(len(pal) - 1).bit_length())  # palette size field
    n_entries = 1 << depth
    palette = np.zeros((n_entries, 3), np.uint8)
    palette[: len(pal)] = pal
    min_code = max(2, depth)
    lzw = _lzw_encode([int(i) for i in inverse], min_code)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    screen = struct.pack("<HHBBB", w, h, 0x80 | 0x70 | (depth - 1), 0, 0)
    image = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return (
        b"GIF89a" + screen + palette.tobytes()
        + image + bytes([min_code]) + bytes(sub) + b"\x3b"
    )


# --------------------------------------------------------------------------
# Real WAV (RIFF PCM) audio codec -- pure struct/numpy, no external library.
# 16-bit signed and 8-bit unsigned PCM decode; compressed audio (MP3/AAC/
# FLAC) keeps the codec-missing marker.
# --------------------------------------------------------------------------


def _decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, int16 array of shape
    (n_frames, n_channels)). 8-bit unsigned widens to int16 (centered);
    non-PCM or other depths raise the codec-missing marker."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"fmt ":
            fmt = body
        elif typ == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise NotImplementedError("malformed WAV: missing fmt/data chunk")
    audio_format, n_ch, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or n_ch < 1:
        raise NotImplementedError(
            f"only uncompressed PCM WAV (format={audio_format})"
        )
    if bits == 16:
        samples = np.frombuffer(pcm, "<i2", count=len(pcm) // 2)
    elif bits == 8:
        samples = np.frombuffer(pcm, np.uint8).astype(np.int16) - 128
    else:
        raise NotImplementedError(f"only 8/16-bit PCM WAV (bits={bits})")
    n_frames = len(samples) // n_ch
    return rate, samples[: n_frames * n_ch].reshape(n_frames, n_ch)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n_frames, n_channels) int16 -> 16-bit PCM RIFF/WAVE bytes."""
    arr = np.ascontiguousarray(np.atleast_2d(samples).T if samples.ndim == 1 else samples, "<i2")
    n_frames, n_ch = arr.shape
    pcm = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Audio payload -> (sample_rate, int16 (n_frames, n_channels)): RIFF
    WAV through the PCM decoder, fLaC through the native FLAC decoder
    (operators/flac.py -- lossless, so both paths are bit-exact)."""
    if payload[:4] == b"fLaC":
        from phageclouds_graphdatabase_spark.operators.flac import decode_flac

        return decode_flac(payload)
    return _decode_wav(payload)


AUDIO_STATS_SCHEMA = (
    "media_id bigint, sample_rate int, n_frames bigint, n_channels int, "
    "sum_sq bigint, peak int"
)


def audio_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL audio decode + exact integer statistics (Arrow batches): sample
    rate, frame/channel counts, sum of squared samples, and peak absolute
    amplitude for every WAV or FLAC payload. Integer outputs keep the stats
    exact across engines; rms/duration derive losslessly downstream.
    ``on_error="skip"`` drops undecodable payloads instead of failing."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_frames", "n_channels", "sum_sq", "peak"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, arr = decode_audio(bytes(payload))
                except DECODE_ERRORS:
                    if on_error == "skip":
                        continue
                    raise
                a64 = arr.astype(np.int64)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_frames"].append(arr.shape[0])
                out["n_channels"].append(arr.shape[1])
                out["sum_sq"].append(int((a64 * a64).sum()))
                out["peak"].append(int(np.abs(a64).max()) if a64.size else 0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# Real AVI (RIFF) video container -- pure struct/numpy. Frames stored as
# uncompressed DIB (24-bit BGR bottom-up rows, 4-byte-aligned stride, the
# layout '00db' chunks use). Compressed video keeps the codec marker.
# --------------------------------------------------------------------------


def _riff_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_len) over a RIFF chunk range."""
    while pos + 8 <= end:
        typ = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield typ, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # word-aligned


def _parse_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """AVI -> (width, height, ordered raw DIB frame payloads). Walks LIST
    hdrl for avih dimensions and LIST movi for '..db'/'..dc' frame chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    w = h = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        for typ, body, ln in _riff_chunks(data, pos, end):
            if typ == b"LIST":
                walk(body + 4, body + ln)  # skip the list-type fourcc
            elif typ == b"avih":
                w = int.from_bytes(data[body + 32 : body + 36], "little")
                h = int.from_bytes(data[body + 36 : body + 40], "little")
            elif typ[2:4] in (b"db", b"dc"):
                frames.append(data[body : body + ln])

    walk(12, len(data))
    if w is None or h is None:
        raise NotImplementedError("malformed AVI: missing avih header")
    return w, h, frames


def decode_dib_frame(frame: bytes, width: int, height: int) -> np.ndarray:
    """Raw DIB frame bytes -> HxWx3 uint8 RGB (bottom-up BGR, padded
    stride -- the same pixel-array layout as a 24-bit BMP)."""
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(frame, np.uint8, count=stride * height).reshape(height, stride)
    arr = rows[:, : width * 3].reshape(height, width, 3)[..., ::-1]
    return np.ascontiguousarray(arr[::-1])


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "raw", quality: int = 90
) -> bytes:
    """List of HxWx3 uint8 RGB frames -> minimal AVI
    (RIFF { LIST hdrl { avih }, LIST movi { frames } }).

    ``codec="raw"`` stores uncompressed DIB '00db' chunks; ``codec="mjpg"``
    stores each frame as a baseline JPEG in a '00dc' chunk (Motion JPEG,
    the standard compressed-AVI layout)."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) // 4 * 4

    def dib(arr: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return typ + len(payload).to_bytes(4, "little") + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    if codec == "mjpg":
        from phageclouds_graphdatabase_spark.operators.jpeg import encode_jpeg_baseline

        body = b"".join(
            chunk(b"00dc", encode_jpeg_baseline(f, quality=quality)) for f in frames
        )
    elif codec == "raw":
        body = b"".join(chunk(b"00db", dib(f)) for f in frames)
    else:
        raise NotImplementedError(f"AVI codec {codec!r} not supported")

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + body)
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_video_frame(frame: bytes, width: int, height: int) -> np.ndarray:
    """One movi frame chunk -> HxWx3 uint8 RGB: Motion-JPEG frames (SOI
    magic) through the native JPEG decoder, anything else as raw DIB."""
    if frame[:2] == b"\xff\xd8":
        from phageclouds_graphdatabase_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(frame)
    return decode_dib_frame(frame, width, height)


VIDEO_FRAME_STATS_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def video_frame_stats(
    media: DataFrame, n_frames: int = 2, on_error: str = "raise"
) -> DataFrame:
    """REAL video frame sampling + exact per-channel pixel sums: parse each
    AVI payload, sample ``n_frames`` evenly across the clip, decode the
    frames (raw DIB or Motion-JPEG), and emit integer channel sums
    (cross-engine exact). The 1->N Arrow fan-out is the same shape an
    ffmpeg-backed sampler would use. ``on_error="skip"`` drops
    undecodable payloads instead of failing."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height", "sum_r", "sum_g", "sum_b"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # the whole clip is atomic under "skip": a corrupt frame
                # mid-payload must not leave partial rows behind
                rows = []
                try:
                    w, h, frames = _parse_avi(bytes(payload))
                    total = len(frames)
                    take = min(n_frames, total)
                    for i in range(take):
                        idx = i * total // take
                        arr = decode_video_frame(frames[idx], w, h).astype(np.int64)
                        sums = arr.reshape(-1, 3).sum(axis=0)
                        rows.append(
                            (idx, w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                        )
                except DECODE_ERRORS:
                    if on_error == "skip":
                        continue
                    raise
                for idx, w, h, sr, sg, sb in rows:
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_r"].append(sr)
                    out["sum_g"].append(sg)
                    out["sum_b"].append(sb)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=VIDEO_FRAME_STATS_SCHEMA
    )


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: documents stand in for media payloads
    (text bytes as the opaque binary column, kind assigned round-robin)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
