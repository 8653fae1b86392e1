"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side plumbing (schema, partition sizing,
Arrow batch shape, UDF signatures) is real and tested. Codec status:

- **Real, dependency-free decoders** for four formats: 24-bit
  uncompressed BMP (:func:`decode_bmp`), 8-bit RGB/RGBA non-interlaced
  PNG (:func:`decode_png` — zlib IDAT inflation + numpy scanline
  unfiltering, all five filter types), baseline JPEG
  (``operators/jpeg.py`` — marker/DQT/DHT parsing, huffman entropy
  decode, dequantize + IDCT + YCbCr→RGB, all in numpy/stdlib), and
  16-bit mono PCM WAV (:func:`decode_wav`). The real path of
  :func:`extract_media_features` dispatches on magic bytes.
- **Header/box-level probes** for MP3 (:func:`probe_mp3` — ID3v2 skip,
  MPEG1-Layer-III frame walk → frames/duration/bitrate/samplerate) and
  MP4 (:func:`probe_mp4` — ISO-BMFF box walk → brand, mvhd
  timescale/duration): typed metadata is real and dependency-free even
  where SAMPLE decode genuinely needs a codec library (absent from this
  container) and stays behind a ``NotImplementedError`` gate naming the
  probe — as do the unsupported JPEG/PNG variants (progressive,
  subsampled, interlaced, palette). ``fake=True`` substitutes a
  deterministic byte-statistics decoder so plumbing tests run on any
  payload.

Scale notes: media rows are large and skew-prone — the operators take a
``target_rows_per_batch`` hint and repartition by a hash of the id so one
hot file cannot pin a partition; feature extraction is ``mapInPandas``
(Arrow-batched), never row-at-a-time.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: payload =
    utf-8 text bytes, modality round-robins image/audio/video. Stands in
    for a parquet/lance media dump at 100 TB (payload column stays opaque
    binary either way)."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real zero-dependency codecs: 24-bit BMP and 16-bit mono PCM WAV
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal well-formed 24bpp bottom-up BMP filled with one color
    (BITMAPFILEHEADER + BITMAPINFOHEADER + padded BGR rows)."""
    r, g, b = rgb
    row = bytes((b, g, r)) * width
    row += b"\x00" * ((-len(row)) % 4)  # 4-byte row alignment
    pixels = row * height
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + dib + pixels


def decode_bmp(data: bytes) -> dict:
    """Parse a 24bpp uncompressed BMP: dimensions + per-channel means.

    The pixel array is one ``np.frombuffer`` reshape — no per-pixel Python.
    Unsupported bit depths/compressions raise ``NotImplementedError`` (the
    honest gate: handling them means bringing in a real imaging library)."""
    if data[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP variant not supported: {bpp}bpp/c{compression}")
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    arr = (
        np.frombuffer(data, np.uint8, count=h * stride, offset=offset)
        .reshape(h, stride)[:, : width * 3]
        .reshape(h, width, 3)
    )  # rows of BGR triples
    means = arr.reshape(-1, 3).mean(axis=0)
    return {
        "width": width,
        "height": h,
        "mean_r": float(means[2]),
        "mean_g": float(means[1]),
        "mean_b": float(means[0]),
    }


def encode_wav(n_samples: int, sample_rate: int, amplitude: int) -> bytes:
    """Minimal RIFF/WAVE, 16-bit mono PCM, ±amplitude square wave."""
    samples = np.where(np.arange(n_samples) % 2 == 0, amplitude, -amplitude).astype(
        "<i2"
    )
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> dict:
    """Parse RIFF/WAVE chunks: duration + RMS amplitude for 16-bit mono
    PCM; anything else (compressed codecs, multi-channel) raises the
    ``NotImplementedError`` gate."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a WAV payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV variant not supported: fmt={audio_format} ch={channels} bits={bits}"
        )
    samples = np.frombuffer(pcm, "<i2").astype(np.float64)
    n = len(samples)
    return {
        "n_samples": n,
        "sample_rate": sample_rate,
        "duration_ms": int(n * 1000 // sample_rate),
        "rms": float(np.sqrt(np.mean(samples**2))) if n else 0.0,
    }


# ---------------------------------------------------------------------------
# PNG: stdlib-zlib IDAT decompression + numpy scanline unfiltering
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _paeth_predict(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9, filter type 4)."""
    a, b, c = (x.astype(np.int16) for x in (left, up, upleft))
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def encode_png_array(pixels: np.ndarray) -> bytes:
    """8-bit RGB/RGBA PNG from a ``(height, width, channels)`` uint8
    array. Each scanline is written with a DIFFERENT filter type
    (``row % 5``), so a decode exercises all five unfilter paths
    (None/Sub/Up/Average/Paeth), not just the trivial one — the round
    trip is a real filter-algebra check, not an identity copy."""
    import zlib

    height, width, ch = pixels.shape
    if pixels.dtype != np.uint8 or ch not in (3, 4):
        raise NotImplementedError("encoder handles 8-bit RGB/RGBA arrays only")
    recon = pixels.reshape(height, width * ch)
    zeros = np.zeros(width * ch, dtype=np.uint8)
    lines = []
    for y in range(height):
        cur = recon[y]
        prev = recon[y - 1] if y else zeros
        left = np.concatenate([zeros[:ch], cur[:-ch]])
        upleft = np.concatenate([zeros[:ch], prev[:-ch]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left  # uint8 arithmetic wraps mod 256, per spec
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            avg = ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(
                np.uint8
            )
            filt = cur - avg
        else:
            filt = cur - _paeth_predict(left, prev, upleft)
        lines.append(bytes([ftype]) + filt.tobytes())
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_png(
    width: int, height: int, rgba: tuple[int, int, int, int]
) -> bytes:
    """Minimal well-formed 8-bit RGBA PNG filled with one color (the
    closed-form-oracle form used by the codec roundtrip registry row)."""
    return encode_png_array(
        np.tile(np.array(rgba, dtype=np.uint8), (height, width)).reshape(
            height, width, 4
        )
    )


def decode_png(data: bytes, return_pixels: bool = False) -> dict:
    """Parse an 8-bit RGB/RGBA non-interlaced PNG: stdlib ``zlib``
    inflates the concatenated IDAT stream, then numpy unfilters each
    scanline (all five filter types; Sub is a per-channel ``cumsum`` —
    uint8 accumulation wraps mod 256 exactly as the spec requires).
    Chunk CRCs are verified. Palette/interlaced/16-bit variants raise the
    ``NotImplementedError`` gate (they need a real imaging library)."""
    import zlib

    if data[:8] != PNG_SIGNATURE:
        raise NotImplementedError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) != crc:
            raise NotImplementedError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt or interlace:
        raise NotImplementedError(
            f"PNG variant not supported: depth={depth} color={color_type} "
            f"interlace={interlace}"
        )
    ch = 3 if color_type == 2 else 4
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != height * (1 + stride):
        raise NotImplementedError("PNG scanline payload size mismatch")
    raw = raw.reshape(height, 1 + stride)
    ftypes, rows = raw[:, 0], raw[:, 1:]
    recon = np.empty((height, stride), np.uint8)
    zeros = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        cur, prev = rows[y], recon[y - 1] if y else zeros
        ftype = int(ftypes[y])
        if ftype == 0:
            recon[y] = cur
        elif ftype == 1:
            # Sub: recon[x] = filt[x] + recon[x-ch]  ==  per-channel
            # cumulative sum down the pixel axis (uint8 wraps mod 256)
            recon[y] = cur.reshape(width, ch).cumsum(axis=0, dtype=np.uint8).ravel()
        elif ftype == 2:
            recon[y] = cur + prev
        elif ftype in (3, 4):
            # Average/Paeth depend on the just-reconstructed left pixel —
            # inherently sequential in x; loop over pixels, numpy per
            # channel group (rows are bounded by image width, not corpus)
            out = recon[y]
            prev_px = np.zeros(ch, dtype=np.uint8)
            for x in range(width):
                sl = slice(x * ch, (x + 1) * ch)
                up = prev[sl]
                upleft = prev[sl.start - ch : sl.start] if x else np.zeros(ch, np.uint8)
                if ftype == 3:
                    pred = ((prev_px.astype(np.int16) + up.astype(np.int16)) // 2).astype(np.uint8)
                else:
                    pred = _paeth_predict(prev_px, up, upleft)
                out[sl] = cur[sl] + pred
                prev_px = out[sl]
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
    px = recon.reshape(height * width, ch).astype(np.float64)
    means = px.mean(axis=0)
    out = {
        "width": width,
        "height": height,
        "channels": ch,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }
    if return_pixels:
        out["pixels"] = recon.reshape(height, width, ch).copy()
    return out


#: MPEG1 Layer III bitrate table (kbps; index 0 = free, 15 = bad)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_MP3_SAMPLERATES = (44100, 48000, 32000, 0)


def probe_mp3(payload: bytes) -> dict:
    """Header-LEVEL MP3 metadata without decoding audio: skip an ID3v2
    tag, then walk MPEG1 Layer III frame headers by their computed
    lengths (144·bitrate/samplerate + padding per frame, 1152 samples
    each). Returns frame count, duration_ms, sample_rate and the modal
    bitrate_kbps. Sample DECODE still needs a real codec library and
    stays behind :func:`decode_payload`'s honest gate; other MPEG
    versions/layers raise here too."""
    import struct as _struct

    pos = 0
    if payload[:3] == b"ID3":
        # syncsafe 28-bit tag size after the 10-byte header
        sz = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + sz
    frames = 0
    bitrates: dict[int, int] = {}
    sample_rate = None
    while pos + 4 <= len(payload):
        (hdr,) = _struct.unpack_from(">I", payload, pos)
        if (hdr >> 21) != 0x7FF:
            break
        version = (hdr >> 19) & 0x3
        layer = (hdr >> 17) & 0x3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG1 Layer III frame headers are parsed"
            )
        br = _MP3_BITRATES[(hdr >> 12) & 0xF]
        sr = _MP3_SAMPLERATES[(hdr >> 10) & 0x3]
        padding = (hdr >> 9) & 0x1
        if not br or not sr:
            raise NotImplementedError("free-format/invalid MP3 frame header")
        sample_rate = sr
        bitrates[br] = bitrates.get(br, 0) + 1
        frames += 1
        pos += 144 * br * 1000 // sr + padding
    if frames == 0:
        raise NotImplementedError("no MPEG audio frame sync found")
    modal_br = max(bitrates.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return {
        "n_frames": frames,
        "sample_rate": sample_rate,
        "bitrate_kbps": modal_br,
        "duration_ms": round(frames * 1152 * 1000.0 / sample_rate, 3),
    }


def probe_mp4(payload: bytes) -> dict:
    """Box-LEVEL MP4/ISO-BMFF metadata without decoding samples: walk the
    top-level boxes (size+type, 64-bit largesize supported), record the
    ``ftyp`` major brand, and recurse into ``moov`` for the ``mvhd``
    movie header (timescale + duration → duration_ms). Track/sample
    decode stays behind the honest gate."""
    import struct as _struct

    def boxes(buf, start, end):
        pos = start
        while pos + 8 <= end:
            (size,) = _struct.unpack_from(">I", buf, pos)
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                (size,) = _struct.unpack_from(">Q", buf, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr:
                raise NotImplementedError("malformed MP4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    brand = None
    mvhd = None
    for btype, body, bend in boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            brand = payload[body : body + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for ctype, cbody, _cend in boxes(payload, body, bend):
                if ctype == b"mvhd":
                    version = payload[cbody]
                    if version == 0:
                        timescale, duration = _struct.unpack_from(
                            ">II", payload, cbody + 12
                        )
                    elif version == 1:
                        timescale, duration = _struct.unpack_from(
                            ">IQ", payload, cbody + 20
                        )
                    else:
                        raise NotImplementedError(f"mvhd version {version}")
                    mvhd = (timescale, duration)
    if brand is None or mvhd is None:
        raise NotImplementedError("MP4 missing ftyp/moov.mvhd")
    timescale, duration = mvhd
    if not timescale:
        raise NotImplementedError("mvhd timescale 0")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": round(duration * 1000.0 / timescale, 3),
    }


def probe_payload(payload: bytes) -> dict:
    """Metadata-level dispatch: full decoders where they exist, header/box
    probes for MP3/MP4 — every common container yields typed metadata
    even where sample decode is gated."""
    if payload is None:
        raise NotImplementedError("null payload")
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
        and payload[:2] != b"\xff\xd8"
    ):
        return {"kind": "mp3", **probe_mp3(payload)}
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return {"kind": "mp4", **probe_mp4(payload)}
    return decode_payload(payload)


def decode_payload(payload: bytes) -> dict:
    """Magic-byte dispatch to the real decoders; unknown formats raise
    ``NotImplementedError``. MP3/MP4 SAMPLE decode needs a real codec
    library (absent from this container) — their gate points at the
    header/box probes (:func:`probe_mp3` / :func:`probe_mp4`), which do
    work dependency-free."""
    if payload is None:
        raise NotImplementedError("null payload")
    if payload[:2] == b"BM":
        return {"kind": "bmp", **decode_bmp(payload)}
    if payload[:8] == PNG_SIGNATURE:
        return {"kind": "png", **decode_png(payload)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return {"kind": "wav", **decode_wav(payload)}
    if payload[:2] == b"\xff\xd8":
        from wcdimportbot_spark.operators.jpeg import decode_jpeg

        return {"kind": "jpeg", **decode_jpeg(payload)}
    if payload[:3] == b"ID3" or (len(payload) >= 8 and payload[4:8] == b"ftyp"):
        raise NotImplementedError(
            "MP3/MP4 sample decode needs a codec library; header metadata "
            "is available via probe_mp3/probe_mp4"
        )
    raise NotImplementedError(
        f"no dependency-free decoder for payload magic {payload[:4]!r}"
    )


def _real_features(payload: bytes) -> list[float]:
    # metadata dispatch: full decode where a decoder exists, header/box
    # probe for the gated containers — so an mp3/mp4 media row yields
    # typed features instead of failing the whole batch
    d = probe_payload(payload)
    if d["kind"] in ("bmp", "png", "jpeg"):
        return [
            float(d["width"]),
            float(d["height"]),
            d["mean_r"],
            d["mean_g"],
            d["mean_b"],
        ]
    if d["kind"] == "mp3":
        return [float(d["duration_ms"]), float(d["bitrate_kbps"])]
    if d["kind"] == "mp4":
        return [float(d["duration_ms"]), float(d["timescale"])]
    return [float(d["duration_ms"]), d["rms"]]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: 4 byte-statistics
    pseudo-features derived from the payload digest."""
    if payload is None:
        return []
    digest = hashlib.md5(payload).digest()
    return [
        float(len(payload)),
        float(digest[0]) / 255.0,
        float(digest[1]) / 255.0,
        float(int.from_bytes(digest[2:4], "big")) / 65535.0,
    ]


def extract_media_features(
    media: DataFrame, fake: bool = True, partitions: int | None = None
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched ``mapInPandas``.

    ``fake=False`` runs the REAL decoders: magic-byte dispatch to the
    dependency-free BMP/WAV parsers; formats that need media libraries
    (JPEG/PNG/MP3/MP4 — absent here) raise ``NotImplementedError`` naming
    the payload, so the gate is honest per-format rather than blanket."""
    if partitions:
        media = media.repartition(partitions, F.crc32(F.col("media_id").cast("string")))
    featurize = _fake_features if fake else _real_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                "payload_md5": pdf["payload"].map(
                    lambda p: None if p is None else hashlib.md5(p).hexdigest()
                ),
                "features": pdf["payload"].map(featurize),
            }
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


CODEC_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        # nullable numerics are doubles on purpose: both engines then hand
        # pandas float64 (NaN for null) and the value hash compares equal
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def codec_roundtrip(docs: DataFrame) -> DataFrame:
    """Real-codec verification surface: ``doc_id % 4`` routes each row to
    one of the four real codecs — solid-color BMP, 16-bit square-wave
    WAV, solid-color RGBA PNG (scanlines written with all five PNG filter
    types), solid-GRAYSCALE baseline JPEG (huffman entropy coding + DCT;
    grayscale makes the lossy color transform exact, so the round trip is
    closed-form) — each synthesized from ``doc_id`` alone, then the REAL
    byte-level decoders recover dimensions / channel means / duration /
    RMS. Every output column is therefore a closed-form function of
    ``doc_id`` that a SQL oracle predicts exactly (solid color ⇒ channel
    mean = the color; ±a square wave ⇒ RMS = a; all values chosen to be
    exactly representable).

    One Arrow-batched Python stage; encode and decode are separate code
    paths over the serialized bytes, so the round trip exercises real
    header/stride/chunk/filter parsing, not an identity function."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CODEC_ROUNDTRIP_SCHEMA.fields]
        for pdf in it:
            out = []
            for raw_id in pdf["doc_id"]:
                did = int(raw_id)
                arm = did % 4
                if arm == 0:
                    payload = encode_bmp(
                        8 + did % 8,
                        4 + did % 4,
                        (did % 256, (did * 7) % 256, (did * 13) % 256),
                    )
                    d = decode_bmp(payload)
                    out.append(
                        (
                            did,
                            "image",
                            float(d["width"]),
                            float(d["height"]),
                            d["mean_r"],
                            d["mean_g"],
                            d["mean_b"],
                            None,
                            None,
                        )
                    )
                elif arm == 1:
                    payload = encode_wav(800 + (did % 10) * 80, 8000, 1000 + did % 100)
                    d = decode_wav(payload)
                    out.append(
                        (
                            did,
                            "audio",
                            None,
                            None,
                            None,
                            None,
                            None,
                            float(d["duration_ms"]),
                            d["rms"],
                        )
                    )
                elif arm == 2:
                    payload = encode_png(
                        8 + did % 5,
                        5 + did % 6,  # ≥5 rows ⇒ every PNG filter type used
                        (did % 256, (did * 11) % 256, (did * 3) % 256, 255),
                    )
                    d = decode_png(payload)
                    out.append(
                        (
                            did,
                            "image",
                            float(d["width"]),
                            float(d["height"]),
                            d["mean_r"],
                            d["mean_g"],
                            d["mean_b"],
                            None,
                            None,
                        )
                    )
                else:
                    from wcdimportbot_spark.operators.jpeg import (
                        decode_jpeg,
                        encode_jpeg,
                    )

                    v = (did * 17) % 256
                    # non-multiple-of-8 dims exercise MCU edge padding
                    wpx, hpx = 9 + did % 7, 5 + did % 5
                    payload = encode_jpeg(
                        np.full((hpx, wpx, 3), v, dtype=np.uint8)
                    )
                    d = decode_jpeg(payload)
                    out.append(
                        (
                            did,
                            "image",
                            float(d["width"]),
                            float(d["height"]),
                            d["mean_r"],
                            d["mean_g"],
                            d["mean_b"],
                            None,
                            None,
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return docs.select("doc_id").mapInPandas(batches, CODEC_ROUNDTRIP_SCHEMA)


def media_feature_stats(features: DataFrame) -> DataFrame:
    """Per-modality byte/feature statistics (the downstream consumer of the
    plumbing; verified rows-only)."""
    return features.groupBy("modality").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_md5").alias("distinct_payloads"),
    )


def synthesize_mp3(n_frames: int) -> bytes:
    """A REAL (header-valid) MPEG1 Layer III stream: an ID3v2 tag followed
    by ``n_frames`` 128 kbps / 44100 Hz frames with zeroed audio data —
    enough structure for any header-walking prober, deterministic in its
    argument."""
    import struct as _struct

    hdr = _struct.pack(">I", 0xFFFB9000)  # sync|MPEG1|LIII|128kbps|44100
    frame = hdr + b"\x00" * (144 * 128000 // 44100 - 4)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    return id3 + frame * n_frames


def synthesize_mp4(duration_ticks: int, timescale: int = 1000) -> bytes:
    """A minimal REAL ISO-BMFF payload: ``ftyp`` (brand isom) + ``moov``
    holding a version-0 ``mvhd`` with the given timescale/duration."""
    import struct as _struct

    ftyp = _struct.pack(">I", 16) + b"ftypisom" + _struct.pack(">I", 0x200)
    mvhd_body = (
        b"\x00\x00\x00\x00"
        + _struct.pack(">II", 0, 0)
        + _struct.pack(">II", timescale, duration_ticks)
        + b"\x00" * 80
    )
    mvhd = _struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = _struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


CONTAINER_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mp3_n_frames", T.IntegerType()),
        T.StructField("mp3_duration_ms", T.DoubleType()),
        T.StructField("mp3_bitrate_kbps", T.IntegerType()),
        T.StructField("mp4_brand", T.StringType()),
        T.StructField("mp4_duration_ms", T.DoubleType()),
    ]
)


def container_probe(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MP3/MP4 metadata-probe verification surface (the codec_roundtrip
    pattern applied to the gated containers): per doc synthesize a REAL
    MPEG1-Layer-III stream (``1 + doc_id % 4`` frames behind an ID3v2
    tag) and a REAL ISO-BMFF payload (``(doc_id % 60 + 1)`` seconds at
    timescale 1000), run the actual header/box probers over the bytes,
    and emit their findings — every column closed-form in ``doc_id`` for
    the SQL oracle. One Arrow-batched Python stage; synthesis and probing
    are separate code paths over serialized bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CONTAINER_PROBE_SCHEMA.fields]
        for pdf in it:
            out = []
            for raw_id in pdf[id_col]:
                did = int(raw_id)
                mp3 = probe_mp3(synthesize_mp3(1 + did % 4))
                mp4 = probe_mp4(synthesize_mp4((did % 60 + 1) * 1000))
                out.append(
                    (
                        did,
                        mp3["n_frames"],
                        mp3["duration_ms"],
                        mp3["bitrate_kbps"],
                        mp4["brand"],
                        mp4["duration_ms"],
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return docs.select(id_col).mapInPandas(batches, CONTAINER_PROBE_SCHEMA)
