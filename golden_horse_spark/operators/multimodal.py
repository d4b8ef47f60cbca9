"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode is REAL for five formats, all pure stdlib+NumPy (this container
ships no PIL/libsndfile):

* **PPM/P6** — header parse + raw RGB read;
* **PNG** (round 3) — full critical-chunk reader: zlib inflate, CRC
  verification, scanline unfiltering (types 0–4 incl. Paeth), 8-bit
  gray/RGB/RGBA, non-interlaced; plus a filter-0 RGB encoder;
* **WAV** (round 3) — RIFF chunk walk, 16-bit PCM, mono/averaged
  multichannel; plus an encoder;
* **GIF** (round 4) — GIF87a/89a reader: color tables, extension-block
  skip, real variable-width LZW (clear/EOI, KwKwK, 12-bit cap with
  reset); plus a GIF89a single-frame encoder with real LZW compression;
* **BMP** (round 4) — 24-bit uncompressed, bottom-up and top-down
  rasters, 4-byte row padding; plus an encoder.

The synthetic media table emits genuine P6/PNG/GIF/BMP image payloads
and genuine WAV audio payloads, so the feature/resize stages run on
real decoded pixels/samples end-to-end. Remaining stubs: JPEG and compressed
audio (true codecs need native libraries — the fallback is the
deterministic fake, and swapping it for PIL/soundfile is a one-function
change on executors), and video containers (frame sampling uses the
stub). All the Spark-side plumbing (schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing) is real and tested either
way.

Design: media payloads ride a separate table keyed by ``media_ref``
(documents carry only the reference — SURVEY.md §1.2), so the 100 TB of
bytes never flows through text-only stages; column pruning drops
``payload`` unless a decode stage asks for it.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)


def synthesize_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Deterministic fake media table for every media span in documents:
    payload = repeatable bytes derived from media_ref."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind in pdf[["media_ref", "kind"]].itertuples(index=False, name=None):
                h = hashlib.sha256(ref.encode()).digest()
                w, ht = 16 + h[0] % 64, 16 + h[1] % 64
                dur = (h[2] * 100) if kind != "image" else 0
                rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
                if kind == "image":
                    # REAL image payload: deterministic RGB pixels seeded
                    # from the ref hash; format rotates P6/PNG/GIF/BMP by
                    # hash so all four real decode paths run in-pipeline
                    # (GIF gets palette-limited pixels — it's an indexed
                    # format)
                    fmt = h[3] % 4
                    if fmt == 2:
                        pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
                        rgb = pal[rng.randint(0, 16, size=(ht, w))]
                        payload = encode_gif(rgb)
                    else:
                        rgb = rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
                        payload = [encode_ppm, encode_png, None, encode_bmp][
                            fmt
                        ](rgb)
                elif kind == "audio":
                    # REAL 16-bit PCM WAV of the declared duration: a
                    # seeded sine + noise mix at 8 kHz
                    n = max(1, dur * 8000 // 1000)
                    t = np.arange(n, dtype=np.float32) / 8000.0
                    f0 = 100.0 + float(h[4]) * 4.0
                    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.randn(
                        n
                    ).astype(np.float32)
                    payload = encode_wav(wave)
                else:
                    payload = h * 4  # 128 deterministic bytes (video stub)
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": ht,
                        "duration_ms": dur,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG (8-bit RGB, filter 0 per scanline,
    non-interlaced). Pure zlib + struct — a real, spec-conformant file
    (readable by any PNG library)."""
    h, w = rgb.shape[:2]
    raw = b"".join(b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def parse_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8. Critical chunks only, CRC-checked; 8-bit
    depth, color types 0 (gray, replicated), 2 (RGB), 6 (RGBA, alpha
    dropped); all five scanline filters; non-interlaced only. Filters
    0/2 unfilter as whole-row vector ops (our encoder emits 0); the
    serial filters 1/3/4 fall back to a per-byte loop — correctness
    path for foreign files, not the hot path."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    pos, idat, ihdr = 8, b"", None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad crc in {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise ValueError(f"unsupported png (depth={depth} ctype={ctype} "
                         f"interlace={interlace})")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated png raster")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth (serial in x)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = cur.astype(np.uint8)
    arr = out.reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(arr, 3, axis=2)
    if ctype == 6:
        return arr[..., :3].copy()
    return arr


def encode_wav(wave_f32: np.ndarray, sr: int = 8000) -> bytes:
    """float32 waveform in [-1, 1] → 16-bit PCM mono RIFF/WAVE."""
    data = (
        (np.clip(wave_f32, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float32 mono waveform in [-1, 1], sample rate).
    16-bit PCM; multichannel averaged to mono; chunk walk honors the
    odd-length pad byte."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a wav")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, sr, _rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported wav (fmt={audio_fmt} bits={bits})")
    x = np.frombuffer(data[: len(data) - len(data) % 2], "<i2")
    x = x.astype(np.float32) / 32767.0
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(1)
    return x, sr



def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    h, w = rgb.shape[:2]
    row = w * 3
    pad = (-row) % 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += rgb[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
        raster += b"\x00" * pad
    off = 14 + 40
    size = off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


def parse_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB. Handles bottom-up
    AND top-down (negative height) rasters and 4-byte row padding;
    raises on palettized/compressed variants."""
    if payload[:2] != b"BM":
        raise ValueError("not a bmp")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported bmp: {bpp}bpp compression={compression}")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    if off + stride * h > len(payload):
        raise ValueError("truncated bmp raster")
    rows = []
    for i in range(h):
        start = off + i * stride
        bgr = np.frombuffer(payload, dtype=np.uint8, count=row, offset=start)
        rows.append(bgr.reshape(w, 3)[:, ::-1])  # BGR → RGB
    img = np.stack(rows)
    return img if top_down else img[::-1]


# ---------------------------------------------------------------- GIF
# GIF89a with LZW (spec Appendix F). The encoder/decoder pair keeps the
# variable code width in lockstep: the encoder widens when the JUST-
# ASSIGNED table code equals 2^width; the decoder (which learns each
# entry one code later) widens when its next free code equals 2^width
# before a read. Max width 12; at 4096 entries the encoder emits CLEAR
# and resets (no deferred-clear ambiguity).


def _gif_pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """LSB-first bit packing of (code, width) pairs."""
    acc = nbits = 0
    out = bytearray()
    for c, w in codes:
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {(i,): i for i in range(clear)}

    table, next_code, width = fresh(), eoi + 1, min_code_size + 1
    codes: list[tuple[int, int]] = [(clear, width)]
    buf = (int(indices[0]),)
    for k in indices[1:]:
        cand = buf + (int(k),)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append((clear, width))
            table, next_code, width = fresh(), eoi + 1, min_code_size + 1
        buf = (int(k),)
    codes.append((table[buf], width))
    codes.append((eoi, width))
    return _gif_pack_codes(codes)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    entries: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code, width = eoi + 1, min_code_size + 1
    pos = 0  # bit position
    out: list[int] = []
    prev: int | None = None
    total_bits = len(data) * 8
    while pos + width <= total_bits:
        byte_i, bit_i = divmod(pos, 8)
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> bit_i) & ((1 << width) - 1)
        pos += width
        if code == clear:
            entries = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code, width, prev = eoi + 1, min_code_size + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("gif lzw: first code not a literal")
            entry = entries[code]
        else:
            if code < next_code:
                entry = entries[code]
            elif code == next_code:  # KwKwK
                entry = entries[prev] + entries[prev][:1]
            else:
                raise ValueError("gif lzw: code out of range")
            if next_code < 4096:
                entries.append(entries[prev] + entry[:1])
                next_code += 1
        out.extend(entry)
        prev = code
        if next_code == (1 << width) and width < 12:
            width += 1
    return out


def encode_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → single-frame GIF89a
    (global color table, non-interlaced, real LZW). Raises if the image
    needs more than 256 palette entries — GIF is an indexed format; the
    synthetic media generator feeds it palette-limited pixels."""
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3).astype(np.uint8)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"gif needs ≤256 colors, image has {len(palette)}")
    gct_bits = max(1, int(len(palette) - 1).bit_length())  # table size 2^n
    table = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(min_code_size)
    lzw = _gif_lzw_encode(indices.astype(np.int64), min_code_size)
    for i in range(0, len(lzw), 255):  # sub-blocks
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def parse_gif(payload: bytes) -> np.ndarray:
    """Single-frame GIF87a/89a → (h, w, 3) uint8 RGB: header + color
    tables + extension skip + LZW decode. Non-interlaced only (raises
    otherwise); the first image block is returned."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected gif block 0x{b0:02x}")
        _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iflags & 0x40:
            raise ValueError("interlaced gif unsupported")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("gif image has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _gif_lzw_decode(bytes(data), min_code_size)
        if len(indices) < iw * ih:
            raise ValueError("truncated gif raster")
        arr = np.asarray(indices[: iw * ih], dtype=np.int64).reshape(ih, iw)
        return ct[arr]
    raise ValueError("gif has no image block")


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def parse_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Pure NumPy/bytes — handles the
    whitespace/comment grammar of the header; raises on truncation."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated ppm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Grayscale float32 in [0, 1]. REAL decode for P6/PPM, PNG, GIF
    (round 4: real LZW) and BMP (round 4) payloads + Rec.601 luminance.
    JPEG is the remaining stubbed branch — no PIL in this container —
    decoded as a deterministic fake (payload bytes tiled into (h, w))."""
    decoders = {
        b"P6": parse_ppm,
        b"\x89PNG\r\n\x1a\n": parse_png,
        b"GIF8": parse_gif,
        b"BM": parse_bmp,
    }
    for magic, dec in decoders.items():
        if payload[: len(magic)] == magic:
            rgb = dec(payload).astype(np.float32)
            lum = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
            return (lum / 255.0).astype(np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    tiled = np.tile(arr, need // len(arr) + 1)[:need]
    return tiled.reshape(height, width).astype(np.float32) / 255.0


def _decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """Mono float32 waveform in [-1, 1]. REAL decode for RIFF/WAVE
    16-bit PCM payloads (``parse_wav``); compressed audio codecs are the
    stubbed branch (soundfile on a real cluster) — deterministic fake:
    payload bytes tiled to an 8 kHz waveform of the declared duration."""
    if payload[:4] == b"RIFF":
        wave, _sr = parse_wav(payload)
        return wave
    sr = 8000
    n = max(1, int(duration_ms) * sr // 1000)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    tiled = np.tile(arr, n // len(arr) + 1)[:n]
    return tiled / 127.5 - 1.0


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL bilinear resize (align_corners=False convention, the
    PIL/OpenCV default) — vectorized NumPy, no library needed. Only the
    codec decode is stubbed in this container; the geometry is exact."""
    in_h, in_w = img.shape
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    tl = img[np.ix_(y0, x0)]
    tr = img[np.ix_(y0, x1)]
    bl = img[np.ix_(y1, x0)]
    br = img[np.ix_(y1, x1)]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def resize_images(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Arrow-batched image resize: decode (stub) → REAL bilinear resize →
    re-emit uint8 payload with the new dimensions. Output rides the same
    MEDIA_SCHEMA so downstream stages are unchanged — the standard
    normalize-resolution step of a multimodal training pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, w, h, dur in pdf[
                ["media_ref", "kind", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                img = _decode_image(bytes(payload), int(w), int(h))
                resized = (
                    (bilinear_resize(img, out_h, out_w) * 255.0)
                    .round()
                    .astype(np.uint8)
                )
                # re-encode as P6 (grayscale replicated to RGB) so the
                # resized payload is itself decodable — the stage output
                # round-trips through the same decode path
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": encode_ppm(
                            np.repeat(resized[:, :, None], 3, axis=2)
                        ),
                        "width": out_w,
                        "height": out_h,
                        "duration_ms": int(dur),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.where(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def extract_media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Per batch: decode (stub) → pooled statistics vector; audio decodes
    to a waveform (RMS/zero-crossings), image/video frames to grayscale
    (pooled quadrant means). The batch shape (pandas DataFrame of binary
    + ints) is exactly what a real decoder sees; sizing note — payloads
    make rows heavy, so upstream should ``repartition`` to keep ~64 MB
    per Arrow batch at real payload sizes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, w, h, dur in pdf[
                ["media_ref", "kind", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                if kind == "audio":
                    wave = _decode_audio(bytes(payload), int(dur))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(wave))) > 0))
                    feat = [
                        float(wave.mean()),
                        float(wave.std()),
                        float(wave.min()),
                        float(wave.max()),
                        float(np.sqrt(np.mean(wave**2))),  # RMS
                        zcr,
                        float(len(wave)),
                        0.0,
                    ]
                else:
                    img = _decode_image(bytes(payload), int(w), int(h))
                    # pooled stats: mean/std/min/max + quadrant means
                    qs = [
                        float(img[: h // 2, : w // 2].mean()),
                        float(img[: h // 2, w // 2 :].mean()),
                        float(img[h // 2 :, : w // 2].mean()),
                        float(img[h // 2 :, w // 2 :].mean()),
                    ]
                    feat = [
                        float(img.mean()),
                        float(img.std()),
                        float(img.min()),
                        float(img.max()),
                    ] + qs
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "feature": feat[:feat_dim],
                        "feat_dim": feat_dim,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing (kind='video'): one output row per sampled
    timestamp; the decode is the same stub. Demonstrates 1→N mapInPandas
    fan-out shape for frame extraction."""
    frames_schema = StructType(
        [
            StructField("media_ref", StringType()),
            StructField("ts_ms", IntegerType()),
            StructField("frame_feature", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, w, h, dur in pdf[
                ["media_ref", "payload", "width", "height", "duration_ms"]
            ].itertuples(index=False, name=None):
                for ts in range(0, max(int(dur), 1), every_ms):
                    img = _decode_image(bytes(payload) + ts.to_bytes(4, "little"), int(w), int(h))
                    rows.append(
                        {
                            "media_ref": ref,
                            "ts_ms": ts,
                            "frame_feature": [float(img.mean()), float(img.std())],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in frames_schema.fields])

    return media.where(F.col("kind") == "video").mapInPandas(run, frames_schema)
