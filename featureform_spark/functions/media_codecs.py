"""Real media codecs for uncompressed public formats — pure numpy/struct.

The multimodal plumbing (functions/multimodal.py) keeps decode behind a
``decoder`` hook because PIL/ffmpeg are absent from this container. That
gate is honest for *compressed* formats (JPEG/PNG/MP3/H.264), but three
ubiquitous uncompressed formats need no codec library at all:

- **BMP** (Windows bitmap, BITMAPINFOHEADER + bottom-up 24-bit rows),
- **PPM** (netpbm P6, ASCII header + raw RGB),
- **WAV** (RIFF PCM, fmt + data chunks).

This module implements genuine encoders and decoders for them with
``struct`` + numpy: ``decode_dims`` reads real headers from real bytes,
``bmp_resize`` does an actual nearest-neighbor resample of the pixel
array and re-encodes. ``sniff_decoder`` is a drop-in for the
``decoder=`` hook: real parse for BMP/PPM/WAV, NotImplementedError (the
documented codec gate) for compressed magics.

Spark usage stays Arrow-batched ``mapInPandas`` — these run per binary
cell inside executor batches, the same shape a PIL-backed decoder has.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


# --------------------------------------------------------------------- BMP

def _bmp_row_size(width: int) -> int:
    return ((3 * width + 3) // 4) * 4  # 24-bit rows padded to 4 bytes


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → a valid 24-bit BMP (bottom-up, BGR)."""
    h, w, _ = pixels.shape
    row = _bmp_row_size(w)
    img_size = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_SIZE + img_size, 0, 0, BMP_HEADER_SIZE
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = np.zeros((h, row), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    body[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + body.tobytes()


def decode_bmp_dims(b: bytes) -> tuple[int, int]:
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack_from("<ii", b, 18)
    return w, abs(h)  # negative height = top-down variant


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB (24-bit uncompressed only)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row = _bmp_row_size(w)
    body = np.frombuffer(b, dtype=np.uint8, count=row * h, offset=offset)
    rows = body.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def bmp_resize(b: bytes, out_w: int, out_h: int) -> bytes:
    """Genuine nearest-neighbor resize: decode → resample → re-encode."""
    px = decode_bmp(b)
    h, w, _ = px.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return encode_bmp(px[yi][:, xi])


# --------------------------------------------------------------------- PPM

def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm_dims(b: bytes) -> tuple[int, int]:
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace-separated width height maxval (comments allowed)
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    return fields[0], fields[1]


# --------------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav_info(b: bytes) -> tuple[int, int, int]:
    """→ (n_samples, channels, sample_rate); walks RIFF chunks properly."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i, ch, rate, bits, n = 12, None, None, 16, None
    while i + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, i)
        if cid == b"fmt ":
            _, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"data":
            n = size // (max(ch or 1, 1) * (bits // 8))
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if ch is None or n is None:
        raise ValueError("WAV missing fmt/data chunk")
    return n, ch, rate


# ----------------------------------------------------------------- dispatch

_COMPRESSED_MAGICS = {
    b"\xff\xd8\xff": "JPEG",
    b"\x89PNG": "PNG",
    b"GIF8": "GIF",
    b"\x00\x00\x00 ftyp": "MP4",
    b"\x1a\x45\xdf\xa3": "WebM/MKV",
    b"ID3": "MP3",
    b"OggS": "Ogg",
}


def sniff_decoder(content: bytes, media_type: str) -> tuple[int, int]:
    """Drop-in for extract_media_features(decoder=...): real header parse
    for BMP/PPM/WAV; the documented codec gate for compressed formats.
    Audio maps (n_samples, channels) onto the (width, height) slots."""
    if content[:2] == b"BM":
        return decode_bmp_dims(content)
    if content[:2] == b"P6":
        return decode_ppm_dims(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        n, ch, _ = decode_wav_info(content)
        return n, ch
    for magic, name in _COMPRESSED_MAGICS.items():
        if content.startswith(magic):
            raise NotImplementedError(
                f"{name} decode requires codec libraries not present in "
                "this container (PIL/ffmpeg); uncompressed BMP/PPM/WAV "
                "decode natively"
            )
    raise ValueError(f"unrecognized media bytes (media_type={media_type!r})")


def synth_bmp(width: int, height: int, seed: int) -> bytes:
    """Deterministic valid BMP: a gradient/checker pattern from (seed) —
    vectorized, so generating test corpora is cheap at scale."""
    y, x = np.mgrid[0:height, 0:width]
    px = np.stack(
        [
            (x * 7 + seed) % 256,
            (y * 13 + seed * 3) % 256,
            (x + y + seed * 5) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_bmp(px)
