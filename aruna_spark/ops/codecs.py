"""Pure-stdlib media codecs: 8-bit grayscale PNG and PCM16 WAV.

The container has no PIL/ffmpeg/soundfile, but both formats are simple
enough to implement faithfully with ``zlib``/``struct`` — so the
multimodal pipeline's decode stage can be REAL (parse the container,
validate checksums, recover the samples) instead of a stub. The heavier
codecs (JPEG, mp4) stay behind the import-gated stub in
:mod:`aruna_spark.queries.multimodal`.

PNG: signature + IHDR/IDAT/IEND chunks with CRC-32 validation; encode
writes filter-type-0 scanlines; decode additionally reverses Sub(1) and
Up(2) filters so third-party minimal encoders parse too.

WAV: canonical RIFF/WAVE with a 16-byte ``fmt `` chunk, mono PCM16;
decode walks chunks (skipping unknown ones) and returns rate + frames.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """8-bit grayscale PNG; ``pixels`` is row-major, len == width*height."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit grayscale PNG → (width, height, pixels).

    Validates the signature and every chunk CRC; reverses scanline
    filters None(0)/Sub(1)/Up(2)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", None, None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only non-interlaced 8-bit grayscale")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w + 1
    out = bytearray()
    prev = bytes(w)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ft, cur = row[0], bytearray(row[1:])
        if ft == 1:  # Sub
            for i in range(1, w):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(w):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft != 0:
            raise ValueError(f"unsupported filter {ft}")
        out += cur
        prev = bytes(cur)
    return w, h, bytes(out)


def wav_encode_pcm16(pcm: bytes, rate: int = 8000) -> bytes:
    """Mono PCM16 WAV container around raw little-endian sample bytes."""
    if len(pcm) % 2:
        raise ValueError("PCM16 needs an even byte count")
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def wav_decode_pcm16(data: bytes) -> tuple[int, bytes]:
    """Parse a mono PCM16 WAV → (sample_rate, pcm bytes); skips unknown
    chunks (LIST/INFO etc.) like a real reader."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only mono PCM16")
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln % 2)  # RIFF chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return rate, pcm
