"""Stdlib PNG/WAV codecs: roundtrips, filter reversal, corruption checks."""

from __future__ import annotations

import struct
import zlib

import pytest

from aruna_spark.ops.codecs import (
    PNG_SIG,
    _chunk,
    png_decode_gray,
    png_encode_gray,
    wav_decode_pcm16,
    wav_encode_pcm16,
)


def test_png_roundtrip_multirow():
    pixels = bytes(range(256)) * 4  # 1024 px
    data = png_encode_gray(pixels, 32, 32)
    w, h, back = png_decode_gray(data)
    assert (w, h) == (32, 32) and back == pixels


def test_png_rejects_bad_crc():
    data = bytearray(png_encode_gray(b"\x01\x02\x03\x04", 2, 2))
    data[-5] ^= 0xFF  # corrupt IEND CRC? corrupt inside IDAT crc instead
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode_gray(bytes(data))


def test_png_decodes_sub_and_up_filters():
    """A third-party encoder may emit Sub/Up filtered scanlines; build one
    by hand and check the reverse pass."""
    w, h = 4, 3
    rows = [b"\x10\x20\x30\x40", b"\x11\x21\x31\x41", b"\x12\x22\x32\x42"]
    # row0: None; row1: Sub (delta vs left); row2: Up (delta vs row1)
    sub = bytes(
        [rows[1][0]] + [(rows[1][i] - rows[1][i - 1]) & 0xFF for i in range(1, w)]
    )
    up = bytes((rows[2][i] - rows[1][i]) & 0xFF for i in range(w))
    raw = b"\x00" + rows[0] + b"\x01" + sub + b"\x02" + up
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    got = png_decode_gray(data)
    assert got == (w, h, b"".join(rows))


def test_wav_roundtrip_and_unknown_chunk_skip():
    pcm = struct.pack("<8h", *range(-4, 4))
    data = wav_encode_pcm16(pcm, 16000)
    # splice an unknown LIST chunk between fmt and data like real files
    fmt_end = data.index(b"data")
    spliced = data[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO" + data[fmt_end:]
    rate, back = wav_decode_pcm16(spliced)
    assert rate == 16000 and back == pcm


def test_wav_rejects_stereo():
    pcm = b"\x00\x00" * 4
    data = bytearray(wav_encode_pcm16(pcm))
    data[22] = 2  # channel count
    with pytest.raises(ValueError, match="mono"):
        wav_decode_pcm16(bytes(data))
