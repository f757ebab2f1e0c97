"""GIF (87a/89a) codec — pure stdlib/numpy, real LZW.

Decode: header + logical screen descriptor, global/local color
tables, extension-block walk (sub-block framing), image descriptor,
variable-width LZW decompression (clear/EOI codes, dictionary growth
to 4095, early code-width bumps), Adam-style 4-pass deinterlace.
Returns (h, w) uint8 of palette INDICES plus the palette — for the
engine's grayscale feature path the palette is identity gray, so
indices ARE intensities.

Encode: the classic "uncompressed GIF" writer — every pixel emitted
as a literal code at min_code_size+1 bits with a CLEAR flushed before
the decoder's dictionary growth would widen the code width. Larger
output than a real compressor, but spec-legal bits that any decoder
(including this one) reads back exactly; GIF is lossless, so the
catalog query's DuckDB oracle recomputes decoded pixels
arithmetically (plans/catalog_data.py:gif_decode_stats).

Reference parity note: the reference app has no media surface; this
extends the builder-brief multimodal-columns family alongside
operators/jpeg.py and the PNG/netpbm codecs in multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

_GRAY_PALETTE = bytes(v for v in range(256) for _ in range(3))


class _LzwWriter:
    """LSB-first bit packer with GIF 255-byte sub-block framing."""

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self.data = bytearray()

    def put(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.data.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def finish(self) -> bytes:
        if self._n:
            self.data.append(self._acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.data), 255):
            chunk = self.data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
        return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression. Width-bump rule mirrors the decoder
    exactly: the decoder has one FEWER table entry than the encoder at
    each point (it adds after the *following* code), so the encoder
    widens when next_code == (1 << width) + 1; at 4095 it emits CLEAR
    and resets rather than run the table to overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wtr = _LzwWriter()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    wtr.put(clear, width)
    s = b""
    for ch in indices:
        s2 = s + bytes([ch])
        if s2 in table:
            s = s2
            continue
        wtr.put(table[s], width)
        table[s2] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        s = bytes([ch])
        if next_code == 4095:
            wtr.put(clear, width)
            table, next_code, width = fresh()
            # s is a single literal, present in the fresh table
    if s:
        wtr.put(table[s], width)
    wtr.put(eoi, width)
    return wtr.finish()


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """8-bit single-image GIF with an identity grayscale palette and
    real LZW compression."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += _GRAY_PALETTE
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(8)  # LZW min code size
    rows = _interlace_order(h) if interlace else list(range(h))
    out += _lzw_encode(px[rows].tobytes(), 8)
    out += b"\x3B"
    return bytes(out)


def _interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace row sequence."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


class _LzwReader:
    """LSB-first bit reader over concatenated sub-block data."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def get(self, width: int) -> int:
        while self._n < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._n -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    rdr = _LzwReader(data)

    def reset() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = rdr.get(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # width grows when the NEXT code could reference the next slot
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_expected:
        raise ValueError("GIF pixel data ended early")
    return out


def decode_gif(content: bytes) -> dict[str, np.ndarray]:
    """Decode the first image of a GIF: returns {'indices': (h, w)
    uint8, 'palette': (n, 3) uint8}. Animated GIFs decode their first
    frame; malformed streams raise ValueError."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(f"not a GIF (magic {content[:6]!r})")
    if len(content) < 14:
        raise ValueError("GIF truncated before logical screen descriptor")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X} at {pos}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", content[pos + 1:pos + 10])
        pos += 10
        if iflags & 0x80:  # local color table overrides
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        min_code = content[pos]
        pos += 1
        data = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            data += content[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        if palette is None:
            raise ValueError("GIF image with no color table")
        idx = np.frombuffer(
            _lzw_decode(bytes(data), min_code, w * h), np.uint8, w * h
        ).reshape(h, w)
        if iflags & 0x40:
            out = np.empty_like(idx)
            out[_interlace_order(h)] = idx
            idx = out
        return {"indices": idx, "palette": palette.copy()}
    raise ValueError("GIF contains no image block")


def decode_gif_gray(content: bytes) -> np.ndarray:
    """Grayscale view: palette-map indices to luminance (integer
    (299R + 587G + 114B) // 1000 — exact, oracle-friendly). For the
    identity gray palette this is the identity."""
    d = decode_gif(content)
    pal = d["palette"].astype(np.int64)
    lum = (299 * pal[:, 0] + 587 * pal[:, 1] + 114 * pal[:, 2]) // 1000
    return lum[d["indices"]].astype(np.uint8)
