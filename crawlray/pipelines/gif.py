"""Pure-stdlib GIF decoder — the second REAL image-decode format.

Companion to :mod:`crawlray.pipelines.png`: the reference stores real
image bytes for whatever the page serves (``image_downloader.py``
infers ``.gif`` from URLs/content-type alongside ``.png``), so the
``backend='real'`` seam decodes GIF too. Implemented from the GIF87a/
GIF89a specification directly: logical-screen/image descriptors,
global/local color tables, sub-block reassembly, and the GIF variant
of LZW (LSB-first variable-width codes, clear/EOI, KwKwK case,
12-bit cap), plus four-pass de-interlacing.

Supported profile: first image frame, full-canvas (left=top=0, frame
size == logical screen size — what single-image GIFs are), global or
local palette, interlaced or not. Transparency and later frames are
ignored (the decode contract is pixels of the primary frame);
out-of-profile inputs raise :class:`GifFormatError` loudly — never a
wrong decode.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class GifFormatError(ValueError):
    """Raised for non-GIF bytes or GIF features outside the supported
    profile (truncated stream, partial-canvas frame, bad LZW code)."""


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in GIF_MAGICS


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; return
    (payload, position after the 0 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            raise GifFormatError("truncated sub-block body")
        out += data[pos:pos + ln]
        pos += ln


def _lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bitstream, variable code width
    starting at min_code_size+1 (cap 12), clear=2^mcs, EOI=clear+1,
    KwKwK handling. Returns exactly ``n_pixels`` palette indices."""
    if not (2 <= min_code_size <= 8):
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole payload at once
    bits = np.unpackbits(np.frombuffer(payload, np.uint8),
                         bitorder="little")
    bitpos = 0
    nbits = len(bits)

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise GifFormatError("LZW bitstream underrun")
        v = 0
        for i in range(width):
            v |= int(bits[bitpos + i]) << i
        bitpos += width
        return v

    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dict as a list of bytes; entries 0..clear-1 are single indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read(width)
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise GifFormatError(f"reference to reserved code {code}")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]            # the KwKwK case
        else:
            raise GifFormatError(f"LZW code {code} out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise GifFormatError(
            f"LZW produced {n_out} of {n_pixels} pixels")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 RGB array (h, w, 3) of the first frame."""
    if not is_gif(data):
        raise GifFormatError("not a GIF (bad magic)")
    if len(data) < 13:
        raise GifFormatError("truncated header")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:                          # trailer
            break
        if b == 0x21:                          # extension: label + blocks
            if pos >= len(data):
                raise GifFormatError("truncated extension")
            pos += 1
            _, pos = _sub_blocks(data, pos)
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if (left, top) != (0, 0) or (iw, ih) != (width, height):
            raise GifFormatError("partial-canvas frame unsupported")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifFormatError("no color table")
        if pos >= len(data):
            raise GifFormatError("truncated image data")
        mcs = data[pos]
        pos += 1
        payload, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(payload, mcs, iw * ih)
        if int(idx.max(initial=0)) >= len(pal):
            raise GifFormatError("palette index out of range")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:                     # de-interlace
            order = np.concatenate(
                [np.arange(start, ih, step)
                 for start, step in _INTERLACE_PASSES])
            deint = np.empty_like(rows)
            deint[order] = rows
            rows = deint
        return pal[rows]
    raise GifFormatError("no image frame found")


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """Minimal valid GIF89a encoder for tests/benches: fixed-width LZW
    codes (the classic 'uncompressed GIF' trick — a clear code before
    every run of 2^mcs-2 literals keeps the code width constant).
    ``indices``: (h, w) uint8 palette indices; ``palette``: (n, 3)."""
    idx = np.asarray(indices, np.uint8)
    pal = np.asarray(palette, np.uint8)
    h, w = idx.shape
    n = len(pal)
    size_field = max(1, (int(n) - 1).bit_length() - 1)  # 2<<f >= n
    while (2 << size_field) < n:
        size_field += 1
    n_slots = 2 << size_field
    full_pal = np.zeros((n_slots, 3), np.uint8)
    full_pal[:n] = pal
    mcs = max(2, size_field + 1)
    clear = 1 << mcs
    eoi = clear + 1
    cw = mcs + 1
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES])
        rows = idx[order]
    else:
        rows = idx
    flat = rows.reshape(-1)
    # emit: CLEAR, then pixels as literal codes with a CLEAR every
    # (clear - 2) literals so the decoder's table never forces a width bump
    codes = [clear]
    for i, v in enumerate(flat.tolist()):
        if i and i % (clear - 2) == 0:
            codes.append(clear)
        codes.append(v)
    codes.append(eoi)
    acc = 0
    accbits = 0
    payload = bytearray()
    for c in codes:
        acc |= c << accbits
        accbits += cw
        while accbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8
    if accbits:
        payload.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field & 7), 0, 0)
    out += full_pal.tobytes()
    out.append(0x2C)                           # image separator
    out += struct.pack("<HHHHB", 0, 0, w, h,
                       (0x40 if interlace else 0))
    out.append(mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)                              # block terminator
    out.append(0x3B)                           # trailer
    return bytes(out)
