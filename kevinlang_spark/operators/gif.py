"""GIF codec in pure stdlib + numpy — no codec libraries.

Companion to operators/jpeg.py: GIF's compression is LZW (GIF89a spec,
public), which needs nothing beyond bit twiddling, so the multimodal
layer's last image gate closes.  Animated GIFs make multi-FRAME media
real — the frame-sampling operator (multimodal.extract_frame_stats)
decodes actual entropy-coded frames, not synthetic fakes.

- :func:`make_gif` — deterministic encoder: one or more frames, each a
  palette-indexed array or a constant color; real LZW with clear codes
  and growing code widths; frames carry Graphic Control Extensions.
- :func:`gif_frames` — decoder for the honest subset: GIF87a/89a,
  global and local color tables, interlacing, sub-block LZW streams,
  frame compositing with disposal methods 0/1 (draw over) and 2
  (restore background).  Disposal 3 (restore previous) raises
  ValueError (quarantine semantics), as do truncated/corrupt streams.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits an initial clear code, grows the code
    width as the dictionary fills, resets at 4096 entries.  Bits pack
    LSB-first (GIF appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for byte in indices:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[trial] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode`, tolerant of any conformant GIF
    encoder (handles the KwKwK case and mid-stream clears)."""
    clear = 1 << min_code_size
    end = clear + 1
    # inline LSB-first bit accumulator: 2-3 int ops per code instead of
    # a per-bit closure call (the decoder's hottest path by far)
    dlen = len(data)
    bpos = 0
    acc = 0
    nbits = 0

    out = bytearray()
    table: list[bytes] = []
    base_table: list[bytes] | None = None  # built once per stream, C-copied per clear
    width = min_code_size + 1
    mask = (1 << width) - 1
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if bpos >= dlen:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[bpos] << nbits
            bpos += 1
            nbits += 8
        code = acc & mask
        acc >>= width
        nbits -= width
        if code == clear:
            if base_table is None:
                base_table = [bytes([i]) for i in range(clear)] + [b"", b""]
            table = list(base_table)
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        if code == end:
            break
        if not table:
            raise ValueError("GIF LZW stream missing initial clear code")
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        prev = entry
    return bytes(out[:expected])


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(
    width: int,
    height: int,
    frames: "list[np.ndarray | int]",
    palette: "list[tuple[int, int, int]]",
    delay_cs: int = 4,
) -> bytes:
    """A minimal VALID GIF89a.  ``frames`` holds full-size H×W arrays of
    palette indices (uint8) or a bare int for a constant-index frame;
    ``palette`` maps index → (r, g, b).  Real LZW compression, one
    Graphic Control Extension per frame, global color table only."""
    if not frames:
        raise ValueError("make_gif: need at least one frame")
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("make_gif: palette size must be in [2, 256]")
    depth = max(2, (n - 1).bit_length())  # GIF table sizes are powers of 2
    table_n = 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    for r, g, b in palette:
        out += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    out += b"\x00\x00\x00" * (table_n - n)
    if len(frames) > 1:  # NETSCAPE loop extension, the de-facto standard
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame in frames:
        if isinstance(frame, (int, np.integer)):
            idx = np.full((height, width), int(frame), dtype=np.uint8)
        else:
            idx = np.asarray(frame, dtype=np.uint8)
            if idx.shape != (height, width):
                raise ValueError("make_gif: frame shape mismatch")
        if int(idx.max(initial=0)) >= n:
            raise ValueError("make_gif: frame index outside palette")
        # GCE: disposal 1 (leave in place), no transparency
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", delay_cs)
        out += b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        mcs = max(2, depth)
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_frames(payload: bytes):
    """Full GIF pixel decode: LZW-decompress every image block,
    composite frames onto the logical screen per their disposal
    methods, map palette indices to RGB.  Returns
    (width, height, n_frames, F×H×W×3 uint8).  Transparent pixels keep
    the underlying canvas value (compositing semantics); disposal
    method 3 and truncated streams raise ValueError."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    bg_index = payload[11]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        if gct.shape[0] < n:
            raise ValueError("truncated GIF color table")
        i += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < gct.shape[0]:
        canvas[:, :] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def read_sub_blocks(j: int) -> tuple[bytes, int]:
        data = bytearray()
        while True:
            if j >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            size = payload[j]
            j += 1
            if size == 0:
                return bytes(data), j
            # per-BLOCK truncation check (a cumulative-length check
            # would only ever fire on the first sub-block)
            if j + size > len(payload):
                raise ValueError("truncated GIF sub-blocks")
            data += payload[j : j + size]
            j += size

    while i < len(payload):
        block = payload[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if i + 2 >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[i + 1]
            if label == 0xF9:  # Graphic Control Extension
                size = payload[i + 2]
                body = payload[i + 3 : i + 3 + size]
                if size < 4 or len(body) < 4:
                    raise ValueError("malformed GIF graphic control block")
                disposal = (body[0] >> 2) & 0x07
                transparent = body[3] if body[0] & 0x01 else None
                if disposal == 3:
                    raise ValueError(
                        "GIF disposal 'restore previous' unsupported"
                    )
                _, i = read_sub_blocks(i + 3 + size)
            else:  # comment / application / plain text: skip
                _, i = read_sub_blocks(i + 2)
            continue
        if block != 0x2C:
            raise ValueError("corrupt GIF block stream")
        if i + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
        iflags = payload[i + 9]
        j = i + 10
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload[j : j + 3 * n], dtype=np.uint8).reshape(
                n, 3
            )
            j += 3 * n
        if table is None:
            raise ValueError("GIF image block with no color table")
        if j >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[j]
        data, j = read_sub_blocks(j + 1)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, w * h), dtype=np.uint8
        ).reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder rows (4-pass scheme)
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            un = np.empty_like(idx)
            un[order] = idx
            idx = un
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF index outside color table")
        patch = table[idx]
        region = canvas[top : top + h, left : left + w]
        if region.shape[:2] != (h, w):
            raise ValueError("GIF frame exceeds logical screen")
        if transparent is not None:
            mask = idx != transparent
            region[mask] = patch[mask]
        else:
            region[:, :] = patch
        frames.append(canvas.copy())
        if disposal == 2:  # restore background before the next frame —
            # the background color index refers to the GLOBAL color
            # table (GIF89a §18), never a frame's local table
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < gct.shape[0]
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + h, left : left + w] = bg
        # a GCE governs ONLY the single rendering block that follows
        # (GIF89a §23) — stale transparency/disposal must not leak into
        # GCE-less frames
        transparent = None
        disposal = 0
        i = j

    if not frames:
        raise ValueError("GIF contains no image data")
    return width, height, len(frames), np.stack(frames)
