"""Baseline JPEG codec in pure stdlib + numpy — no codec libraries.

Closes the last honest multimodal gate (multimodal.py previously raised
NotImplementedError for JPEG pixel data): baseline sequential JPEG is
Huffman coding + an 8×8 DCT, both implementable exactly from the
public ITU-T T.81 spec with nothing beyond ``struct`` and numpy.

Two halves:

- :func:`make_jpeg` — a minimal deterministic ENCODER used to
  synthesize real baseline-JPEG bytes for tests and bronze tables
  (grayscale or 4:4:4 / 4:2:0 YCbCr, all-ones quantization tables so
  constant-color blocks round-trip EXACTLY — the property the decode
  oracles rely on).  ``progressive=True`` emits a spectral-selection
  progressive stream (SOF2: one interleaved DC scan, then one
  full-band AC scan per component); ``successive=True`` adds the
  successive-approximation dimension (Al=1 first scans + Ah=1
  refinement scans with cross-block EOB runs and buffered correction
  bits — T.81 G.1.2.3).
- :func:`jpeg_pixels` — a DECODER for the honest subset: 8-bit
  baseline sequential (SOF0/SOF1) plus FULL progressive (SOF2 —
  spectral selection AND successive approximation: coefficients
  accumulate across DC/AC first and refinement scans, EOB-run coding,
  correction bits, one IDCT at the end), Huffman entropy coding,
  grayscale or 3-component YCbCr, sampling factors up to 2×2
  (nearest-neighbor chroma upsampling, as libjpeg's -nosmooth),
  restart intervals.  Arithmetic coding, 12-bit precision, CMYK, and
  hierarchical raise ValueError (quarantine semantics).

The reference engine (harry75369/KevinLang) has no media layer at all;
this extends the SURVEY §2 multimodal tier, where image/audio columns
are opaque binary + typed metadata and decode runs in Arrow-batched
UDFs (multimodal.py extract_pixel_stats).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order, generated (not transcribed): diagonal d holds the
# cells i+j == d, traversed up-right on even diagonals — T.81 Figure 5
ZIGZAG: list[int] = []
for _d in range(15):
    _cells = [(_i, _d - _i) for _i in range(8) if 0 <= _d - _i < 8]
    if _d % 2 == 0:
        _cells.reverse()
    ZIGZAG.extend(_i * 8 + _j for _i, _j in _cells)


def _dct_matrix() -> np.ndarray:
    """The orthonormal 8-point DCT-II matrix A: forward F = A X Aᵀ,
    inverse X = Aᵀ F A.  Identical to T.81's definition (the 1/4 ·
    C(u)C(v) scaling folded into the matrix rows)."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else 0.5
        for j in range(8):
            a[u, j] = c * np.cos((2 * j + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()

# our canonical Huffman tables (any valid DHT works — the decoder reads
# tables from the stream): 12 DC categories at 4 bits, and all 176
# AC symbols at 8 bits — the 162 baseline run/size pairs plus the 14
# progressive EOBn run-length symbols (r<<4 for r=1..14; baseline scans
# never emit those and the baseline decoder rejects them).
# Single-length canonical codes are trivially prefix-free and never
# produce the all-ones padding ambiguity.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 7 + [176] + [0] * 8
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]  # EOBn (progressive EOB runs)
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for an encoder, canonical assignment."""
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _canonical_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for a decoder."""
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, length: int) -> None:
        for shift in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> shift) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    bw: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    diff = zz[0] - pred
    s = _category(diff)
    if s > 11:
        raise ValueError("make_jpeg: DC difference out of baseline range")
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write((diff if diff > 0 else diff + (1 << s) - 1) & ((1 << s) - 1), s)
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    run = 0
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("make_jpeg: AC coefficient out of baseline range")
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write((v if v > 0 else v + (1 << s) - 1) & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return zz[0]


def _fdct_quantized(block: np.ndarray, quant: int = 1) -> list[int]:
    """Level-shift, forward DCT, quantize by the uniform ``quant``
    table, emit zigzag-ordered ints."""
    f = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = np.rint(f / quant).astype(np.int64)
    flat = q.reshape(64)
    return [int(flat[ZIGZAG[i]]) for i in range(64)]


def _comp_plane(pixels: np.ndarray, height: int, width: int) -> np.ndarray:
    """Edge-replicate a component plane up to whole-block dimensions."""
    bh = (height + 7) // 8 * 8
    bw_ = (width + 7) // 8 * 8
    out = np.empty((bh, bw_), dtype=np.float64)
    out[:height, :width] = pixels
    out[height:, :width] = pixels[height - 1 : height, :]
    out[:, width:] = out[:, width - 1 : width]
    return out


def make_jpeg(
    width: int,
    height: int,
    rgb: tuple[int, int, int] | None = None,
    gray: int | None = None,
    pixels: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    quant: int = 1,
    two_tables: bool = False,
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """A minimal VALID baseline-sequential JPEG.

    ``quant`` writes uniform quantization tables of that value (the
    default 1 keeps constant blocks bit-exact; larger values exercise
    REAL dequantization on the decode side — reconstruction error of a
    constant block is bounded by quant/16).  ``two_tables`` registers a
    second identical Huffman table pair as ids 1 and points the chroma
    components at them (Td/Ta = 1) — the multi-table DHT/SOS wiring
    real encoders use.

    - ``gray=v`` → single-component greyscale, every pixel ``v``.  With
      the all-ones quantization tables written here, constant blocks
      have one integer DC coefficient and zero AC — the round-trip is
      bit-EXACT, which is what the decode oracles assert.
    - ``rgb=(r,g,b)`` → 3-component YCbCr, constant fill (4:4:4, or
      4:2:0 with ``subsample=True``).  The RGB→YCbCr→RGB integer
      round-trip may differ by ±1 per channel (both directions round).
    - ``pixels`` → H×W (grey) or H×W×3 (RGB) uint8 array of arbitrary
      content; quantization error is bounded by the all-ones tables.
    """
    if pixels is not None:
        px = np.asarray(pixels, dtype=np.float64)
        is_gray = px.ndim == 2
    elif gray is not None:
        px = np.full((height, width), gray, dtype=np.float64)
        is_gray = True
    elif rgb is not None:
        px = np.empty((height, width, 3), dtype=np.float64)
        px[:, :, 0], px[:, :, 1], px[:, :, 2] = rgb
        is_gray = False
    else:
        raise ValueError("make_jpeg: pass rgb=, gray= or pixels=")

    if is_gray:
        planes = [_comp_plane(px, height, width)]
        samp = [(1, 1)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = np.rint(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))
        if subsample:  # 4:2:0 — chroma averaged over 2×2, Y full-res
            ph = (height + 1) // 2 * 2
            pw = (width + 1) // 2 * 2
            cbp = _comp_plane(cb, height, width)[:ph, :pw]
            crp = _comp_plane(cr, height, width)[:ph, :pw]
            cb = np.rint(cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            cr = np.rint(crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            planes = [
                _comp_plane(y, height, width),
                _comp_plane(cb, ph // 2, pw // 2),
                _comp_plane(cr, ph // 2, pw // 2),
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [_comp_plane(p, height, width) for p in (y, cb, cr)]
            samp = [(1, 1), (1, 1), (1, 1)]

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    if not 1 <= quant <= 255:
        raise ValueError("make_jpeg: quant must be in [1, 255]")
    # DQT: table 0 (and 1 for color), uniform `quant` — 1 keeps
    # constant integer-DC blocks exact
    for tq in range(1 if is_gray else 2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes([quant]) * 64
    # SOF0 (baseline) or SOF2 (progressive); identical payload format
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for c in range(ncomp):
        h, v = samp[c]
        out += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    # DHT: a DC+AC table pair as id 0; with two_tables an identical
    # pair registers as id 1 for the chroma components (the Td/Ta
    # wiring real encoders use — different ids, same canonical codes)
    table_ids = (0, 1) if two_tables and not is_gray else (0,)
    for th in table_ids:
        for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)), (1, (_AC_BITS, _AC_VALS))):
            out += (
                b"\xff\xc4"
                + struct.pack(">H", 19 + len(vals))
                + bytes([(tc << 4) | th])
                + bytes(bits)
                + bytes(vals)
            )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    maxh = max(h for h, _ in samp)
    maxv = max(v for _, v in samp)
    mcu_cols = (width + 8 * maxh - 1) // (8 * maxh)
    mcu_rows = (height + 8 * maxv - 1) // (8 * maxv)
    # pad every plane to the full MCU grid so edge MCUs have data
    padded = []
    for c in range(ncomp):
        h, v = samp[c]
        ph, pw = mcu_rows * v * 8, mcu_cols * h * 8
        p = planes[c]
        full = np.empty((ph, pw))
        full[: p.shape[0], : p.shape[1]] = p
        full[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        full[:, p.shape[1] :] = full[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(full)

    def table_id(c: int) -> int:
        return 1 if (two_tables and not is_gray and c > 0) else 0

    def rst(bw: _BitWriter, n: int) -> None:
        bw.flush()
        bw.buf += bytes([0xFF, 0xD0 + (n - 1) % 8])

    if not progressive:
        # SOS — the single interleaved baseline scan
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for c in range(ncomp):
            t = table_id(c)
            out += bytes([c + 1, (t << 4) | t])
        out += b"\x00\x3f\x00"
        bw = _BitWriter()
        preds = [0] * ncomp
        mcu_n = 0
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                    rst(bw, mcu_n // restart_interval)
                    preds = [0] * ncomp
                mcu_n += 1
                for c in range(ncomp):
                    h, v = samp[c]
                    for by in range(v):
                        for bx in range(h):
                            y0 = (my * v + by) * 8
                            x0 = (mx * h + bx) * 8
                            zz = _fdct_quantized(
                                padded[c][y0 : y0 + 8, x0 : x0 + 8], quant
                            )
                            _encode_block(bw, zz, preds[c], dc_codes, ac_codes)
                            preds[c] = zz[0]
        bw.flush()
        out += bw.buf
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # --- progressive (T.81 G.1): one interleaved DC scan, then one
    # full-band AC scan per component — spectral selection.  With
    # ``successive=True`` the first scans send Al=1 (point transform)
    # and Ah=1→Al=0 REFINEMENT scans follow, exercising the
    # successive-approximation half of the progressive decoder. ---
    al1 = 1 if successive else 0
    coefs = []
    for c in range(ncomp):
        h, v = samp[c]
        coefs.append(
            [
                [
                    _fdct_quantized(
                        padded[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        quant,
                    )
                    for bx in range(mcu_cols * h)
                ]
                for by in range(mcu_rows * v)
            ]
        )

    def dc_scan(first: bool) -> bytes:
        """Interleaved DC scan: first pass codes (DC >> Al) diffs
        (arithmetic shift, T.81 G.1.2.1); refinement appends bit Al."""
        o = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp))
        for c in range(ncomp):
            o += bytes([c + 1, table_id(c) << 4])
        o += bytes([0, 0, (0 if first else 1) << 4 | (al1 if first else 0)])
        bw = _BitWriter()
        preds = [0] * ncomp
        mcu_n = 0
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                    rst(bw, mcu_n // restart_interval)
                    preds = [0] * ncomp
                mcu_n += 1
                for c in range(ncomp):
                    h, v = samp[c]
                    for by in range(v):
                        for bx in range(h):
                            dc = coefs[c][my * v + by][mx * h + bx][0]
                            if not first:
                                bw.write(dc & 1, 1)  # bit Al=0
                                continue
                            val = dc >> al1
                            diff = val - preds[c]
                            preds[c] = val
                            s = _category(diff)
                            if s > 11:
                                raise ValueError(
                                    "make_jpeg: DC difference out of range"
                                )
                            code, ln = dc_codes[s]
                            bw.write(code, ln)
                            if s:
                                bw.write(
                                    (diff if diff > 0 else diff + (1 << s) - 1)
                                    & ((1 << s) - 1),
                                    s,
                                )
        bw.flush()
        return bytes(o + bw.buf)

    def ac_scan(c: int, first: bool) -> bytes:
        """Single-component AC scan over the component's OWN dimensions
        (ceil(x·h/maxh)/8 blocks — T.81 A.2.2), NOT the MCU-padded
        grid; cross-block EOB-run accumulation in both passes."""
        h, v = samp[c]
        bw_ni = (-(-(width * h) // maxh) + 7) // 8
        bh_ni = (-(-(height * v) // maxv) + 7) // 8
        o = bytearray(b"\xff\xda" + struct.pack(">HB", 8, 1))
        o += bytes([c + 1, table_id(c)])  # Ta in the low nibble
        o += bytes([1, 63, (0 if first else 1) << 4 | (al1 if first else 0)])
        bw = _BitWriter()
        st = _EobState()
        blk_n = 0
        enc = _encode_ac_first_block if first else _encode_ac_refine_block
        for by in range(bh_ni):
            for bx in range(bw_ni):
                if restart_interval and blk_n and blk_n % restart_interval == 0:
                    _flush_eobrun(bw, st, ac_codes)
                    rst(bw, blk_n // restart_interval)
                blk_n += 1
                enc(bw, coefs[c][by][bx], 1, 63, al1 if first else 0,
                    ac_codes, st)
        _flush_eobrun(bw, st, ac_codes)
        bw.flush()
        return bytes(o + bw.buf)

    out += dc_scan(first=True)
    for c in range(ncomp):
        out += ac_scan(c, first=True)
    if successive:
        out += dc_scan(first=False)
        for c in range(ncomp):
            out += ac_scan(c, first=False)
    out += b"\xff\xd9"  # EOI
    return bytes(out)

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("truncated JPEG scan data")
        b = self.d[self.i]
        self.i += 1
        if b == 0xFF:
            if self.i < len(self.d) and self.d[self.i] == 0x00:
                self.i += 1  # stuffed 0xFF data byte
                return 0xFF
            raise ValueError("unexpected marker inside JPEG scan")
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 E.2.4)."""
        self.n = 0
        if (
            self.i + 1 < len(self.d)
            and self.d[self.i] == 0xFF
            and 0xD0 <= self.d[self.i + 1] <= 0xD7
        ):
            self.i += 2
        else:
            raise ValueError("missing JPEG restart marker")


def _decode_sym(br: _BitReader, lut: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in lut:
            return lut[(ln, code)]
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    br: _BitReader, dc_lut: dict, ac_lut: dict, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = _decode_sym(br, dc_lut)
    if s > 11:
        raise ValueError("corrupt JPEG DC category")
    diff = _extend(br.bits(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_sym(br, ac_lut)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        s = rs & 0x0F
        if k > 63 or s == 0 or s > 10:
            raise ValueError("corrupt JPEG AC run/size")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * qt
    block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
    return block, dc


#: id(lut) → (lut, 9-bit lookahead) — combined with _DHT_CACHE the
#: lookahead is built once per DISTINCT table, not once per image (the
#: dominant fixed cost on KB-scale payloads).  The stored lut reference
#: both keeps the id stable and guards against id reuse after GC.
_FAST_CACHE: dict[int, tuple] = {}


def _lookahead_for(lut: dict) -> list:
    """9-bit-prefix decode table: one list index replaces the per-bit
    canonical walk for every code ≤ 9 bits (all of them in our
    encoder's tables; the overwhelming majority in libjpeg's standard
    tables).  None → fall back to the walk."""
    ent = _FAST_CACHE.get(id(lut))
    if ent is not None and ent[0] is lut:
        return ent[1]
    fast: list = [None] * 512
    for (ln, code), sym in lut.items():
        if ln <= 9:
            base = code << (9 - ln)
            for suf in range(1 << (9 - ln)):
                fast[base | suf] = (sym, ln)
    if len(_FAST_CACHE) > 256:
        _FAST_CACHE.clear()
    _FAST_CACHE[id(lut)] = (lut, fast)
    return fast


def _decode_scan_baseline(
    data: bytes,
    scan_comps: list,
    dc_luts: dict,
    ac_luts: dict,
    qts: dict,
    restart_interval: int,
    mcu_rows: int,
    mcu_cols: int,
) -> list:
    """Fast path for the baseline interleaved scan: the entropy decode
    runs with an inline multi-byte bit accumulator (no per-bit method
    calls — the _BitReader abstraction costs ~5× in CPython) and the
    dequantize + IDCT runs ONCE per component as a batched (N×8×8)
    matmul instead of two 8×8 matmuls per block.  Semantics and error
    strings are identical to the per-block reference path
    (_BitReader/_decode_block, still used by the progressive walker);
    tests/test_codec_properties.py pins the two against each other via
    encode→decode roundtrips."""
    for comp, td, ta in scan_comps:
        if td not in dc_luts or ta not in ac_luts or comp["tq"] not in qts:
            raise ValueError("JPEG scan references undefined table")

    fast_tabs: dict[tuple, list] = {}
    # pre-split the scan on restart markers and unstuff 0xFF00 at C
    # speed (bytes.find / bytes.replace) — the per-byte Python stuffing
    # scan was the hottest line of the decoder.  marker_tail[i] records
    # whether segment i was terminated by a marker byte (an RSTn, or a
    # corrupt trailing lone 0xFF) so bit starvation reproduces the
    # reference reader's exact error strings.  _find_scan_end
    # guarantees the only 0xFF pairs inside are 0xFF00 and RSTn.
    segs: list[bytes] = []
    marker_tail: list[bool] = []
    n_raw = len(data)
    start = 0
    k = 0
    while True:
        k = data.find(b"\xff", k)
        if k < 0:
            segs.append(data[start:].replace(b"\xff\x00", b"\xff"))
            marker_tail.append(False)
            break
        if k + 1 >= n_raw:
            segs.append(data[start:k].replace(b"\xff\x00", b"\xff"))
            marker_tail.append(True)  # lone trailing 0xFF = marker byte
            break
        if data[k + 1] == 0x00:
            k += 2
            continue
        segs.append(data[start:k].replace(b"\xff\x00", b"\xff"))
        marker_tail.append(True)
        start = k + 2
        k += 2
    seg_i = 0
    seg = segs[0]
    slen = len(seg)
    pos = 0
    acc = 0  # invariant: acc < 2**nbits (only live bits kept)
    nbits = 0
    ncomp = len(scan_comps)
    blocks_per_mcu = sum(c["h"] * c["v"] for c, _, _ in scan_comps)
    total = mcu_rows * mcu_cols * blocks_per_mcu
    zzs = np.zeros((total, 64), dtype=np.float64)
    rows_i: list[list[int]] = [[] for _ in range(ncomp)]
    cols_i: list[list[int]] = [[] for _ in range(ncomp)]
    bidx: list[list[int]] = [[] for _ in range(ncomp)]
    preds = [0] * ncomp
    bi = 0
    mcu_n = 0

    def refill() -> tuple[int, int, int]:
        # top up from the CURRENT unstuffed segment, up to 6 bytes (48
        # bits) per call — one slice + int.from_bytes, all C-speed;
        # only restart() may cross a segment (= marker) boundary
        p = pos
        take = slen - p
        if take <= 0:
            return p, acc, nbits
        if take > 6:
            take = 6
        return (
            p + take,
            (acc << (8 * take)) | int.from_bytes(seg[p : p + take], "big"),
            nbits + 8 * take,
        )

    def starve() -> None:
        # out of bits: reproduce the reference reader's distinction —
        # stopped AT a marker vs ran off the end of the data
        if seg_i < len(segs) - 1 or marker_tail[seg_i]:
            raise ValueError("unexpected marker inside JPEG scan")
        raise ValueError("truncated JPEG scan data")

    for comp, td, ta in scan_comps:
        if ("d", td) not in fast_tabs:
            fast_tabs[("d", td)] = _lookahead_for(dc_luts[td])
        if ("a", ta) not in fast_tabs:
            fast_tabs[("a", ta)] = _lookahead_for(ac_luts[ta])

    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # byte-align (≤7 pad bits drop — whole unconsumed bytes
                # or leftover segment data mean the marker is NOT next,
                # exactly the reference reader's check) and step past
                # the pre-split RSTn (T.81 E.2.4)
                if nbits >= 8 or pos < slen or seg_i + 1 >= len(segs):
                    raise ValueError("missing JPEG restart marker")
                acc = 0
                nbits = 0
                seg_i += 1
                seg = segs[seg_i]
                slen = len(seg)
                pos = 0
                preds = [0] * ncomp
            for ci, (comp, td, ta) in enumerate(scan_comps):
                dc_lut = dc_luts[td]
                ac_lut = ac_luts[ta]
                dc_fast = fast_tabs[("d", td)]
                ac_fast = fast_tabs[("a", ta)]
                v_samp = comp["v"]
                h_samp = comp["h"]
                for by in range(v_samp):
                    for bx in range(h_samp):
                        zrow = zzs[bi]
                        # --- DC symbol (lookahead, walk fallback) ---
                        k = 0
                        lut = dc_lut
                        fast = dc_fast
                        while True:  # two passes: DC then AC coefficients
                            if nbits < 9:
                                pos, acc, nbits = refill()
                            hit = (
                                fast[acc >> (nbits - 9)]
                                if nbits >= 9
                                else None
                            )
                            if hit is not None:
                                sym, ln = hit
                                nbits -= ln
                                acc &= (1 << nbits) - 1
                            else:
                                code = 0
                                ln = 0
                                sym = -1
                                while ln < 16:
                                    if nbits == 0:
                                        pos, acc, nbits = refill()
                                        if nbits == 0:
                                            starve()
                                    ln += 1
                                    nbits -= 1
                                    code = (code << 1) | (acc >> nbits)
                                    acc &= (1 << nbits) - 1
                                    sym = lut.get((ln, code), -1)
                                    if sym >= 0:
                                        break
                                if sym < 0:
                                    raise ValueError("invalid JPEG huffman code")
                            if lut is dc_lut:
                                if sym > 11:
                                    raise ValueError("corrupt JPEG DC category")
                                if sym:
                                    if nbits < sym:
                                        pos, acc, nbits = refill()
                                        if nbits < sym:
                                            starve()
                                    nbits -= sym
                                    v = acc >> nbits
                                    acc &= (1 << nbits) - 1
                                    diff = (
                                        v
                                        if v >= (1 << (sym - 1))
                                        else v - (1 << sym) + 1
                                    )
                                else:
                                    diff = 0
                                preds[ci] += diff
                                zrow[0] = preds[ci]
                                k = 1
                                lut = ac_lut
                                fast = ac_fast
                                continue
                            # --- AC run/size ---
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                if k < 64:
                                    continue
                                break
                            k += sym >> 4
                            s = sym & 0x0F
                            if k > 63 or s == 0 or s > 10:
                                raise ValueError("corrupt JPEG AC run/size")
                            if nbits < s:
                                pos, acc, nbits = refill()
                                if nbits < s:
                                    starve()
                            nbits -= s
                            v = acc >> nbits
                            acc &= (1 << nbits) - 1
                            zrow[k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
                            k += 1
                            if k >= 64:
                                break
                        rows_i[ci].append(my * v_samp + by)
                        cols_i[ci].append(mx * h_samp + bx)
                        bidx[ci].append(bi)
                        bi += 1
            mcu_n += 1

    planes = []
    for ci, (comp, _td, _ta) in enumerate(scan_comps):
        qt = qts[comp["tq"]]
        r8 = mcu_rows * comp["v"]
        c8 = mcu_cols * comp["h"]
        z = zzs[np.array(bidx[ci], dtype=np.int64)]
        nat = np.empty_like(z)
        nat[:, ZIGZAG] = z * qt[None, :]
        blocks = _A.T @ nat.reshape(-1, 8, 8) @ _A + 128.0
        plane = np.zeros((r8 * 8, c8 * 8))
        view = plane.reshape(r8, 8, c8, 8).swapaxes(1, 2)
        view[
            np.array(rows_i[ci], dtype=np.int64),
            np.array(cols_i[ci], dtype=np.int64),
        ] = blocks
        planes.append(plane)
    return planes


def _parse_dqt(body: bytes, qts: dict) -> None:
    """DQT segment — possibly several tables per segment (the ONE place
    the pq=0/1 precision rules live, shared by both decoders)."""
    j = 0
    while j < len(body):
        pq, tq = body[j] >> 4, body[j] & 0x0F
        j += 1
        if pq == 0:
            qts[tq] = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(
                np.float64
            )
            j += 64
        elif pq == 1:
            qts[tq] = np.frombuffer(body[j : j + 128], dtype=">u2").astype(
                np.float64
            )
            j += 128
        else:
            raise ValueError("corrupt JPEG DQT precision")


#: DHT-bytes → decode dict cache: a 100 TB corpus overwhelmingly ships
#: ONE encoder's tables, so per-image table construction (and the fast
#: lookahead built from the same dict object downstream) amortizes to a
#: dict hit.  Bounded; values are read-only after construction.
_DHT_CACHE: dict[bytes, dict] = {}


def _parse_dht(body: bytes, dc_luts: dict, ac_luts: dict) -> None:
    """DHT segment — possibly several tables per segment (shared)."""
    j = 0
    while j < len(body):
        tc, th = body[j] >> 4, body[j] & 0x0F
        bits = list(body[j + 1 : j + 17])
        nv = sum(bits)
        key = bytes(body[j : j + 17 + nv])
        lut = _DHT_CACHE.get(key)
        if lut is None:
            vals = list(body[j + 17 : j + 17 + nv])
            lut = _canonical_lut(bits, vals)
            if len(_DHT_CACHE) > 256:
                _DHT_CACHE.clear()
            _DHT_CACHE[key] = lut
        (dc_luts if tc == 0 else ac_luts)[th] = lut
        j += 17 + nv


def _parse_sof_body(body: bytes) -> tuple[int, int, list[dict]]:
    """SOF frame header → (height, width, comps); the 8-bit / 1-or-3
    components / ≤2×2 sampling gates live HERE, shared by the baseline
    and progressive decoders so the two cannot drift."""
    if len(body) < 6:
        raise ValueError("malformed JPEG SOF header")
    if body[0] != 8:
        raise ValueError("only 8-bit JPEG precision supported")
    height, width = struct.unpack(">HH", body[1:5])
    ncomp = body[5]
    if ncomp not in (1, 3):
        raise ValueError("only greyscale / YCbCr JPEG supported")
    if len(body) < 6 + 3 * ncomp:
        raise ValueError("malformed JPEG SOF header")
    comps = []
    for c in range(ncomp):
        cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
        h, v = hv >> 4, hv & 0x0F
        if not (1 <= h <= 2 and 1 <= v <= 2):
            raise ValueError("JPEG sampling factors above 2 unsupported")
        comps.append({"id": cid, "h": h, "v": v, "tq": tq})
    return height, width, comps


def jpeg_pixels(payload: bytes):
    """Full baseline-JPEG pixel decode: parse DQT/SOF0/DHT/DRI/SOS,
    Huffman-decode the MCU stream (byte unstuffing, restart markers,
    DC prediction), dequantize, inverse-DCT each block, replicate
    chroma up to full resolution, and convert YCbCr→RGB.  Returns
    (width, height, channels, H×W×C uint8).  Anything outside 8-bit
    baseline sequential raises ValueError (quarantine semantics)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG segment stream")
        # optional 0xFF fill bytes are legal padding before any marker
        # (ITU T.81 B.1.1.2) — skip them instead of quarantining
        while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(payload):
            break
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seg_len]
        if len(body) < seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            height, width, comps = _parse_sof_body(body)
        elif marker == 0xC2:  # progressive — own multi-scan walker
            return _jpeg_pixels_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline-sequential / progressive JPEG supported "
                "(arithmetic/hierarchical/lossless need no more maths, "
                "just more code)"
            )
        elif marker == 0xC4:
            _parse_dht(body, dc_luts, ac_luts)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("malformed JPEG DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if not body:
                raise ValueError("malformed JPEG SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("malformed JPEG SOS header")
            if ns != len(comps):
                # a legal baseline stream MAY carry one scan per
                # component (non-interleaved); decoding only the first
                # scan would silently return Y as a grayscale image
                raise ValueError(
                    "non-interleaved multi-scan JPEG unsupported "
                    "(SOS component count != SOF component count)"
                )
            scan_comps = []
            for c in range(ns):
                cid, tda = body[1 + 2 * c : 3 + 2 * c]
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    raise ValueError(
                        "JPEG SOS references an undeclared component"
                    )
                scan_comps.append((comp, tda >> 4, tda & 0x0F))
            # scan data runs from after this segment to the next real
            # marker (stuffed 0xFF00 and RSTn stay inside)
            j = i + 2 + seg_len
            scan = (scan_comps, payload[j : _find_scan_end(payload, j)])
            break
        i += 2 + seg_len

    if scan is None or width is None:
        raise ValueError("JPEG missing SOF/SOS")
    scan_comps, data = scan
    maxh = max(c["h"] for c, _, _ in scan_comps)
    maxv = max(c["v"] for c, _, _ in scan_comps)
    mcu_cols = (width + 8 * maxh - 1) // (8 * maxh)
    mcu_rows = (height + 8 * maxv - 1) // (8 * maxv)
    planes = _decode_scan_baseline(
        data, scan_comps, dc_luts, ac_luts, qts,
        restart_interval, mcu_rows, mcu_cols,
    )

    return _assemble_image(
        [(c["h"], c["v"]) for c, _, _ in scan_comps], planes, width, height
    )


def _assemble_image(samp, planes, width: int, height: int):
    """Shared decode tail (baseline + progressive): nearest-neighbor
    chroma upsampling (libjpeg -nosmooth), crop to the frame, and
    YCbCr→RGB for 3 components."""
    maxh = max(h for h, _ in samp)
    maxv = max(v for _, v in samp)
    full = []
    for (h, v), p in zip(samp, planes):
        if h < maxh:
            p = np.repeat(p, maxh // h, axis=1)
        if v < maxv:
            p = np.repeat(p, maxv // v, axis=0)
        full.append(p[:height, :width])

    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, gray[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, b], axis=2)
    return width, height, 3, np.clip(np.rint(px), 0, 255).astype(np.uint8)


def _find_scan_end(payload: bytes, j: int) -> int:
    """End of an entropy-coded segment starting at ``j``: the next real
    marker (stuffed 0xFF00 and RSTn stay inside); a stream lacking a
    trailing EOI keeps its final entropy byte."""
    k = j
    n = len(payload)
    while True:
        k = payload.find(b"\xff", k)
        if k < 0 or k + 1 >= n:
            return n  # trailing lone 0xFF keeps its entropy byte
        nxt = payload[k + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return k
        k += 2


def _jpeg_pixels_progressive(payload: bytes):
    """Progressive-JPEG decode for the SPECTRAL-SELECTION subset (T.81
    G.1 with Ah=0): any number of scans accumulate DCT coefficients —
    an interleaved or single-component DC scan, then per-component AC
    band scans with EOB-run coding — and the IDCT runs once at the end.
    Al (point transform) shifts first-scan values; successive-
    approximation REFINEMENT scans (Ah>0) raise ValueError (the stream
    quarantines — fail-closed, never a misdecode).  Restart intervals
    reset predictors and EOB runs in every scan kind."""
    qts: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    coef: list[np.ndarray] = []  # per comp: (pbh, pbw, 64) zigzag ints
    pdims: list[tuple[int, int]] = []  # MCU-padded block dims
    ndims: list[tuple[int, int]] = []  # non-interleaved block dims
    mcu_rows = mcu_cols = maxh = maxv = 0
    any_scan = False

    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG segment stream")
        while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1  # 0xFF fill bytes (T.81 B.1.1.2)
        if i + 4 > len(payload):
            break
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seg_len]
        if len(body) < seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker == 0xC4:
            _parse_dht(body, dc_luts, ac_luts)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("malformed JPEG DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC2:  # SOF2
            if comps:
                raise ValueError("multiple JPEG frame headers")
            height, width, comps = _parse_sof_body(body)
            maxh = max(c["h"] for c in comps)
            maxv = max(c["v"] for c in comps)
            mcu_cols = (width + 8 * maxh - 1) // (8 * maxh)
            mcu_rows = (height + 8 * maxv - 1) // (8 * maxv)
            for c in comps:
                pbh, pbw = mcu_rows * c["v"], mcu_cols * c["h"]
                pdims.append((pbh, pbw))
                ndims.append(
                    (
                        (-(-(height * c["v"]) // maxv) + 7) // 8,
                        (-(-(width * c["h"]) // maxh) + 7) // 8,
                    )
                )
                coef.append(np.zeros((pbh, pbw, 64), dtype=np.int32))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported JPEG frame type")
        elif marker == 0xDA:  # SOS — one progressive scan
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            if not body:
                raise ValueError("malformed JPEG SOS header")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("malformed JPEG SOS header")
            scan_comps = []  # (comp index, td, ta)
            for c in range(ns):
                cid, tda = body[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    (x for x, cc in enumerate(comps) if cc["id"] == cid), None
                )
                if ci is None:
                    raise ValueError("JPEG SOS references an undeclared component")
                scan_comps.append((ci, tda >> 4, tda & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if ss > se or se > 63:
                raise ValueError("corrupt progressive spectral selection")
            j = i + 2 + seg_len
            end = _find_scan_end(payload, j)
            br = _BitReader(payload[j:end])
            if ah == 0:
                _decode_prog_scan(
                    br, coef, comps, scan_comps, ss, se, al,
                    dc_luts, ac_luts, restart_interval,
                    mcu_rows, mcu_cols, ndims,
                )
            else:
                _decode_prog_refine(
                    br, coef, comps, scan_comps, ss, se, al,
                    ac_luts, restart_interval, mcu_rows, mcu_cols, ndims,
                )
            any_scan = True
            i = end
            continue
        i += 2 + seg_len

    if not any_scan or width is None:
        raise ValueError("JPEG missing SOF/SOS")

    planes = []
    for c, comp in enumerate(comps):
        if comp["tq"] not in qts:
            raise ValueError("JPEG scan references undefined table")
        qt = qts[comp["tq"]]
        pbh, pbw = pdims[c]
        plane = np.empty((pbh * 8, pbw * 8))
        for by in range(pbh):
            for bx in range(pbw):
                cf = np.zeros(64, dtype=np.float64)
                cf[ZIGZAG] = coef[c][by, bx].astype(np.float64) * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ cf.reshape(8, 8) @ _A + 128.0
                )
        planes.append(plane)
    return _assemble_image(
        [(c["h"], c["v"]) for c in comps], planes, width, height
    )


def _decode_prog_scan(
    br: _BitReader,
    coef: list[np.ndarray],
    comps: list[dict],
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    al: int,
    dc_luts: dict,
    ac_luts: dict,
    restart_interval: int,
    mcu_rows: int,
    mcu_cols: int,
    ndims: list[tuple[int, int]],
) -> None:
    """Decode ONE first-pass progressive scan (Ah=0) into the
    coefficient arrays: DC scans (Ss=0) run MCU-interleaved (ns>1) or
    block-raster (ns=1) with the usual DC prediction; AC scans (Ss≥1,
    ns must be 1) run block-raster over the component's own dimensions
    with EOB-run coding.  Values shift left by Al (point transform)."""
    if ss == 0:
        if se != 0:
            raise ValueError(
                "corrupt progressive DC scan (Se must be 0 when Ss is 0)"
            )
        preds = [0] * len(scan_comps)
        for si, (ci, td, _) in enumerate(scan_comps):
            if td not in dc_luts:
                raise ValueError("JPEG scan references undefined table")
        if len(scan_comps) > 1:  # interleaved MCU order
            mcu_n = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                        br.restart()
                        preds = [0] * len(scan_comps)
                    mcu_n += 1
                    for si, (ci, td, _) in enumerate(scan_comps):
                        h, v = comps[ci]["h"], comps[ci]["v"]
                        for by in range(v):
                            for bx in range(h):
                                s = _decode_sym(br, dc_luts[td])
                                if s > 11:
                                    raise ValueError("corrupt JPEG DC category")
                                diff = _extend(br.bits(s), s) if s else 0
                                preds[si] += diff
                                coef[ci][my * v + by, mx * h + bx, 0] = (
                                    preds[si] << al
                                )
        else:
            ci, td, _ = scan_comps[0]
            nbh, nbw = ndims[ci]
            blk_n = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and blk_n and blk_n % restart_interval == 0:
                        br.restart()
                        preds = [0]
                    blk_n += 1
                    s = _decode_sym(br, dc_luts[td])
                    if s > 11:
                        raise ValueError("corrupt JPEG DC category")
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[0] += diff
                    coef[ci][by, bx, 0] = preds[0] << al
        return

    if len(scan_comps) != 1:
        raise ValueError(
            "corrupt progressive AC scan (must be single-component)"
        )
    ci, _, ta = scan_comps[0]
    if ta not in ac_luts:
        raise ValueError("JPEG scan references undefined table")
    lut = ac_luts[ta]
    nbh, nbw = ndims[ci]
    eobrun = 0
    blk_n = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and blk_n and blk_n % restart_interval == 0:
                br.restart()
                eobrun = 0
            blk_n += 1
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_sym(br, lut)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL — sixteen zeros inside the band
                        k += 16
                        if k > se + 1:
                            raise ValueError("corrupt progressive AC run")
                        continue
                    eobrun = (1 << r) - 1  # EOBn: this block + eobrun more
                    if r:
                        eobrun += br.bits(r)
                    break
                k += r
                if k > se or s > 10:
                    raise ValueError("corrupt progressive AC run/size")
                coef[ci][by, bx, k] = _extend(br.bits(s), s) << al
                k += 1


def _refine_nonzero(br: _BitReader, blk: np.ndarray, k: int, p1: int) -> None:
    """One correction bit for a nonzero-history coefficient (T.81
    G.1.2.3): if the bit is set and bit Al is not already set, move the
    magnitude up one step TOWARD its sign."""
    if br.bit():
        if not (int(blk[k]) & p1):
            blk[k] += p1 if blk[k] >= 0 else -p1


def _decode_prog_refine(
    br: _BitReader,
    coef: list[np.ndarray],
    comps: list[dict],
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    al: int,
    ac_luts: dict,
    restart_interval: int,
    mcu_rows: int,
    mcu_cols: int,
    ndims: list[tuple[int, int]],
) -> None:
    """Decode ONE successive-approximation REFINEMENT scan (Ah>0): DC
    refinement appends bit Al of every DC coefficient (1 bit/block, no
    prediction); AC refinement interleaves newly-nonzero coefficients
    (size-1 symbols, run counts ZERO-history positions only) with
    correction bits for every nonzero-history coefficient crossed — the
    T.81 G.1.2.3 algorithm.  Blocks inside an EOB run still read one
    correction bit per nonzero-history coefficient in the band."""
    p1 = 1 << al
    if ss == 0:  # DC refinement
        if se != 0:
            raise ValueError(
                "corrupt progressive DC scan (Se must be 0 when Ss is 0)"
            )
        if len(scan_comps) > 1:  # interleaved MCU order
            mcu_n = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                        br.restart()
                    mcu_n += 1
                    for ci, _, _ in scan_comps:
                        h, v = comps[ci]["h"], comps[ci]["v"]
                        for by in range(v):
                            for bx in range(h):
                                if br.bit():
                                    coef[ci][my * v + by, mx * h + bx, 0] = (
                                        int(coef[ci][my * v + by, mx * h + bx, 0])
                                        | p1
                                    )
        else:
            ci = scan_comps[0][0]
            nbh, nbw = ndims[ci]
            blk_n = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and blk_n and blk_n % restart_interval == 0:
                        br.restart()
                    blk_n += 1
                    if br.bit():
                        coef[ci][by, bx, 0] = int(coef[ci][by, bx, 0]) | p1
        return

    if len(scan_comps) != 1:
        raise ValueError(
            "corrupt progressive AC scan (must be single-component)"
        )
    ci, _, ta = scan_comps[0]
    if ta not in ac_luts:
        raise ValueError("JPEG scan references undefined table")
    lut = ac_luts[ta]
    nbh, nbw = ndims[ci]
    eobrun = 0
    blk_n = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and blk_n and blk_n % restart_interval == 0:
                br.restart()
                eobrun = 0
            blk_n += 1
            blk = coef[ci][by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_sym(br, lut)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:  # EOBn — rest of band is corrections
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "corrupt progressive refinement size"
                            )
                        newval = p1 if br.bit() else -p1
                    # advance r zero-history positions, refining every
                    # nonzero-history coefficient crossed on the way
                    while k <= se:
                        if blk[k] != 0:
                            _refine_nonzero(br, blk, k, p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if k > se and (newval or s):
                        raise ValueError("corrupt progressive AC run")
                    if newval:
                        blk[k] = newval
                    k += 1
            else:
                eobrun -= 1
            # EOB-run (or post-EOBn) tail: one correction bit per
            # remaining nonzero-history coefficient in the band
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(br, blk, k, p1)
                k += 1


class _EobState:
    """Cross-block EOB-run accumulator for progressive AC scans: ``run``
    counts blocks whose band ended early; ``bits`` holds the correction
    bits (refinement scans) that belong to those blocks and must follow
    the EOBn code."""

    def __init__(self) -> None:
        self.run = 0
        self.bits: list[int] = []


def _flush_eobrun(bw: _BitWriter, st: _EobState, ac_codes: dict) -> None:
    if st.run:
        nbits = st.run.bit_length() - 1
        code, ln = ac_codes[nbits << 4]  # EOBn symbol (r<<4)|0
        bw.write(code, ln)
        if nbits:
            bw.write(st.run - (1 << nbits), nbits)
        st.run = 0
    for b in st.bits:
        bw.write(b, 1)
    st.bits = []


def _encode_ac_first_block(
    bw: _BitWriter,
    zz: list[int],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
    st: _EobState,
) -> None:
    """One block of a progressive AC FIRST scan (Ah=0): run/size coding
    of the point-transformed band (sign·(|v|>>Al), T.81 G.1.2.2) with
    cross-block EOB-run accumulation."""
    vals = [0] * (se + 1)
    last_nz = ss - 1
    for i in range(ss, se + 1):
        v = int(zz[i])
        a = abs(v) >> al
        vals[i] = a if v >= 0 else -a
        if vals[i]:
            last_nz = i
    if last_nz < ss:  # whole band zero at this precision → join EOB run
        st.run += 1
        if st.run == 0x7FFF:
            _flush_eobrun(bw, st, ac_codes)
        return
    _flush_eobrun(bw, st, ac_codes)
    run = 0
    for i in range(ss, last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("make_jpeg: AC coefficient out of range")
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write((v if v > 0 else v + (1 << s) - 1) & ((1 << s) - 1), s)
        run = 0
    if last_nz < se:
        st.run += 1
        if st.run == 0x7FFF:
            _flush_eobrun(bw, st, ac_codes)


def _encode_ac_refine_block(
    bw: _BitWriter,
    zz: list[int],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
    st: _EobState,
) -> None:
    """One block of a progressive AC REFINEMENT scan (Ah=Al+1): size-1
    symbols for newly-nonzero coefficients with runs counting only
    zero-history positions, one buffered correction bit per
    nonzero-history coefficient, cross-block EOB runs — T.81 G.1.2.3
    (the spec's figure G.7 bookkeeping: ZRLs flush at the FIRST nonzero
    position once r>15, before that position's own bit is buffered)."""
    t = [0] * (se + 1)
    eob = ss - 1
    for k in range(ss, se + 1):
        t[k] = abs(int(zz[k])) >> al
        if t[k] == 1:
            eob = k  # last NEWLY-nonzero coefficient
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        a = t[k]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(bw, st, ac_codes)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if a > 1:  # previously nonzero — correction bit only
            br_bits.append(a & 1)
            continue
        _flush_eobrun(bw, st, ac_codes)
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(zz[k]) < 0 else 1, 1)
        r = 0
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
    if r > 0 or br_bits:  # band ends in zeros/corrections → EOB run
        st.run += 1
        st.bits.extend(br_bits)
        if st.run == 0x7FFF or len(st.bits) > 900:
            _flush_eobrun(bw, st, ac_codes)
