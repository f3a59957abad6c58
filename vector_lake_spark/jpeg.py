"""Baseline JPEG codec — pure stdlib + numpy, no PIL/opencv.

Closes the last "DCT codecs are environment-gated" gap
(`multimodal._decode_image`) the honest way PNG was closed in r06:
implement the subset for real and gate the rest loudly. Scope:

- **Decoder** (`decode_jpeg_pixels`): baseline sequential DCT (SOF0)
  AND progressive DCT (SOF2, r07 — full spectral selection +
  successive approximation per T.81 Annex G: DC first/refine, AC first
  with EOB runs, AC refine with correction bits), 8-bit, 1 or 3
  components, sampling factors 1..4 with integer upsampling ratios —
  4:4:4, 4:2:2, 4:2:0 (the camera default) and 4:1:1 (the DV tape
  format) all decode, with nearest-neighbor chroma upsampling;
  DRI/RSTn restart intervals honored. Marker walk → DQT/DHT/SOF/SOS
  parse → bit-unstuffed Huffman decode (table-driven from the file's
  own DHT segments) → dequant → 2-D IDCT (orthonormal DCT matrix —
  exactly JPEG's Annex A definition) → level shift → YCbCr→RGB.
  EXTENDED SEQUENTIAL (SOF1) decodes at 8- AND 12-bit precision (r09:
  level shift 2048, 16-bit DQT entries, widened amplitude categories,
  uint16 output — the medical/scanned-archive variant), and SOF2
  progressive decodes at BOTH precisions too (12-bit progressive
  landed later in r09 — the same four Annex G scan decoders over the
  widened categories), and LOSSLESS (SOF3, Annex H DPCM — late r09)
  decodes at precision 2..16 with all seven predictors, the one JPEG
  process whose round trip is exact on arbitrary content. Anything
  outside the subset (arithmetic coding, differential processes,
  fractional chroma-upsampling ratios) raises NotImplementedError
  naming the feature.
- **Encoders** (`encode_jpeg` baseline, `encode_jpeg_progressive`
  SOF2 with both spectral selection and successive approximation),
  used by the tests so exactness can be proven without a reference
  binary (`subsample=True` writes 4:2:0 with 2×2-averaged chroma):
  both ends are this module, so a constant-gray image at the all-ones
  quant table must round-trip EXACTLY (DC-only blocks are integer
  arithmetic end-to-end), smooth images must round-trip above a PSNR
  floor, and — because both encoders quantize identically — the
  progressive and baseline decodes of the same image must agree
  pixel-for-pixel at every quality. Huffman tables are written
  per-file as simple canonical fixed-length codes (any prefix code is
  a valid DHT; optimal tables buy compression, not correctness).

At 100 TB the decode runs inside the same Arrow `mapInPandas` operator
shape as BMP/PNG (`multimodal.extract_jpeg_features`): payloads stay an
opaque binary column, the scan projects (id, payload) only, and decoder
memory is bounded by the Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

# Annex K luminance/chrominance quantization tables (quality 50 base).
LUM_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
CHR_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> list[tuple[int, int]]:
    """The standard zigzag scan, generated (not transcribed): diagonal s
    runs (0,s)→(s,0) for odd s and (s,0)→(0,s) for even s."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(diag)
    return order


ZIGZAG = _zigzag_order()
# flat (row*8 + col) zigzag gather indices for the encoders' hot path
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.int64)

# Orthonormal DCT-II matrix: C @ B @ C.T == JPEG Annex A FDCT exactly.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C[0, :] *= np.sqrt(1.0 / 8.0)
_C[1:, :] *= np.sqrt(2.0 / 8.0)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → base tables, 100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# Fixed-length canonical Huffman tables (written into every file's DHT;
# the decoder is table-driven, so simplicity costs bits, not bugs).
DC_SYMBOLS = list(range(12))  # categories 0..11, all 4-bit codes
AC_SYMBOLS = sorted(
    {0x00, 0xF0}
    | {(run << 4) | size for run in range(16) for size in range(1, 11)}
)  # EOB, ZRL, and every (run, size) — 162 symbols, all 8-bit codes


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (i, length) for i, sym in enumerate(symbols)}


DC_CODES = _canonical_codes(DC_SYMBOLS, 4)
AC_CODES = _canonical_codes(AC_SYMBOLS, 8)

# 12-bit extended sequential widens the amplitude categories (T.81
# tables F.6/F.8): DC diffs reach category 15, AC sizes reach 14. The
# 16 DC symbols move to 5-bit codes (16 4-bit codes would be a complete
# code whose all-ones word Annex C reserves); the 226 AC symbols still
# fit 8-bit codes.
DC_SYMBOLS_12 = list(range(16))
AC_SYMBOLS_12 = sorted(
    {0x00, 0xF0}
    | {(run << 4) | size for run in range(16) for size in range(1, 15)}
)
DC_CODES_12 = _canonical_codes(DC_SYMBOLS_12, 5)
AC_CODES_12 = _canonical_codes(AC_SYMBOLS_12, 8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _emit_block(
    bw: _BitWriter, qf, pred_dc: int, dc_codes: dict, ac_codes: dict,
    max_ac: int,
) -> int:
    """Entropy-emit one PRE-QUANTIZED zigzag block (r13: the FDCT/
    quantize half moved to the batched ``_quantized_planes``; this is
    ``_encode_block``'s emission tail visiting only the NONZERO AC
    slots — zero runs come from index gaps. Byte-identical to the
    verbatim ``_encode_block`` below, pinned in tests/test_jpeg.py)."""
    dc = int(qf[0])
    diff = dc - pred_dc
    size = _category(diff)
    if size not in dc_codes:
        raise ValueError(f"DC difference {diff} out of range")
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude(diff, size), size)
    nz = np.flatnonzero(qf[1:])
    prev = -1
    for j in nz.tolist():
        run = j - prev - 1
        prev = j
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        v = int(qf[1 + j])
        size = _category(v)
        if size > max_ac:
            raise ValueError(f"AC coefficient {v} out of range")
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude(v, size), size)
    if (int(nz[-1]) if nz.size else -1) < 62:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtbl: np.ndarray, pred_dc: int,
    half: float = 128.0, dc_codes: dict = DC_CODES,
    ac_codes: dict = AC_CODES, max_ac: int = 10,
) -> int:
    # r13: no longer on the encode path (kept VERBATIM as the per-block
    # FDCT+emission reference for the byte-identity pin in
    # tests/test_jpeg.py::test_sequential_encoder_matches_per_block_reference)
    coef = np.round(_C @ (block - half) @ _C.T)
    q = (coef / qtbl).round().astype(np.int64)
    # zigzag via one fancy-indexed gather + tolist (r12, guide §4.2):
    # q is already int64, so the reorder is pure integer movement —
    # bit-identical to the per-cell int(q[r, c]) walk it replaces,
    # which profiled at a third of encode time (63 numpy scalar reads
    # + int() conversions per block)
    qf = q.reshape(64)[_ZZ_FLAT]
    dc = int(qf[0])
    diff = dc - pred_dc
    size = _category(diff)
    if size not in dc_codes:
        raise ValueError(f"DC difference {diff} out of range")
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude(diff, size), size)
    zz = qf[1:].tolist()
    run = 0
    nz = np.flatnonzero(qf[1:])
    last_nonzero = int(nz[-1]) if nz.size else -1
    for i, v in enumerate(zz):
        if i > last_nonzero:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        if size > max_ac:
            raise ValueError(f"AC coefficient {v} out of range")
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude(v, size), size)
        run = 0
    # EOB only when the block does NOT fill through the last AC slot
    # (index 62 of the 63 ACs) — the decoder exits at k == 64 on its own
    # there, and a spurious EOB would desynchronize the stream
    if last_nonzero < 62:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _pad_replicate(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]  # edge-replicate padding
    pp[:, w:] = pp[:, w - 1 : w]
    return pp



# subsampling modes: luma factors; chroma is always (1, 1). True keeps
# the historical 4:2:0 meaning.
_SUBSAMPLE_LUMA = {
    False: (1, 1), True: (2, 2), "420": (2, 2), "422": (2, 1),
    "411": (4, 1),
}


def _subsample_factors(subsample, gray):
    if subsample not in _SUBSAMPLE_LUMA:
        raise ValueError(
            f"subsample must be False/True/'420'/'422'/'411', "
            f"got {subsample!r}"
        )
    if gray:
        return [(1, 1)]
    lh, lv = _SUBSAMPLE_LUMA[subsample]
    return [(lh, lv), (1, 1), (1, 1)]


def _chroma_average(p, h, w, fh, fv):
    """fh x fv box-average of a chroma plane (pad-then-mean) — shared
    by BOTH encoders so progressive==baseline stays bit-identical."""
    ph = -(-h // fv) * fv
    pw = -(-w // fh) * fh
    p = _pad_replicate(p, ph, pw)
    return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode a uint8 array — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JFIF JPEG: 4:4:4 by default, 4:2:0 (2×2-averaged chroma,
    the format virtually every camera writes) with ``subsample=True``.
    ``restart_interval=n`` emits a DRI segment and an RSTm marker every
    n MCUs (DC predictors reset, stream re-byte-aligned) — the
    error-resilience feature most camera files carry. ``precision=12``
    writes an EXTENDED SEQUENTIAL (SOF1) file from uint16 samples in
    0..4095 — level shift 2048, the widened T.81 amplitude categories
    (DC to 15, AC to 14) — the medical/scanned-archive variant."""
    px = np.asarray(pixels)
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 8:
        if px.dtype != np.uint8:
            raise ValueError("pixels must be uint8")
    else:
        if px.dtype != np.uint16:
            raise ValueError("12-bit pixels must be uint16")
        if px.max(initial=0) > 4095:
            raise ValueError("12-bit samples exceed 4095")
    half = float(1 << (precision - 1))
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image")
    if subsample not in _SUBSAMPLE_LUMA:
        raise ValueError(
            f"subsample must be False/True/'420'/'422'/'411', "
            f"got {subsample!r}"
        )
    if gray:
        subsample = False

    # r13 (guide §4.2): the FDCT/quantize front half is the shared
    # batched `_quantized_planes` (one stacked matmul per plane — same
    # pairwise contraction order as the old per-block matmul, which the
    # progressive==sequential equality tests already pin), so the MCU
    # loop below only EMITS precomputed zigzag coefficients. Full-file
    # byte identity vs the old per-block encoder is pinned across the
    # gray/RGB × 8/12-bit × subsample × restart × quality matrix in
    # tests/test_jpeg.py.
    _h2, _w2, samp, qtbls, coefs = _quantized_planes(
        px, quality, subsample, precision
    )
    ncomp = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    if precision == 8:  # JFIF declares 8-bit samples; 12-bit files omit it
        out += (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0)
        )
    for tq, tbl in enumerate(qtbls):
        zz = bytes(int(tbl[r, c]) for r, c in ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    dc_syms, dc_len = (
        (DC_SYMBOLS, 4) if precision == 8 else (DC_SYMBOLS_12, 5)
    )
    ac_syms = AC_SYMBOLS if precision == 8 else AC_SYMBOLS_12
    out += _dht_segment(0, 0, dc_syms, dc_len)
    out += _dht_segment(1, 0, ac_syms, 8)
    if not gray:
        out += _dht_segment(0, 1, dc_syms, dc_len)
        out += _dht_segment(1, 1, ac_syms, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    pred = [0] * ncomp
    mcu_no = 0
    rst = 0
    dc_codes = DC_CODES if precision == 8 else DC_CODES_12
    ac_codes = AC_CODES if precision == 8 else AC_CODES_12
    max_ac = 10 if precision == 8 else 14
    for by in range(mcus_y):
        for bx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                out += bw.flush()  # byte-align with 1-padding
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            mcu_no += 1
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        pred[ci] = _emit_block(
                            bw,
                            coefs[ci][by * vi + vy, bx * hi + vx],
                            pred[ci], dc_codes, ac_codes, max_ac,
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy stream with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # truncate consumed history FIRST: without the mask, acc grows
        # into a bigint spanning the whole scan and every shift becomes
        # O(stream) — quadratic decode (caught in r07 profiling)
        self.acc &= (1 << self.nbits) - 1
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xD9:  # EOI — the pad bits ran out; feed 1s
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy stream"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if self.nbits < n:  # bulk fill, then slice once
            while self.nbits < n:
                self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def sync_restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker between restart
        intervals: drop pad bits, expect 0xFFD0+n."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"expected restart marker RST{n} at byte {self.pos}, "
                f"found 0x{self.data[self.pos]:02X}{self.data[self.pos+1]:02X}"
            )
        self.pos += 2


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[int, int]:
    """Canonical JPEG Huffman, keyed by the sentinel-prefixed code
    (1 << length) | code — unique across lengths, so the decode loop
    probes one small-int key per bit instead of building a tuple."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(1 << length) | code] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[int, int]) -> int:
    # hot path: walk the accumulator bits inline — a read_bit() call per
    # bit costs more than the table probe itself. (r12 negative result:
    # an 8-bit peek table guarded on nbits >= 8 measured SLOWER — the
    # windowed reader fills one byte at a time, so the buffer rarely
    # holds 8 bits and the probe was pure overhead; eager pre-filling is
    # not an option because a fill that crosses the last code of a
    # restart interval would hit the RSTn marker and raise.)
    code = 1
    acc, nbits = br.acc, br.nbits
    for _ in range(16):
        if nbits == 0:
            br.nbits = 0
            br._fill()
            acc, nbits = br.acc, br.nbits
        nbits -= 1
        code = (code << 1) | ((acc >> nbits) & 1)
        sym = table.get(code)
        if sym is not None:
            br.acc, br.nbits = acc, nbits
            return sym
    br.acc, br.nbits = acc, nbits
    raise ValueError("invalid Huffman code in entropy stream")


def _huff_lut16_lists(bits, vals):
    """List form of the 16-bit-window LUT — the scalar scan decoders
    probe one symbol at a time, and Python list indexing beats ndarray
    scalar indexing ~2x. Cached beside the ndarray form."""
    key = ("lists", tuple(bits), tuple(vals))
    hit = _LL_LUT_CACHE.get(key)
    if hit is None:
        sym, ln = _huff_lut16(bits, vals)
        hit = (sym.tolist(), ln.tolist())
        _LL_LUT_CACHE[key] = hit
    return hit


class _ScanReader:
    """Window-cursor reader over ONE scan's entropy data (r13, guide
    §4.2 — VERDICT r12 #3): the stream is unstuffed once and split at
    RSTn markers into segments; a Huffman symbol decodes in ONE
    16-bit-window LUT probe and raw bits in one 4-byte fetch, replacing
    ``_BitReader``'s per-bit accumulator walk (kept verbatim below as
    the in-test oracle). Error contract mirrored: bits at/past a
    non-EOI marker raise the same unexpected-marker error only when
    actually needed, EOI feeds 1-bits indefinitely, ``sync_restart``
    validates the byte-aligned RSTn with the same message, and ``pos``
    reports the byte position after the last consumed byte (mapped
    through the 0xFF00 unstuffing), as the old reader's fill pointer
    did."""

    __slots__ = (
        "payload", "segs", "si", "data", "orig", "nbytes", "nbits",
        "end_marker", "seg_start", "p",
    )

    def __init__(self, payload: bytes, pos: int):
        self.payload = payload
        arr = np.frombuffer(payload, np.uint8)
        segs = []
        cur = pos
        drops: list[int] = []
        terminated = False
        for i in (np.flatnonzero(arr[pos:] == 0xFF) + pos).tolist():
            if i < cur:
                continue
            nxt = int(arr[i + 1]) if i + 1 < arr.size else None
            if nxt == 0x00:
                drops.append(i + 1)
                continue
            segs.append(
                self._seg(arr, cur, i, drops, 0x100 if nxt is None else nxt)
            )
            drops = []
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                cur = i + 2
                continue
            terminated = True
            break
        if not terminated:
            # ran off the payload with no marker: the old reader's fill
            # IndexError, surfaced as a loud ValueError
            segs.append(self._seg(arr, cur, arr.size, drops, None))
        self.segs = segs
        self.si = 0
        self._load(0)

    @staticmethod
    def _seg(arr, start, end, drops, marker):
        keep = np.ones(end - start, dtype=bool)
        for d in drops:
            if start <= d < end:
                keep[d - start] = False
        data = arr[start:end][keep]
        orig = (np.flatnonzero(keep) + start).tolist()
        pad = b"\xff" * 68  # covers window probes + boundary-spanning reads
        return (data.tobytes() + pad, orig, int(data.size),
                int(data.size) * 8, marker, start)

    def _load(self, si):
        (self.data, self.orig, self.nbytes, self.nbits,
         self.end_marker, self.seg_start) = self.segs[si]
        self.p = 0

    def _hit_end(self):
        m = self.end_marker
        if m is None:
            raise ValueError(
                "JPEG truncated: entropy stream ends without a marker"
            )
        if m == 0x100:
            raise ValueError(
                "unexpected truncated 0xFF marker in entropy stream"
            )
        raise ValueError(f"unexpected marker 0xFF{m:02X} in entropy stream")

    @property
    def pos(self) -> int:
        p = self.p
        if p == 0 or self.nbytes == 0:
            return self.seg_start
        j = (p - 1) >> 3
        if j >= self.nbytes:
            j = self.nbytes - 1  # EOI 1-feeding never advanced the old pos
        return self.orig[j] + (2 if self.data[j] == 0xFF else 1)

    def read_bits(self, n: int) -> int:
        p = self.p
        if n == 0:
            return 0
        if p + n > self.nbits:
            if self.end_marker != 0xD9:
                self._hit_end()
            if p >= self.nbits + 512:  # deep in the 1s pad: synthesize
                self.p = p + n
                return (1 << n) - 1
        s = p & 7
        v = (
            int.from_bytes(self.data[p >> 3 : (p >> 3) + 4], "big")
            >> (32 - s - n)
        ) & ((1 << n) - 1)
        self.p = p + n
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)

    def huff(self, lut) -> int:
        sym_l, len_l = lut
        p = self.p
        if p + 16 <= self.nbits:
            w = (
                int.from_bytes(self.data[p >> 3 : (p >> 3) + 4], "big")
                >> (16 - (p & 7))
            ) & 0xFFFF
            L = len_l[w]
            if L == 0:
                raise ValueError("invalid Huffman code in entropy stream")
            self.p = p + L
            return sym_l[w]
        # near or past the segment end: mirror the per-bit walk's checks
        if p >= self.nbits + 512:
            w = 0xFFFF
        else:
            w = (
                int.from_bytes(self.data[p >> 3 : (p >> 3) + 4], "big")
                >> (16 - (p & 7))
            ) & 0xFFFF
        L = len_l[w]
        if L == 0:
            # the old walk fills per bit: a marker raises before the
            # 16-bit no-match error can
            if p + 16 > self.nbits and self.end_marker != 0xD9:
                self._hit_end()
            raise ValueError("invalid Huffman code in entropy stream")
        if p + L > self.nbits and self.end_marker != 0xD9:
            self._hit_end()
        self.p = p + L
        return sym_l[w]

    def sync_restart(self, n: int) -> None:
        pos = self.pos
        d = self.payload
        if pos + 1 >= len(d) or d[pos] != 0xFF or d[pos + 1] != 0xD0 + n:
            b0 = d[pos] if pos < len(d) else 0
            b1 = d[pos + 1] if pos + 1 < len(d) else 0
            raise ValueError(
                f"expected restart marker RST{n} at byte {pos}, "
                f"found 0x{b0:02X}{b1:02X}"
            )
        self.si += 1
        self._load(self.si)


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _check_integer_upsampling(comps) -> None:
    """Factors 1..4 decode when every component's upsampling ratio to
    the max factor is an integer (4:4:4, 4:2:2, 4:2:0, 4:1:1, 4:1:0 —
    everything real encoders emit). Fractional ratios (e.g. 3-vs-2)
    would need box resampling and stay a named gate."""
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    for _cid, _tq, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"fractional chroma upsampling unsupported (factors "
                f"{hi}x{vi} against a {hmax}x{vmax} grid — integer "
                f"ratios decode)"
            )


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1) to uint8
    pixels — (h, w) for grayscale, (h, w, 3) RGB otherwise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
    precision = 8
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # ISO 10918-1 B.1.1.2: any number of 0xFF fill bytes may pad a
        # marker — skip them (r06 review: real camera files use these)
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: parameterless markers, no length field
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"corrupt JPEG: DQT precision {pq}")
                tbl = np.zeros((8, 8), dtype=np.int64)
                if pq == 0:
                    if bpos + 65 > len(body):
                        raise ValueError(
                            "corrupt JPEG: truncated 8-bit DQT segment"
                        )
                    for i, (r, c) in enumerate(ZIGZAG):
                        tbl[r, c] = body[bpos + 1 + i]
                    bpos += 65
                else:  # 16-bit entries (the 12-bit-precision pairing)
                    if bpos + 129 > len(body):
                        raise ValueError(
                            "corrupt JPEG: truncated 16-bit DQT segment"
                        )
                    vals16 = struct.unpack_from(">64H", body, bpos + 1)
                    for i, (r, c) in enumerate(ZIGZAG):
                        tbl[r, c] = vals16[i]
                    bpos += 129
                qtbls[tq] = tbl
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                # raw spec kept: the scan decodes through the cached
                # 16-bit-window LUT (r13), not the per-bit table
                htabs[(tc, th)] = (bits, vals)
                bpos += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if marker == 0xC0 and prec != 8:
                raise ValueError(f"corrupt JPEG: baseline {prec}-bit")
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"{prec}-bit precision (8-bit baseline and 8/12-bit "
                    f"extended sequential decode)"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"corrupt JPEG: sampling factors {hi}x{vi} "
                        f"(the spec range is 1..4)"
                    )
                comps.append((cid, tq, hi, vi))
            if ncomp == 1:
                # T.81: a single-component scan is NON-interleaved — one
                # data unit per MCU in raster order over the component's
                # own ceil grid; the declared factors only matter
                # relative to siblings, so normalize them away
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            _check_integer_upsampling(comps)
            sof = (h, w, comps)
            precision = prec
        elif marker == 0xC2:  # SOF2 progressive — own multi-scan walk
            return _decode_progressive_pixels(payload)
        elif marker == 0xC3:  # SOF3 lossless — own predictive walk
            return _decode_lossless_pixels(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (differential/arithmetic) "
                f"unsupported — baseline (SOF0), extended sequential "
                f"(SOF1), progressive (SOF2) and lossless (SOF3) decode"
            )
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            pos = pos + 2 + seglen
            break
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        pos = pos + 2 + seglen
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = sof
    ncomp = len(comps)
    comp_info = {cid: (tq, hi, vi) for cid, tq, hi, vi in comps}
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # entropy-decode into zigzag-order coefficient arrays; the IDCT runs
    # ONCE over all blocks at the end, shared with the progressive path
    # (batch stacked-matmul; on entropy-dense content the Huffman loop
    # dominates either way — scripts/codec_stress.py — but the shared
    # tail removes the duplicated upsample/color code)
    coefs = [
        np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for _, _, hi, vi in comps
    ]
    br = _ScanReader(payload, pos)
    luts = {
        key: _huff_lut16_lists(*htabs[key])
        for _cid, td, ta in scan_comps
        for key in ((0, td), (1, ta))
    }
    pred = [0] * ncomp
    mcu_no = 0
    rst = 0
    for by in range(mcus_y):
        for bx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                br.sync_restart(rst)
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            mcu_no += 1
            for ci, (cid, td, ta) in enumerate(scan_comps):
                tq, hi, vi = comp_info[cid]
                dc_lut = luts[(0, td)]
                ac_lut = luts[(1, ta)]
                for vy in range(vi):
                    for vx in range(hi):
                        q = coefs[ci][by * vi + vy, bx * hi + vx]
                        size = br.huff(dc_lut)
                        diff = (
                            _extend(br.read_bits(size), size) if size else 0
                        )
                        pred[ci] += diff
                        q[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = br.huff(ac_lut)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k >= 64:
                                raise ValueError("AC run past end of block")
                            q[k] = _extend(br.read_bits(size), size)
                            k += 1
    geom = (hmax, vmax, mcus_x, mcus_y, None)
    return _idct_assemble(sof, geom, coefs, qtbls, precision)


def decode_jpeg(payload: bytes) -> dict:
    """Stats-shaped decode (the `multimodal._extract_image_stats`
    contract): dimensions + per-channel means."""
    px = decode_jpeg_pixels(payload).astype(np.float64)
    if px.ndim == 2:
        mr = mg = mb = float(px.mean())
        h, w = px.shape
    else:
        h, w = px.shape[:2]
        mr, mg, mb = (float(px[:, :, i].mean()) for i in range(3))
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": round(mr, 6),
        "mean_g": round(mg, 6),
        "mean_b": round(mb, 6),
    }


# ---------------------------------------------------------------------------
# Progressive (SOF2) — ITU-T T.81 Annex G.1.2/G.2
# ---------------------------------------------------------------------------
#
# A progressive JPEG carries MULTIPLE scans, each delivering part of the
# coefficient data: spectral selection (a band [Ss, Se] of the zigzag
# spectrum per scan) and successive approximation (high bits first —
# Ah/Al point transforms — refined one bit per later scan). The decoder
# therefore accumulates integer coefficients per block across scans and
# runs the IDCT exactly ONCE at the end; the entropy algorithms below
# are the four of Annex G: DC first / DC refine / AC first (with EOB
# runs) / AC refine (with correction bits). This is the format most web
# JPEGs actually use, so the 100 TB decode operator cannot gate on it.

# raster slot -> zigzag index, used by the shared IDCT tail
_UNZIG = np.empty(64, dtype=np.int64)
for _i, (_r, _c) in enumerate(ZIGZAG):
    _UNZIG[_r * 8 + _c] = _i


def _ac_first_block(br, actab, coef, Ss, Se, Al, eobrun):
    """Annex G.1.2.2: first AC scan of a band. `coef` is the block's
    64-slot zigzag-order coefficient array. Returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = br.huff(actab)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block is done...
            if r:
                eobrun += br.read_bits(r)
            break  # ...and eobrun MORE blocks are all-zero
        k += r
        if k > Se:
            raise ValueError("AC run past end of progressive band")
        coef[k] = _extend(br.read_bits(s), s) << Al
        k += 1
    return eobrun


def _ac_refine_block(br, actab, coef, Ss, Se, Al, eobrun):
    """Annex G.1.2.3: AC refinement. Every already-nonzero coefficient
    visited costs one correction bit; newly-nonzero coefficients arrive
    as ±2^Al. An EOBn here still refines the REST of the current block
    before skipping whole blocks."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = br.huff(actab)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r  # includes the current block
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "invalid AC refinement symbol (size must be 1)"
                    )
                newval = p1 if br.read_bit() else -p1
            # advance past r zero-history slots, refining nonzeros on
            # the way: the loop stops AT the (r+1)-th zero-history slot
            # (or past Se). r12: visit only the nonzero slots (the
            # zeros never consume bits here) — one flatnonzero instead
            # of per-slot numpy scalar reads; same bits, same order.
            seg = coef[k : Se + 1]
            zpos = np.flatnonzero(seg == 0)
            stop = (k + int(zpos[r])) if r < zpos.size else Se + 1
            for k2 in (k + np.flatnonzero(seg[: stop - k])).tolist():
                if br.read_bit() and (coef[k2] & p1) == 0:
                    coef[k2] += p1 if coef[k2] > 0 else -p1
            k = stop
            if newval and k <= Se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # refinement bits for the rest of this block — nonzero slots
        # only (identical: zeros read no bits in this tail)
        if k <= Se:
            for k2 in (k + np.flatnonzero(coef[k : Se + 1])).tolist():
                if br.read_bit() and (coef[k2] & p1) == 0:
                    coef[k2] += p1 if coef[k2] > 0 else -p1
        eobrun -= 1
    return eobrun


def _next_marker(payload: bytes, pos: int) -> int:
    """Byte-align to the next marker after a scan's entropy data."""
    while pos < len(payload) - 1:
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,):
            return pos
        pos += 1
    raise ValueError("JPEG truncated: no marker after scan data")


def _decode_progressive_pixels(payload: bytes) -> np.ndarray:
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    precision = 8
    coefs: list[np.ndarray] | None = None
    geom = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"corrupt JPEG: DQT precision {pq}")
                tbl = np.zeros((8, 8), dtype=np.int64)
                if pq == 0:
                    if bpos + 65 > len(body):
                        raise ValueError(
                            "corrupt JPEG: truncated 8-bit DQT segment"
                        )
                    for i, (r, c) in enumerate(ZIGZAG):
                        tbl[r, c] = body[bpos + 1 + i]
                    bpos += 65
                else:  # 16-bit entries (the 12-bit-precision pairing)
                    if bpos + 129 > len(body):
                        raise ValueError(
                            "corrupt JPEG: truncated 16-bit DQT segment"
                        )
                    vals16 = struct.unpack_from(">64H", body, bpos + 1)
                    for i, (r, c) in enumerate(ZIGZAG):
                        tbl[r, c] = vals16[i]
                    bpos += 129
                qtbls[tq] = tbl
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                # raw spec kept: scans decode via the window LUT (r13)
                htabs[(tc, th)] = (bits, vals)
                bpos += 17 + n
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"{prec}-bit progressive (8- and 12-bit decode)"
                )
            precision = prec
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"corrupt JPEG: sampling factors {hi}x{vi} "
                        f"(the spec range is 1..4)"
                    )
                comps.append((cid, tq, hi, vi))
            if ncomp == 1:
                # single-component frames are non-interleaved (see the
                # sequential walk) — factors normalize to 1x1
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            _check_integer_upsampling(comps)
            sof = (h, w, comps)
            hmax = max(hi for _, _, hi, _ in comps)
            vmax = max(vi for _, _, _, vi in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            coefs = []
            nb = []
            for cid, _, hi, vi in comps:
                # full MCU-padded grid for interleaved scans; the
                # ceil(actual-size) grid for non-interleaved scans
                coefs.append(
                    np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
                )
                cw = -(-w * hi // hmax)
                ch = -(-h * vi // vmax)
                nb.append((-(-ch // 8), -(-cw // 8)))
            geom = (hmax, vmax, mcus_x, mcus_y, nb)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if sof is None or coefs is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_progressive_scan(
                payload, pos + 2 + seglen, sof, geom, coefs, htabs,
                scan_comps, ss, se, ah, al, restart_interval,
            )
            pos = _next_marker(payload, pos)
            continue
        pos = pos + 2 + seglen
    if sof is None or coefs is None:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    return _idct_assemble(sof, geom, coefs, qtbls, precision)


def _decode_progressive_scan(
    payload, pos, sof, geom, coefs, htabs, scan_comps, ss, se, ah, al,
    restart_interval,
):
    """Decode one scan's entropy data; returns the stream position after
    the last consumed byte. Interleaved (multi-component, DC only per
    G.1.1) scans walk the MCU grid; single-component scans walk that
    component's own ceil-sized block grid in raster order."""
    h, w, comps = sof
    hmax, vmax, mcus_x, mcus_y, nb = geom
    comp_idx = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    br = _ScanReader(payload, pos)
    dc_luts = {
        td: _huff_lut16_lists(*htabs[(0, td)])
        for _cid, td, _ta in scan_comps
        if (0, td) in htabs
    }
    eobrun = 0
    rst = 0
    unit_no = 0
    pred = {cid: 0 for cid, _, _ in scan_comps}

    def maybe_restart():
        nonlocal eobrun, pred, rst
        if restart_interval and unit_no and unit_no % restart_interval == 0:
            br.sync_restart(rst)
            rst = (rst + 1) % 8
            eobrun = 0
            pred = {cid: 0 for cid, _, _ in scan_comps}

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if len(scan_comps) > 1:
            for by in range(mcus_y):
                for bx in range(mcus_x):
                    maybe_restart()
                    unit_no += 1
                    for cid, td, _ta in scan_comps:
                        ci = comp_idx[cid]
                        _, _, hi, vi = comps[ci]
                        for vy in range(vi):
                            for vx in range(hi):
                                blk = coefs[ci][by * vi + vy, bx * hi + vx]
                                _dc_unit(br, dc_luts, td, blk, ah, al, pred, cid)
        else:
            cid, td, _ta = scan_comps[0]
            ci = comp_idx[cid]
            nby, nbx = nb[ci]
            for y in range(nby):
                for x in range(nbx):
                    maybe_restart()
                    unit_no += 1
                    _dc_unit(br, dc_luts, td, coefs[ci][y, x], ah, al, pred, cid)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _td, ta = scan_comps[0]
        ci = comp_idx[cid]
        actab = _huff_lut16_lists(*htabs[(1, ta)])
        nby, nbx = nb[ci]
        fn = _ac_first_block if ah == 0 else _ac_refine_block
        for y in range(nby):
            for x in range(nbx):
                maybe_restart()
                unit_no += 1
                eobrun = fn(br, actab, coefs[ci][y, x], ss, se, al, eobrun)
    return br.pos


def _dc_unit(br, dc_luts, td, blk, ah, al, pred, cid):
    if ah == 0:  # first DC scan: Huffman diff, shifted up by Al
        size = br.huff(dc_luts[td])
        diff = _extend(br.read_bits(size), size) if size else 0
        pred[cid] += diff
        blk[0] = pred[cid] << al
    else:  # refinement: one raw bit, OR'd into two's complement
        if br.read_bit():
            blk[0] |= 1 << al


def _idct_assemble(sof, geom, coefs, qtbls, precision=8):
    """Shared progressive tail: de-zigzag, dequantize, batch IDCT, then
    the same upsample + color conversion as baseline. ``precision``
    sets the level shift (2^(P-1)), sample range (0..2^P-1) and output
    dtype (uint8 for 8-bit, uint16 for 12-bit)."""
    h, w, comps = sof
    hmax, vmax, mcus_x, mcus_y, _nb = geom
    half = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dt = np.uint8 if precision == 8 else np.uint16
    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        zz = coefs[ci].astype(np.float64)  # (by, bx, 64) zigzag order
        blocks = zz[:, :, _UNZIG].reshape(zz.shape[0], zz.shape[1], 8, 8)
        blocks *= qtbls[tq][None, None, :, :]
        # batch IDCT: C.T @ B @ C over every block at once — stacked
        # matmul, NOT einsum: matmul contracts pairwise exactly like the
        # baseline per-block path, so baseline and progressive decodes
        # of identically-quantized coefficients agree bit-for-bit
        spatial = (_C.T @ blocks) @ _C + half
        plane = spatial.transpose(0, 2, 1, 3).reshape(
            zz.shape[0] * 8, zz.shape[1] * 8
        )
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, maxv).astype(dt)
    y, cb, cr = planes
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxv).astype(dt)


# ---------------------------------------------------------------------------
# Progressive encoder — exists so progressive exactness is provable
# (the same reason the baseline encoder exists). Scan script: DC-first
# (interleaved, Al=1) → per-component AC-first (1..63, Al=1) → DC
# refinement → per-component AC refinement — every Annex G decode
# algorithm above gets exercised by a round trip.
# ---------------------------------------------------------------------------


def _quantized_planes(px, quality, subsample, precision=8):
    """Shared FDCT front half: returns (h, w, samp, qtbls, coefs) where
    coefs[ci] is an (by, bx, 64) int array in zigzag order over the
    MCU-padded grid. ``precision`` sets the level shift / chroma offset
    (2^(P-1)), matching the sequential encoder."""
    half = float(1 << (precision - 1))
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        subsample = False
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + half,
            0.5 * r - 0.418688 * g - 0.081312 * b + half,
        ]
    qlum = _quality_scale(LUM_Q, quality)
    qchr = _quality_scale(CHR_Q, quality)
    qtbls = [qlum] if gray else [qlum, qchr]
    samp = _subsample_factors(subsample, gray)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    zig = np.array([r * 8 + c for r, c in ZIGZAG])
    coefs = []
    for ci, p in enumerate(planes):
        hi, vi = samp[ci]
        if ci > 0 and (hmax, vmax) != (1, 1):
            p = _chroma_average(p, h, w, hmax // hi, vmax // vi)
        p = _pad_replicate(p, mcus_y * 8 * vi, mcus_x * 8 * hi)
        by, bx = mcus_y * vi, mcus_x * hi
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - half
        # stacked matmul (not einsum) for bit-identity with the baseline
        # encoder's per-block FDCT — same pairwise contraction order
        coef = np.round((_C @ blocks) @ _C.T)
        q = np.round(coef / qtbls[0 if ci == 0 else 1]).astype(np.int64)
        coefs.append(q.reshape(by, bx, 64)[:, :, zig])
    return h, w, samp, qtbls, coefs


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG using both spectral
    selection and one level of successive approximation, so a round
    trip through ``decode_jpeg_pixels`` exercises all four Annex G scan
    decoders. Same quant/table conventions as ``encode_jpeg`` — at
    quality 100 the two encoders produce IDENTICAL coefficients, so
    progressive and baseline decodes of the same image must agree
    pixel-for-pixel. ``precision=12`` writes a 12-bit progressive
    stream from uint16 samples in 0..4095 (level shift 2048, widened
    amplitude categories, 16-bit DQT entries) — the same matrix cell
    the sequential encoder covers with SOF1."""
    px = np.asarray(pixels)
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 8:
        if px.dtype != np.uint8:
            raise ValueError("pixels must be uint8")
    else:
        if px.dtype != np.uint16:
            raise ValueError("12-bit pixels must be uint16")
        if px.max(initial=0) > 4095:
            raise ValueError("12-bit samples exceed 4095")
    if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    if px.shape[0] == 0 or px.shape[1] == 0:
        raise ValueError("degenerate image")
    h, w, samp, qtbls, coefs = _quantized_planes(
        px, quality, subsample, precision
    )
    dc_codes = DC_CODES if precision == 8 else DC_CODES_12
    ac_codes = AC_CODES if precision == 8 else AC_CODES_12
    ncomp = len(coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    nb = []
    for ci in range(ncomp):
        hi, vi = samp[ci]
        ch = -(-h * vi // vmax)  # ceil component height
        cw = -(-w * hi // hmax)
        nb.append((-(-ch // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    if precision == 8:  # JFIF declares 8-bit samples; 12-bit files omit it
        out += (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0)
        )
    for tq, tbl in enumerate(qtbls):
        if precision == 8:
            zz = bytes(int(tbl[r, c]) for r, c in ZIGZAG)
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
        else:  # Pq=1: 16-bit entries, the 12-bit-precision pairing
            zz16 = struct.pack(">64H", *(int(tbl[r, c]) for r, c in ZIGZAG))
            out += (
                b"\xff\xdb" + struct.pack(">H", 131)
                + bytes([0x10 | tq]) + zz16
            )
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    dc_syms, dc_len = (
        (DC_SYMBOLS, 4) if precision == 8 else (DC_SYMBOLS_12, 5)
    )
    ac_syms = AC_SYMBOLS if precision == 8 else AC_SYMBOLS_12
    out += _dht_segment(0, 0, dc_syms, dc_len)
    out += _dht_segment(1, 0, ac_syms, 8)
    if ncomp > 1:
        out += _dht_segment(0, 1, dc_syms, dc_len)
        out += _dht_segment(1, 1, ac_syms, 8)

    def sos_header(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, td << 4 | ta])
        body += bytes([ss, se, ah << 4 | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # ---- scan 1: DC first, interleaved, Al=1 -----------------------------
    out += sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, 1
    )
    bw = _BitWriter()
    pred = [0] * ncomp
    for by in range(mcus_y):
        for bx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        dc = int(coefs[ci][by * vi + vy, bx * hi + vx, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        size = _category(diff)
                        code, length = dc_codes[size]
                        bw.write(code, length)
                        if size:
                            bw.write(_amplitude(diff, size), size)
    out += bw.flush()

    # ---- scans 2..: AC first per component, band 1..63, Al=1 -------------
    for ci in range(ncomp):
        out += sos_header([(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 0, 1)
        bw = _BitWriter()
        nby, nbx = nb[ci]
        for y in range(nby):
            for x in range(nbx):
                _emit_ac_first(bw, coefs[ci][y, x], 1, 63, 1, ac_codes)
        out += bw.flush()

    # ---- DC refinement: raw bit per block, interleaved, Ah=1 Al=0 --------
    out += sos_header(
        [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0
    )
    bw = _BitWriter()
    for by in range(mcus_y):
        for bx in range(mcus_x):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        dc = int(coefs[ci][by * vi + vy, bx * hi + vx, 0])
                        bw.write(dc & 1, 1)
    out += bw.flush()

    # ---- AC refinement per component, Ah=1 Al=0 ---------------------------
    for ci in range(ncomp):
        out += sos_header([(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 1, 0)
        bw = _BitWriter()
        nby, nbx = nb[ci]
        for y in range(nby):
            for x in range(nbx):
                _emit_ac_refine(bw, coefs[ci][y, x], 1, 63, 0, ac_codes)
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _emit_ac_first(bw, coef, ss, se, al, ac_codes=AC_CODES):
    """AC-first scan of one block: magnitudes shifted toward zero by Al
    (T.81 point transform), run/size coding, per-block EOB0 (no
    cross-block EOB runs — simplicity costs bits, not bugs). r13
    (guide §4.2): only the NONZERO slots are visited — zero runs come
    from index gaps, so the all-zero band (every DC-only block) costs
    one flatnonzero instead of a 63-step Python walk. Emitted symbols
    identical (pinned in tests/test_jpeg.py)."""
    seg = np.asarray(coef[ss : se + 1])
    az_all = np.where(seg >= 0, np.abs(seg) >> al, -(np.abs(seg) >> al))
    nz = np.flatnonzero(az_all)
    if nz.size == 0:
        code, length = ac_codes[0x00]  # EOB0
        bw.write(code, length)
        return
    prev = -1
    for j in nz.tolist():
        run = j - prev - 1
        prev = j
        while run >= 16:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        az = int(az_all[j])
        size = _category(az)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude(az, size), size)
    if ss + int(nz[-1]) < se:
        code, length = ac_codes[0x00]  # EOB0
        bw.write(code, length)


def _emit_ac_refine(bw, coef, ss, se, al, ac_codes=AC_CODES):
    """AC-refinement scan of one block — the jcphuff.c G.1.2.3 shape:
    newly-nonzero coefficients emit (run, 1) + sign, already-nonzero
    coefficients buffer one correction bit which flushes after the next
    emitted symbol (ZRL / (r,1) / EOB)."""
    # r13 (guide §4.2): visit only the nonzero slots — zeros contribute
    # runs via index gaps; the all-zero band costs one flatnonzero.
    # Emission order and bits identical (pinned in tests/test_jpeg.py).
    seg = np.asarray(coef[ss : se + 1])
    a_all = np.abs(seg) >> al
    nzall = np.flatnonzero(a_all)
    ones = np.flatnonzero(a_all == 1)
    eob = ss + int(ones[-1]) if ones.size else ss - 1
    run = 0
    pending: list[int] = []
    prev = -1
    for j in nzall.tolist():
        k = ss + j
        run += j - prev - 1
        prev = j
        a = int(a_all[j])
        while run > 15 and k <= eob:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
            for bit in pending:
                bw.write(bit, 1)
            pending = []
        if a > 1:  # history coefficient: one correction bit, run intact
            pending.append(a & 1)
            continue
        code, length = ac_codes[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(seg[j]) > 0 else 0, 1)
        for bit in pending:
            bw.write(bit, 1)
        pending = []
        run = 0
    run += (se - ss) - prev  # trailing zeros after the last nonzero
    if run > 0 or pending:
        code, length = ac_codes[0x00]  # EOB0 + its buffered bits
        bw.write(code, length)
        for bit in pending:
            bw.write(bit, 1)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3) — ITU-T T.81 Annex H
# ---------------------------------------------------------------------------
#
# The predictive (DPCM) process: no DCT, no quantization. Each sample's
# difference from a neighbor prediction (7 selectable predictors) is
# Huffman-coded with DC-style category codes, arithmetic modulo 2^16.
# This is the archival variant (DNG, DICOM) — precision 2..16 bits and
# the ONLY JPEG process whose round trip is exact on arbitrary content,
# which is what the table-scale oracle pins. Restart intervals are not
# written by the encoder and raise by name in the decoder (their
# prediction-reset spatial semantics are a rarely-used corner).

# categories 0..16 (16 = the special 32768 difference, no extra bits)
DC_SYMBOLS_LL = list(range(17))
DC_CODES_LL = _canonical_codes(DC_SYMBOLS_LL, 5)


_LL_LUT_CACHE: dict = {}


def _huff_lut16(bits, vals):
    """65536-entry (symbol, code-length) decode LUT keyed by the next
    16 bits of the stream (r12, guide §4.2): a canonical code of length
    L covers the window range [code << (16-L), (code+1) << (16-L)).
    Cached per table spec — one build per distinct DHT per process.
    r13: returns int32 ndarrays (the consumers gather with numpy fancy
    indexing, not per-symbol Python probes)."""
    key = (tuple(bits), tuple(vals))
    hit = _LL_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(65536, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym, ln)
    _LL_LUT_CACHE[key] = out
    return out


def _unstuffed_entropy(payload: bytes, pos: int):
    """Unstuffed entropy stream from byte ``pos`` as a uint8 ndarray
    (r12 windows refactored per r12 ADVICE: no per-bit Python list is
    materialized — consumers window in bounded chunks). Returns
    (data, n_real_bits, bad_marker); ``bad_marker`` is the byte of an
    unexpected in-stream marker, raised only if decode actually needs
    bits at/past it, and a TRUNCATED trailing 0xFF (no byte follows)
    counts as a bad marker rather than a clean end (r12 ADVICE #3)."""
    arr = np.frombuffer(payload, np.uint8)[pos:]
    ff = np.flatnonzero(arr == 0xFF)
    drop = []
    end = arr.size
    bad = None
    for i in ff.tolist():
        if i >= end:
            break
        nxt = int(arr[i + 1]) if i + 1 < arr.size else None
        if nxt == 0x00:
            drop.append(i + 1)
        elif nxt == 0xD9:
            end = i
            break
        else:
            end = i
            bad = 0x100 if nxt is None else nxt  # 0x100 = truncated FF
            break
    keep = np.ones(end, dtype=bool)
    for i in drop:
        if i < end:
            keep[i] = False
    data = arr[:end][keep]
    return data, int(data.size) * 8, bad


_LL_CHUNK_BITS = 1 << 20  # bounded work-array footprint per chunk (~30 MB)


def _raise_ll_invalid(p, nbits, bad):
    """Error parity of the r12 per-symbol loop: a symbol starting
    at/past the real bits with an in-stream marker raised the marker
    error BEFORE the window probe could report an invalid code."""
    if bad is not None and p >= nbits:
        if bad == 0x100:
            raise ValueError(
                "unexpected truncated 0xFF marker in entropy stream"
            )
        raise ValueError(f"unexpected marker 0xFF{bad:02X} in entropy stream")
    raise ValueError("invalid Huffman code in entropy stream")


def _ll_entropy_decode(data, nbits, bad, luts, nc, n_symbols):
    """Vectorized lossless scan decode (r13, guide §4.2 — the FLAC
    rice-orbit pattern): per chunk, ONE windowing pass computes, for
    every bit position, the Huffman (size, length) and therefore the
    symbol's total bit advance; the per-symbol Python work collapses to
    walking the advance orbit (one list index + add per symbol), and
    the magnitudes/diffs are gathered in vector ops. Bit-identical to
    the r12 per-symbol window loop (pinned in tests/test_jpeg.py),
    including the error contract: an in-stream marker raises only if
    decode needs bits at/past it (checked post-walk: any overrun past
    the real bits implies the old loop's per-symbol check fired, and a
    final-symbol overrun now raises too — r12 ADVICE #3); EOI
    truncation keeps the feed-1s semantics (chunks past the real end
    are all-ones bits); an unmatched window raises the same invalid-
    code error. Memory is bounded: ~30 MB of work arrays per 128 KB
    chunk, never a full-stream Python list (r12 ADVICE #1)."""
    # distinct tables -> one adv/size array per chunk per table
    distinct = []
    table_of = []
    for t in luts:
        for j, d in enumerate(distinct):
            if d is t:
                table_of.append(j)
                break
        else:
            table_of.append(len(distinct))
            distinct.append(t)
    one_table = len(distinct) == 1
    diffs = np.empty(n_symbols, dtype=np.int64)
    pos_all = np.empty(n_symbols, dtype=np.int64)
    p = 0
    i = 0
    base = 0  # first bit covered by the current chunk
    while i < n_symbols:
        # chunk covers bits [base, base+span) with 48 bits of lookahead;
        # span tracks the REAL remaining bits (tiny streams build tiny
        # work arrays), floored so pad-region walks still progress
        span = min(_LL_CHUNK_BITS, max(nbits - base, 2048))
        assert base <= p
        lo_byte = base >> 3
        hi_byte = (base + span + 48 + 7) >> 3
        real = data[lo_byte : min(hi_byte, data.size)]
        # 16-bit window at every bit position, built from a 24-bit
        # per-byte view with a broadcasted shift — no per-bit unpack,
        # no int64 matmul (the r12 formulation's cost). Bytes past the
        # real stream are 0xFF: the spec's feed-1s padding.
        padded = np.full(hi_byte - lo_byte + 2, 0xFF, dtype=np.uint8)
        if real.size:
            padded[: real.size] = real
        b32 = padded.astype(np.int32)
        b24 = (b32[:-2] << 16) | (b32[1:-1] << 8) | b32[2:]
        W = (
            (b24[:, None] >> (8 - np.arange(8, dtype=np.int32)[None, :]))
            & 0xFFFF
        ).reshape(-1)
        advs = []
        sizes_c = []
        for sym_l, len_l in distinct:
            sz = sym_l[W]
            ln = len_l[W]
            adv = ln + np.where(sz == 16, 0, sz)
            adv[ln == 0] = 0  # invalid-code sentinel
            advs.append(adv.tolist())
            sizes_c.append(sz)
        limit = base + (W.size - 48)
        i0 = i
        if one_table:
            adv0 = advs[0]
            while i < n_symbols and p < limit:
                pos_all[i] = p
                a = adv0[p - base]
                if a == 0:
                    _raise_ll_invalid(p, nbits, bad)
                p += a
                i += 1
        else:
            while i < n_symbols and p < limit:
                pos_all[i] = p
                a = advs[table_of[i % nc]][p - base]
                if a == 0:
                    _raise_ll_invalid(p, nbits, bad)
                p += a
                i += 1
        # vectorized gather for the symbols walked in this chunk
        for t in range(len(distinct)):
            if one_table:
                idx = np.arange(i0, i)
            else:
                idx = np.arange(i0, i)
                idx = idx[np.array(table_of, dtype=np.int64)[idx % nc] == t]
            if idx.size == 0:
                continue
            rel = pos_all[idx] - base
            sym_l, len_l = distinct[t]
            wv = W[rel]
            sz = sym_l[wv].astype(np.int64)
            ln = len_l[wv].astype(np.int64)
            mag = W[rel + ln] >> (16 - np.minimum(sz, 15))
            d = np.where(
                mag >> np.maximum(sz - 1, 0) > 0,
                mag,
                mag - (np.int64(1) << np.minimum(sz, 62)) + 1,
            )
            d = np.where(sz == 0, 0, d)
            d = np.where(sz == 16, 0x8000, d)
            diffs[idx] = d
        if i < n_symbols:
            base = (p >> 3) << 3  # next chunk starts at the cursor's byte
    if p > nbits and bad is not None:
        if bad == 0x100:
            raise ValueError(
                "unexpected truncated 0xFF marker in entropy stream"
            )
        raise ValueError(
            f"unexpected marker 0xFF{bad:02X} in entropy stream"
        )
    return diffs


def _pack_codes(vals, lens) -> bytes:
    """MSB-first concatenation of per-symbol (value, length) codes into
    a padded + stuffed entropy byte string (r12, guide §4.2) —
    byte-identical to feeding the scalar ``_BitWriter`` (pad with 1s
    per the spec, stuff 0x00 after every 0xFF, including a padded final
    byte)."""
    lens = np.asarray(lens, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.int64)
    total = int(lens.sum())
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pad = (-total) % 8
    bits = np.zeros(total + pad, dtype=np.uint8)
    if pad:
        bits[total:] = 1
    for j in range(int(lens.max(initial=0))):
        m = lens > j
        bits[offs[m] + j] = (vals[m] >> (lens[m] - 1 - j)) & 1
    packed = np.packbits(bits)
    ffs = np.flatnonzero(packed == 0xFF)
    if ffs.size:
        packed = np.insert(packed, ffs + 1, 0)
    return packed.tobytes()


def _ll_reconstruct(d: np.ndarray, predictor: int, default: int) -> np.ndarray:
    """Vectorized inverse DPCM (r12): the scalar loop's per-step masked
    arithmetic is preserved exactly — predictors 1/2/4 are pure
    addition chains (masking commutes, applied at the end), 3/5 read
    only previous-ROW values (row-at-a-time vector ops, rows stored
    masked), and 6/7 pass the left neighbor through a floor shift
    (genuinely sequential — plain-int row loops). Bit-identity against
    the scalar loop is pinned in tests/test_jpeg.py."""
    h, w = d.shape
    M = 0xFFFF
    if predictor == 1:
        t = d.copy()
        t[0, 0] += default
        col0 = np.cumsum(t[:, 0])
        t[:, 0] = 0
        return (np.cumsum(t, axis=1) + col0[:, None]) & M
    if predictor == 2:
        t = d.copy()
        t[0, 0] += default
        row0 = np.cumsum(t[0, :])
        t[0, :] = 0
        return (np.cumsum(t, axis=0) + row0[None, :]) & M
    if predictor == 4:
        return (np.cumsum(np.cumsum(d, axis=1), axis=0) + default) & M
    out = np.empty((h, w), dtype=np.int64)
    out[0, :] = (np.cumsum(d[0, :]) + default) & M
    if predictor == 3:
        for y in range(1, h):
            out[y, 0] = out[y - 1, 0] + d[y, 0]
            out[y, 1:] = out[y - 1, :-1] + d[y, 1:]
            out[y] &= M
        return out
    if predictor == 5:
        for y in range(1, h):
            prow = out[y - 1]
            t = d[y].copy()
            t[1:] += (prow[1:] - prow[:-1]) >> 1
            t[0] += prow[0]
            out[y] = np.cumsum(t) & M
        return out
    dl = d.tolist()
    rows = [out[0].tolist()]
    for y in range(1, h):
        prev = rows[-1]
        dr = dl[y]
        v = (prev[0] + dr[0]) & M
        row = [v]
        if predictor == 6:
            for x in range(1, w):
                pred = prev[x] + ((v - prev[x - 1]) >> 1)
                v = (pred + dr[x]) & M
                row.append(v)
        else:  # predictor 7
            for x in range(1, w):
                pred = (v + prev[x]) >> 1
                v = (pred + dr[x]) & M
                row.append(v)
        rows.append(row)
    return np.array(rows, dtype=np.int64)


def _ll_predict(plane, x, y, predictor, default):
    """T.81 H.1.2.1: first sample -> default; rest of first line -> Ra;
    first column -> Rb; everywhere else the selected predictor."""
    if y == 0:
        return default if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # predictor 7


def encode_jpeg_lossless(
    pixels: np.ndarray, predictor: int = 1, precision: int | None = None
) -> bytes:
    """Encode as a lossless (SOF3) JPEG — exact for ANY content at any
    precision 2..16. Gray (h, w) or RGB (h, w, 3) arrays; components
    are stored as-is (no color transform — losslessness is the point).
    ``precision`` defaults to 8 for uint8 input and 16 for uint16."""
    px = np.asarray(pixels)
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    if px.shape[0] == 0 or px.shape[1] == 0:
        raise ValueError("degenerate image")
    if px.dtype.kind not in "ui":
        raise ValueError("lossless samples must be an integer dtype")
    if precision is None:
        precision = 8 if px.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if px.max(initial=0) > (1 << precision) - 1 or px.min(initial=0) < 0:
        raise ValueError(f"samples exceed {precision}-bit range")
    h, w = px.shape[:2]
    planes = (
        [px.astype(np.int64)]
        if px.ndim == 2
        else [px[:, :, c].astype(np.int64) for c in range(3)]
    )
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # H=V=1; Tq unused in lossless
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_SYMBOLS_LL, 5)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah<<4|Al=0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    default = 1 << (precision - 1)
    # the whole prediction pass is vectorizable at encode time (the
    # decoder's reconstruction is the sequential side): build Ra/Rb/Rc
    # shifts, select the predictor, patch the first-line/first-column
    # rules, and map differences to signed mod-2^16 in one shot
    diffs = []
    for p in planes:
        ra = np.zeros_like(p)
        ra[:, 1:] = p[:, :-1]
        rb = np.zeros_like(p)
        rb[1:, :] = p[:-1, :]
        rc = np.zeros_like(p)
        rc[1:, 1:] = p[:-1, :-1]
        if predictor == 1:
            pred = ra
        elif predictor == 2:
            pred = rb
        elif predictor == 3:
            pred = rc
        elif predictor == 4:
            pred = ra + rb - rc
        elif predictor == 5:
            pred = ra + ((rb - rc) >> 1)
        elif predictor == 6:
            pred = rb + ((ra - rc) >> 1)
        else:
            pred = (ra + rb) >> 1
        pred[0, :] = ra[0, :]  # first line: predictor 1
        pred[1:, 0] = rb[1:, 0]  # first column: predictor 2
        pred[0, 0] = default
        d = (p - pred) & 0xFFFF
        d[d >= 0x8000] -= 0x10000
        diffs.append(d)
    # interleaved symbol order (y, x, component); categories, amplitudes
    # and the bit emission all vectorized (r12, guide §4.2) — each
    # symbol is (huffman code << magnitude-bits) | amplitude, packed by
    # _pack_codes byte-identically to the scalar writer it replaces
    # (pinned in tests/test_jpeg.py)
    d = np.stack(diffs, axis=2).reshape(-1)
    a = np.abs(d)
    size = np.searchsorted(
        (1 << np.arange(17)).astype(np.int64), a, side="right"
    ).astype(np.int64)
    is_min = d == -0x8000  # the special 32768 category: code only
    size[is_min] = 16
    code_arr = np.array([DC_CODES_LL[s][0] for s in range(17)], dtype=np.int64)
    len_arr = np.array([DC_CODES_LL[s][1] for s in range(17)], dtype=np.int64)
    amp = np.where(d >= 0, d, d + (1 << size) - 1)
    magbits = np.where(is_min, 0, size)
    vals = (code_arr[size] << magbits) | np.where(is_min, 0, amp)
    lens = len_arr[size] + magbits
    out += _pack_codes(vals, lens)
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless_pixels(payload: bytes) -> np.ndarray:
    """Decode a lossless (SOF3) stream: marker walk, then the Annex H
    DPCM scan — Huffman difference categories, modulo-2^16 arithmetic,
    the selected predictor with the first-line/first-column rules."""
    pos = 2
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                # raw spec kept: the scan decodes through the cached
                # 16-bit-window LUT (r12), not the bit-walk table
                htabs[(tc, th)] = (bits, vals)
                bpos += 17 + n
        elif marker == 0xC3:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if not 2 <= prec <= 16:
                raise ValueError(f"corrupt JPEG: lossless {prec}-bit")
            comps = []
            for i in range(ncomp):
                cid, hv, _tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components "
                        "unsupported (H=V=1 decodes)"
                    )
                comps.append(cid)
            sof = (prec, h, w, comps)
        elif marker == 0xDD:
            raise NotImplementedError(
                "restart intervals in lossless JPEG unsupported "
                "(prediction-reset semantics)"
            )
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4)
                for i in range(ns)
            ]
            predictor = body[1 + 2 * ns]
            pt = body[3 + 2 * ns] & 0xF
            if not 1 <= predictor <= 7:
                raise ValueError(
                    f"corrupt JPEG: lossless predictor {predictor}"
                )
            if pt != 0:
                raise NotImplementedError(
                    "lossless point transform (Al != 0) unsupported"
                )
            scan = (scan_comps, predictor)
            pos = pos + 2 + seglen
            break
        pos = pos + 2 + seglen
    if sof is None or scan is None:
        raise ValueError("lossless JPEG missing SOF3/SOS")
    prec, h, w, comps = sof
    scan_comps, predictor = scan
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "non-interleaved lossless scans unsupported"
        )
    default = 1 << (prec - 1)
    # r12 (guide §4.2): entropy decode through 16-bit-window LUTs over
    # the unstuffed stream; r13 vectorizes the remaining per-symbol
    # Python loop into the chunked advance-orbit walk + vector gathers
    # of _ll_entropy_decode — bit-identical (pinned in tests/test_jpeg
    # .py::test_ll_entropy_decode_matches_per_symbol_loop), then
    # per-plane vectorized inverse DPCM.
    nc = len(scan_comps)
    n_symbols = h * w * nc
    data, nbits, bad = _unstuffed_entropy(payload, pos)
    luts = [_huff_lut16(*htabs[(0, td)]) for _cid, td in scan_comps]
    diffs_flat = _ll_entropy_decode(data, nbits, bad, luts, nc, n_symbols)
    dmat = diffs_flat.reshape(h * w, nc)
    planes = [
        _ll_reconstruct(dmat[:, ci].reshape(h, w), predictor, default)
        for ci in range(nc)
    ]
    maxv = (1 << prec) - 1
    for p in planes:
        if int(p.max(initial=0)) > maxv:
            raise ValueError(
                f"corrupt lossless JPEG: reconstructed sample exceeds "
                f"the declared {prec}-bit range"
            )
    dt = np.uint8 if prec <= 8 else np.uint16
    if len(planes) == 1:
        return planes[0].astype(dt)
    return np.stack(planes, axis=2).astype(dt)
