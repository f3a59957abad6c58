"""Baseline JPEG codec — pure stdlib + numpy, no PIL/opencv.

Closes the last "DCT codecs are environment-gated" gap
(`multimodal._decode_image`) the honest way PNG was closed in r06:
implement the subset for real and gate the rest loudly. Scope:

- **Decoder** (`decode_jpeg_pixels`): baseline sequential DCT (SOF0),
  8-bit, 1 or 3 components, sampling factors 1..2 — 4:4:4, 4:2:2 and
  4:2:0 (the camera default) all decode, with nearest-neighbor chroma
  upsampling; DRI/RSTn restart intervals honored. Marker walk → DQT/DHT/SOF0/SOS parse → bit-unstuffed
  Huffman decode (table-driven from the file's own DHT segments) →
  dequant → 2-D IDCT (orthonormal DCT matrix — exactly JPEG's Annex A
  definition) → level shift → YCbCr→RGB. Anything outside the subset
  (progressive SOF2, 12-bit precision, arithmetic coding, sampling
  factors above 2) raises NotImplementedError
  naming the feature.
- **Encoder** (`encode_jpeg`): the matching baseline writer, used by
  the tests so exactness can be proven without a reference binary
  (`subsample=True` writes 4:2:0 with 2×2-averaged chroma):
  both ends are this module, so a constant-gray image at the all-ones
  quant table must round-trip EXACTLY (DC-only blocks are integer
  arithmetic end-to-end), and smooth images must round-trip above a
  PSNR floor. Huffman tables are written per-file as simple canonical
  fixed-length codes (any prefix code is a valid DHT; optimal tables
  buy compression, not correctness).

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


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtbl: np.ndarray, pred_dc: int
) -> int:
    coef = np.round(_C @ (block - 128.0) @ _C.T)
    q = (coef / qtbl).round().astype(np.int64)
    dc = int(q[0, 0])
    diff = dc - pred_dc
    size = _category(diff)
    code, length = DC_CODES[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude(diff, size), size)
    zz = [int(q[r, c]) for r, c in ZIGZAG[1:]]
    run = 0
    last_nonzero = max((i for i, v in enumerate(zz) if v), default=-1)
    for i, v in enumerate(zz):
        if i > last_nonzero:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = AC_CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        if size > 10:
            raise ValueError(f"AC coefficient {v} out of baseline range")
        code, length = AC_CODES[(run << 4) | size]
        bw.write(code, length)
        bw.write(_amplitude(v, size), size)
        run = 0
    # EOB only when the block does NOT fill through the last AC slot
    # (index 62 of the 63 ACs) — the decoder exits at k == 64 on its own
    # there, and a spurious EOB would desynchronize the stream
    if last_nonzero < 62:
        code, length = AC_CODES[0x00]  # EOB
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


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JFIF JPEG: 4:4:4 by default, 4:2:0 (2×2-averaged chroma,
    the format virtually every camera writes) with ``subsample=True``.
    ``restart_interval=n`` emits a DRI segment and an RSTm marker every
    n MCUs (DC predictors reset, stream re-byte-aligned) — the
    error-resilience feature most camera files carry."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image")
    if gray:
        subsample = False

    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qlum = _quality_scale(LUM_Q, quality)
    qchr = _quality_scale(CHR_Q, quality)
    qtbls = [qlum] if gray else [qlum, qchr]
    ncomp = 1 if gray else 3
    # sampling factors (Hi, Vi) per component
    samp = [(1, 1)] * ncomp
    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        hi, vi = samp[ci]
        if subsample and ci > 0:  # 2x2 chroma averaging
            ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
            p = _pad_replicate(p, ph2, pw2)
            p = (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0
        padded.append(_pad_replicate(p, mcus_y * 8 * vi, mcus_x * 8 * hi))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tq, tbl in enumerate(qtbls):
        zz = bytes(int(tbl[r, c]) for r, c in ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_SYMBOLS, 4)
    out += _dht_segment(1, 0, AC_SYMBOLS, 8)
    if not gray:
        out += _dht_segment(0, 1, DC_SYMBOLS, 4)
        out += _dht_segment(1, 1, AC_SYMBOLS, 8)
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
                        r0 = (by * vi + vy) * 8
                        c0 = (bx * hi + vx) * 8
                        block = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qtbls[0 if ci == 0 else 1], pred[ci]
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
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

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


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG (4:4:4 / 4:2:2 / 4:2:0) to uint8
    pixels — (h, w) for grayscale, (h, w, 3) RGB otherwise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
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
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[bpos + 1 + i]
                qtbls[tq] = tbl
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                htabs[(tc, th)] = _build_decode_table(bits, vals)
                bpos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} unsupported "
                        f"(4:4:4, 4:2:2 and 4:2:0 decode — factors 1..2)"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (progressive/extended) unsupported — "
                f"baseline sequential (SOF0) only"
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
    planes = []
    for cid, _, hi, vi in comps:
        planes.append(np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi)))
    br = _BitReader(payload, pos)
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
                for vy in range(vi):
                    for vx in range(hi):
                        q = np.zeros((8, 8), dtype=np.int64)
                        size = _huff_decode(br, htabs[(0, td)])
                        diff = (
                            _extend(br.read_bits(size), size) if size else 0
                        )
                        pred[ci] += diff
                        q[0, 0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, htabs[(1, ta)])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k >= 64:
                                raise ValueError("AC run past end of block")
                            r, c = ZIGZAG[k]
                            q[r, c] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = q * qtbls[tq]
                        block = _C.T @ coef.astype(np.float64) @ _C + 128.0
                        r0 = (by * vi + vy) * 8
                        c0 = (bx * hi + vx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
    # upsample subsampled components to full resolution, then crop
    up = []
    for ci, (cid, _, hi, vi) in enumerate(comps):
        p = planes[ci]
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        up.append(p[:h, :w])
    planes = up
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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
