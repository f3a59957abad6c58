"""CCITT Group 3 / Group 4 fax codecs — ITU-T T.4 (MH, G3 1-D) and
T.6 (G4 / MMR), the bilevel compressions of scanned-document TIFFs
(patents, books, archives — TIFF 6.0 §10/§11 compressions 2, 3, 4).

Pure stdlib/numpy. Bit convention: raw samples are 0 = WHITE,
1 = BLACK (TIFF's photometric-0 pages then invert on decode like any
other MinIsWhite page). Code streams are MSB-first.

- ``mh``  — Modified Huffman (TIFF compression 2, "CCITT RLE"): each
  row is an independent run-length line of T.4 white/black codes and
  starts on a byte boundary (the TIFF byte-aligned variant).
- ``g3``  — Group 3 one-dimensional (TIFF compression 3, T4Options
  bit 0 clear): MH rows, each prefixed by an EOL (000000000001),
  optionally fill-padded. ``g3-2d`` is the T.4 two-dimensional (MR)
  extension (T4Options bit 0): EOL + tag bit per line, 2-D lines coded
  against the previous line with the same pass/vertical/horizontal
  modes as T.6, a 1-D line every K. Uncompressed mode gates by name
  in the TIFF layer.
- ``g4``  — Group 4 / MMR (TIFF compression 4): fully two-dimensional
  pass / horizontal / vertical coding against the previous row, the
  first row coded against an imaginary all-white reference. The
  encoder terminates with EOFB per T.6; the decoder stops after the
  requested rows (TIFF readers never require EOFB).

The run-length code tables below are the public T.4 tables 1-3
(terminating codes 0..63, make-up codes 64..1728 per color, extended
make-ups 1792..2560 shared). Encoder and decoder are table-driven from
the SAME dicts, and `tests/test_fax.py` additionally pins well-known
codewords (white 2 = 0111, black 1 = 010, ...) against the spec so a
transcription slip cannot hide behind a self-consistent round trip.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# T.4 table 1 — white terminating codes (run length -> bit string)
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

# T.4 table 2 — white make-up codes
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

# T.4 table 1 — black terminating codes
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

# T.4 table 2 — black make-up codes
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# T.4 table 3 — extended make-ups, shared by both colors
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"


def _decode_table(*tables: dict[int, str]) -> dict[int, int]:
    """Sentinel-keyed decode dict like the JPEG Huffman tables:
    key = (1 << len) | code, value = run length."""
    out: dict[int, int] = {}
    for tbl in tables:
        for run, bits in tbl.items():
            key = (1 << len(bits)) | int(bits, 2)
            if key in out:
                raise ValueError(f"fax code table collision at {bits}")
            out[key] = run
    return out


_WHITE_DECODE = _decode_table(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DECODE = _decode_table(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)
_MAX_CODE_LEN = 14  # longest fax codeword (13) + 1 slack


def _run_lut(table: dict[int, int]):
    """14-bit-window (run, code-length) LUT over a sentinel-keyed run
    table (r13, guide §4.2 — the jpeg.py window-LUT pattern): one probe
    replaces the per-bit dict walk of the old ``_read_code``. Disjoint
    fills by the prefix property; unmatched windows keep length 0."""
    size = 1 << _MAX_CODE_LEN
    run_a = np.zeros(size, dtype=np.int32)
    len_a = np.zeros(size, dtype=np.int32)
    for key, run in table.items():
        length = key.bit_length() - 1
        code = key - (1 << length)
        lo = code << (_MAX_CODE_LEN - length)
        hi = (code + 1) << (_MAX_CODE_LEN - length)
        run_a[lo:hi] = run
        len_a[lo:hi] = length
    return run_a.tolist(), len_a.tolist()


_WHITE_LUT = _run_lut(_WHITE_DECODE)
_BLACK_LUT = _run_lut(_BLACK_DECODE)


class _BitReader:
    """MSB-first bit reader (no byte-stuffing — fax streams are raw)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pad = data + b"\x00\x00\x00\x00"  # 4-byte window fetches
        self.nbits = len(data) * 8
        self.bitpos = 0

    def read_bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("corrupt fax stream: ran out of bits")
        self.bitpos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align_byte(self) -> None:
        self.bitpos = (self.bitpos + 7) // 8 * 8

    def exhausted(self) -> bool:
        return self.bitpos >= self.nbits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_str(self, bits: str) -> None:
        # one int parse per code instead of a per-character loop (r13);
        # byte-identical emission (pinned in tests/test_fax.py)
        n = len(bits)
        if not n:
            return
        self.acc = (self.acc << n) | int(bits, 2)
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align_byte(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def flush(self) -> bytes:
        self.align_byte()
        return bytes(self.out)


def _read_code(rd: _BitReader, lut) -> int:
    """One run code via the 14-bit-window LUT. Error parity with the
    per-bit walk it replaces: running out of bits mid-code raises the
    same message as the old read_bit, and a 14-bit no-match (with
    enough bits) raises the same invalid-code error."""
    p = rd.bitpos
    w = (
        int.from_bytes(rd.pad[p >> 3 : (p >> 3) + 4], "big")
        >> (18 - (p & 7))
    ) & 0x3FFF
    run_l, len_l = lut
    length = len_l[w]
    if length == 0 or p + length > rd.nbits:
        need = length if length else _MAX_CODE_LEN
        if p + need > rd.nbits:
            raise ValueError("corrupt fax stream: ran out of bits")
        raise ValueError("corrupt fax stream: invalid run-length code")
    rd.bitpos = p + length
    return run_l[w]


def _read_run(rd: _BitReader, white: bool) -> int:
    """One complete run: zero or more make-ups, then a terminating
    code (make-ups are multiples of 64; terminating codes are 0..63)."""
    lut = _WHITE_LUT if white else _BLACK_LUT
    total = 0
    while True:
        run = _read_code(rd, lut)
        total += run
        if run < 64:
            return total


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    while run >= 2624:  # beyond the largest make-up + 63
        bw.write_str(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        step = (run // 64) * 64
        bw.write_str(_EXT_MAKEUP[step] if step >= 1792 else makeup[step])
        run -= step
    bw.write_str(term[run])


def _decode_mh_row(rd: _BitReader, w: int) -> np.ndarray:
    """One T.4 one-dimensional line: alternating white/black runs
    starting white, summing exactly to the row width."""
    row = np.zeros(w, dtype=np.uint8)
    pos = 0
    white = True
    while pos < w:
        run = _read_run(rd, white)
        if pos + run > w:
            raise ValueError("corrupt fax stream: run past end of row")
        if not white:
            row[pos : pos + run] = 1
        pos += run
        white = not white
    return row


def _row_changes(row: np.ndarray) -> list[int]:
    """Positions where the color changes, scanning left to right from
    the implicit white start (the T.6 changing-elements view)."""
    padded = np.diff(row.astype(np.int8), prepend=np.int8(0))
    return np.flatnonzero(padded).tolist()


def _all_row_changes(bits: np.ndarray) -> list[list[int]]:
    """``_row_changes`` for every row in ONE vectorized pass (r13,
    guide §4.2): the per-row numpy-call overhead (diff + astype +
    flatnonzero per tiny row) dominated fax ENCODE on narrow pages.
    Row-for-row identical to mapping ``_row_changes``."""
    rows = bits.shape[0]
    d = np.diff(
        bits.astype(np.int8), axis=1,
        prepend=np.zeros((rows, 1), dtype=np.int8),
    )
    rr, cc = np.nonzero(d)
    idx = np.searchsorted(rr, np.arange(rows + 1))
    return [cc[idx[y] : idx[y + 1]].tolist() for y in range(rows)]


def _g4_decode_row(rd: _BitReader, ref: list[int], w: int) -> list[int]:
    """One T.6 2-D line against the reference line's changing elements.
    Returns the new line's changing elements."""
    cur: list[int] = []
    a0 = -1  # sentinel: before the first pixel, color white
    color = 0  # 0 = white

    def b1_b2() -> tuple[int, int]:
        # b1: first changing element on the reference line to the right
        # of a0 with the OPPOSITE color of a0's color — i.e. a change TO
        # the opposite color. ref alternates starting with a w->b change,
        # so changes at even indices flip to black, odd to white.
        # r13: ref is strictly increasing, so the "first > a0" scan is a
        # bisect; the parity fix-up is at most one step (identical i to
        # the old linear walk — changes alternate). Was O(changes) per
        # mode code, i.e. quadratic per row on wide pages.
        n = len(ref)
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else w
        b2 = ref[i + 1] if i + 1 < n else w
        return b1, b2

    while True:
        b1, b2 = b1_b2()
        # mode codes: V0=1, VR1=011, VL1=010, H=001, P=0001,
        # VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        if rd.read_bit():  # 1 -> V0
            a1 = b1
            mode = "v"
        elif rd.read_bit():  # 01x
            a1 = b1 + 1 if rd.read_bit() else b1 - 1
            mode = "v"
        elif rd.read_bit():  # 001 -> horizontal
            r1 = _read_run(rd, color == 0)
            r2 = _read_run(rd, color != 0)
            start = 0 if a0 < 0 else a0
            if r1 + r2 == 0 and a0 >= 0:
                # two zero runs advance nothing: corrupt, not a hang
                raise ValueError("corrupt fax stream: empty H runs")
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
            if a0 > w:
                raise ValueError("corrupt fax stream: H runs past row end")
            if a0 >= w:
                break
            continue
        elif rd.read_bit():  # 0001 -> pass
            a0 = b2
            if a0 >= w:
                break
            continue
        else:  # 00001x / 000001x -> V±2 / V±3
            if rd.read_bit():
                a1 = b1 + 2 if rd.read_bit() else b1 - 2
            elif rd.read_bit():
                a1 = b1 + 3 if rd.read_bit() else b1 - 3
            else:
                raise ValueError(
                    "fax extension/uncompressed mode code unsupported"
                )
            mode = "v"
        if mode == "v":
            # a1 must lie strictly right of a0 (T.6: coding advances);
            # an equal-or-left change would be a zero/negative run and
            # flip the color parity of everything after it
            if a1 > w or a1 <= a0:
                raise ValueError("corrupt fax stream: vertical out of range")
            cur.append(a1)
            color ^= 1
            a0 = a1
            if a0 >= w:
                break
    # drop the sentinel change exactly at w (run ends there anyway)
    while cur and cur[-1] >= w:
        cur.pop()
    return cur


def _changes_to_row(changes: list[int], w: int) -> np.ndarray:
    row = np.zeros(w, dtype=np.uint8)
    for i in range(0, len(changes), 2):
        start = changes[i]
        end = changes[i + 1] if i + 1 < len(changes) else w
        row[start:end] = 1
    return row


def decode_fax(
    data: bytes, w: int, rows: int, scheme: str
) -> np.ndarray:
    """Decode one independently-coded block (a TIFF strip) to a
    (rows, w) uint8 array, 0 = white / 1 = black."""
    rd = _BitReader(data)
    out = np.zeros((rows, w), dtype=np.uint8)
    if scheme == "g4":
        ref: list[int] = []  # imaginary all-white reference line
        for y in range(rows):
            ref = _g4_decode_row(rd, ref, w)
            out[y] = _changes_to_row(ref, w)
        return out
    if scheme == "g3-2d":
        # T.4 2-D: EOL + tag bit per line; tag 1 -> 1-D, tag 0 -> 2-D
        ref: list[int] = []
        for y in range(rows):
            _read_eol(rd)
            if rd.read_bit():
                row = _decode_mh_row(rd, w)
                out[y] = row
                ref = _row_changes(row)
            else:
                ref = _g4_decode_row(rd, ref, w)
                out[y] = _changes_to_row(ref, w)
        return out
    if scheme not in ("mh", "g3"):
        raise ValueError(f"unknown fax scheme {scheme!r}")
    for y in range(rows):
        if scheme == "mh":
            rd.align_byte()  # TIFF compression 2: byte-aligned rows
        else:  # g3 1-D: EOL (with optional fill 0s) before every row
            _read_eol(rd)
        out[y] = _decode_mh_row(rd, w)
    return out


def _read_eol(rd: _BitReader) -> None:
    """Consume one EOL (>= 11 zero bits then a 1, optionally
    fill-padded with extra zeros)."""
    zeros = 0
    while True:
        if rd.read_bit():
            if zeros < 11:
                raise ValueError(
                    "corrupt fax stream: expected EOL before row"
                )
            return
        zeros += 1


def encode_fax(bits: np.ndarray, scheme: str, k: int = 2) -> bytes:
    """Encode a (rows, w) uint8 array (0 = white / 1 = black) as one
    independently-coded block. ``mh`` byte-aligns every row (TIFF
    compression 2); ``g3`` prefixes every row with an EOL; ``g3-2d``
    is T.4 two-dimensional coding (EOL + tag bit per line, a 1-D line
    every ``k``); ``g4`` codes 2-D against the previous row and
    terminates with EOFB."""
    bits = np.asarray(bits, dtype=np.uint8)
    if bits.ndim != 2:
        raise ValueError("encode_fax expects a (rows, w) bit array")
    if bits.max(initial=0) > 1:
        raise ValueError("encode_fax expects 0/1 samples")
    rows, w = bits.shape
    bw = _BitWriter()
    all_changes = _all_row_changes(bits)  # one pass for every scheme
    if scheme in ("mh", "g3"):
        for y in range(rows):
            if scheme == "mh":
                bw.align_byte()
            else:
                bw.write_str(_EOL)
            _encode_1d_row(bw, all_changes[y], w)
        return bw.flush()
    if scheme == "g3-2d":
        # T.4 two-dimensional (MR): every line is EOL + a tag bit — 1
        # means the NEXT line is 1-D coded, 0 means 2-D coded against
        # the previous line. Every k-th line is 1-D (the error-bound
        # K factor; K=2 standard, K=4 fine resolution).
        if k < 1:
            raise ValueError("g3-2d K factor must be >= 1")
        ref: list[int] = []
        for y in range(rows):
            bw.write_str(_EOL)
            if y % k == 0:
                bw.write_str("1")
                _encode_1d_row(bw, all_changes[y], w)
                ref = all_changes[y]
            else:
                bw.write_str("0")
                cur = all_changes[y]
                _encode_2d_row(bw, cur, ref, w)
                ref = cur
        return bw.flush()
    if scheme != "g4":
        raise ValueError(f"unknown fax scheme {scheme!r}")
    ref = []
    for y in range(rows):
        cur = all_changes[y]
        _encode_2d_row(bw, cur, ref, w)
        ref = cur
    bw.write_str(_EOL + _EOL)  # EOFB per T.6
    return bw.flush()


def _encode_1d_row(bw: _BitWriter, row_changes: list[int], w: int) -> None:
    """One MH-coded line: alternating run lengths from the changes."""
    pos = 0
    white = True
    changes = row_changes + [w]
    for nxt in changes:
        if nxt == pos and white:
            # row starts black: emit the zero-length white run
            _write_run(bw, 0, True)
            white = False
            continue
        _write_run(bw, nxt - pos, white)
        pos = nxt
        white = not white


def _encode_2d_row(
    bw: _BitWriter, cur: list[int], ref: list[int], w: int
) -> None:
    """One 2-D-coded line (pass/vertical/horizontal modes) against the
    reference line's changing elements — shared by T.6 (every line) and
    T.4 2-D (tagged lines)."""
    a0 = -1
    color = 0
    ci = 0  # index into cur of the next change > a0
    while True:
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        n = len(ref)
        i = bisect_right(ref, a0)  # r13: same i as the linear walk
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else w
        b2 = ref[i + 1] if i + 1 < n else w
        if b2 < a1:
            bw.write_str("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write_str(
                {0: "1", 1: "011", -1: "010", 2: "000011",
                 -2: "000010", 3: "0000011", -3: "0000010"}[a1 - b1]
            )
            a0 = a1
            color ^= 1
            ci += 1
        else:  # horizontal
            bw.write_str("001")
            start = 0 if a0 < 0 else a0
            _write_run(bw, a1 - start, color == 0)
            _write_run(bw, a2 - a1, color != 0)
            a0 = a2
            ci += 2
        if a0 >= w:
            break
