"""Perceptual image signatures (dHash / aHash) and the Spark operator
that computes them — the image leg of the near-duplicate family.

A 100 TB curation pipeline (LAION/DataComp-style) needs image-level
near-dup BEFORE any embedding model runs: two crops/re-encodes of the
same picture should collapse under a cheap integer signature. The
classic answer is a difference hash (dHash): area-downsample the
grayscale image to a 9×8 grid, compare horizontal neighbors, and pack
the 64 "is the right pixel brighter" bits into one int64. Re-encoding,
scaling and small noise perturb few bits, so near-dups sit at small
Hamming distance — which the banded-Hamming pair machinery
(``operators/binary.hamming_neardup_pairs``) turns into an equi-join
problem: with 8 bands of 8 bits, any pair within distance ≤ 7 MUST
agree on at least one whole band (pigeonhole), so banded candidates +
exact XOR/bit_count re-check is EXACT at those radii — not an
approximation like hyperplane LSH.

Scale posture: pixels never leave the Arrow stage — the decoder and
the hash both run inside one ``mapInPandas`` and only (id, int64
signature) rows shuffle. The reference has no image operators at all
(SURVEY §2.B multimodal); decoders are this repo's own
(gif/jpeg/tiff/png/vp8l modules).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame


def _to_gray(px: np.ndarray) -> np.ndarray:
    """(h, w[, ch]) array in any sample domain → (h, w) float64 luma.
    Integer-coefficient Rec.601 luma for color; alpha ignored."""
    a = np.asarray(px, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.ndim == 3:
        if a.shape[2] == 1:
            return a[:, :, 0]
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        return (299 * r + 587 * g + 114 * b) / 1000.0
    raise ValueError(f"expected 2-D or 3-D pixel array, got {a.shape}")


def _box_resample(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Area (box) downsample to (rows, cols). Exact block means when the
    dimensions divide (the fixture path: 2× upscaled grids reduce back
    to their exact cell values); otherwise each output cell averages
    the input cells its box overlaps, weighted by overlap — plain
    summed-area arithmetic, no external resampler."""
    h, w = gray.shape
    if h % rows == 0 and w % cols == 0:
        return gray.reshape(rows, h // rows, cols, w // cols).mean(
            axis=(1, 3)
        )
    # integral-image area averaging for non-dividing geometries.
    # Fractional-box area sums via linear edge interpolation would be
    # overkill for a hash; snap to nearest integer boundaries (standard
    # for dHash). The clamps keep every box at least one real pixel
    # even when the image is SMALLER than the hash grid (cells then
    # repeat pixels instead of dividing by zero). r12 (guide §4.2
    # "vectorize inside the Python stage"): the former per-cell Python
    # double loop (rows·cols iterations — 1024 for the 32×32 pHash
    # grid, measured 6.2 ms/image) is replaced by whole-grid NumPy
    # indexing over the same integral image; per-cell arithmetic —
    # banker's-rounded boundaries, the ((a−b)−c)+d sum order, division
    # by the exact integer box area — is reproduced operation-for-
    # operation, so every cell is bit-identical (pinned by
    # tests/test_imagehash.py against the scalar reference).
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    ys = np.linspace(0, h, rows + 1)
    xs = np.linspace(0, w, cols + 1)
    y0 = np.minimum(np.round(ys[:-1]).astype(np.int64), h - 1)
    x0 = np.minimum(np.round(xs[:-1]).astype(np.int64), w - 1)
    y1 = np.minimum(np.maximum(np.round(ys[1:]).astype(np.int64), y0 + 1), h)
    x1 = np.minimum(np.maximum(np.round(xs[1:]).astype(np.int64), x0 + 1), w)
    s = (
        ii[np.ix_(y1, x1)]
        - ii[np.ix_(y0, x1)]
        - ii[np.ix_(y1, x0)]
        + ii[np.ix_(y0, x0)]
    )
    return s / ((y1 - y0)[:, None] * (x1 - x0)[None, :])


def dhash64(px: np.ndarray) -> int:
    """Difference hash: 9×8 box downsample, bit (y*8 + x) set iff
    grid[y, x+1] > grid[y, x] (strict; ties are 0). Returns a SIGNED
    int64 (bit 63 = row 7's last comparison) — Hamming distance via
    XOR + popcount is two's-complement safe on both Spark and DuckDB."""
    grid = _box_resample(_to_gray(px), 8, 9)
    bits = grid[:, 1:] > grid[:, :-1]  # (8, 8), row-major
    v = 0
    for p in np.flatnonzero(bits.reshape(-1)):
        v |= 1 << int(p)
    # two's complement into int64 range
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash256(px: np.ndarray) -> list[int]:
    """Wide difference hash (r11, VERDICT r10 #4): 17×16 box downsample
    (17 columns, 16 rows), bit (y*16 + x) set iff grid[y, x+1] >
    grid[y, x] (strict) — 256 bits packed little-endian into FOUR
    signed int64s (long j holds bits [64j, 64j+64); two's-complement
    per long, same convention as ``dhash64``). The wide signature is
    the scale answer to the 64-bit block-key density cliff: fed to
    ``binary.hamming_neardup_pairs(n_longs=4)``, the minimal radius-7
    config keys on 32-bit blocks, so per-bucket density stays ~n/2³²
    at any realistic corpus size (SCALE.md "Image near-dup ladder")."""
    grid = _box_resample(_to_gray(px), 16, 17)
    bits = grid[:, 1:] > grid[:, :-1]  # (16, 16), row-major
    flat = bits.reshape(-1)
    out = []
    for j in range(4):
        v = 0
        for p in np.flatnonzero(flat[64 * j : 64 * (j + 1)]):
            v |= 1 << int(p)
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out


PHASH_GRID = 32
PHASH_BLOCK = 8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: M[u, x] = s_u·cos(π·u·(2x+1)/(2n)),
    s_0 = √(1/n), s_u = √(2/n). Plain NumPy — the 32×32 grid makes the
    O(n³) matmul trivial and keeps the kernel dependency-free."""
    x = np.arange(n)
    u = np.arange(n)[:, None]
    m = np.cos(np.pi * u * (2 * x + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(PHASH_GRID)


def phash64(px: np.ndarray) -> int:
    """DCT perceptual hash (r12, VERDICT r11 #5) — the standard answer
    to crop/gamma/blur robustness in LAION-style image dedup, where
    dHash/aHash only cover re-encode and resolution changes: box
    downsample to 32×32 luma, orthonormal 2D DCT-II, keep the 8×8
    low-frequency block, bit (v·8 + u) set iff coefficient (u, v) is
    strictly greater than the MEAN of the block's 63 AC coefficients
    (DC excluded from both the bits and the threshold — bit 0, the DC
    position, is always 0). Mean-thresholding
    AC energy makes the hash invariant to global gain and robust to
    monotone tone curves (gamma) and mild blur, which perturb the
    low-frequency ORDERING far less than they perturb pixel
    differences (tests/test_imagehash.py pins both empirically).
    Same int64 packing/Hamming conventions as ``dhash64``, so the
    whole banded pair machinery applies unchanged."""
    grid = _box_resample(_to_gray(px), PHASH_GRID, PHASH_GRID)
    coeffs = _DCT32 @ grid @ _DCT32.T
    low = coeffs[:PHASH_BLOCK, :PHASH_BLOCK]  # [v, u] (rows = vertical)
    ac = low.reshape(-1)[1:]  # drop DC
    mean = ac.mean()
    v = 0
    for p in np.flatnonzero(low.reshape(-1) > mean):
        if p:  # DC never contributes a bit
            v |= 1 << int(p)
    # two's complement into int64 range, same as every other hasher:
    # bit 63 is coefficient (7,7) > mean — set on ~half of natural
    # images (review r12: only the registry fixture keeps it clear, so
    # without the wrap the Arrow int64 cast overflows in production)
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(px: np.ndarray) -> int:
    """Average hash: 8×8 box downsample, bit (y*8 + x) set iff the cell
    is strictly brighter than the grid mean. Coarser than dHash (global
    mean shifts under exposure changes) but catches flat-region dups
    dHash misses; the pair machinery is identical."""
    grid = _box_resample(_to_gray(px), 8, 8)
    bits = grid > grid.mean()
    v = 0
    for p in np.flatnonzero(bits.reshape(-1)):
        v |= 1 << int(p)
    return v - (1 << 64) if v >= (1 << 63) else v


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Correct pixels to upright per the EXIF/TIFF Orientation tag
    (1..8) — the rotate-BEFORE-hash step: a sideways image's dHash
    will not match its upright twin, so curation pipelines normalize
    orientation first (``exif.probe_exif`` reads the tag). Cases per
    the public EXIF spec: 1 normal, 2 flip-H, 3 rotate 180, 4 flip-V,
    5 transpose (main diagonal), 6 rotate 90 CW, 7 transverse
    (anti-diagonal), 8 rotate 270 CW. Works on (h, w) and
    (h, w, ch)."""
    o = int(orientation or 1)
    if o == 1:
        return px
    if o == 2:
        return px[:, ::-1]
    if o == 3:
        return px[::-1, ::-1]
    if o == 4:
        return px[::-1, :]
    if o == 5:
        return np.swapaxes(px, 0, 1)
    if o == 6:
        return np.rot90(px, -1)
    if o == 7:
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.rot90(px, 1)
    raise ValueError(f"EXIF orientation {o} out of range 1..8")


# the transform that UNDOES each orientation (how a fixture stores an
# upright scene so that apply_exif_orientation recovers it): every case
# is self-inverse except the two quarter-rotations, which swap
INVERSE_ORIENTATION = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def decode_image_gray(payload: bytes) -> np.ndarray:
    """Magic-dispatched pixel decode → (h, w) float64 luma, over the
    repo's own codecs (the pixels-level twin of
    ``multimodal._decode_image``'s stats dispatch): GIF, PNG, JPEG,
    lossless WebP, TIFF and BMP."""
    b = bytes(payload)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from vector_lake_spark.gif import decode_gif_pixels

        return _to_gray(decode_gif_pixels(b))
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        from vector_lake_spark.multimodal import decode_png_pixels

        return _to_gray(decode_png_pixels(b))
    if b[:2] == b"\xff\xd8":
        from vector_lake_spark.jpeg import decode_jpeg_pixels

        return _to_gray(decode_jpeg_pixels(b))
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from vector_lake_spark.vp8l import decode_webp_pixels

        return _to_gray(decode_webp_pixels(b)["pixels"])
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from vector_lake_spark.tiff import decode_tiff_pixels

        return _to_gray(decode_tiff_pixels(b))
    if b[:2] == b"BM":
        from vector_lake_spark.multimodal import decode_bmp

        # decode_bmp is stats-shaped but owns the format validation
        # (uncompressed 24-bit only — 32bpp/palette/compressed raise
        # its named gates instead of silently hashing garbage, review
        # r10); after it accepts, the row slicing here is safe
        decode_bmp(b)
        import struct

        off, = struct.unpack_from("<I", b, 10)
        w, h = struct.unpack_from("<ii", b, 18)
        # negative height = top-down row order (legal per the BMP spec,
        # and decode_bmp's stats path accepts it) — same pixels, no
        # bottom-up flip (r11, ADVICE r10: this is a well-formed layout,
        # not corruption)
        flip = h > 0
        h = abs(h)
        row = (w * 3 + 3) & ~3
        px = np.frombuffer(
            b, dtype=np.uint8, count=h * row, offset=off
        ).reshape(h, row)
        if flip:
            px = px[::-1]
        px = px[:, : w * 3].reshape(h, w, 3)
        return _to_gray(px[:, :, ::-1])  # BGR → RGB
    raise NotImplementedError(
        "unrecognized image payload for perceptual hashing (GIF, PNG, "
        "JPEG, lossless WebP, TIFF and BMP decode natively)"
    )


def image_signatures(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind: str = "dhash",
) -> DataFrame:
    """(id, payload) → (id, sig) perceptual signatures through ONE
    Arrow ``mapInPandas`` stage: decode + downsample + hash per row,
    pixels never serialized out of Python. ``kind``: "dhash"/"ahash"
    emit one int64 (``sig long``); "dhash256" emits the 4×int64 wide
    signature (``sig array<long>`` — r11). Downstream, feed
    ``binary.hamming_neardup_pairs`` (exact at radius < n_blocks;
    n_longs=4 for dhash256) or the ``vec_topk_hamming`` XOR kernel for
    query-time lookup."""
    import pandas as pd

    try:
        hasher = {
            "dhash": dhash64, "ahash": ahash64, "dhash256": dhash256,
            "phash": phash64,
        }[kind]
    except KeyError:
        raise ValueError(
            f"unknown signature kind {kind!r} (dhash, ahash, dhash256, "
            "phash)"
        ) from None
    wide = kind == "dhash256"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            sigs = [
                hasher(decode_image_gray(p)) for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sig": sigs if wide else pd.array(sigs, "int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=f"{id_col} long, sig " + ("array<long>" if wide else "long"),
    )


def decode_video_frames_gray(payload: bytes, frame_indices):
    """Magic-dispatched selective video decode → [(frame_no, (h, w)
    float64 luma)] over the repo's own container/codec stack (the
    pixels-level twin of ``multimodal.extract_video_frames``'s stats
    dispatch): MJPEG/RLE8 AVI, photo-JPEG MP4, V_MJPEG Matroska. Only
    the requested frames are entropy-decoded (RLE8 replays its delta
    chain up to the last request — the interframe cost model);
    interframe codecs raise their named gates inside the decoders."""
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from vector_lake_spark.avi import decode_avi_frames as dec
    else:
        from vector_lake_spark.mkv import is_mkv
        from vector_lake_spark.mp4 import is_mp4

        if is_mkv(b):
            from vector_lake_spark.mkv import decode_mkv_frames as dec
        elif is_mp4(b):
            from vector_lake_spark.mp4 import decode_mp4_frames as dec
        else:
            raise NotImplementedError(
                "unrecognized video payload for perceptual hashing "
                "(MJPEG/RLE8 AVI, photo-JPEG MP4 and V_MJPEG Matroska "
                "decode natively)"
            )
    idx = list(frame_indices)
    try:
        _info, frames = dec(b, idx)
    except IndexError:
        # a video SHORTER than the sampling plan is data, not an error
        # (crawl clips vary in length): decode what exists and keep the
        # requested subset. Cost stays bounded — a video that trips
        # this has fewer frames than max(frame_indices)+1, so "all
        # frames" is smaller than the requested sample.
        _info, frames = dec(b, None)
        wanted = set(idx)
        frames = [(f, px) for f, px in frames if f in wanted]
    return [(fno, _to_gray(px)) for fno, px in frames]


def video_frame_signatures(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_indices=(0, 1, 2),
    kind: str = "dhash",
) -> DataFrame:
    """(id, payload) → (id, frame_no, sig) per-frame perceptual
    signatures for VIDEO near-dup (r11): container probe + selective
    frame decode + dHash all inside ONE Arrow ``mapInPandas`` — pixels
    and container bytes never leave Python, only (id, int, int64) rows
    shuffle. Downstream, near-dup videos come from per-frame-index
    banded-Hamming joins aggregated per video pair (two re-encodes of
    the same clip match frame-for-frame on the shared timeline —
    ``queries.q_mm_video_neardup``). Sampling which frames to hash is
    the caller's ``frame_indices`` knob; cost is frames_hashed ×
    decode, never duration × decode (the selective-decode contract of
    avi/mp4/mkv)."""
    import pandas as pd

    try:
        hasher = {
            "dhash": dhash64, "ahash": ahash64, "dhash256": dhash256,
            "phash": phash64,
        }[kind]
    except KeyError:
        raise ValueError(
            f"unknown signature kind {kind!r} (dhash, ahash, dhash256, "
            "phash)"
        ) from None
    idx = list(frame_indices)
    wide = kind == "dhash256"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for fno, gray in decode_video_frames_gray(payload, idx):
                    rows.append((mid, fno, hasher(gray)))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_no", "sig"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=f"{id_col} long, frame_no int, sig "
        + ("array<long>" if wide else "long"),
    )
