"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; transforms run
as Arrow-batched ``mapInPandas`` over the binary payloads so the bytes never
pass through Python row-at-a-time serde. Decode status (r06):

- REAL, stdlib-only: uncompressed 24-bit BMP (``decode_bmp`` — struct
  parsing → dims + channel means), PNG at **every legal IHDR
  combination** (``decode_png`` — stdlib zlib inflate + full
  None/Sub/Up/Average/Paeth filter reconstruction; depths 1/2/4/8/16
  and Adam7 interlace since r08), and WAV at **every sample format**
  (``decode_wav`` — 8-bit biased / 16 / sign-extended 24 / 32 integer
  PCM since r08; IEEE float 32/64 and G.711 A-law/μ-law through the
  manual RIFF walk since r09), each with a Spark operator
  (``extract_bmp_features`` /
  ``extract_png_features`` / ``extract_wav_features``) and
  exact-pixel/exact-sample tests through the Arrow boundary.
- REAL, numpy-only: baseline + progressive JPEG (``jpeg.py`` — Huffman
  + dequant + IDCT + YCbCr + Annex G scans, with matching encoders so
  exactness is provable; ``extract_jpeg_features``), GIF87a/89a
  (``gif.py`` — LZW, interlace, animation composition;
  ``extract_gif_features``), **lossless WebP** (``vp8l.py`` — the
  complete VP8L bitstream, simple / VP8X-wrapped / animated with
  composition in ``webp.py``; ``extract_webp_features``; r08), and
  **video**: MJPEG-in-AVI (``avi.py``) + photo-JPEG-in-MP4
  (``mp4.py`` — full sample-table probe) behind the shared
  ``extract_video_frames`` dispatch, decoding ONLY sampled frames.
- All three video containers PROBE for real (RIFF/AVI, ISO-BMFF/MP4,
  EBML/Matroska — ``probe_media`` is the unified metadata pass);
  remaining gates are named codec subsets (arithmetic-coded JPEG,
  lossy VP8, motion-compensated video codecs — Matroska block decode
  raises listing the codecs it found, though V_MJPEG tracks decode for
  real; RLE8-in-AVI interframe deltas and lossless SOF3 JPEG decode
  for real since r09).

At 100 TB: binary payloads dominate row size, so every transform projects
only the columns it needs (column pruning keeps untouched media out of the
scan), and ``repartition`` before heavy decode stages sizes batches to
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image(payload: bytes):
    """Decode an image payload. Uncompressed 24-bit BMP (r05), 8-bit
    PNG (r06 — DEFLATE is stdlib zlib, filters reconstructed here),
    baseline + progressive JPEG (r06/r07 — full Huffman + dequant +
    IDCT + Annex G progressive scans in ``jpeg.py``, numpy only) and
    GIF (r07 — LZW + frame composition in ``gif.py``) decode for real;
    the remaining gates are format subsets (arithmetic-coded JPEG,
    lossy VP8), each raising with the feature named; lossless SOF3
    decodes for real since late r09."""
    if payload is not None and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload is not None and payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload is not None and payload[:2] == b"\xff\xd8":
        from vector_lake_spark.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload is not None and payload[:6] in (b"GIF87a", b"GIF89a"):
        from vector_lake_spark.gif import decode_gif

        return decode_gif(payload)
    if payload is not None and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from vector_lake_spark.webp import decode_webp

        # lossless (VP8L) decodes for real; VP8/VP8X raise named gates
        return decode_webp(payload)
    if payload is not None and payload[:4] in (b"II*\x00", b"MM\x00*"):
        from vector_lake_spark.tiff import decode_tiff

        # none/LZW/PackBits, striped or tiled, 8/16-bit and palette
        # pages decode for real (r08/r09 — 16-bit/palette means are in
        # the 16-bit range); 1/2/4-bit, fax, JPEG-in-TIFF and planar
        # raise named gates
        return decode_tiff(payload)
    raise NotImplementedError(
        "unrecognized image payload (BMP, PNG, JPEG, GIF, lossless WebP "
        "and baseline TIFF decode natively — decode_bmp / decode_png / "
        "jpeg.decode_jpeg / gif.decode_gif / webp.decode_webp / "
        "tiff.decode_tiff; lossy WebP probes via webp.probe_webp)"
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


# Adam7 interlace pass geometry: (x_origin, y_origin, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw, pos, n_rows, row_bytes, bpp):
    """Reconstruct one filtered scanline block (None/Sub/Up/Average/
    Paeth); ``bpp`` is the filter's byte distance to the left neighbor
    (max(1, channels*depth//8) per the spec). Returns (rows, new_pos)."""
    import numpy as np

    out = np.zeros((n_rows, row_bytes), dtype=np.int32)
    prev = np.zeros(row_bytes, dtype=np.int32)
    for r in range(n_rows):
        if pos + 1 + row_bytes > len(raw):
            raise ValueError("PNG pixel stream length mismatch")
        f = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes, offset=pos + 1
        ).astype(np.int32)
        pos += 1 + row_bytes
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorizable (no intra-row dependency)
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth carry an intra-row dependency
            cur = np.zeros(row_bytes, dtype=np.int32)
            for i in range(row_bytes):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) // 2
                elif f == 4:  # Paeth
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                cur[i] = (int(line[i]) + pred) & 0xFF
        out[r] = cur
        prev = cur
    return out, pos


def _png_samples(rows, w, ch, depth):
    """Packed reconstructed bytes -> (n_rows, w*ch) sample values in the
    file's native domain (0..2^depth-1): big-endian pairs at 16 bits,
    MSB-first bit unpacking below 8."""
    import numpy as np

    if depth == 8:
        return rows[:, : w * ch]
    if depth == 16:
        used = rows[:, : w * ch * 2]
        return (used[:, 0::2] << 8) | used[:, 1::2]
    per = 8 // depth  # sub-byte: spec only allows these for 1 channel
    vals = np.zeros((rows.shape[0], rows.shape[1] * per), dtype=np.int32)
    for k in range(per):
        shift = 8 - depth * (k + 1)
        vals[:, k::per] = (rows >> shift) & ((1 << depth) - 1)
    return vals[:, : w * ch]


def decode_png_pixels(payload: bytes):
    """REAL decode of a PNG (grayscale / RGB / palette / RGBA) to its
    pixel array — (h, w, ch) float64 in the file's native sample domain
    (palette resolved to RGB) — with pure stdlib ``zlib`` + numpy:
    chunk walk, DEFLATE inflate, full scanline filter reconstruction
    (None/Sub/Up/Average/Paeth). Split out of ``decode_png`` in r10 so
    perceptual hashing (``operators/imagehash.py``) can reach pixels.

    r08 closed the format gates: EVERY legal IHDR combination decodes —
    bit depths 1/2/4 (gray + palette, MSB-first unpacking), 8, and 16
    (big-endian pairs), plus Adam7 interlacing (seven independently
    filtered passes scattered into the canvas). Channel means are
    reported in the file's native sample domain (0..65535 for 16-bit,
    0..2^d-1 for shallow grays) — the same raw-domain stance as
    ``decode_wav``'s width-dependent RMS. Illegal depth/color combos
    are corrupt input (ValueError), no longer NotImplementedError."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, idat, header, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, _comp, _filt, interlace = header
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 6: (8, 16)}
    if color not in legal or depth not in legal[color]:
        raise ValueError(
            f"corrupt PNG: illegal depth/color combination "
            f"(depth={depth}, color_type={color})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"corrupt PNG: interlace method {interlace}")
    if color == 3 and (plte is None or len(plte) % 3 or not plte):
        raise ValueError("palette PNG without a valid PLTE chunk")
    if w == 0 or h == 0:
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        row_bytes = (w * ch * depth + 7) // 8
        rows, pos = _png_unfilter(raw, 0, h, row_bytes, bpp)
        samp = _png_samples(rows, w, ch, depth)
    else:  # Adam7: seven sub-images, each filtered independently
        samp = np.zeros((h, w * ch), dtype=np.int32)
        samp3 = samp.reshape(h, w, ch)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            row_bytes = (wp * ch * depth + 7) // 8
            rows, pos = _png_unfilter(raw, pos, hp, row_bytes, bpp)
            sub = _png_samples(rows, wp, ch, depth).reshape(hp, wp, ch)
            samp3[y0::dy, x0::dx, :] = sub
    if pos != len(raw):
        raise ValueError("PNG pixel stream length mismatch")
    if color == 3:  # palette indices -> RGB via PLTE lookup
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samp.reshape(h, w)
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        px = pal[idx].astype(np.float64)
        ch = 3
    else:
        px = samp.reshape(h, w, ch).astype(np.float64)
    return px


def decode_png(payload: bytes) -> dict:
    """Stats-shaped PNG decode (dimensions + per-channel means) over
    ``decode_png_pixels``. Channel means are reported in the file's
    native sample domain (0..65535 for 16-bit, 0..2^d-1 for shallow
    grays) — the same raw-domain stance as ``decode_wav``'s
    width-dependent RMS. Illegal depth/color combos are corrupt input
    (ValueError), not NotImplementedError (r08 closed every legal IHDR
    combination: depths 1/2/4/8/16 and Adam7 interlacing)."""
    px = decode_png_pixels(payload)
    h, w, ch = px.shape
    if ch == 1:
        mr = mg = mb = float(px.mean())
    else:  # RGB / RGBA (alpha excluded from the channel means)
        mr, mg, mb = (float(px[:, :, i].mean()) for i in range(3))
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": round(mr, 6),
        "mean_g": round(mg, 6),
        "mean_b": round(mb, 6),
    }


def decode_bmp(payload: bytes) -> dict:
    """Real decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER) with
    pure stdlib struct parsing: dimensions + per-channel means. BMP rows
    are bottom-up and padded to 4-byte boundaries."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got {bpp}bpp, "
            f"compression={compression})"
        )
    h = abs(height)
    row_stride = (width * 3 + 3) & ~3
    tot = [0, 0, 0]  # B, G, R accumulator (BMP byte order)
    for r in range(h):
        base = data_offset + r * row_stride
        row = payload[base : base + width * 3]
        tot[0] += sum(row[0::3])
        tot[1] += sum(row[1::3])
        tot[2] += sum(row[2::3])
    n = max(width * h, 1)
    return {
        "width": width,
        "height": h,
        "mean_r": round(tot[2] / n, 6),
        "mean_g": round(tot[1] / n, 6),
        "mean_b": round(tot[0] / n, 6),
    }


def decode_wav(payload: bytes) -> dict:
    """Real decode of a WAV payload: sample rate, channel count,
    duration, and RMS amplitude.

    All integer PCM widths decode (r08 — the sub-16-bit gate is
    closed): 8-bit is UNSIGNED with a 128 bias per the RIFF spec,
    16/24/32-bit are signed little-endian (24-bit unpacked by byte
    composition — no stdlib struct code exists for it). Format tags
    beyond PCM decode too (late r09, via the manual RIFF walk the
    stdlib ``wave`` module refuses): IEEE float 32/64 (tag 3), A-law
    (tag 6) and μ-law (tag 7, both G.711 — ``g711.py``, expanded to
    16-bit linear before the RMS), both common ADPCM families (r10 —
    IMA/DVI tag 0x11 and MS tag 0x02, ``adpcm.py``, fact-chunk frame
    trim), plus WAVE_FORMAT_EXTENSIBLE wrapping any of those. RMS is
    computed on the raw samples of whatever domain the file carries
    (bias-corrected for 8-bit, [-1, 1] floats for tag 3, 16-bit linear
    for G.711/ADPCM), so the value is format-dependent by design — it
    reports THIS file's amplitude, not a normalized loudness."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            rate = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError):
        # stdlib wave only opens plain integer PCM (and raises EOFError,
        # not wave.Error, on some truncated headers) — companded/float/
        # extensible/corrupt payloads take the manual RIFF chunk walk,
        # which decodes or raises the named ValueError contract
        return _decode_wav_ext(payload)
    samples = _pcm_samples(frames, width)
    return _wav_stats(samples, rate, n_channels, n_frames, "pcm")


def _pcm_samples(frames: bytes, width: int):
    """Integer PCM bytes → int64 samples at any of the four widths —
    shared by the stdlib-wave path and the extensible RIFF walk."""
    import numpy as np

    if width == 1:  # unsigned with a 128 bias, per the RIFF spec
        return np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    if width == 2:
        return np.frombuffer(frames, dtype="<i2").astype(np.int64)
    if width == 3:  # no struct code for 24-bit: compose bytes
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        u = (
            raw[:, 0].astype(np.int64)
            | (raw[:, 1].astype(np.int64) << 8)
            | (raw[:, 2].astype(np.int64) << 16)
        )
        return u - ((u >> 23) << 24)  # sign-extend bit 23
    if width == 4:
        return np.frombuffer(frames, dtype="<i4").astype(np.int64)
    raise NotImplementedError(
        f"unsupported PCM sample width {width * 8} bits (8/16/24/32 "
        f"integer PCM decode natively)"
    )


def _wav_stats(samples, rate, n_channels, n_frames, codec) -> dict:
    import math

    # square-sum in float64: int64 would overflow past ~2^31.5 amplitude
    sf = samples.astype("float64")
    rms = math.sqrt(float((sf * sf).sum()) / len(sf)) if len(sf) else 0.0
    return {
        "sample_rate": rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
        "rms": round(rms, 6),
        "codec": codec,
    }


def _decode_wav_ext(payload: bytes) -> dict:
    """RIFF walk for the WAV formats stdlib ``wave`` refuses: IEEE
    float (3), A-law (6), μ-law (7), and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE, resolved through the SubFormat GUID's leading tag —
    including extensible INTEGER PCM, the form multichannel/24-bit
    encoders emit), and IMA/DVI ADPCM (0x0011 — ``adpcm.py``, r10).
    Anything else (MP3-in-WAV …) raises a named NotImplementedError."""
    samples, rate, n_channels, codec = _decode_wav_ext_samples(payload)
    n_frames = len(samples) // n_channels
    return _wav_stats(samples, rate, n_channels, n_frames, codec)


def _decode_wav_ext_samples(payload: bytes):
    """The samples-level half of ``_decode_wav_ext`` (split out r12,
    VERDICT r11 #2 so the audio fingerprint stack can route non-PCM
    WAV through the SAME decoders instead of gating them out):
    returns (interleaved samples ndarray, rate, n_channels, codec) —
    int64 for the integer codecs (G.711/ADPCM expand to 16-bit linear),
    float for IEEE-float payloads."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    fact_frames = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    if len(fmt) < 16:
        raise ValueError(f"WAV fmt chunk too short ({len(fmt)} bytes)")
    tag, n_channels, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
        if len(fmt) < 26:
            raise ValueError("extensible WAV fmt chunk too short")
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if tag == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4")
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8")
        else:
            raise ValueError(f"IEEE-float WAV with {bits}-bit samples")
        codec = f"float{bits}"
    elif tag in (6, 7):
        if bits not in (0, 8):
            raise ValueError(f"G.711 WAV with {bits}-bit samples")
        from vector_lake_spark.g711 import alaw_decode, ulaw_decode

        codes = np.frombuffer(data, dtype=np.uint8)
        samples = alaw_decode(codes) if tag == 6 else ulaw_decode(codes)
        codec = "alaw" if tag == 6 else "ulaw"
    elif tag == 1:
        # plain PCM never lands here (stdlib wave handles it), but the
        # EXTENSIBLE wrapper around integer PCM — the form multichannel
        # and 24-bit encoders actually emit — resolves to tag 1 above
        # and decodes through the shared width logic
        if bits % 8 != 0 or not 8 <= bits <= 32:
            raise ValueError(f"integer-PCM WAV with {bits}-bit samples")
        samples = _pcm_samples(data, bits // 8)
        codec = "pcm"
    elif tag == 0x11:  # IMA/DVI ADPCM (r10 — was a named gate)
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV with {bits}-bit nibbles")
        from vector_lake_spark.adpcm import ima_adpcm_decode

        samples = ima_adpcm_decode(data, n_channels, block_align)
        if fact_frames is not None:
            # the spec's fact chunk carries the true frame count; the
            # final block may be zero-padded past it
            samples = samples[: fact_frames * n_channels]
        codec = "ima_adpcm"
    elif tag == 0x02:  # MS ADPCM (r10 — was a named gate)
        if bits != 4:
            raise ValueError(f"MS ADPCM WAV with {bits}-bit nibbles")
        if len(fmt) < 20:
            raise ValueError("MS ADPCM fmt chunk missing samplesPerBlock")
        # extension starts after the 16-byte base + 2-byte cbSize
        (spb,) = struct.unpack_from("<H", fmt, 18)
        from vector_lake_spark.adpcm import ms_adpcm_decode

        samples = ms_adpcm_decode(data, n_channels, block_align, spb)
        if fact_frames is not None:
            samples = samples[: fact_frames * n_channels]
        codec = "ms_adpcm"
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} unsupported (integer PCM, IEEE float, "
            f"G.711 A-law/μ-law, IMA and MS ADPCM decode natively)"
        )
    if n_channels < 1:
        raise ValueError("WAV with zero channels")
    return samples, rate, n_channels, codec


def encode_wav_ext(
    samples, rate: int = 8000, fmt: str = "ulaw", n_channels: int = 1
) -> bytes:
    """Mux samples into the non-PCM WAV formats ``_decode_wav_ext``
    reads — the test/oracle-side writer proving the decode inverts a
    real stream. ``fmt``: 'ulaw'/'alaw' take int16 linear samples and
    compand them through ``g711.py``; 'float32'/'float64' take floats
    verbatim."""
    import struct

    import numpy as np

    x = np.asarray(samples)
    if fmt == "ulaw":
        from vector_lake_spark.g711 import ulaw_encode

        data, tag, bits = ulaw_encode(x).tobytes(), 7, 8
    elif fmt == "alaw":
        from vector_lake_spark.g711 import alaw_encode

        data, tag, bits = alaw_encode(x).tobytes(), 6, 8
    elif fmt == "float32":
        data, tag, bits = x.astype("<f4").tobytes(), 3, 32
    elif fmt == "float64":
        data, tag, bits = x.astype("<f8").tobytes(), 3, 64
    else:
        raise ValueError(f"unknown ext-WAV format {fmt!r}")
    ba = n_channels * bits // 8
    # non-PCM fmt chunks carry the cbSize extension word (0: no extra)
    fmt_chunk = struct.pack(
        "<HHIIHHH", tag, n_channels, rate, rate * ba, ba, bits, 0
    )
    pad = b"\x00" if len(data) & 1 else b""
    out = bytearray(b"RIFF")
    out += struct.pack(
        "<I", 4 + 8 + len(fmt_chunk) + 8 + len(data) + len(pad)
    )
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    out += b"data" + struct.pack("<I", len(data)) + data + pad
    return bytes(out)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from payload bytes — stands in for a
    model forward pass; keeps the pipeline testable end-to-end."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [round(a / 997.0, 6) for a in acc]


def extract_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column —
    a deterministic byte-fold STAND-IN for a model forward pass (keeps
    embedding-shaped pipelines testable end-to-end; it is NOT a
    perceptual signature). For real content-level image identity use
    ``operators/imagehash.image_signatures`` (dHash/aHash over decoded
    pixels, r10) feeding ``binary.hamming_neardup_pairs``.

    Projects (media_id, payload) only — column pruning drops the rest of
    the row before the Python boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset,
    computed from metadata (decode itself is stubbed). Demonstrates the
    explode-by-timeline pattern used for real video pipelines."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_no", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "media_id",
            "frame_no",
            (F.col("frame_no") * every_ms).alias("offset_ms"),
        )
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.LongType(), False),
        T.StructField("offset_ms", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


MEDIA_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("decodable", T.BooleanType(), True),
    ]
)


def probe_media(df: DataFrame) -> DataFrame:
    """Unified container-metadata pass over a binary payload column —
    the FIRST operator a 100 TB media pipeline runs: route, filter and
    budget by (container, codec, dims, duration, frame count) WITHOUT
    entropy-decoding anything. All three container probes are real
    header walks (RIFF/AVI, ISO-BMFF/MP4, EBML/Matroska); `decodable`
    reports whether this repo's native decoders can open the video
    stream (MJPEG in AVI, photo-JPEG in MP4 — interframe codecs are
    honest NotImplementedError gates at decode time)."""
    from vector_lake_spark.avi import probe_avi
    from vector_lake_spark.mkv import is_mkv, probe_mkv
    from vector_lake_spark.mp4 import is_mp4, probe_mp4

    def one(mid, payload):
        data = bytes(payload)
        if is_mp4(data):
            info = probe_mp4(data)
            video = [t for t in info["tracks"] if t["handler"] == "vide"]
            t = video[0] if video else None
            return {
                "media_id": mid,
                "container": "mp4",
                "codec": t["codec"] if t else None,
                "width": t["width"] if t else None,
                "height": t["height"] if t else None,
                "duration_ms": info["duration_ms"],
                "n_frames": t["n_samples"] if t else 0,
                "decodable": bool(t and t["codec"] in ("jpeg", "mjpa")),
            }
        if is_mkv(data):
            info = probe_mkv(data)
            video = [t for t in info["tracks"] if t["track_type"] == 1]
            t = video[0] if video else None
            return {
                "media_id": mid,
                "container": info["doc_type"],
                "codec": t["codec"] if t else None,
                "width": t["width"] if t else None,
                "height": t["height"] if t else None,
                "duration_ms": info["duration_ms"],
                "n_frames": info["n_blocks"],
                # intraframe V_MJPEG blocks decode natively (late r09);
                # interframe codecs still gate by name — the flag must
                # agree with decode_mkv_frames, which picks ANY V_MJPEG
                # video track, not just the first
                "decodable": any(v["codec"] == "V_MJPEG" for v in video),
            }
        info = probe_avi(data)  # raises its own named error on non-AVI
        return {
            "media_id": mid,
            "container": "avi",
            "codec": info.get("codec", "MJPG"),
            "width": info.get("width"),
            "height": info.get("height"),
            "duration_ms": (
                int(info["n_frames"] * 1000 / info["fps"])
                if info.get("fps")
                else None
            ),
            "n_frames": info["n_frames"],
            "decodable": True,
        }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                one(mid, payload)
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_PROBE_SCHEMA.fields]
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=MEDIA_PROBE_SCHEMA
    )


def extract_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video decode over Arrow batches (r06): MJPEG-in-AVI payloads
    are probed (header walk, no frame decode), the timeline is sampled
    every ``every_ms``, and ONLY the sampled frames decode through the
    native JPEG codec — per sampled frame: (frame_no, offset_ms, dims,
    channel means).

    The 100 TB shape: frame independence (MJPEG) means a sampled frame
    never touches its neighbors, so sampling cost is
    frames_sampled × decode, not duration × decode; the probe slices
    frame chunks by (offset, length) so unsampled frames are never even
    copied out of the payload buffer. r07 adds the MP4 container
    (photo-JPEG samples, ``mp4.py``) and late r09 Matroska V_MJPEG
    tracks (``mkv.py``) behind the same magic dispatch; interframe
    codecs raise by name."""
    from vector_lake_spark.avi import decode_avi_frames, probe_avi
    from vector_lake_spark.mkv import decode_mkv_frames, is_mkv, probe_mkv
    from vector_lake_spark.mp4 import decode_mp4_frames, is_mp4, probe_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if is_mkv(data):
                    info = probe_mkv(data)
                    video = [
                        t for t in info["tracks"] if t["track_type"] == 1
                    ]
                    if not video:
                        raise ValueError("Matroska has no video track")
                    # size the sampling from the SAME track decode will
                    # pick (the V_MJPEG one); a no-MJPEG file keeps
                    # video[0] so decode raises its named codec gate
                    tr = next(
                        (t for t in video if t["codec"] == "V_MJPEG"),
                        video[0],
                    )
                    n_frames = info["blocks_by_track"].get(
                        tr["track_number"], 0
                    )
                    fps = (
                        n_frames * 1000.0 / info["duration_ms"]
                        if info["duration_ms"]
                        else 0
                    )
                    decode = decode_mkv_frames
                elif is_mp4(data):
                    info = probe_mp4(data)
                    video = [
                        t for t in info["tracks"] if t["handler"] == "vide"
                    ]
                    if not video:
                        raise ValueError("MP4 has no video track")
                    tr = video[0]
                    # rate from the track's own timescale and raw stts
                    # tick duration — the floor-rounded duration_ms
                    # drifts the stride for real-world timescales
                    # (r07 advice)
                    ticks = sum(c * d for c, d in tr["timing"])
                    if ticks:
                        fps = tr["n_samples"] * tr["timescale"] / ticks
                    elif tr["duration_ms"]:
                        fps = tr["n_samples"] * 1000.0 / tr["duration_ms"]
                    else:
                        fps = 0
                    n_frames, decode = tr["n_samples"], decode_mp4_frames
                else:
                    info = probe_avi(data)
                    fps = info.get("fps")
                    n_frames, decode = info["n_frames"], decode_avi_frames
                if not fps:
                    # never fabricate timestamps from an invented rate —
                    # the module contract is raise-by-name
                    raise ValueError(
                        "video without a usable frame rate — cannot "
                        "compute sample offsets"
                    )
                stride = max(int(round(every_ms * fps / 1000.0)), 1)
                wanted = list(range(0, n_frames, stride))
                _, frames = decode(data, wanted)
                for fno, px in frames:
                    px3 = px if px.ndim == 3 else px[:, :, None].repeat(3, 2)
                    means = px3.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": fno,
                            "offset_ms": int(fno * 1000 / fps),
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "mean_r": round(float(means[0]), 4),
                            "mean_g": round(float(means[1]), 4),
                            "mean_b": round(float(means[2]), 4),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields],
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-size stats per media kind — pure JVM expressions."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 2).alias("avg_bytes"),
        )
    )


BMP_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)

WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def _extract_image_stats(df: DataFrame, decode_fn) -> DataFrame:
    """Shared Arrow kernel wrapper for real image decodes: the operator
    shape (column-pruned mapInPandas, IMAGE stats schema) is identical
    for every codec — swapping a codec in changes only ``decode_fn``
    (the promise the BMP docstring makes, now structural — r06
    review)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_fn(bytes(payload))
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=BMP_FEATURES_SCHEMA
    )


def extract_bmp_features(df: DataFrame) -> DataFrame:
    """REAL image decode over Arrow batches (r05): uncompressed 24-bit
    BMP payloads → dimensions + channel means, stdlib-only."""
    return _extract_image_stats(df, decode_bmp)


def extract_png_features(df: DataFrame) -> DataFrame:
    """REAL compressed-image decode over Arrow batches (r06): 8-bit PNG
    payloads → dimensions + channel means via stdlib zlib + numpy
    filter reconstruction."""
    return _extract_image_stats(df, decode_png)


def extract_jpeg_features(df: DataFrame) -> DataFrame:
    """REAL DCT-codec decode over Arrow batches (r06): baseline 4:4:4
    JPEG payloads → dimensions + channel means via the numpy-only
    Huffman + IDCT decoder (``jpeg.py``)."""
    from vector_lake_spark.jpeg import decode_jpeg

    return _extract_image_stats(df, decode_jpeg)


def extract_gif_features(df: DataFrame) -> DataFrame:
    """REAL LZW-codec decode over Arrow batches (r07): GIF87a/89a
    payloads → first composed frame's dimensions + channel means via the
    stdlib/numpy decoder (``gif.py``); animation frames compose per the
    disposal spec before the stats are taken."""
    from vector_lake_spark.gif import decode_gif

    return _extract_image_stats(df, decode_gif)


def extract_tiff_features(df: DataFrame) -> DataFrame:
    """REAL scanned-document decode over Arrow batches (r08): baseline
    TIFF payloads (none/LZW/PackBits strips, horizontal-differencing
    predictor, gray/RGB) → dimensions + channel means (``tiff.py``)."""
    from vector_lake_spark.tiff import decode_tiff

    return _extract_image_stats(df, decode_tiff)


def extract_webp_features(df: DataFrame) -> DataFrame:
    """REAL prefix-code/LZ77 decode over Arrow batches (r08): lossless
    WebP (VP8L) payloads → dimensions + channel means via the
    numpy-only decoder (``vp8l.py``); lossy VP8 / extended VP8X
    payloads raise their named gates."""
    from vector_lake_spark.webp import decode_webp

    return _extract_image_stats(df, decode_webp)


EXIF_SCHEMA = (
    "media_id long, has_exif boolean, byte_order string, orientation int, "
    "width int, height int, datetime string, datetime_original string"
)


def extract_exif(df: DataFrame) -> DataFrame:
    """EXIF metadata over the binary payload column (r10): JPEG APP1 /
    TIFF IFD walk via ``exif.probe_exif`` through one Arrow stage —
    header arithmetic only, no pixel decode, so the per-row cost is
    O(header) regardless of image size. Payloads without EXIF yield
    has_exif=false rather than erroring (absence is data at crawl
    scale); non-JPEG/TIFF payloads yield has_exif=NULL (the column
    contract mirrors ``probe_media``'s route-don't-crash stance)."""
    from vector_lake_spark.exif import probe_exif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "has_exif", "byte_order", "orientation", "width", "height",
            "datetime", "datetime_original",
        ]
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = probe_exif(bytes(payload))
                except ValueError:
                    d = dict.fromkeys(cols)
                rows.append((mid, *(d[c] for c in cols)))
            yield pd.DataFrame(
                rows, columns=["media_id", *cols]
            ).astype({"orientation": "Int32", "width": "Int32",
                      "height": "Int32"})

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=EXIF_SCHEMA
    )


def _decode_audio(payload: bytes) -> dict:
    """Magic-dispatched audio decode: WAV (all four integer PCM widths,
    IEEE float 32/64, G.711 A-law/μ-law) and FLAC (``flac.py`` — full
    Rice/LPC lossless decode, r08) both return the same
    rate/channels/duration/RMS stats shape. MPEG audio is RECOGNIZED
    and probed (``mp3.py``) but its decode raises the named gate — the
    probe is the scale operator for that format."""
    if payload is not None and payload[:4] == b"fLaC":
        from vector_lake_spark.flac import decode_flac

        return decode_flac(bytes(payload))
    if (
        payload is not None
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        return decode_wav(bytes(payload))
    from vector_lake_spark.mp3 import decode_mp3, is_mp3
    from vector_lake_spark.ogg import decode_ogg, is_ogg

    if is_mp3(payload):
        decode_mp3(bytes(payload))  # raises the named layer gate
    if is_ogg(payload):
        decode_ogg(bytes(payload))  # raises the named codec gate
    raise NotImplementedError(
        "unrecognized audio payload (WAV and FLAC decode natively — "
        "decode_wav / flac.decode_flac; MPEG audio and Ogg probe via "
        "mp3.probe_mp3 / ogg.probe_ogg)"
    )


def _audio_stats_operator(df: DataFrame, decode_fn) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_fn(bytes(payload))
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "rms",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=WAV_FEATURES_SCHEMA
    )


def extract_wav_features(df: DataFrame) -> DataFrame:
    """REAL audio decode over Arrow batches (r05; all integer PCM
    widths since r08): WAV payloads → rate/channels/duration/RMS via
    the stdlib ``wave`` module."""
    return _audio_stats_operator(df, decode_wav)


def extract_flac_features(df: DataFrame) -> DataFrame:
    """REAL lossless-audio decode over Arrow batches (r08): FLAC
    payloads → rate/channels/duration/RMS via the full Rice/LPC
    decoder (``flac.py``)."""
    from vector_lake_spark.flac import decode_flac

    return _audio_stats_operator(df, decode_flac)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Magic-dispatched audio stats over a mixed WAV/FLAC column — the
    audio counterpart of ``probe_media``'s route-by-container stance."""
    return _audio_stats_operator(df, _decode_audio)
