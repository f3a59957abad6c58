"""Perceptual audio fingerprint (sign-of-band-energy-delta) and the
Spark operator that computes it — the audio leg of the near-duplicate
family (r11, VERDICT r10 #5).

A speech/music curation pipeline needs audio-level near-dup BEFORE any
embedding model runs: two re-encodes/re-levels of the same clip should
collapse under a cheap integer signature. The classic public answer
(Haitsma-Kalker / Philips-style fingerprinting) takes the SIGN of
band-energy differences over a time-frequency grid: energy ordering
survives re-encoding and gain changes far better than raw magnitudes.
This implementation is the integer-exact, seedless variant suited to an
oracle gate: 8 non-overlapping 64-sample frames × 9 single-bin FFT
bands (bins 3..11 of the 64-point rFFT), bit (f·8 + b) set iff band
b+1's energy strictly exceeds band b's in frame f — 64 bits packed
into ONE signed int64 with the same two's-complement convention as
``imagehash.dhash64``. Structurally the fingerprint IS a dHash of the
spectrogram, so the whole banded-Hamming pair machinery
(``binary.hamming_neardup_pairs``) applies unchanged.

Robustness note (why the comparisons are float-safe): a full-frame
cosine at integer bin k concentrates exactly in bin k (orthogonality —
zero leakage into other bins), so band energies compare across a ≥2×
energy gap in the fixture regime while int16 quantization perturbs a
band by ≪1%; strict inequality can never flip. The reference has no
audio operators at all (SURVEY §2.B multimodal).

Scale posture: samples never leave the Arrow stage — WAV decode, FFT
and the hash all run inside one ``mapInPandas``; only (id, int64) rows
shuffle, exactly the image-signature contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

FRAME = 64
N_FRAMES = 8
N_BANDS = 9
BASE_BIN = 3


def decode_wav_samples(payload: bytes):
    """WAV payload → (mono float64 samples, sample_rate). Integer-PCM
    widths decode via the stdlib ``wave`` walk + the shared
    ``multimodal._pcm_samples`` composition (8/16/24/32-bit);
    multi-channel downmixes by plain channel mean. Non-PCM tags
    (G.711/ADPCM/float) raise the named gate — their decoders exist
    (``g711.py``/``adpcm.py`` produce 16-bit linear PCM inside
    ``decode_wav``) and routing them here is plumbing, not new codec
    work; the probe-and-route posture keeps this operator's scope the
    fingerprint itself."""
    import io
    import wave

    from vector_lake_spark.multimodal import _pcm_samples

    b = bytes(payload)
    try:
        with wave.open(io.BytesIO(b), "rb") as w:
            n_channels = w.getnchannels()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
            width = w.getsampwidth()
    except (wave.Error, EOFError) as e:
        # stdlib wave raises the same error family for damage and for
        # format novelty — split them per the repo's routing contract
        # (ValueError = corrupt, NotImplementedError = legal-but-
        # unsupported, the is_mp3 lesson): a well-formed RIFF/WAVE
        # whose fmt tag is non-PCM is the named gate; everything else
        # is a corrupt stream
        import struct

        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            pos = 12
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                sz, = struct.unpack_from("<I", b, pos + 4)
                if cid == b"fmt " and pos + 10 <= len(b):
                    tag, = struct.unpack_from("<H", b, pos + 8)
                    if tag != 1:
                        raise NotImplementedError(
                            f"non-integer-PCM WAV (format tag {tag}) in "
                            "audio fingerprinting (G.711/ADPCM/float "
                            "decode exists in decode_wav; route through "
                            "it to linear PCM first)"
                        ) from e
                    break
                pos += 8 + sz + (sz & 1)
        raise ValueError(
            "corrupt WAV payload for audio fingerprinting"
        ) from e
    samples = _pcm_samples(frames, width).astype(np.float64)
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, rate


def audio_fingerprint64(
    samples,
    frame: int = FRAME,
    n_frames: int = N_FRAMES,
    base_bin: int = BASE_BIN,
    n_bands: int = N_BANDS,
) -> int:
    """Sign-of-adjacent-band-energy fingerprint over the first
    ``n_frames`` non-overlapping ``frame``-sample windows: bit
    (f·(n_bands−1) + b) set iff |rFFT(frame f)[base_bin+b+1]|² >
    |rFFT(frame f)[base_bin+b]|² (strict). Defaults give exactly 64
    bits (8 frames × 8 comparisons) in one signed int64."""
    x = np.asarray(samples, dtype=np.float64)
    need = frame * n_frames
    if x.size < need:
        raise ValueError(
            f"audio too short to fingerprint: {x.size} < {need} samples"
        )
    v = 0
    width = n_bands - 1
    for f in range(n_frames):
        seg = x[f * frame : (f + 1) * frame]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        bands = spec[base_bin : base_bin + n_bands]
        for b in np.flatnonzero(bands[1:] > bands[:-1]):
            v |= 1 << (f * width + int(b))
    return v - (1 << 64) if v >= (1 << 63) else v


def mux_pcm16_wav(samples, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV writer (stdlib ``wave``) — the fixture/test
    muxer feeding ``decode_wav_samples``."""
    import io
    import wave

    x = np.asarray(samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.astype("<i2").tobytes())
    return buf.getvalue()


def audio_signatures(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, payload) → (id, sig int64) audio fingerprints through ONE
    Arrow ``mapInPandas`` stage: WAV decode + FFT + hash per row,
    samples never serialized out of Python. Downstream, feed
    ``binary.hamming_neardup_pairs`` (exact at radius < n_blocks)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            sigs = [
                audio_fingerprint64(decode_wav_samples(p)[0])
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sig": pd.array(sigs, "int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, sig long"
    )
