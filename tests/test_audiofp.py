"""Audio fingerprint (`operators/audiofp`): fingerprint determinism and
bit layout, WAV round-trip through the real muxer/decoder, gain
invariance of the sign structure, the named non-PCM gate, and the
fixture's closed-form parity (synth → mux → REAL decode → fingerprint
== formula)."""

import numpy as np
import pytest

from vector_lake_spark.operators.audiofp import (
    audio_fingerprint64,
    audio_signatures,
    decode_wav_samples,
    mux_pcm16_wav,
)


def _tone_frames(levels):
    """Synthesize 8×64 samples from an (8, 9) level grid — the fixture
    renderer's core, inlined for independence from queries.py."""
    n = np.arange(64)
    out = np.zeros(512)
    for f in range(8):
        seg = np.zeros(64)
        for b in range(9):
            amp = 2.0 ** ((float(levels[f][b]) - 64) / 16.0 + 4.0)
            seg += amp * np.cos(2.0 * np.pi * (3 + b) * n / 64.0)
        out[f * 64 : (f + 1) * 64] = seg
    return np.round(out).astype(np.int16)


def test_fingerprint_bit_layout():
    # strictly rising bands in every frame -> all 64 bits set
    rising = np.tile(np.arange(9) * 8 + 80, (8, 1))
    assert audio_fingerprint64(_tone_frames(rising)) == -1
    # strictly falling -> no bits
    assert audio_fingerprint64(_tone_frames(rising[:, ::-1])) == 0
    # one rising comparison: frame 2, band 3 -> bit 2*8+3
    lv = rising[:, ::-1].copy()
    lv[2] = [144, 136, 128, 120, 128, 120, 112, 104, 96]
    # comparisons: falls, falls, falls, RISES at b=3, then falls
    got = audio_fingerprint64(_tone_frames(lv))
    assert got == (1 << 19), hex(got)


def test_fingerprint_is_gain_invariant():
    """Energy ORDERING survives a volume change — the property that
    makes sign-of-delta a perceptual fingerprint."""
    rng = np.random.RandomState(3)
    lv = rng.choice([64, 80, 96, 112, 128, 144], size=(8, 9))
    # break ties: walk rows so adjacent levels always differ
    for f in range(8):
        for b in range(1, 9):
            if lv[f][b] == lv[f][b - 1]:
                lv[f][b] += 8
    x = _tone_frames(lv).astype(np.float64)
    assert audio_fingerprint64(x) == audio_fingerprint64(x * 0.25)
    assert audio_fingerprint64(x) == audio_fingerprint64(x * 3.0)


def test_fingerprint_short_audio_raises():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(np.zeros(100))


def test_wav_roundtrip_and_downmix():
    rng = np.random.RandomState(5)
    x = rng.randint(-3000, 3000, size=512).astype(np.int16)
    got, rate = decode_wav_samples(mux_pcm16_wav(x, rate=16000))
    assert rate == 16000
    assert np.array_equal(got, x.astype(np.float64))
    # stereo downmix = channel mean
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        inter = np.empty(1024, dtype=np.int16)
        inter[0::2] = x
        inter[1::2] = x // 3
        w.writeframes(inter.astype("<i2").tobytes())
    got2, _ = decode_wav_samples(buf.getvalue())
    assert np.allclose(got2, (x.astype(np.float64) + x // 3) / 2.0)


def test_non_pcm_gate_is_named():
    from vector_lake_spark.multimodal import encode_wav_ext

    payload = encode_wav_ext(np.zeros(512, dtype=np.int16), fmt="ulaw")
    with pytest.raises(NotImplementedError, match="non-integer-PCM"):
        decode_wav_samples(payload)


def test_corrupt_wav_routes_to_valueerror():
    """Review r11: damage and format novelty must split per the repo's
    routing contract — a non-WAV blob or a PCM WAV truncated inside its
    header is corrupt (ValueError), NOT an unsupported format."""
    with pytest.raises(ValueError, match="corrupt WAV"):
        decode_wav_samples(b"RIFFxxxxWAVE" + b"\x01" * 8)
    with pytest.raises(ValueError, match="corrupt WAV"):
        decode_wav_samples(b"not a wav at all, definitely")
    # a real PCM WAV cut inside the header is damage, not novelty
    good = mux_pcm16_wav(np.zeros(512, dtype=np.int16))
    with pytest.raises(ValueError, match="corrupt WAV"):
        decode_wav_samples(good[:20])


def test_fixture_closed_form_parity_sweep():
    """The mm_audio_neardup contract: synth → WAV mux → REAL decode →
    fingerprint must equal the oracle's closed-form signature across
    every group and deep members."""
    from vector_lake_spark.queries import (
        _audio_fixture_sig,
        _render_audio_pcm,
    )

    for doc_id in list(range(40)) + [40, 85, 163, 247, 361, 499, 1234]:
        sig = _audio_fixture_sig(doc_id)
        assert 0 <= sig < (1 << 63)
        samples, _ = decode_wav_samples(
            mux_pcm16_wav(_render_audio_pcm(sig))
        )
        assert audio_fingerprint64(samples) == sig


def test_audio_signatures_operator(spark):
    from vector_lake_spark.queries import (
        _audio_fixture_sig,
        _render_audio_pcm,
    )

    rows = [
        (i, bytearray(mux_pcm16_wav(_render_audio_pcm(_audio_fixture_sig(i)))))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.sig for r in audio_signatures(df).collect()}
    for i, _ in rows:
        assert got[i] == _audio_fixture_sig(i)
