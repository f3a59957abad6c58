"""Property-based tests (hypothesis) — the reference's invariant strategy
(tests/test_properties.py:23-85: router bounds, add/query invariants)
re-targeted at the rebuild's driver-side kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from vector_lake_spark.adapter import hashed_ngram_embedder
from vector_lake_spark.operators import lsh
from vector_lake_spark.operators.ann import multiprobe_shards

H = lsh.make_hyperplanes(5, 5)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite_floats, min_size=5, max_size=5))
@settings(max_examples=200, deadline=None)
def test_router_bounds(vec):
    shard = lsh.route_vector(vec, H)
    assert 0 <= shard < 32


@given(st.lists(finite_floats, min_size=5, max_size=5))
@settings(max_examples=100, deadline=None)
def test_router_deterministic(vec):
    assert lsh.route_vector(vec, H) == lsh.route_vector(vec, H)


@given(
    st.lists(finite_floats, min_size=5, max_size=5),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_multiprobe_invariants(vec, n_probes):
    probes = multiprobe_shards(vec, H, n_probes)
    assert probes[0] == lsh.route_vector(vec, H)
    assert len(probes) == len(set(probes)) <= n_probes
    assert all(0 <= p < 32 for p in probes)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_embedder_unit_norm_or_zero(text):
    embed = hashed_ngram_embedder(dim=16)
    (v,) = embed([text])
    assert len(v) == 16
    norm = float(np.linalg.norm(v))
    assert norm == 0.0 or abs(norm - 1.0) < 1e-9


@given(st.text(max_size=100))
@settings(max_examples=50, deadline=None)
def test_embedder_deterministic(text):
    embed = hashed_ngram_embedder(dim=8)
    assert embed([text]) == embed([text])


def test_int8_quantization_error_bound(spark):
    """Mathematical contract: symmetric int8 round-to-nearest keeps every
    per-element reconstruction error ≤ scale/2 (+1ulp slack)."""
    from vector_lake_spark import queries as Q

    rows = Q.q_vec_quantize_int8(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["max_err"] <= r["scale"] / 2 + 1e-6, r


def test_asof_join_matches_bruteforce_random(spark):
    """Randomized (seeded) cross-check: asof_join == per-row brute-force
    max over strictly-earlier right rows, including ties and no-match."""
    import numpy as np

    rng = np.random.RandomState(7)
    n_keys = 5
    left_rows = [
        (int(k), int(t), i)
        for i, (k, t) in enumerate(
            zip(rng.randint(0, n_keys, 60), rng.randint(0, 50, 60))
        )
    ]
    right_rows = [
        (int(k), int(t), float(v))
        for k, t, v in zip(
            rng.randint(0, n_keys, 80),
            rng.randint(0, 50, 80),
            rng.rand(80).round(3),
        )
    ]
    from pyspark.sql import functions as F

    from vector_lake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, __import__("datetime").datetime(2024, 1, 1, 0, t), i) for k, t, i in left_rows],
        "key long, ts timestamp, row_id long",
    )
    right = spark.createDataFrame(
        [(k, __import__("datetime").datetime(2024, 1, 1, 0, t), v) for k, t, v in right_rows],
        "key long, ts timestamp, val double",
    )
    got = {
        r["row_id"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(left, right, key="key", right_vals=["val"]).collect()
    }
    # brute force: latest strictly-earlier right (key, ts); val from that ts
    # (right side reduced to one row per (key, ts) — max val wins is NOT
    # guaranteed without right_id, so compare ts only, and val only when
    # (key, ts) is unique on the right)
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t, v in right_rows:
        by_key[k].append((t, v))
    for k, t, i in left_rows:
        earlier = [(rt, rv) for rt, rv in by_key[k] if rt < t]
        want_ts = max((rt for rt, _ in earlier), default=None)
        got_ts, got_val = got[i]
        got_minute = got_ts.minute if got_ts is not None else None
        assert got_minute == want_ts, (i, got_ts, want_ts)
        if want_ts is not None:
            vals_at = [rv for rt, rv in by_key[k] if rt == want_ts]
            if len(vals_at) == 1:
                assert got_val == vals_at[0]
            else:
                assert got_val in vals_at


def test_interval_join_matches_bruteforce_random(spark):
    """Randomized (seeded) cross-check for the bucketed interval join:
    every (point, interval) containment pair is found — no bucket-edge
    misses — and nothing extra."""
    import datetime

    import numpy as np

    rng = np.random.RandomState(13)
    base = datetime.datetime(2024, 1, 1)

    points = [
        (int(k), base + datetime.timedelta(seconds=int(s)), i)
        for i, (k, s) in enumerate(
            zip(rng.randint(0, 4, 80), rng.randint(0, 7200, 80))
        )
    ]
    intervals = []
    for j in range(30):
        k = int(rng.randint(0, 4))
        s = int(rng.randint(0, 7200))
        e = s + int(rng.randint(0, 2400))
        intervals.append(
            (j, k, base + datetime.timedelta(seconds=s), base + datetime.timedelta(seconds=e))
        )

    from vector_lake_spark.operators.interval import point_in_interval_join

    pts = spark.createDataFrame(
        points, "key long, ts timestamp, pt_id long"
    )
    ivs = spark.createDataFrame(
        intervals, "iv_id long, key long, start timestamp, end timestamp"
    )
    got = {
        (r["pt_id"], r["iv_id"])
        for r in point_in_interval_join(
            pts, ivs, key="key", bucket_seconds=600
        ).collect()
    }
    want = {
        (i, j)
        for (k, t, i) in points
        for (j, ik, s, e) in intervals
        if k == ik and s <= t <= e
    }
    assert got == want


# --- PII scrub pattern contract -------------------------------------------
# The patterns restrict themselves to constructs Java regex, RE2 (DuckDB)
# and Python `re` all implement identically (classes, bounded repetition,
# \d, ASCII \b), so a Python mirror is a faithful kernel for properties.
import re

from vector_lake_spark.functions.text import EMAIL_RE, PHONE_RE

_EMAIL = re.compile(EMAIL_RE)
_PHONE = re.compile(PHONE_RE)


def _redact_py(t: str) -> str:
    return _PHONE.sub("[PHONE]", _EMAIL.sub("[EMAIL]", t))


_pii_fragments = st.lists(
    st.one_of(
        st.text(max_size=12),
        st.sampled_from(
            [
                "a@b.co", "x.y+z@sub.example.org", "555-1234", "123-4567",
                "[EMAIL]", "[PHONE]", "@", ".com", "555-", "-1234",
                "a@b", "12-3456", "555-1234@x.co", "a@b.co555-1234",
            ]
        ),
    ),
    max_size=12,
).map(" ".join)


@given(_pii_fragments)
@settings(max_examples=300, deadline=None)
def test_redact_idempotent(text):
    """One scrub is a fixed point: the placeholders contain no '@' and no
    digits, so they can never re-match either pattern."""
    once = _redact_py(text)
    assert _redact_py(once) == once


@given(_pii_fragments)
@settings(max_examples=300, deadline=None)
def test_redact_removes_all_matches(text):
    scrubbed = _redact_py(text)
    assert not _EMAIL.search(scrubbed)
    assert not _PHONE.search(scrubbed)


# ---------------------------------------------------------------------------
# Morton (Z-order) code properties — pure-python reference, no Spark
# ---------------------------------------------------------------------------


def _interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_morton_bijective(x, y):
    """Interleave is a bijection on the 16-bit grid: deinterleave
    recovers (x, y) exactly, so the Z-code loses no layout
    information."""
    assert _deinterleave(_interleave(x, y)) == (x, y)


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65534),
)
def test_morton_monotone_along_axes(x, y):
    """With one coordinate fixed, the code is strictly monotone in the
    other — axis-aligned range predicates map to (unions of) Z-ranges,
    which is what makes min/max pruning on the Z-sort effective."""
    assert _interleave(x, y + 1) > _interleave(x, y)
    if x < 65535:
        assert _interleave(x + 1, y) > _interleave(x, y)


# --- wave-3 kernels: sign-bit packing + temperature-mix arithmetic -------

@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=1,
        max_size=96,
    )
)
@settings(max_examples=200, deadline=None)
def test_pack_query_sig_bounds_and_halves(vec):
    from vector_lake_spark.operators.binary import (
        BITS_PER_HALF,
        n_halves,
        pack_query_sig,
    )

    sig = pack_query_sig(vec)
    assert len(sig) == n_halves(len(vec))
    for h, s in enumerate(sig):
        width = min(BITS_PER_HALF, len(vec) - h * BITS_PER_HALF)
        assert 0 <= s < (1 << width)


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=100, deadline=None)
def test_pack_query_sig_bit_semantics(vec):
    """Bit i of half h is exactly sign(vec[h*32+i]) >= 0, MSB-first —
    the contract the Spark fold, the SQL template, and the index all
    share."""
    from vector_lake_spark.operators.binary import pack_query_sig

    sig = pack_query_sig(vec)
    for i, x in enumerate(vec):
        h, pos = divmod(i, 32)
        width = min(32, len(vec) - h * 32)
        bit = (sig[h] >> (width - 1 - pos)) & 1
        assert bit == (1 if x >= 0 else 0), (i, x)


@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=30)
)
@settings(max_examples=200, deadline=None)
def test_temperature_targets_sum_close_and_flatten(counts):
    """The fixed-point integer targets must (a) sum to ~N (±1 per
    domain from half-up rounding), (b) never silence a domain
    (target >= 1), (c) never downsample a below-arithmetic-mean domain
    (T_i/n_i = sqrt(n̄_q/n_i) where n̄_q is the quadratic-mean
    threshold ≥ the arithmetic mean, so count < mean ⟹ upsample), and
    (d) flatten MONOTONICALLY: the repeat factor t_i/n_i never
    increases with domain size (the α=0.5 contract — what 'low-resource
    upsampling' actually promises)."""
    import math

    wts = [math.floor(math.sqrt(n * 1_000_000)) for n in counts]
    wt_sum, n_total = sum(wts), sum(counts)
    targets = [
        (2 * n_total * w + wt_sum) // (2 * wt_sum) for w in wts
    ]
    assert all(t >= 1 for t in targets)
    assert abs(sum(targets) - n_total) <= len(counts)
    mean = n_total / len(counts)
    for n, t in zip(counts, targets):
        if n < mean:
            assert t >= n - 1, (n, t)
    # monotone flattening, with ±1 integer-rounding slack on each side
    for (n_i, t_i) in zip(counts, targets):
        for (n_j, t_j) in zip(counts, targets):
            if n_i < n_j:
                assert (t_i + 1) * n_j >= (t_j - 1) * n_i, (
                    (n_i, t_i),
                    (n_j, t_j),
                )


def test_wave4_invariants(spark):
    """Mathematical invariants of the wave-4 analytics ops on the real
    sf0.001 tables: PSI is non-negative (it is a symmetrized KL
    divergence), entropy sits in [0, ln(distinct)], per-source transition
    probabilities sum to 1, and TWAP lies within the per-user value range
    (it is a convex combination of held values)."""
    import math

    from vector_lake_spark import queries as Q

    sf = "/root/testdata/sf0.001"

    for r in Q.QUERIES["drift_psi"](spark, sf).collect():
        assert r["psi"] >= 0.0, r

    # entropy is rounded to 6 dp, so allow half-grid slack on the bound
    for r in Q.QUERIES["text_entropy"](spark, sf).collect():
        assert -5e-7 <= r["entropy"] <= math.log(r["n_distinct"]) + 5e-7, r

    rows = Q.QUERIES["ev_transition_matrix"](spark, sf).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], 0.0)
        by_prev[r["prev_type"]] += r["p"]
    for prev, total in by_prev.items():
        # each p is individually rounded to 6 dp; |types| terms of
        # half-ulp rounding bound the drift from exactly 1
        assert abs(total - 1.0) < 5e-6, (prev, total)

    twap = {
        r["user_id"]: r for r in Q.QUERIES["ev_twap"](spark, sf).collect()
    }
    import pyspark.sql.functions as F

    bounds = {
        r["user_id"]: r
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for uid, r in twap.items():
        b = bounds[uid]
        assert b["lo"] - 1e-6 <= r["twap"] <= b["hi"] + 1e-6, (uid, r, b)


def test_weighted_sample_is_global_topn_and_monotone_in_weight(spark):
    """Two priority-sampling invariants: (a) the emitted sample is exactly
    the global top-N of the full priority ranking (checked against an
    independent recomputation of every document's priority); (b) holding
    the uniform fixed, a larger weight strictly increases the priority —
    recomputed per sampled row from the md5 hash with the weight doubled."""
    import hashlib

    from vector_lake_spark import queries as Q
    from vector_lake_spark.queries import WEIGHTED_SAMPLE_N

    sf = "/root/testdata/sf0.001"
    sample = Q.QUERIES["pipe_weighted_sample"](spark, sf).collect()
    assert len(sample) <= WEIGHTED_SAMPLE_N
    # priorities ordered descending by construction
    ps = [r["priority"] for r in sample]
    assert ps == sorted(ps, reverse=True)

    def priority(doc_id: int, weight: int) -> float:
        # mirror token_hash60: first 15 md5 hex chars of the id string
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = float(h + 1) / float(2**60)
        return float(weight) / u

    for r in sample:
        p = priority(r["doc_id"], r["ntok"])
        assert p == r["priority"], (r, p)
        # weight-monotonicity with the uniform held fixed
        assert priority(r["doc_id"], 2 * r["ntok"]) > p

    # every sampled priority must be >= every unsampled one: recompute
    # the full ranking independently
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    full = con.execute(
        Q.ORACLES["pipe_weighted_sample"].replace(
            f"LIMIT {WEIGHTED_SAMPLE_N}", ""
        )
    ).df()
    cutoff = full["priority"].sort_values(ascending=False)
    if len(cutoff) > len(sample):
        assert min(ps) >= cutoff.iloc[len(sample)]


# --- r07 codec invariants ---------------------------------------------------


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=2, max_value=17),
    st.integers(min_value=42, max_value=45),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(h, w, n_colors, seed):
    """GIF is lossless within a <=256-color palette: encode->decode is
    the identity for ANY palette image geometry (the unit tests pin
    hand-picked shapes; this sweeps the space)."""
    from vector_lake_spark.gif import decode_gif_pixels, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, size=(h, w))]
    assert np.array_equal(decode_gif_pixels(encode_gif(img)), img)


@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_mp4_sample_table_partition_property(sizes_pattern, fps):
    """The muxer->probe round trip preserves the sample partition: the
    probe's resolved (offset, size) table must tile the mdat body
    contiguously in order, for any frame-count/fps combination."""
    from vector_lake_spark.mp4 import encode_mp4_mjpeg, probe_mp4

    frames = [bytes([i]) * (s * 7) for i, s in enumerate(sizes_pattern)]
    payload = encode_mp4_mjpeg(frames, fps, 8, 8)
    t = probe_mp4(payload)["tracks"][0]
    assert t["n_samples"] == len(frames)
    offs = t["samples"]
    for i in range(1, len(offs)):
        assert offs[i][0] == offs[i - 1][0] + offs[i - 1][1]
    for (off, size), f in zip(offs, frames):
        assert payload[off : off + size] == f


@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=1, max_value=100),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=25, deadline=None)
def test_progressive_equals_baseline_property(h, w, quality, seed):
    """Both encoders quantize identically, so progressive and baseline
    decodes must agree pixel-for-pixel at ANY geometry and quality."""
    from vector_lake_spark.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    base = decode_jpeg_pixels(encode_jpeg(img, quality))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, quality))
    assert np.array_equal(prog, base)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    n_colors=st.integers(min_value=0, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_vp8l_roundtrip_property(h, w, n_colors, seed):
    """r08 codec: VP8L round-trips BIT-EXACTLY for arbitrary geometry
    on both encoder paths — color indexing (any palette size incl. the
    sub-byte bundling widths) when n_colors > 0, subtract-green literal
    Huffman when n_colors == 0 (full random RGBA)."""
    from vector_lake_spark.vp8l import decode_vp8l, encode_vp8l

    rng = np.random.default_rng(seed)
    if n_colors:
        colors = rng.integers(0, 256, (max(1, min(n_colors, 256)), 4),
                              dtype=np.uint8)
        px = colors[rng.integers(0, len(colors), (h, w))]
        out = decode_vp8l(encode_vp8l(px))
    else:
        px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        out = decode_vp8l(encode_vp8l(px, use_palette=False))
    assert out["width"] == w and out["height"] == h
    assert np.array_equal(out["pixels"], px)


@given(
    n=st.integers(min_value=0, max_value=5000),
    n_ch=st.integers(min_value=1, max_value=3),
    bps=st.sampled_from([8, 16, 24]),
    shape=st.sampled_from(["noise", "ramp", "constant", "sine"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_flac_roundtrip_property(n, n_ch, bps, shape, seed):
    """r08 codec: FLAC round-trips bit-exactly for arbitrary lengths
    (incl. multi-frame > 4096 and the empty stream), channel counts,
    bit depths and signal shapes (each favoring a different FIXED
    predictor order / the raw-escape path)."""
    from vector_lake_spark.flac import decode_flac_samples, encode_flac

    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    if shape == "noise":
        s = rng.integers(-lim, lim, (n, n_ch))
    elif shape == "ramp":
        base = (np.arange(n) % (2 * lim)) - lim
        s = np.repeat(base[:, None], n_ch, axis=1)
    elif shape == "constant":
        s = np.full((n, n_ch), int(rng.integers(-lim, lim)), dtype=np.int64)
    else:
        s = (np.sin(np.arange(n) * 0.05)[:, None] * (lim - 1)).astype(
            np.int64
        ).repeat(n_ch, axis=1)
    out = decode_flac_samples(encode_flac(s, 44100, bps))
    assert out["n_channels"] == n_ch and out["n_samples"] == n
    assert np.array_equal(out["samples"], np.asarray(s, dtype=np.int64))


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8",
                                   blacklist_categories=("Cs",)),
            max_size=120,
        ),
        min_size=1,
        max_size=4,
    ),
    statuses=st.lists(
        st.integers(min_value=100, max_value=599), min_size=4, max_size=4
    ),
    gz=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_warc_roundtrip_property(texts, statuses, gz):
    """r08 ingestion: arbitrary UTF-8 response bodies round-trip
    through encode_warc -> parse_warc in both layouts (plain and
    member-gzipped), preserving order, statuses and bodies."""
    from vector_lake_spark.sources.warc import encode_warc, parse_warc

    recs = [
        {
            "warc_type": "response",
            "url": f"http://x/{i}",
            "http_status": statuses[i % 4],
            "http_headers": {"content-type": "text/plain; charset=utf-8"},
            "body": t,
        }
        for i, t in enumerate(texts)
    ]
    out = parse_warc(encode_warc(recs, member_gzip=gz))
    assert [r["body"] for r in out] == texts
    assert [r["http_status"] for r in out] == [
        statuses[i % 4] for i in range(len(texts))
    ]


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_html_to_text_idempotent_and_total(text):
    """html_to_text never throws on arbitrary input and its output is
    a fixed point (already-extracted text re-extracts unchanged) when
    it contains no markup-significant characters."""
    from vector_lake_spark.htmltext import html_to_text

    out = html_to_text(text)  # totality: no exception on any input
    if not any(c in out for c in "<>&"):
        assert html_to_text(out) == out


# ---------------------------------------------------------------------------
# TIFF matrix round trip (r09): any (dims, depth, channels, compression,
# layout, predictor, photometric) cell must invert exactly
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 70),
    h=st.integers(1, 50),
    depth=st.sampled_from([8, 16]),
    spp=st.sampled_from([1, 3]),
    comp=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
    tiled=st.booleans(),
    pred=st.booleans(),
    planar=st.booleans(),
    miw=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_matrix_round_trip_property(
    w, h, depth, spp, comp, tiled, pred, planar, miw, seed
):
    import numpy as np

    from vector_lake_spark.tiff import decode_tiff_pixels, encode_tiff

    rng = np.random.default_rng(seed)
    dt = np.uint16 if depth == 16 else np.uint8
    px = rng.integers(0, 1 << depth, (h, w, spp)).astype(dt)
    f = encode_tiff(
        px, compression=comp, predictor=pred,
        tile_size=16 if tiled else None,
        planar=planar and spp == 3,
        min_is_white=miw and spp == 1,
    )
    assert np.array_equal(decode_tiff_pixels(f), px)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 70),
    h=st.integers(1, 50),
    depth=st.sampled_from([1, 2, 4]),
    comp=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
    tiled=st.booleans(),
    miw=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_subbyte_round_trip_property(w, h, depth, comp, tiled, miw, seed):
    """Sub-byte pages (r09 wave 2): MSB-first packing, per-row byte
    padding, MinIsWhite inversion — every cell must invert exactly."""
    import numpy as np

    from vector_lake_spark.tiff import decode_tiff_pixels, encode_tiff

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    f = encode_tiff(
        px, compression=comp, bit_depth=depth, min_is_white=miw,
        tile_size=16 if tiled else None,
    )
    assert np.array_equal(decode_tiff_pixels(f)[:, :, 0], px)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    n_colors=st.integers(1, 256),
    comp=st.sampled_from(["none", "packbits", "lzw"]),
    tiled=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_palette_round_trip_property(w, h, n_colors, comp, tiled, seed):
    import numpy as np

    from vector_lake_spark.tiff import decode_tiff_pixels, encode_tiff

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
    cmap = rng.integers(0, 1 << 16, (n_colors, 3)).astype(np.uint16)
    f = encode_tiff(
        idx, compression=comp, colormap=cmap,
        tile_size=16 if tiled else None,
    )
    assert np.array_equal(decode_tiff_pixels(f), cmap[idx])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 90),
    h=st.integers(1, 40),
    scheme=st.sampled_from(["mh", "g3", "g4"]),
    density=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_fax_round_trip_property(w, h, scheme, density, seed):
    """CCITT fax (r09 wave 3): any bilevel page must invert exactly
    through MH / G3 1-D / G4 at any mark density."""
    import numpy as np

    from vector_lake_spark.fax import decode_fax, encode_fax

    rng = np.random.default_rng(seed)
    px = (rng.random((h, w)) < density).astype(np.uint8)
    data = encode_fax(px, scheme)
    assert np.array_equal(decode_fax(data, w, h, scheme), px)


@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=1, max_value=100),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=20, deadline=None)
def test_progressive12_equals_sequential_property(h, w, quality, seed):
    """Late-r09 codec: the 12-bit progressive and extended-sequential
    encoders quantize identically, so their decodes must agree
    pixel-for-pixel at ANY geometry and quality — the same anchor the
    8-bit pair is pinned by above, over the widened categories."""
    from vector_lake_spark.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    seq = decode_jpeg_pixels(encode_jpeg(img, quality, precision=12))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, quality, precision=12)
    )
    assert prog.dtype == np.uint16
    assert np.array_equal(prog, seq)


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_g711_compander_properties(xs):
    """Late-r09 codec (G.711): for ANY int16 samples, (1) encode→decode→
    encode is a fixed point (decode levels re-encode to their own code),
    (2) the decoded magnitude error is within the segment step, and
    (3) sign is preserved for samples past the first quantization step."""
    from vector_lake_spark.g711 import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    x = np.array(xs, dtype=np.int16)
    for enc, dec, step0 in ((ulaw_encode, ulaw_decode, 8),
                            (alaw_encode, alaw_decode, 16)):
        code = enc(x)
        back = dec(code)
        # fixed point: decode levels are exactly representable
        assert np.array_equal(enc(back), code)
        assert np.array_equal(dec(enc(back)), back)
        # bounded error: each segment's step doubles; worst case the
        # relative error above the first segment is < 1/16 + slack
        err = np.abs(back.astype(np.int64) - x.astype(np.int64))
        mag = np.abs(x.astype(np.int64))
        big = mag >= 1024
        if big.any():
            assert float((err[big] / mag[big]).max()) < 0.08
        small = mag < 1024
        if small.any():
            assert int(err[small].max()) <= 64
        # sign preservation away from zero
        far = mag > 4 * step0
        if far.any():
            assert np.all(np.sign(back[far]) == np.sign(x[far]))


@given(
    v3=st.integers(min_value=0, max_value=2),
    layer=st.integers(min_value=1, max_value=3),
    br_idx=st.integers(min_value=1, max_value=14),
    rate_idx=st.integers(min_value=0, max_value=2),
    n=st.integers(min_value=1, max_value=60),
    mono=st.booleans(),
    pad_every=st.integers(min_value=0, max_value=4),
    tagged=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_mp3_probe_matches_closed_form(
    v3, layer, br_idx, rate_idx, n, mono, pad_every, tagged
):
    """Late-r09 probe: for ANY cell of the public header-table matrix,
    the frame walk's outputs equal the closed-form arithmetic the
    DuckDB oracle uses (frame sizes, slot padding, duration)."""
    from vector_lake_spark.mp3 import (
        BITRATES,
        SAMPLE_RATES,
        frame_length,
        mux_mp3_frames,
        probe_mp3,
    )

    version = ("1", "2", "2.5")[v3]
    vgroup = 1 if version == "1" else 2
    payload = mux_mp3_frames(
        n, version, layer, br_idx, rate_idx, mono=mono,
        pad_every=pad_every, id3v2_bytes=33 if tagged else 0, id3v1=tagged,
    )
    info = probe_mp3(payload)
    rate = SAMPLE_RATES[version][rate_idx]
    kbps = BITRATES[(vgroup, layer)][br_idx - 1]
    n_pad = n // pad_every if pad_every else 0
    base = frame_length(vgroup, layer, kbps, rate, 0)
    slot = 4 if layer == 1 else 1
    spf = 384 if layer == 1 else (1152 if (layer == 2 or vgroup == 1) else 576)
    assert info["n_frames"] == n
    assert info["sample_rate"] == rate
    assert info["bitrate_kbps"] == kbps
    assert info["stream_bytes"] == n * base + n_pad * slot
    assert info["duration_ms"] == n * spf * 1000 // rate
    assert info["n_channels"] == (1 if mono else 2)
    assert info["vbr"] is False


@given(
    opus=st.booleans(),
    channels=st.integers(min_value=1, max_value=8),
    rate=st.sampled_from([8000, 22050, 44100, 48000]),
    n_audio=st.integers(min_value=1, max_value=10),
    pkt_bytes=st.lists(st.integers(min_value=0, max_value=700),
                       min_size=1, max_size=3),
    gstep=st.integers(min_value=1, max_value=100_000),
    pre_skip=st.integers(min_value=0, max_value=2000),
)
@settings(max_examples=60, deadline=None)
def test_ogg_probe_matches_closed_form(
    opus, channels, rate, n_audio, pkt_bytes, gstep, pre_skip
):
    """Late-r09 probe: any page/packet geometry muxes to a stream whose
    walk reproduces the closed-form page/packet/duration arithmetic —
    incl. multi-packet pages and 255-multiple lacing boundaries."""
    from vector_lake_spark.ogg import (
        mux_ogg_pages,
        opus_id_packet,
        probe_ogg,
        vorbis_id_packet,
    )

    idpkt = (
        opus_id_packet(channels, pre_skip, 48000)
        if opus
        else vorbis_id_packet(channels, rate)
    )
    pages = [{"serial": 1, "seq": 0, "granule": 0, "bos": True,
              "packets": [idpkt]}]
    for i in range(n_audio):
        pages.append(
            {
                "serial": 1,
                "seq": i + 1,
                "granule": (i + 1) * gstep,
                "eos": i == n_audio - 1,
                "packets": [bytes(k) for k in pkt_bytes],
            }
        )
    info = probe_ogg(mux_ogg_pages(pages))
    eff_rate = 48000 if opus else rate
    g = n_audio * gstep
    samples = max(g - pre_skip, 0) if opus else g
    assert info["codec"] == ("opus" if opus else "vorbis")
    assert info["n_channels"] == channels
    assert info["sample_rate"] == eff_rate
    assert info["n_pages"] == n_audio + 1
    assert info["n_packets"] == 1 + n_audio * len(pkt_bytes)
    assert info["duration_ms"] == samples * 1000 // eff_rate
    page_body = sum(pkt_bytes)
    lacing = sum(k // 255 + 1 for k in pkt_bytes)
    assert info["total_bytes"] == (
        27 + 1 + len(idpkt) + n_audio * (27 + lacing + page_body)
    )


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    predictor=st.integers(min_value=1, max_value=7),
    precision=st.sampled_from([2, 4, 8, 12, 16]),
    rgb=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_lossless_jpeg_roundtrip_property(h, w, predictor, precision, rgb, seed):
    """Late-r09 codec (SOF3): lossless JPEG round-trips BIT-EXACTLY for
    ARBITRARY content at any geometry, precision 2..16, all seven
    predictors, gray and RGB — the definitional property of the Annex H
    process."""
    from vector_lake_spark.jpeg import decode_jpeg_pixels, encode_jpeg_lossless

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    dt = np.uint8 if precision <= 8 else np.uint16
    px = rng.integers(0, 1 << precision, shape).astype(dt)
    out = decode_jpeg_pixels(
        encode_jpeg_lossless(px, predictor=predictor, precision=precision)
    )
    assert out.dtype == dt
    assert np.array_equal(out, px)


# --- r10: lacing, ADPCM and perceptual-hash properties ----------------------


@given(
    st.lists(st.integers(1, 700), min_size=1, max_size=8),
    st.sampled_from(["xiph", "ebml"]),
)
@settings(max_examples=40, deadline=None)
def test_lacing_roundtrip_arbitrary_frame_sizes(sizes, lacing):
    """Any frame-size sequence must survive mux → slice through Xiph
    and EBML lacing (fixed lacing requires equal sizes and is covered
    separately) — sizes crossing the 255-run and multi-byte-VINT
    boundaries included."""
    from vector_lake_spark.mkv import _block_frame_slices, _laced_block_body

    frames = [bytes([i & 0xFF]) * n for i, n in enumerate(sizes)]
    body = _laced_block_body(frames, lacing)
    # body: tno VINT (1) + ts (2) + flags (1), then lacing
    flags = body[3]
    slices = _block_frame_slices(body, 4, len(body), flags)
    assert [body[a:b] for a, b in slices] == frames


@given(st.integers(1, 100), st.integers(2, 64))
@settings(max_examples=30, deadline=None)
def test_fixed_lacing_roundtrip(n_frames, size):
    from vector_lake_spark.mkv import _block_frame_slices, _laced_block_body

    frames = [bytes([i & 0xFF]) * size for i in range(n_frames)]
    body = _laced_block_body(frames, "fixed")
    slices = _block_frame_slices(body, 4, len(body), body[3])
    assert [body[a:b] for a, b in slices] == frames


@given(
    st.lists(st.integers(-30000, 30000), min_size=2, max_size=600),
    st.sampled_from([1, 2]),
)
@settings(max_examples=25, deadline=None)
def test_ima_adpcm_bounded_and_deterministic(samples, n_channels):
    """IMA ADPCM on ARBITRARY int16 signals: decode(encode(x)) is
    int16-bounded, deterministic, and every block's first sample is
    exact (the header re-seeds the predictor)."""
    import numpy as np

    from vector_lake_spark.adpcm import ima_adpcm_decode, ima_adpcm_encode

    x = np.asarray(samples, dtype=np.int64)
    if len(x) % n_channels:
        x = x[: len(x) - (len(x) % n_channels)]
    if len(x) < n_channels:
        return
    data, ba = ima_adpcm_encode(x, n_channels, 65)
    dec = ima_adpcm_decode(data, n_channels, ba)
    dec2 = ima_adpcm_decode(data, n_channels, ba)
    assert np.array_equal(dec, dec2)
    assert dec.min() >= -32768 and dec.max() <= 32767
    spb = 65
    frames = x.reshape(-1, n_channels)
    for c in range(n_channels):
        for b0 in range(0, len(frames), spb):
            assert dec[b0 * n_channels + c] == frames[b0, c]


@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=600))
@settings(max_examples=25, deadline=None)
def test_ms_adpcm_bounded_and_seeded(samples):
    """MS ADPCM: int16-bounded output; the two verbatim header samples
    of every block are exact on arbitrary content."""
    import numpy as np

    from vector_lake_spark.adpcm import ms_adpcm_decode, ms_adpcm_encode

    x = np.asarray(samples, dtype=np.int64)
    data, ba = ms_adpcm_encode(x, 1, 66)
    dec = ms_adpcm_decode(data, 1, ba, 66)
    assert dec.min() >= -32768 and dec.max() <= 32767
    for b0 in range(0, len(x), 66):
        assert dec[b0] == x[b0]
        if b0 + 1 < len(x):
            assert dec[b0 + 1] == x[b0 + 1]


@given(
    st.integers(0, (1 << 63) - 1),
    st.lists(st.integers(0, 63), min_size=0, max_size=6, unique=True),
)
@settings(max_examples=40, deadline=None)
def test_dhash_render_roundtrip_property(base, flips):
    """ANY 63-bit signature (bit 63 clear) survives render → box
    downsample → dHash — the fixture construction is total, not just
    correct on the registry's formula outputs."""
    import numpy as np

    from vector_lake_spark.operators.imagehash import dhash64
    from vector_lake_spark.queries import _render_dhash_grid

    sig = base & ((1 << 63) - 1)
    for f in flips:
        if f < 63:
            sig ^= 1 << f
    sig &= (1 << 63) - 1
    grid = _render_dhash_grid(sig)
    up = np.kron(grid, np.ones((3, 2), dtype=np.uint8))  # non-square scale
    assert dhash64(up.astype(np.float64)) == sig


@given(
    st.integers(min_value=0, max_value=255),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),  # flip position
        ),
        max_size=12,
    ),
    st.integers(min_value=0, max_value=11),  # radius
)
@settings(max_examples=60, deadline=None)
def test_wide_block_pigeonhole_property(seed, flips, radius):
    """Driver-side property of the wide (4×int64) block decomposition:
    for ANY 256-bit pair within `radius`, at least one of the
    C(b, b−radius) block combinations agrees exactly — the pigeonhole
    guarantee `hamming_neardup_pairs(n_longs=4)` builds its equi-join
    on, checked against the same layout arithmetic the operator uses."""
    from itertools import combinations

    from vector_lake_spark.operators.binary import _block_layout

    rng = np.random.RandomState(seed)
    a = [int(rng.randint(0, 1 << 63)) for _ in range(4)]
    b = list(a)
    for (pos,) in flips[: radius if radius else 0]:
        b[pos // 64] ^= 1 << (pos % 64)
    dist = sum(
        bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b)
    )
    assert dist <= radius
    n_blocks = max(radius + 1, 4)
    layout = _block_layout(n_blocks, 256)

    def block_val(sig, off, w):
        total = 0
        for j in range(4):
            total |= (sig[j] & ((1 << 64) - 1)) << (64 * j)
        return (total >> off) & ((1 << w) - 1)

    t = n_blocks - radius
    agrees = [
        block_val(a, *layout[i]) == block_val(b, *layout[i])
        for i in range(n_blocks)
    ]
    assert any(
        all(agrees[i] for i in combo)
        for combo in combinations(range(n_blocks), t)
    )


@given(
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=0.05, max_value=20.0, allow_nan=False),
)
@settings(max_examples=40, deadline=None)
def test_audio_fingerprint_gain_invariance_property(doc_id, gain):
    """The sign-of-band-energy fingerprint must be invariant under any
    uniform gain (energy ordering is scale-free) — over arbitrary
    fixture walks, not just the unit-test grid."""
    from vector_lake_spark.operators.audiofp import audio_fingerprint64
    from vector_lake_spark.queries import (
        _audio_fixture_sig,
        _render_audio_pcm,
    )

    x = _render_audio_pcm(_audio_fixture_sig(doc_id)).astype(np.float64)
    assert audio_fingerprint64(x) == audio_fingerprint64(x * gain)


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_phash_int64_range_and_gain_invariance_property(seed):
    """Every perceptual hasher must return a value in signed-int64
    range on ARBITRARY pixel content (the r12 review found phash64
    skipped the two's-complement wrap — bit 63 is set on ~half of
    natural images), and pHash must be exactly gain-invariant on
    unrounded float pixels (mean-thresholded AC ordering is
    scale-free)."""
    import numpy as np

    from vector_lake_spark.operators.imagehash import phash64

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    v = phash64(img)
    assert -(1 << 63) <= v < (1 << 63)
    assert v & 1 == 0  # the DC position never contributes a bit
    f = img.astype(np.float64)
    assert phash64(f * 0.25) == phash64(f)
