"""Property-based invariants for the round-4 additions (hypothesis):
AllPairs losslessness vs a Python brute force, z-score agreement with
the float definition, resample grid completeness, and QOI round-trip
on arbitrary rasters."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

# Small alphabets force collisions/overlap — the interesting regime.
_token = st.sampled_from([f"w{i}" for i in range(12)])
_doc = st.lists(_token, min_size=1, max_size=12)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_allpairs_matches_python_brute_force(spark, docs):
    from incremental_github_data_pipeline_spark.operators.dedup import (
        allpairs_jaccard_join,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in allpairs_jaccard_join(df, threshold_pct=70).collect()
    }
    sets = [set(d) for d in docs]
    want = {
        (i, j)
        for i in range(len(sets))
        for j in range(i + 1, len(sets))
        if 100 * len(sets[i] & sets[j]) >= 70 * len(sets[i] | sets[j])
    }
    assert got == want  # lossless AND no false positives


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=3, max_size=40)
)
def test_zscore_integer_test_matches_float_definition(spark, values):
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        zscore_outliers,
    )

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(values)],
        "g string, id long, v long",
    )
    got = {
        r["id"]: r["is_outlier"]
        for r in zscore_outliers(df, "g", "v").collect()
    }
    n = len(values)
    mean = sum(values) / n
    var = sum((v - mean) ** 2 for v in values) / n
    sd = math.sqrt(var)
    for i, v in enumerate(values):
        # exact integer test == strict float comparison (ties: the
        # integer form is exact where the float one rounds, so only
        # assert agreement away from the knife edge)
        fl = abs(v - mean) > 2 * sd
        dev2 = (n * v - sum(values)) ** 2
        rhs = 4 * (n * sum(x * x for x in values) - sum(values) ** 2)
        assert got[i] == (dev2 > rhs)
        if abs(dev2 - rhs) > max(1, rhs // 10**9):  # off the edge
            assert got[i] == fl


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=72),  # hour offset
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_resample_grid_complete_and_ffilled(spark, obs):
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        resample_ffill,
    )

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [("k", base + dt.timedelta(hours=h), v) for h, v in obs],
        "k string, t timestamp, v long",
    )
    rows = sorted(
        (r["grid_ts"], r["value"], r["is_gap"])
        for r in resample_ffill(df, "k", "t", "v").collect()
    )
    hours = sorted(h for h, _ in obs)
    vals = dict(obs)
    # grid covers [min, max] hour with NO holes
    assert [t for t, _, _ in rows] == [
        base + dt.timedelta(hours=h) for h in range(hours[0], hours[-1] + 1)
    ]
    last = None
    for t, v, gap in rows:
        h = int((t - base).total_seconds() // 3600)
        if h in vals:
            assert (v, gap) == (vals[h], False)
            last = vals[h]
        else:
            assert (v, gap) == (last, True)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**31),
)
def test_qoi_round_trip_arbitrary(w, h, seed):
    import numpy as np

    from incremental_github_data_pipeline_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(seed)
    # mix of flat regions and noise exercises RUN/INDEX/DIFF paths
    px = rng.integers(0, 4, size=(h, w, 3), dtype=np.uint8) * 85
    assert (decode_qoi(encode_qoi(px)) == px).all()


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=2, max_value=17),
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=2**31),
)
def test_gif_lzw_round_trip_arbitrary(w, h, ncol, seed):
    """GIF + LZW round-trip on arbitrary index rasters — runs, width
    changes, dictionary growth, and the KwKwK case all arise from
    random content at small palette sizes."""
    import numpy as np

    from incremental_github_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, pal))
    assert (out == pal[idx]).all()


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31),
)
def test_png_round_trip_arbitrary(w, h, seed):
    """PNG round-trip with the filter cycle 0..4 on random truecolor
    and grayscale rasters."""
    import numpy as np

    from incremental_github_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()
