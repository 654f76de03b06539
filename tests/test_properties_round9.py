"""Property-based invariants for the round-9 additions (hypothesis):
codec round-trips (FLAC, TIFF PackBits/LZW), the WordPiece scoring
recurrence vs a reference Python implementation, the offset floor
division's three-evaluator agreement, and HLL merge laws. Pure-Python
paths — no SparkSession, so these fuzz wide and fast."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_github_data_pipeline_spark.operators import multimodal as mm

_bytes = st.binary(min_size=0, max_size=4000)
_samples = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=2000
)


@settings(max_examples=40, deadline=None)
@given(_bytes)
def test_packbits_roundtrip(data):
    assert mm._packbits_decode(mm._packbits_encode(data), len(data)) == data


@settings(max_examples=40, deadline=None)
@given(_bytes)
def test_tiff_lzw_roundtrip(data):
    assert mm._tiff_lzw_decode(mm._tiff_lzw_encode(data), len(data)) == data


@settings(max_examples=25, deadline=None)
@given(_samples, st.integers(min_value=1, max_value=512))
def test_flac_mono_roundtrip(samples, block):
    s = np.array(samples, dtype=np.int16)
    sr, out = mm.decode_flac(mm.encode_flac(s, 8000, block_size=block))
    assert sr == 8000
    assert np.array_equal(out, s)


@settings(max_examples=15, deadline=None)
@given(_samples, _samples)
def test_flac_stereo_roundtrip(left, right):
    n = min(len(left), len(right))
    s = np.stack(
        [
            np.array(left[:n], dtype=np.int16),
            np.array(right[:n], dtype=np.int16),
        ],
        axis=1,
    )
    _, out = mm.decode_flac(mm.encode_flac(s, 8000, block_size=256))
    assert np.array_equal(out, s)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([0, 1, 2]),
)
def test_tiff_roundtrip_any_shape(w, h, mode):
    rng = np.random.default_rng(w * 1000 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if mode == 1:
        px = px[:, :, 0]
    comp = ["none", "packbits", "lzw"][mode]
    rps = max(1, h // 3)
    got = mm.decode_tiff(
        mm.encode_tiff(px, rows_per_strip=rps, compression=comp)
    )
    assert np.array_equal(got, px)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=1, max_value=10**5),
)
def test_offset_floor_div_is_true_floor(num, den):
    """The _FDIV_OFFSET shift must compute Python's floor division for
    any signed numerator — the invariant the seasonal/Theil-Sen SQL
    lanes rely on (Spark div and DuckDB // truncate; the offset moves
    the numerator where truncation IS floor)."""
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        _FDIV_OFFSET,
    )

    b = _FDIV_OFFSET
    shifted = (num + den * b) // den - b  # trunc == floor: non-negative
    assert shifted == num // den


def _ref_wordpiece(words, n_merges):
    """Reference WordPiece: independent Python implementation of the
    likelihood-ratio merge loop (exact integer score)."""
    from collections import Counter

    freq = Counter(words)
    seqs = {w: list(w) for w in freq}
    merges = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, s in seqs.items():
            for sym in s:
                sc[sym] += freq[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += freq[w]
        if not pc:
            break
        scored = {
            p: (c * 10**12) // (sc[p[0]] * sc[p[1]]) for p, c in pc.items()
        }
        (pa, pb) = min(scored, key=lambda p: (-scored[p], p[0], p[1]))
        merges.append((step, pa, pb, pc[(pa, pb)], scored[(pa, pb)]))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pa and s[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=1,
        max_size=15,
    )
)
def test_wordpiece_local_matches_reference(spark, words):
    from incremental_github_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    merges, _ = tx.learn_wordpiece(df, n_merges=3)
    got = [
        (r.step, r.pa, r.pb, r.cnt, r.score_s)
        for r in merges.orderBy("step").collect()
    ]
    assert got == _ref_wordpiece(words, 3)
