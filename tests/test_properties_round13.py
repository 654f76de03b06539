"""Property-based invariants for the round-13 operators: trigram
language ID vs a pure-Python counter, percent-encoding normalization
vs an independent reference decoder, salted keep-first vs pandas
groupby-idxmin, and G3-MR framing round-trips under hypothesis-driven
rasters."""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import multimodal as mm
from incremental_github_data_pipeline_spark.operators import text as tx

TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    max_size=80,
)


def _py_trigrams(s: str) -> list[str]:
    t = " " + s.lower() + " "
    return [t[i : i + 3] for i in range(len(t) - 2)]


class TestTrigramProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(TEXTS, min_size=1, max_size=8))
    def test_hits_match_python_counter(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        hits = tx.trigram_hits("t")
        got = {
            r["i"]: {la: r[la] for la in tx.TRIGRAM_PROFILES}
            for r in df.select(
                "i", *[hits[la].alias(la) for la in tx.TRIGRAM_PROFILES]
            ).collect()
        }
        for i, t in enumerate(texts):
            tg = _py_trigrams(t)
            for lang, profile in tx.TRIGRAM_PROFILES.items():
                want = sum(1 for x in tg if x in set(profile))
                assert got[i][lang] == want, (t, lang)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(TEXTS, min_size=1, max_size=8))
    def test_label_matches_python_argmax(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        got = {
            r["i"]: r["lang"]
            for r in df.select(
                "i", tx.lang_id_trigram("t").alias("lang")
            ).collect()
        }
        for i, t in enumerate(texts):
            counts = {
                name: len(re.findall(f"[{rng}]", t))
                for name, rng in tx.SCRIPT_RANGES.items()
            }
            names = list(counts)
            dom = names[
                min(
                    range(len(names)),
                    key=lambda j: (-counts[names[j]], j),
                )
            ]
            if dom in tx._SCRIPT_LANG:
                want = tx._SCRIPT_LANG[dom]
            else:
                tg = _py_trigrams(t)
                hits = {
                    lang: sum(1 for x in tg if x in set(profile))
                    for lang, profile in tx.TRIGRAM_PROFILES.items()
                }
                best = max(hits.values())
                want = (
                    "und"
                    if best == 0
                    else next(
                        la for la in tx.TRIGRAM_PROFILES
                        if hits[la] == best
                    )
                )
            assert got[i] == want, (t, got[i], want)


def _py_percent_normalize(s: str) -> str:
    """Independent reference: regex-driven single pass."""
    out = []
    i = 0
    while i < len(s):
        if s[i] == "%" and re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            v = int(s[i + 1 : i + 3], 16)
            if (
                0x41 <= v <= 0x5A or 0x61 <= v <= 0x7A
                or 0x30 <= v <= 0x39 or v in (0x2D, 0x2E, 0x5F, 0x7E)
            ):
                out.append(chr(v))
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=list("%0123456789abcdefABCDEFxyzG/?.~_-"),
            max_size=30,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_percent_encoding_matches_reference(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", tx.normalize_percent_encoding("u").alias("n")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _py_percent_normalize(u), u


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),   # key bucket
            st.integers(0, 10**6),  # payload
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 8),
)
def test_salted_keep_first_matches_pandas(spark, rows, buckets):
    import pandas as pd

    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_keep_first,
    )

    data = [(f"k{k}", i, p) for i, (k, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, seq long, payload long")
    got = sorted(
        map(tuple, salted_keep_first(
            df, ["k"], ["seq"], buckets=buckets
        ).collect())
    )
    pdf = pd.DataFrame(data, columns=["k", "seq", "payload"])
    want = sorted(
        map(
            tuple,
            pdf.loc[pdf.groupby("k")["seq"].idxmin()].itertuples(
                index=False
            ),
        )
    )
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 80),
    st.floats(0.0, 1.0),
    st.integers(1, 6),
    st.randoms(use_true_random=False),
)
def test_g3_mr_roundtrip_property(h, w, density, k, rnd):
    black = np.array(
        [[rnd.random() < density for _ in range(w)] for _ in range(h)],
        dtype=bool,
    )
    data = mm.encode_ccitt_g3_2d(black, k=k)
    assert np.array_equal(mm.decode_ccitt_g3_2d(data, w, h), black)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12),
    st.lists(st.integers(0, 2 ** 24 - 1), min_size=1, max_size=40),
)
def test_webp_rgba_still_roundtrip_property(h, w, seeds):
    rng = np.random.RandomState(seeds[0] % 2**31)
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    out = mm.decode_webp_lossless(mm.encode_webp_lossless(px))
    if out.shape[2] == 3:  # all-opaque random draw
        assert np.all(px[:, :, 3] == 255)
        assert np.array_equal(out, px[:, :, :3])
    else:
        assert np.array_equal(out, px)
