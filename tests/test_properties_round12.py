"""Property-based invariants for the round-12 additions (hypothesis):
CCITT G3/G4 round-trips over arbitrary bilevel rasters and densities,
EXIF orientation group laws (involutions, the rotation subgroup, and
composition against numpy ground truth), the T.4 run-table bijection,
tracker-strip idempotence, and script-count conservation. Pure-Python
paths — no SparkSession, so these fuzz wide and fast."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_github_data_pipeline_spark.operators import multimodal as mm
from incremental_github_data_pipeline_spark.operators import text as tx

_dims = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=180),
)


def _bilevel(h: int, w: int, seed: int, density: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random((h, w)) < density


@settings(max_examples=60, deadline=None)
@given(
    _dims,
    st.integers(min_value=0, max_value=2**31),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_g4_roundtrip_any_bilevel(dims, seed, density):
    h, w = dims
    img = _bilevel(h, w, seed, density)
    got = mm.decode_ccitt_g4(mm.encode_ccitt_g4(img), w, h)
    assert np.array_equal(got, img)


@settings(max_examples=60, deadline=None)
@given(
    _dims,
    st.integers(min_value=0, max_value=2**31),
    st.floats(min_value=0.0, max_value=1.0),
    st.booleans(),
)
def test_g3_roundtrip_any_bilevel_both_framings(dims, seed, density, eol):
    h, w = dims
    img = _bilevel(h, w, seed, density)
    got = mm.decode_ccitt_g3(
        mm.encode_ccitt_g3(img, eol=eol), w, h, eol=eol
    )
    assert np.array_equal(got, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=5200), st.booleans())
def test_t4_run_code_bijection(run, white):
    """Every run length encodes to a bit string the run decoder reads
    back exactly, consuming all of it — makeup composition included."""
    bits = mm._t4_run_bits(run, white)
    table = mm._T4_DEC_WHITE if white else mm._T4_DEC_BLACK
    pos, total = 0, 0
    while True:
        for ln in range(2, mm._T4_MAX_CODE_LEN + 1):
            r = table.get(bits[pos : pos + ln])
            if r is not None:
                pos += ln
                total += r
                break
        else:  # pragma: no cover
            raise AssertionError("undecodable code emitted")
        if r < 64:
            break
    assert total == run and pos == len(bits)


@settings(max_examples=40, deadline=None)
@given(
    _dims,
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=8),
)
def test_exif_orientation_group_laws(dims, seed, o):
    h, w = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = mm.apply_exif_orientation(px, o)
    # orientations 1-4 are involutions; 6 and 8 are mutual inverses;
    # 5 and 7 are involutions (transpositions)
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}[o]
    back = mm.apply_exif_orientation(out, inverse)
    assert np.array_equal(back, px)
    # pixel multiset is preserved (pure permutation, nothing lost)
    assert np.array_equal(np.sort(out, axis=None), np.sort(px, axis=None))
    # dims swap exactly for the transposing half
    assert out.shape == ((w, h) if o >= 5 else (h, w))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_rotation_subgroup_composition(seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    # 6 (rot90 CW) applied twice = 3 (rot180); three times = 8 (rot270)
    r90 = mm.apply_exif_orientation(px, 6)
    assert np.array_equal(
        mm.apply_exif_orientation(r90, 6), mm.apply_exif_orientation(px, 3)
    )
    assert np.array_equal(
        mm.apply_exif_orientation(mm.apply_exif_orientation(r90, 6), 6),
        mm.apply_exif_orientation(px, 8),
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                ["id", "a", "b", "utm_source", "utm_x", "fbclid", "gclid"]
            ),
            st.integers(min_value=0, max_value=99),
        ),
        max_size=6,
    ),
    st.integers(min_value=0, max_value=99),
)
def test_strip_tracking_params_idempotent_spark_free(params, pid):
    """Python re-implementation of the documented contract checked for
    idempotence and tracker-freeness — the Spark expression itself is
    pinned by the oracle query; this fuzzes the CONTRACT."""
    url = f"https://h.ex/p{pid}"
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)

    def strip(u: str) -> str:
        if "?" not in u:
            return u
        base, q = u.split("?", 1)
        kept = [
            p for p in q.split("&")
            if not (
                p.split("=")[0].startswith("utm_")
                or p.split("=")[0] in tx.TRACKING_PARAM_NAMES
            )
        ]
        return base + ("?" + "&".join(kept) if kept else "")

    once = strip(url)
    assert strip(once) == once
    assert "utm_" not in once.split("?")[-1] or "?" not in once
    for name in tx.TRACKING_PARAM_NAMES:
        assert f"?{name}=" not in once and f"&{name}=" not in once


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=200))
def test_script_ranges_disjoint_on_any_text(text):
    """The script classes are DISJOINT code-point sets: no character
    can count toward two scripts, so per-script counts sum to at most
    the character count."""
    import re

    total = 0
    for rng in tx.SCRIPT_RANGES.values():
        total += len(re.findall(f"[{rng}]", text))
    assert total <= len(text)
