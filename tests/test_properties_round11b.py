"""Property-based invariants for the late round-11 additions
(hypothesis): WARC / Avro / tar / zip build→parse round-trips over
arbitrary content, AU/PCX codec round-trips over arbitrary rasters and
signals, mojibake-repair laws (corruption inverse, idempotence) and
sentence-split reconstruction. Pure-Python paths — no SparkSession, so
these fuzz wide and fast."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from incremental_github_data_pipeline_spark.operators import multimodal as mm
from incremental_github_data_pipeline_spark.operators import text as tx
from incremental_github_data_pipeline_spark.sources.archives import (
    archive_members,
    tar_build,
    zip_build,
)
from incremental_github_data_pipeline_spark.sources.avro import (
    avro_build,
    avro_records,
)

# -- WARC ------------------------------------------------------------------

_uri = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=40,
).map(lambda s: "https://h.example.com/" + s)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["warcinfo", "response", "request", "metadata"]),
            st.binary(max_size=200),
            _uri,
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=6,
    ),
    st.booleans(),
)
def test_warc_roundtrip_arbitrary_records(specs, gz):
    recs = []
    for wtype, body, uri, has_status in specs:
        rec = {"warc_type": wtype, "target_uri": uri, "body": body}
        if wtype == "response" and has_status:
            rec["http_status"] = 200
        recs.append(rec)
    parsed = tx.warc_records(tx.warc_build(recs, gzip_per_record=gz))
    assert len(parsed) == len(recs)
    for got, want in zip(parsed, recs):
        assert got["warc_type"] == want["warc_type"]
        assert got["body"] == want["body"]
        assert got["target_uri"] == want["target_uri"]
        if "http_status" in want:
            assert got["http_status"] == 200


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(max_size=100), min_size=1, max_size=5))
def test_warc_layouts_parse_identically(bodies):
    recs = [{"warc_type": "metadata", "body": b} for b in bodies]
    plain = tx.warc_records(tx.warc_build(recs))
    gz = tx.warc_records(tx.warc_build(recs, gzip_per_record=True))
    assert plain == gz


# -- Avro ------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "o", "type": ["null", "long"]},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "boolean"},
    ],
}

_avro_rec = st.fixed_dictionaries(
    {
        "s": st.text(max_size=30),
        "n": st.integers(min_value=-(2**62), max_value=2**62),
        "o": st.none() | st.integers(min_value=-1000, max_value=1000),
        "b": st.binary(max_size=40),
        "f": st.booleans(),
    }
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(_avro_rec, min_size=1, max_size=12),
    st.sampled_from(["null", "deflate"]),
    st.integers(min_value=1, max_value=5),
)
def test_avro_roundtrip_arbitrary_records(recs, codec, per_block):
    payload = avro_build(
        _AVRO_SCHEMA, recs, codec=codec, records_per_block=per_block
    )
    _, got = avro_records(payload)
    assert got == recs


# -- archives ----------------------------------------------------------------

_member_name = st.text(
    alphabet=st.characters(
        min_codepoint=ord("a"), max_codepoint=ord("z")
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(_member_name, st.binary(max_size=120)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["tar", "tar.gz", "zip", "zip0"]),
)
def test_archive_roundtrip_arbitrary_members(members, layout):
    if layout == "tar":
        payload = tar_build(members)
    elif layout == "tar.gz":
        payload = tar_build(members, gz=True)
    elif layout == "zip":
        payload = zip_build(members)
    else:
        payload = zip_build(members, compress=False)
    assert archive_members(payload) == members


# -- AU / PCX ----------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=2**31),
)
def test_au_pcm16_roundtrip(n, ch, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    if ch == 1:
        s = s[:, 0]
    sr, out = mm.decode_au(mm.encode_au(s, annotation=b"x" * (seed % 5)))
    assert np.array_equal(out.reshape(s.shape), s)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31),
)
def test_pcx_roundtrip_arbitrary_rasters(h, w, gray, seed):
    rng = np.random.default_rng(seed)
    if gray:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    else:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_pcx(mm.encode_pcx(px)), px)


# -- mojibake ----------------------------------------------------------------

_clean_targets = "".join(t for _, t in tx.MOJIBAKE_MAP)


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(_clean_targets + "abc XYZ,"),
        max_size=60,
    )
)
def test_mojibake_corruption_inverse_and_idempotence(s):
    # corrupt the WHOLE string the way the bug does, then repair
    corrupt = s.encode("utf-8").decode("cp1252", errors="ignore")
    # only strings whose corruption is losslessly representable count
    if corrupt.encode("cp1252", errors="ignore") != s.encode("utf-8"):
        return
    fixed = corrupt
    for c, r in tx.MOJIBAKE_MAP:
        fixed = fixed.replace(c, r)
    assert fixed == s
    again = fixed
    for c, r in tx.MOJIBAKE_MAP:
        again = again.replace(c, r)
    assert again == fixed  # repair is idempotent on repaired text


# -- sentences ---------------------------------------------------------------

_word = st.text(
    alphabet=st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
    min_size=1,
    max_size=8,
)
_sentence = st.tuples(
    _word, st.lists(_word, max_size=4), st.sampled_from(".!?")
).map(lambda t: (t[0].capitalize() + " " + " ".join(t[1])).strip() + t[2])


@settings(max_examples=40, deadline=None)
@given(st.lists(_sentence, min_size=1, max_size=6))
def test_sentence_split_reconstructs_generated_sentences(sents):
    # pure-python replay of split_sentences' regex (same pattern)
    import re

    text = " ".join(sents)
    marked = re.sub(r"([.!?])\s+([A-Z0-9])", "\\1\x01\\2", text)
    got = [p.strip() for p in marked.split("\x01")]
    assert got == sents
