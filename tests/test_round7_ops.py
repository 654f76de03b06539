"""Round-7/8 advisor fixes: pooled-recall block clamp (r7) and its
empty-vector corner (r8), BPE symbol-mass gate (r7), and the per-scan
JPEG DHT/DRI snapshot (fixed r7, regression-pinned r8 by a hand-built
two-scan stream that redefines table id 0 and DRI between scans — the
exact shape libjpeg ``-optimize`` emits and the repo's own encoders
never produce). Edge cases the sf0.01 oracles don't reach."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import (
    similarity as sim,
)
from incremental_github_data_pipeline_spark.operators import (
    text as tx,
)


def test_pooled_ann_recall_clamps_blocks_to_dim(spark):
    """dim=4 < n_blocks=8: the sketch clamps to one component per
    block, so the pooled ranking IS the exact ranking — recall@k must
    be perfect, not the degenerate 7-empty-blocks sketch the pre-r7
    code silently produced."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 4)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    rows = sim.pooled_ann_recall(corpus, queries, k=5, n_blocks=8).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_overlap"] == r["k"] == 5


def test_learn_bpe_syms_gate_reroutes_to_distributed(spark, monkeypatch):
    """The local-fold gate bounds COLLECTED driver bytes (total
    symbols), not just word-type count: few-but-huge word types must
    take the distributed path even though n_types is tiny."""
    df = spark.createDataFrame(
        [(1, "abcd" * 25 + " " + "bcda" * 25)], "doc_id long, text string"
    )

    def boom(*_a, **_k):  # pragma: no cover - failure path
        raise AssertionError("local path taken despite syms gate")

    monkeypatch.setattr(tx, "_learn_bpe_local", boom)
    merges, vocab = tx.learn_bpe(df, n_merges=2, local_syms_max=50)
    assert merges.count() == 2  # distributed path ran the rounds
    assert vocab.count() == 2  # two word types survive either path


def test_learn_bpe_syms_gate_passes_small_corpora(spark):
    """Default gates keep small corpora on the local fold and the
    result is unchanged (agreement with the distributed path is pinned
    separately at n_merges=1000 in test_round5_ops)."""
    df = spark.createDataFrame(
        [(1, "aaab aaab aab")], "doc_id long, text string"
    )
    rows = tx.learn_bpe_merges(df, n_merges=1).orderBy("step").collect()
    assert [(r.step, r.pa, r.pb) for r in rows] == [(1, "a", "a")]


def test_pooled_ann_recall_empty_vector_defined(spark):
    """An EMPTY query vector must produce a well-defined all-zero
    pooled sketch (nb clamps to 1), not the nb=0 degenerate where
    base = size/0 is NULL and sequence(0, -1) yields [0, -1] — which
    made dot_pooled NULL and the pooled ranking null-ordered
    (advisor r8). The query still gets a recall row with a non-null
    overlap count."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(12, 8)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "corpus_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]]), (1, [])],
        "query_id long, embedding array<float>",
    )
    rows = {
        r["query_id"]: r
        for r in sim.pooled_ann_recall(
            corpus, queries, k=4, n_blocks=8
        ).collect()
    }
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["n_overlap"] is not None
        assert 0 <= r["n_overlap"] <= r["k"] == 4
    # an empty vector's exact and pooled dots are BOTH all-zero, so the
    # two lanes tie-break identically by corpus_id: recall is perfect
    assert rows[1]["n_overlap"] == 4


# ---------------------------------------------------------------------
# Per-scan JPEG DHT/DRI snapshot (multimodal.py decode_jpeg SOS path)
# ---------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _two_scan_progressive_jpeg(px: np.ndarray) -> bytes:
    """Hand-built two-scan progressive grayscale JPEG in which scan 2
    is preceded by a REDEFINITION of DC table id 0 (reversed symbol
    order — same code lengths, different meanings) and a DRI change
    (2 -> 0). Scan 1 (full DC, restart interval 2, one RST0 marker)
    is only decodable with the FIRST table 0 and DRI=2; scan 2 (AC
    band 1-63) only with the second definitions. A decoder that
    replays all scans against the last-defined marker state (the
    pre-r7 behavior) misreads scan 1's Huffman codes and never
    switches restart segments — this stream is the regression pin for
    the dict(huff)/DRI snapshot at each SOS."""
    from incremental_github_data_pipeline_spark.operators import (
        multimodal as mm,
    )

    coefs, n_comp, h, w = mm._quantized_blocks(px)
    assert n_comp == 1 and coefs.shape[1] == 2 and coefs.shape[2] == 2
    dc_a_vals = list(mm._DC_VALS)
    dc_b_vals = list(reversed(mm._DC_VALS))  # same lengths, new meanings
    dc_a = mm._huff_codes(mm._DC_BITS, dc_a_vals)
    ac_b = mm._huff_codes(mm._AC_PROG_BITS, mm._AC_PROG_VALS)

    # scan 1: DC first (Ss=0 Se=0 Ah=0 Al=0), DRI=2 -> two restart
    # segments of two blocks each, fresh predictor per segment
    seg1 = mm._enc_dc_first(coefs, [(0, 0, 0), (0, 0, 1)], 0, dc_a)
    seg2 = mm._enc_dc_first(coefs, [(0, 1, 0), (0, 1, 1)], 0, dc_a)
    scan1 = seg1 + b"\xff\xd0" + seg2
    # scan 2: AC first over band 1-63, no restarts
    blocks = [(0, 0), (0, 1), (1, 0), (1, 1)]
    scan2 = mm._enc_ac_first(coefs[0], blocks, 1, 63, 0, ac_b)

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 72, 72, 0, 0)
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in mm._QTABLE))
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, 1) + struct.pack(">BBB", 1, 0x11, 0),
    )
    out += _dht(0, 0, mm._DC_BITS, dc_a_vals)
    out += _seg(0xDD, struct.pack(">H", 2))  # DRI=2 for scan 1
    out += _seg(0xDA, struct.pack(">BBBBBB", 1, 1, 0x00, 0, 0, 0x00))
    out += scan1
    # between-scan redefinitions: table id 0 now means something else,
    # and restarts are switched OFF
    out += _dht(0, 0, mm._DC_BITS, dc_b_vals)
    out += _dht(1, 0, mm._AC_PROG_BITS, mm._AC_PROG_VALS)
    out += _seg(0xDD, struct.pack(">H", 0))  # DRI=0 for scan 2
    out += _seg(0xDA, struct.pack(">BBBBBB", 1, 1, 0x00, 1, 63, 0x00))
    out += scan2
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_per_scan_tables_and_dri():
    """decode of the two-scan stream with mid-file DHT/DRI
    redefinition must equal the decode of the same pixels through the
    repo's up-front-tables encoder — both carry identical quantized
    coefficients, so the outputs are bit-identical. Reverting the
    per-SOS dict(huff)/restart_interval snapshot makes scan 1 decode
    against the reversed table with DRI=0 and this assertion (or the
    decode itself) fail."""
    from incremental_github_data_pipeline_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    got = mm.decode_jpeg(_two_scan_progressive_jpeg(px))
    want = mm.decode_jpeg(mm.encode_jpeg(px))
    assert got.shape == want.shape == (16, 16)
    assert np.array_equal(got, want)


def test_decode_jpeg_last_tables_would_misdecode():
    """Sanity guard on the fixture itself: decoding scan 1's entropy
    bytes against the LAST-defined (reversed) DC table does NOT
    reproduce the true DC values — i.e. the stream genuinely
    discriminates per-scan state from last-defined state."""
    from incremental_github_data_pipeline_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    coefs, _n, _h, _w = mm._quantized_blocks(px)
    dc_a = mm._huff_codes(mm._DC_BITS, list(mm._DC_VALS))
    dc_b_dec = mm._huff_decoder(mm._DC_BITS, list(reversed(mm._DC_VALS)))
    seg1 = mm._enc_dc_first(coefs, [(0, 0, 0), (0, 0, 1)], 0, dc_a)
    br = mm._BitReader(seg1)
    wrong = []
    try:
        pred = 0
        for _ in range(2):
            size = br.read_symbol(dc_b_dec)
            pred += mm._extend(br.read_bits(size), size)
            wrong.append(pred)
    except ValueError:
        wrong = None  # truncation counts as mis-decode too
    true_dc = [int(coefs[0, 0, 0, 0]), int(coefs[0, 0, 1, 0])]
    assert wrong != true_dc
