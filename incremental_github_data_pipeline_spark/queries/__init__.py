# spark-graft: PySpark-native incremental data-pipeline engine

This repo is a brand-new, PySpark-native analytics/ETL engine with the same
query and data-processing capabilities as
`piter-a/Incremental-GitHub-Data-Pipeline` — an incremental ELT pipeline that
ingests GitHub entities (repos, issues, branches, users, owners), cleans and
conforms them behind deterministic UUIDv5 surrogate keys, enforces a
constraint-checked star schema, and loads idempotently — rebuilt from scratch
on idiomatic Spark (DataFrame/SQL/Catalyst, with a Structured Streaming
incremental path) rather than ported from the reference's pandas
implementation. Beyond reference parity it adds a general relational operator
surface (joins, aggregations, windows, set ops) plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis), each
designed for 100 TB scale and verified against a DuckDB oracle. The blueprint
is `SURVEY.md` (structural analysis of the reference with file:line
citations); `BASELINE.md` holds the performance baseline, `FIXTURES.md` the
test-fixture schemas, and `__spark_entry__.py` the driver verification
contract.

## Layout

```
incremental_github_data_pipeline_spark/
  session.py       SparkSession factory (UTC, AQE, Arrow, broadcast conf)
  keys.py          bit-exact native uuid5 expressions + pandas-UDF twin
  sources/         schema'd readers (S5), rotating writers (S4/S7),
                   manifest-versioned snapshots (time travel/vacuum),
                   REST ingestion (S1-S3/S9), audit log (S10), JDBC
                   warehouse w/ MERGE upsert (S8), migration ledger
  operators/       core relational ops (P*/J*/A*/W*/U*), dedup (exact/
                   minhash/simhash/jaccard/embedding + connected-component
                   cluster formation, AllPairs exact-similarity join), similarity (brute force + IVF top-k,
                   vector norms), text (lang-id/quality/repetition/tokens/
                   fingerprint/decontamination/chunking/sampling/splits/
                   BM25 retrieval/negative sampling/inverted index),
                   BPE/WordPiece/unigram-LM tokenizer training,
                   temporal (as-of + range join), graph (integer-exact
                   PageRank, triangle counting, k-core peel), skew
                   (salting), privacy (k-anonymity/l-diversity gate +
                   suppression + generalization ladder), incremental_agg (algebraic rollup
                   state, count-min + state-certified HyperLogLog
                   mergeable sketches), timeseries (gap-fill
                   resample/LOCF, weighted moving avg, TWAP, exact
                   z-score outliers, CUSUM change points, additive
                   seasonal decomposition, Theil-Sen slope), multimodal
                   (real BMP / JPEG incl. progressive, 4:2:0 + restart
                   markers, 12-bit SOF1 / PNG incl. Adam7, 16-bit,
                   sub-byte depths / GIF-LZW / QOI / PCM-WAV incl.
                   stereo + 8-bit lanes / FLAC (fixed-predictor,
                   CRC+MD5-verified) / baseline TIFF (II+MM,
                   multi-strip, PackBits + LZW/predictor) / Netpbm /
                   TGA incl. RLE / AIFF / G.711 / IMA-ADPCM / raw-video
                   codecs over mapInPandas, plus VAD segmentation and
                   video motion/scene-cut stats)
  functions/       scalar F1-F10 + let_ (single-eval expression binding)
  plans/           expectations engine: the warehouse DDL contract as
                   declarative checks (evaluate/enforce + audit frame)
  pipelines/       the five GitHub cleaners as one lazy DAG (golden-
                   replay-tested against the reference's committed CSVs)
  streaming/       availableNow ingestion, idempotent uuid5 merge,
                   watermarked windows, applyInPandasWithState
                   (incl. session-window attribution), gzip-shard
                   streams into versioned tables, incremental PQ-ANN
                   and BM25 search-index maintenance (doclens delta
                   table, term-clustered compaction, versioned hybrid
                   RRF serving)
  queries/         193 registered queries, almost all with a DuckDB
                   oracle twin (incl. all 22 TPC-H queries, the
                   real-codec media decodes — JPEG, PNG, GIF, QOI, G.711,
                   and a recursive-CTE-certified IMA ADPCM — and the
                   end-to-end curation funnel); approximate
                   operators certify via engine-portable assertions
                   (planted-copy ranks, error-bound booleans) plus
                   invariant tests
tests/             pytest suite (golden replay, oracles, property tests,
                   physical-plan contracts, streaming micro-batches)
bench.py           headline-query wall-clock harness (driver contract)
COVERAGE.md        SURVEY.md §2 inventory → implementation/test/query map
PLANS.md           auto-generated per-query physical-plan audit
```

Run everything: `python -m pytest tests/ -q`, correctness vs DuckDB:
`python scripts/check_correctness.py`, benchmark: `python bench.py`.
Measured 1×/10×/50× scaling evidence (plans that hold as data grows,
with per-operator shuffle/partition rationale) lives in `SCALE.md`;
reproduce with `python scripts/scale_smoke.py 10 [query ...]`.
