"""Ray-Data-native per-column lightweight-compression engine for transcript
tables, re-expressing the capability surface of the reference DuckDB/Parquet
ETL pipeline (``KamilJ117417/ETL-SQL-DuckDB-Parquet-``).

Layout:

- ``codecs``    — pure numpy/pyarrow codec kernels (dict, RLE, FSST,
  frame-of-reference + bit-packing, delta / delta-of-delta, zstd) with a
  per-chunk auto-selector driven by sampled stats.
- ``chunk``     — the on-disk encoded-chunk container format.
- ``sources``   — parquet read helpers + the deterministic transcript
  generator.
- ``stages``    — vectorized ``map_batches`` stages: normalize, validate,
  dedup (exact / MinHash-LSH / SimHash), text analysis, similarity search.
- ``pipelines`` — end-to-end encode/decode/verify pipelines and the
  relational query registry mirrored by ``oracle_sql``.
- ``state``     — lineage manifest (checkpoint/resume) and broadcast helpers.

No module here calls ``ray.init``; sessions are owned by the driver,
``bench.py`` and the test fixture only.
"""

__version__ = "0.1.0"
