"""pysearch — a from-scratch PySpark-native full-text index + BM25 query engine.

Capabilities modeled on the reference (a137872798/elasticsearch, an annotated
fork of elastic/elasticsearch 7.x): Lucene-style inverted-index build
(analysis chain -> postings with delta+varint compression, block-max
metadata, SmallFloat-quantized doc-length norms) and top-k BM25 query
execution (term / match / bool AND / bool OR with block-max WAND pruning),
re-expressed Spark-first (DataFrame ops + vectorized Arrow/pandas UDFs;
no per-row Python anywhere).

Package map (SURVEY.md §7):
  analysis.py  tokenizer spec (single source of truth for Python/Spark/DuckDB)
  codec.py     numpy varint/delta posting codec + SmallFloat byte4 norms
  build.py     corpus -> postings/norms/stats segment build pipeline
  stats.py     global collection + term statistics
  plan.py      query plan dataclasses + parser
  exec.py      scoring/search operators (WAND, intersect, top-k, fetch)
  oracle.py    numpy brute-force BM25 (test oracle)
  oracle_sql.py DuckDB SQL generators (driver correctness contract)
  session.py   SparkSession builder
"""

__version__ = "0.1.0"
