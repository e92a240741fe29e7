"""DuckDB oracle-SQL generators for the driver correctness contract.

The driver runs each __spark_entry__.queries() entry AND the matching
oracle_sql() string side-by-side at sf0.01 and compares row-count, schema
and an order-insensitive value hash. BM25 is fully SQL-expressible, so the
flagship scoring path gets a STRONG oracle (not rows-only): the SQL below
recomputes tokenization (RE2 regexes identical to pysearch.analysis),
SmallFloat doc-length quantization (codec.duckdb_dlq_expr) and Lucene-8
BM25 from scratch in DuckDB. Scores are rounded to ROUND_DIGITS on both
sides (engine computes in float64; cross-system libm/sum-order noise is
~1e-15, far below the rounding grain).
"""

from __future__ import annotations

from collections import Counter

from . import analysis, codec

ROUND_DIGITS = 4


def _quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def corpus_ctes(table: str = "documents", text_col: str = "text") -> str:
    """Shared CTE prefix: tok2 (post-stop tokens), dl (per-doc length incl.
    zero-token docs), stats (N, avgdl)."""
    return f"""
tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_expr(text_col)}) AS term
  FROM {table}
),
tok2 AS (SELECT doc_id, term FROM tok WHERE {analysis.duckdb_stop_pred('term')}),
dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS dl
  FROM {table} d LEFT JOIN tok2 t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / count(*) AS avgdl
  FROM {table}
)"""


def bm25_topk_sql(query_text: str, k: int, mode: str = "or",
                  table: str = "documents") -> str:
    """Top-k BM25 (Lucene-8 form, quantized dl) as one DuckDB query.

    Produces columns (doc_id BIGINT, score DOUBLE) — score rounded to
    ROUND_DIGITS; top-k selected on the RAW score with doc_id tie-break,
    exactly like the engine."""
    terms = analysis.analyze(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0::DOUBLE AS score FROM {table} WHERE 1=0"
    weights = Counter(terms)
    qw_vals = ", ".join(f"({_quote(t)}, {w}.0)" for t, w in sorted(weights.items()))
    in_list = ", ".join(_quote(t) for t in sorted(weights))
    k1, b = analysis.K1, analysis.B
    dlq = codec.duckdb_dlq_expr("dl.dl")
    and_filter = f"HAVING count(*) = {len(weights)}" if mode == "and" else ""
    return f"""
WITH {corpus_ctes(table)},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok2 WHERE term IN ({in_list}) GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
qw(term, weight) AS (VALUES {qw_vals}),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)))
           * qw.weight AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN qw USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score_raw
  FROM scored GROUP BY doc_id {and_filter}
),
topk AS (
  SELECT doc_id, score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk
"""


def _scored_ctes(query_text: str, table: str = "documents") -> tuple[str, int]:
    """Shared CTE chain ending in scored(doc_id, term, contrib) — one row
    per matching (doc, clause) with its UNWEIGHTED BM25 contribution.
    Returns (sql_fragment, n_unique_terms)."""
    terms = sorted(set(analysis.analyze(query_text)))
    in_list = ", ".join(_quote(t) for t in terms)
    k1, b = analysis.K1, analysis.B
    dlq = codec.duckdb_dlq_expr("dl.dl")
    frag = f"""{corpus_ctes(table)},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok2 WHERE term IN ({in_list}) GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)))
           AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
)"""
    return frag, len(terms)


def dis_max_sql(query_text: str, k: int, tie_breaker: float = 0.0,
                table: str = "documents") -> str:
    frag, _ = _scored_ctes(query_text, table)
    return f"""
WITH {frag},
agg AS (
  SELECT doc_id, max(contrib) AS mx, sum(contrib) AS sm
  FROM scored GROUP BY doc_id
),
topk AS (
  SELECT doc_id, mx + {tie_breaker} * (sm - mx) AS score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def constant_score_sql(query_text: str, boost: float = 1.0,
                       mode: str = "or", table: str = "documents") -> str:
    terms = sorted(set(analysis.analyze(query_text)))
    in_list = ", ".join(_quote(t) for t in terms)
    having = (f"HAVING count(DISTINCT term) = {len(terms)}"
              if mode == "and" else "")
    return f"""
WITH {corpus_ctes(table)},
m AS (
  SELECT doc_id FROM tok2 WHERE term IN ({in_list})
  GROUP BY doc_id {having})
SELECT doc_id, {float(boost)} AS score FROM m ORDER BY doc_id"""


def function_score_sql(query_text: str, k: int,
                       table: str = "documents") -> str:
    """BM25 · ln(1 + len(text)/100) (field_value_factor modifier)."""
    frag, _ = _scored_ctes(query_text, table)
    return f"""
WITH {frag},
agg AS (SELECT doc_id, sum(contrib) AS bm25 FROM scored GROUP BY doc_id),
boosted AS (
  SELECT a.doc_id, a.bm25 * ln(1 + len(d.text) / 100.0) AS score_raw
  FROM agg a JOIN {table} d ON a.doc_id = d.doc_id),
topk AS (
  SELECT doc_id, score_raw FROM boosted
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def bool_full_sql(plan, table: str = "documents") -> str:
    """Oracle for the full bool query (must/filter/should/must_not/msm).
    Shares exact BM25 semantics with bm25_topk_sql; clause weights are a
    VALUES relation mirroring exec.search_bool_full."""
    from collections import Counter

    all_terms = sorted(set(plan.must) | set(plan.should)
                       | set(plan.must_not) | set(plan.filter))
    # _scored_ctes analyzes its input; feed the raw terms through a fake
    # query text only if they are analyzer-stable — enforce that here.
    for t in all_terms:
        assert analysis.analyze(t) == [t], f"non-stable term {t!r}"
    frag, _ = _scored_ctes(" ".join(all_terms), table)
    wm, ws = Counter(plan.must), Counter(plan.should)
    req = sorted(set(plan.must) | set(plan.filter))
    vals = ", ".join(
        f"({_quote(t)}, {float(wm.get(t, 0))}, {float(ws.get(t, 0))}, "
        f"{str(t in set(req)).upper()}, {str(t in set(plan.must_not)).upper()})"
        for t in all_terms)
    return f"""
WITH {frag},
clauses(term, w_must, w_should, is_req, is_not) AS (VALUES {vals}),
agg AS (
  SELECT s.doc_id,
         sum(s.contrib * (c.w_must + c.w_should)) AS score_raw,
         count(DISTINCT CASE WHEN c.is_req THEN s.term END) AS n_req,
         count(DISTINCT CASE WHEN c.w_should > 0 THEN s.term END) AS n_should,
         max(CASE WHEN c.is_not THEN 1 ELSE 0 END) AS has_not
  FROM scored s JOIN clauses c ON s.term = c.term
  GROUP BY s.doc_id
),
topk AS (
  SELECT doc_id, score_raw FROM agg
  WHERE n_req = {len(req)} AND has_not = 0 AND n_should >= {plan.msm}
  ORDER BY score_raw DESC, doc_id ASC LIMIT {plan.k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def count_sql(query_text: str, mode: str = "or", table: str = "documents") -> str:
    terms = analysis.analyze(query_text)
    if not terms:
        return "SELECT 0::BIGINT AS cnt"
    uniq = sorted(set(terms))
    in_list = ", ".join(_quote(t) for t in uniq)
    having = f"HAVING count(DISTINCT term) = {len(uniq)}" if mode == "and" else ""
    return f"""
WITH {corpus_ctes(table)},
m AS (
  SELECT doc_id FROM tok2 WHERE term IN ({in_list})
  GROUP BY doc_id {having}
)
SELECT count(*)::BIGINT AS cnt FROM m
"""
