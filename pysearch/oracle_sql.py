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


def corpus_ctes(table: str = "documents", text_col: str = "text",
                prefix: str = "") -> str:
    """Shared CTE prefix: {p}tok2 (post-stop tokens), {p}dl (per-doc length
    incl. zero-token docs), {p}stats (N, avgdl). ``text_col`` may be any
    SQL expression over the table (e.g. substr(text,1,80) — a derived
    field); ``prefix`` namespaces the CTEs so two fields' chains coexist
    in one query (multi_match)."""
    p = prefix
    return f"""
{p}tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_expr(text_col)}) AS term
  FROM {table}
),
{p}tok2 AS (SELECT doc_id, term FROM {p}tok WHERE {analysis.duckdb_stop_pred('term')}),
{p}dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS dl
  FROM {table} d LEFT JOIN {p}tok2 t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
),
{p}stats AS (
  SELECT count(*)::DOUBLE AS n,
         (SELECT sum(dl) FROM {p}dl)::DOUBLE / count(*) AS avgdl
  FROM {table}
)"""


def bm25_topk_sql(query_text: str, k: int, mode: str = "or",
                  table: str = "documents", pre_cte: str = "",
                  exclude_ids: tuple[int, ...] = ()) -> str:
    """Top-k BM25 (Lucene-8 form, quantized dl) as one DuckDB query.

    Produces columns (doc_id BIGINT, score DOUBLE) — score rounded to
    ROUND_DIGITS; top-k selected on the RAW score with doc_id tie-break,
    exactly like the engine.

    pre_cte: extra leading CTE(s) (``name AS (...)``) so ``table`` may be
    a derived corpus (versioning oracles: the PHYSICAL post-update
    corpus). exclude_ids: doc_ids filtered out AFTER scoring — Lucene's
    live-docs bitset over soft-deleted docs, which still count in
    df/N/avgdl until a merge drops them."""
    terms = analysis.analyze(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0::DOUBLE AS score FROM {table} WHERE 1=0"
    weights = Counter(terms)
    qw_vals = ", ".join(f"({_quote(t)}, {w}.0)" for t, w in sorted(weights.items()))
    in_list = ", ".join(_quote(t) for t in sorted(weights))
    k1, b = analysis.K1, analysis.B
    dlq = codec.duckdb_dlq_expr("dl.dl")
    and_filter = f"HAVING count(*) = {len(weights)}" if mode == "and" else ""
    pre = f"{pre_cte}," if pre_cte else ""
    excl = ("WHERE doc_id NOT IN (%s)" % ", ".join(map(str, exclude_ids))
            if exclude_ids else "")
    return f"""
WITH {pre}{corpus_ctes(table)},
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
  SELECT doc_id, score_raw FROM agg {excl}
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
)
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk
"""


def _scored_ctes(query_text: str, table: str = "documents",
                 text_col: str = "text", prefix: str = "") -> tuple[str, int]:
    """Shared CTE chain ending in {prefix}scored(doc_id, term, contrib) —
    one row per matching (doc, clause) with its UNWEIGHTED BM25
    contribution. Returns (sql_fragment, n_unique_terms)."""
    terms = sorted(set(analysis.analyze(query_text)))
    in_list = ", ".join(_quote(t) for t in terms)
    k1, b = analysis.K1, analysis.B
    p = prefix
    dlq = codec.duckdb_dlq_expr(f"{p}dl.dl")
    frag = f"""{corpus_ctes(table, text_col, prefix)},
{p}tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM {p}tok2 WHERE term IN ({in_list}) GROUP BY doc_id, term
),
{p}dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM {p}tf GROUP BY term
),
{p}scored AS (
  SELECT {p}tf.doc_id, {p}tf.term,
         ln(1 + (s.n - {p}dfreq.df + 0.5) / ({p}dfreq.df + 0.5))
           * ({p}tf.tf / ({p}tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)))
           AS contrib
  FROM {p}tf
  JOIN {p}dfreq USING (term)
  JOIN {p}dl ON {p}tf.doc_id = {p}dl.doc_id
  CROSS JOIN {p}stats s
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
SELECT doc_id, CAST({float(boost)} AS DOUBLE) AS score FROM m ORDER BY doc_id"""


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


# Forward-index keyword columns as they appear in the RAW documents table
# (the oracle side): the engine's corpus maps source->repo (build.py
# corpus_from_documents), so AttrNode fields translate back here.
_ATTR_SQL_COL = {"lang": "lang", "repo": "source"}


def _pos_cte(table: str = "documents") -> str:
    return f"""
pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[CAST(i AS INT)] AS term
  FROM (SELECT doc_id, {analysis.duckdb_tokens_nostop_expr('text')} AS t
        FROM {table}),
       unnest(range(1, len(t) + 1)) AS u(i)
)"""


def tree_sql(node, k: int, table: str = "documents") -> str:
    """Oracle for a recursive query tree (plan.parse_tree /
    parse_query_string): mirrors exec.search_tree node-for-node — every
    node becomes a CTE producing (doc_id, score), a bool node is the same
    tagged UNION ALL + GROUP BY + HAVING-style filter."""
    from . import plan as pplan

    terms = sorted(pplan.tree_terms(node))
    has_phrase = _tree_has_phrase(node)
    ctes: list[str] = []
    if terms:
        frag, _ = _scored_ctes(" ".join(terms), table)
        ctes.append(frag)
    if has_phrase:
        ctes.append(_pos_cte(table))

    counter = [0]

    def emit(n) -> str:
        name = f"nd{counter[0]}"
        counter[0] += 1
        if isinstance(n, pplan.MatchNode):
            if not n.terms:  # stopword-only clause: matches nothing
                ctes.append(f"""
{name} AS (SELECT doc_id, 0.0 AS score FROM {table} WHERE 1=0)""")
                return name
            in_list = ", ".join(_quote(t) for t in n.terms)
            ctes.append(f"""
{name} AS (
  SELECT doc_id, sum(contrib) AS score FROM scored
  WHERE term IN ({in_list}) GROUP BY doc_id
)""")
            return name
        if isinstance(n, pplan.PhraseNode):
            joins, conds = [], []
            for i in range(len(n.terms)):
                joins.append(f"pos a{i}")
                conds.append(f"a{i}.term = {_quote(n.terms[i])}")
                if i:
                    conds.append(f"a{i}.doc_id = a{i-1}.doc_id")
                    conds.append(
                        f"a{i}.pos BETWEEN a{i-1}.pos + 1 "
                        f"AND a{i-1}.pos + 1 + {n.slop}")
            in_list = ", ".join(_quote(t) for t in n.terms)
            ctes.append(f"""
{name} AS (
  SELECT s.doc_id, s.score FROM (
    SELECT DISTINCT a0.doc_id FROM {', '.join(joins)}
    WHERE {' AND '.join(conds)}) m
  JOIN (SELECT doc_id, sum(contrib) AS score FROM scored
        WHERE term IN ({in_list}) GROUP BY doc_id) s
    ON m.doc_id = s.doc_id
)""")
            return name
        if isinstance(n, pplan.AttrNode):
            col = _ATTR_SQL_COL.get(n.field, n.field)
            ctes.append(f"""
{name} AS (
  SELECT doc_id, 0.0 AS score FROM {table} WHERE {col} = {_quote(n.value)}
)""")
            return name
        assert isinstance(n, pplan.BoolNode)
        branches = []
        for kind in ("must", "should", "must_not", "filter"):
            for cid, sub in enumerate(getattr(n, kind)):
                cname = emit(sub)
                branches.append(
                    f"SELECT doc_id, score, '{kind}' AS kind, "
                    f"'{kind}:{cid}' AS cid FROM {cname}")
        if not any((n.must, n.should, n.filter)):
            branches.append(
                f"SELECT doc_id, 0.0 AS score, 'seed' AS kind, "
                f"'seed:0' AS cid FROM {table}")
        union = "\n  UNION ALL ".join(branches)
        eff_msm = n.msm if n.should else 0
        ctes.append(f"""
{name} AS (
  SELECT doc_id, score FROM (
    SELECT doc_id,
           sum(CASE WHEN kind IN ('must', 'should') THEN score ELSE 0.0 END) AS score,
           count(DISTINCT CASE WHEN kind = 'must' THEN cid END) AS n_must,
           count(DISTINCT CASE WHEN kind = 'filter' THEN cid END) AS n_filter,
           count(DISTINCT CASE WHEN kind = 'should' THEN cid END) AS n_should,
           max(CASE WHEN kind = 'must_not' THEN 1 ELSE 0 END) AS has_not
    FROM ({union})
    GROUP BY doc_id)
  WHERE n_must = {len(n.must)} AND n_filter = {len(n.filter)}
    AND n_should >= {eff_msm} AND has_not = 0
)""")
        return name

    root = emit(node)
    body = ",".join(ctes)
    return f"""
WITH {body}
SELECT doc_id, round(score, {ROUND_DIGITS}) AS score FROM (
  SELECT doc_id, score FROM {root}
  ORDER BY score DESC, doc_id ASC LIMIT {k})"""


def _tree_has_phrase(node) -> bool:
    from . import plan as pplan

    if isinstance(node, pplan.PhraseNode):
        return True
    if isinstance(node, pplan.BoolNode):
        return any(_tree_has_phrase(s)
                   for slot in ("must", "should", "must_not", "filter")
                   for s in getattr(node, slot))
    return False


def multi_match_sql(text: str, fields: dict[str, str], k: int,
                    match_type: str = "best_fields", tie_breaker: float = 0.0,
                    boosts: dict[str, float] | None = None,
                    table: str = "documents") -> str:
    """Oracle for multi_match: one prefixed per-field BM25 chain per entry
    of ``fields`` (name -> SQL text expression over the table), combined
    best_fields (max + tb·rest) or most_fields (sum) — mirroring
    exec.search_multi_match."""
    boosts = boosts or {}
    frags, branches = [], []
    for i, (fname, fexpr) in enumerate(fields.items()):
        p = f"f{i}_"
        frag, _ = _scored_ctes(text, table, text_col=fexpr, prefix=p)
        frags.append(frag)
        w = float(boosts.get(fname, 1.0))
        branches.append(
            f"SELECT doc_id, sum(contrib) * {w} AS fscore "
            f"FROM {p}scored GROUP BY doc_id")
    union = "\n  UNION ALL ".join(branches)
    if match_type == "best_fields":
        score = f"mx + {tie_breaker} * (sm - mx)"
    elif match_type == "most_fields":
        score = "sm"
    else:
        raise ValueError(match_type)
    return f"""
WITH {",".join(frags)},
perfield AS ({union}),
agg AS (
  SELECT doc_id, max(fscore) AS mx, sum(fscore) AS sm
  FROM perfield GROUP BY doc_id),
topk AS (
  SELECT doc_id, {score} AS score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def decay_sql(query_text: str, kind: str, *, origin: float, scale: float,
              offset: float, decay: float, k: int,
              table: str = "documents") -> str:
    """Oracle for function_score decay: BM25 · decay(len(text)) with the
    same closed-form curve constants exec._decay_factor embeds."""
    import math

    frag, _ = _scored_ctes(query_text, table)
    dist = f"greatest(0.0, abs(len(d.text) - {float(origin)!r}) - {float(offset)!r})"
    if kind == "gauss":
        sigma2 = -scale * scale / (2.0 * math.log(decay))
        curve = f"exp(-({dist}) * ({dist}) / {2.0 * sigma2!r})"
    elif kind == "exp":
        lam = math.log(decay) / scale
        curve = f"exp({lam!r} * ({dist}))"
    elif kind == "linear":
        s = scale / (1.0 - decay)
        curve = f"greatest(0.0, ({s!r} - ({dist})) / {s!r})"
    else:
        raise ValueError(kind)
    return f"""
WITH {frag},
agg AS (SELECT doc_id, sum(contrib) AS bm25 FROM scored GROUP BY doc_id),
boosted AS (
  SELECT a.doc_id, a.bm25 * {curve} AS score_raw
  FROM agg a JOIN {table} d ON a.doc_id = d.doc_id),
topk AS (
  SELECT doc_id, score_raw FROM boosted
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def random_score_sql(query_text: str, seed: int, k: int,
                     table: str = "documents") -> str:
    """Oracle for function_score random_score: identical md5-derived
    uniform — first 8 hex chars of md5('<seed>:<doc_id>') / 2^32."""
    terms = sorted(set(analysis.analyze(query_text)))
    in_list = ", ".join(_quote(t) for t in terms)
    return f"""
WITH {corpus_ctes(table)},
m AS (SELECT doc_id FROM tok2 WHERE term IN ({in_list}) GROUP BY doc_id),
r AS (
  SELECT doc_id,
         ('0x' || substr(md5(concat('{seed}', ':', doc_id)), 1, 8))::BIGINT
           / 4294967296.0 AS score_raw
  FROM m),
topk AS (
  SELECT doc_id, score_raw FROM r
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def cross_fields_sql(text: str, fields: dict[str, str], k: int,
                     boosts: dict[str, float] | None = None,
                     table: str = "documents") -> str:
    """Oracle for multi_match type=cross_fields: per-term df BLENDED as
    max over fields, each field keeps its own tf/dl normalization, best
    field wins per (doc, term), terms sum — mirrors
    exec.search_multi_match_cross."""
    boosts = boosts or {}
    terms = sorted(set(analysis.analyze(text)))
    in_list = ", ".join(_quote(t) for t in terms)
    k1, b = analysis.K1, analysis.B
    frags, df_unions, branches = [], [], []
    for i, (fname, fexpr) in enumerate(fields.items()):
        p = f"f{i}_"
        w = float(boosts.get(fname, 1.0))
        dlq = codec.duckdb_dlq_expr(f"{p}dl.dl")
        frags.append(f"""{corpus_ctes(table, fexpr, p)},
{p}tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM {p}tok2 WHERE term IN ({in_list}) GROUP BY doc_id, term
)""")
        df_unions.append(
            f"SELECT term, count(*)::DOUBLE AS df FROM {p}tf GROUP BY term")
        branches.append(f"""
  SELECT {p}tf.doc_id, {p}tf.term,
         ln(1 + (s.n - bl.dfb + 0.5) / (bl.dfb + 0.5))
           * ({p}tf.tf / ({p}tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)))
           * {w} AS fscore
  FROM {p}tf
  JOIN blend bl USING (term)
  JOIN {p}dl ON {p}tf.doc_id = {p}dl.doc_id
  CROSS JOIN {p}stats s""")
    union_df = "\n  UNION ALL ".join(df_unions)
    union_br = "\n  UNION ALL ".join(branches)
    return f"""
WITH {",".join(frags)},
blend AS (
  SELECT term, max(df) AS dfb FROM ({union_df}) GROUP BY term),
perfield AS ({union_br}),
perterm AS (
  SELECT doc_id, term, max(fscore) AS ts FROM perfield GROUP BY doc_id, term),
agg AS (SELECT doc_id, sum(ts) AS score_raw FROM perterm GROUP BY doc_id),
topk AS (
  SELECT doc_id, score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def fuzzy_sql(term: str, max_dist: int, max_expansions: int, k: int,
              table: str = "documents") -> str:
    """Oracle for the fuzzy query: the expansion set is re-derived from
    the corpus vocabulary with the same (levenshtein ≤ d, top-N by
    (dist, term)) rule, then weighted-BM25 summed."""
    k1, b = analysis.K1, analysis.B
    dlq = codec.duckdb_dlq_expr("dl.dl")
    return f"""
WITH {corpus_ctes(table)},
vocab AS (SELECT DISTINCT term FROM tok2),
exp AS (
  SELECT term, levenshtein(term, '{term}')::DOUBLE AS dist
  FROM vocab WHERE levenshtein(term, '{term}') <= {max_dist}
  ORDER BY dist ASC, term ASC LIMIT {max_expansions}),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok2 WHERE term IN (SELECT term FROM exp) GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)))
           * (1.0 - e.dist / {float(len(term))}) AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN exp e USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s),
agg AS (SELECT doc_id, sum(contrib) AS score_raw FROM scored GROUP BY doc_id),
topk AS (
  SELECT doc_id, score_raw FROM agg
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def boosting_sql(positive: str, negative: str, negative_boost: float,
                 k: int, table: str = "documents") -> str:
    """Oracle for the boosting query: positive BM25 scores, demoted by
    ×negative_boost where the doc also matches the negative terms."""
    pos_terms = sorted(set(analysis.analyze(positive)))
    neg_terms = sorted(set(analysis.analyze(negative)))
    frag, _ = _scored_ctes(" ".join(pos_terms + neg_terms), table)
    pos_in = ", ".join(_quote(t) for t in pos_terms)
    neg_in = ", ".join(_quote(t) for t in neg_terms) or "''"
    return f"""
WITH {frag},
pos AS (
  SELECT doc_id, sum(contrib) AS score FROM scored
  WHERE term IN ({pos_in}) GROUP BY doc_id),
neg AS (SELECT DISTINCT doc_id FROM scored WHERE term IN ({neg_in})),
demoted AS (
  SELECT p.doc_id,
         CASE WHEN n.doc_id IS NOT NULL
              THEN p.score * {negative_boost} ELSE p.score END AS score_raw
  FROM pos p LEFT JOIN neg n ON p.doc_id = n.doc_id),
topk AS (
  SELECT doc_id, score_raw FROM demoted
  ORDER BY score_raw DESC, doc_id ASC LIMIT {k})
SELECT doc_id, round(score_raw, {ROUND_DIGITS}) AS score FROM topk"""


def index_stats_sql(table: str = "documents") -> str:
    """Oracle for index_stats: re-derive the segment statistics straight
    from the corpus — cross-checks the INDEX's own tables (docs/term_stats/
    postings) against ground truth."""
    return f"""
WITH {corpus_ctes(table)},
tf AS (SELECT doc_id, term FROM tok2 GROUP BY doc_id, term)
SELECT (SELECT count(*) FROM {table})::BIGINT AS n_docs,
       (SELECT count(DISTINCT term) FROM tok2)::BIGINT AS n_terms,
       (SELECT count(*) FROM tf)::BIGINT AS n_postings,
       (SELECT round(avgdl, 4) FROM stats) AS avgdl"""


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
