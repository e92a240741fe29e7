"""Search-surface extensions: highlighting and term suggestion.

Reference anchors:
  * highlight — fetch subphase building marked-up fragments around query
    matches (search/fetch/subphase/highlight/HighlightPhase.java, unified
    highlighter). Spark mapping: pure string expressions at fetch time.
  * suggest — the term suggester ("did you mean"): edit-distance
    candidates from the terms dictionary ranked by (distance, popularity)
    (search/suggest/term/TermSuggester.java; [lucene dep]
    DirectSpellChecker). Spark mapping: levenshtein over the (small)
    vocabulary relation, exactly Lucene's terms-dict-automaton shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import analysis, codec
from .registry import Entry, tbl

REGISTRY: dict[str, Entry] = {}

HL_TERM = "merge"
HL_CTX = 20          # chars of context either side
SUGGEST_INPUT = "mrge"   # misspelling of 'merge'
SUGGEST_MAX_DIST = 2


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


@_reg("q_highlight", f"""
WITH hit AS (
  SELECT doc_id, text, instr(text, '{HL_TERM}') AS pos
  FROM documents WHERE instr(text, '{HL_TERM}') > 0
),
frag AS (
  SELECT doc_id,
         substr(text, greatest(pos - {HL_CTX}, 1),
                {2 * HL_CTX} + len('{HL_TERM}')) AS fragment
  FROM hit
)
SELECT doc_id,
       replace(fragment, '{HL_TERM}', '<em>{HL_TERM}</em>') AS highlighted
FROM frag ORDER BY doc_id""")
def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-phase highlighting: a ±{HL_CTX}-char fragment around the
    first occurrence, matches wrapped in <em> tags."""
    d = tbl(spark, sf_dir, "documents")
    pos = F.instr("text", HL_TERM)
    frag = F.expr(
        f"substr(text, greatest(instr(text, '{HL_TERM}') - {HL_CTX}, 1), "
        f"{2 * HL_CTX} + length('{HL_TERM}'))")
    return (d.where(pos > 0)
            .select("doc_id",
                    F.replace(frag, F.lit(HL_TERM),
                              F.lit(f"<em>{HL_TERM}</em>")).alias("highlighted"))
            .orderBy("doc_id"))


# unified/FVH-style multi-fragment highlighting: fragments are ranked by
# match density and the best N are returned per doc (r02 "missing" #5 —
# q_highlight only emitted one fragment around the first occurrence).
HLU_TERMS = ("merge", "sort")
HLU_TOP_FRAGS = 2


def _occ(frag_expr: str, term: str) -> str:
    """occurrence count of `term` in a string expr — portable SQL
    ((len(x) − len(replace(x, t, ''))) / len(t)), identical in Spark+DuckDB."""
    return (f"CAST((length({frag_expr}) - "
            f"length(replace({frag_expr}, '{term}', ''))) / {len(term)} AS INT)")


_HLU_SCORE = " + ".join(_occ("frag", t) for t in HLU_TERMS)
_HLU_WRAP = "frag"
for _t in HLU_TERMS:
    _HLU_WRAP = f"replace({_HLU_WRAP}, '{_t}', '<em>{_t}</em>')"


@_reg("q_highlight_unified", f"""
WITH split AS (
  SELECT doc_id, string_split(text, '. ') AS s FROM documents
  WHERE instr(text, '{HLU_TERMS[0]}') > 0 AND instr(text, '{HLU_TERMS[1]}') > 0
),
frags AS (
  SELECT doc_id, CAST(i AS INT) AS fidx, s[CAST(i AS INT)] AS frag
  FROM split, unnest(range(1, len(s) + 1)) AS u(i)
),
scored AS (
  SELECT doc_id, fidx, frag, {_HLU_SCORE} AS fscore FROM frags
),
ranked AS (
  SELECT doc_id, fidx, fscore,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY fscore DESC, fidx ASC) AS rnk,
         {_HLU_WRAP} AS highlighted
  FROM scored WHERE fscore > 0
)
SELECT doc_id, fidx, fscore, highlighted FROM ranked
WHERE rnk <= {HLU_TOP_FRAGS} ORDER BY doc_id, fidx""")
def q_highlight_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified/FVH-style highlighting (fetch/subphase/highlight/
    DefaultHighlighter.java [unified], FastVectorHighlighter): the doc is
    split into sentence fragments, every fragment is SCORED by match
    density, and the best {HLU_TOP_FRAGS} fragments per doc are returned
    (vs q_highlight's single first-occurrence window). Pure Catalyst:
    split+posexplode+window top-N — the window partitions by doc_id, so
    no global sort at any scale."""
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    hit = d
    for t in HLU_TERMS:
        hit = hit.where(F.instr("text", t) > 0)
    frags = (hit.select(
        "doc_id",
        F.posexplode(F.split("text", r"\. ")).alias("i", "frag"))
        .select("doc_id", (F.col("i") + 1).cast("int").alias("fidx"), "frag"))
    scored = frags.select(
        "doc_id", "fidx", "frag", F.expr(_HLU_SCORE).alias("fscore"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("fscore"), F.asc("fidx"))
    return (scored.where(F.col("fscore") > 0)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= HLU_TOP_FRAGS)
            .select("doc_id", "fidx", "fscore",
                    F.expr(_HLU_WRAP).alias("highlighted"))
            .orderBy("doc_id", "fidx"))


MLT_DOC = 0
MLT_TERMS = 5
MLT_K = 10


@_reg("q_more_like_this", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS dl
  FROM documents d LEFT JOIN tok t ON d.doc_id = t.doc_id GROUP BY d.doc_id
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / count(*) AS avgdl
  FROM documents
),
mlt AS (
  SELECT term FROM (
    SELECT term, count(*) AS tf FROM tok WHERE doc_id = {MLT_DOC}
    GROUP BY term ORDER BY tf DESC, term ASC LIMIT {MLT_TERMS})
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
  WHERE term IN (SELECT term FROM mlt) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf / (tf.tf + {analysis.K1} * (1 - {analysis.B}
              + {analysis.B} * {codec.duckdb_dlq_expr("dl.dl")} / s.avgdl))) AS contrib
  FROM tf JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score_raw FROM scored
  WHERE doc_id != {MLT_DOC} GROUP BY doc_id
),
topk AS (SELECT doc_id, score_raw FROM agg
         ORDER BY score_raw DESC, doc_id ASC LIMIT {MLT_K})
SELECT doc_id, round(score_raw, 4) AS score FROM topk""")
def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """more_like_this: the source doc's top-{MLT_TERMS} terms (by tf, tie
    term asc) become an OR query; the source doc itself is excluded.
    Reference: index/query/MoreLikeThisQueryBuilder.java ([lucene dep]
    MoreLikeThis#retrieveInterestingTerms)."""
    from collections import Counter

    from . import exec as pexec

    import __spark_entry__ as em  # reuse the per-sf built index cache

    idx = em._index_for(spark, sf_dir)
    src = idx.docs.where(F.col("doc_id") == MLT_DOC).select("content").collect()
    toks = analysis.analyze(src[0][0]) if src else []
    top = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))
    terms = [t for t, _ in top[:MLT_TERMS]]
    q = pexec.Query(0, terms, k=MLT_K + 1, mode="or")
    hits = pexec.search_many(idx, [q])
    return (hits.where(F.col("doc_id") != MLT_DOC)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(MLT_K)
            .select("doc_id", F.round("score", 4).alias("score")))


RESCORE_Q1 = "value"    # first-pass query (cheap, recall-oriented)
RESCORE_Q2 = "merge"    # rescore query (precision pass over the window)
RESCORE_WINDOW = 50
RESCORE_W = 0.5         # query_weight = rescore_query_weight = 0.5


def _rescore_sql() -> str:
    from . import oracle_sql as osql

    frag, _ = osql._scored_ctes(f"{RESCORE_Q1} {RESCORE_Q2}")
    return f"""
WITH {frag},
s1 AS (SELECT doc_id, sum(contrib) AS a FROM scored
       WHERE term = '{RESCORE_Q1}' GROUP BY doc_id),
s2 AS (SELECT doc_id, sum(contrib) AS b FROM scored
       WHERE term = '{RESCORE_Q2}' GROUP BY doc_id),
win AS (SELECT doc_id, a FROM s1
        ORDER BY a DESC, doc_id ASC LIMIT {RESCORE_WINDOW}),
re AS (
  SELECT w.doc_id,
         {RESCORE_W} * w.a + {RESCORE_W} * coalesce(s2.b, 0) AS score_raw
  FROM win w LEFT JOIN s2 ON w.doc_id = s2.doc_id),
topk AS (SELECT doc_id, score_raw FROM re
         ORDER BY score_raw DESC, doc_id ASC LIMIT 10)
SELECT doc_id, round(score_raw, 4) AS score FROM topk"""


def q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rescore: re-rank the top-{RESCORE_WINDOW} hits of a cheap first
    query with a second scoring pass, combined 50/50 (QueryRescorer's
    query_weight/rescore_query_weight). Reference:
    search/rescore/QueryRescorer.java, RescorePhase.java."""
    from . import exec as pexec

    import __spark_entry__ as em

    idx = em._index_for(spark, sf_dir)
    win = pexec.search(idx, RESCORE_Q1, k=RESCORE_WINDOW).withColumnRenamed(
        "score", "a")
    s2 = (pexec._per_term_scored(idx, [RESCORE_Q2])
          .groupBy("doc_id").agg(F.sum("score").alias("b")))
    re = (win.join(s2, "doc_id", "left")
          .select("doc_id",
                  (RESCORE_W * F.col("a")
                   + RESCORE_W * F.coalesce(F.col("b"), F.lit(0.0)))
                  .alias("score")))
    return (re.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
            .select("doc_id", F.round("score", 4).alias("score")))


REGISTRY["q_rescore"] = Entry(fn=q_rescore, sql=_rescore_sql())


@_reg("suggest_term", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents
),
vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, df, levenshtein(term, '{SUGGEST_INPUT}') AS dist
FROM vocab
WHERE levenshtein(term, '{SUGGEST_INPUT}') <= {SUGGEST_MAX_DIST}
ORDER BY dist ASC, df DESC, term ASC LIMIT 5""")
def suggest_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term suggester: closest vocabulary terms to a misspelled input,
    ranked by (edit distance, document frequency)."""
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(analysis.tokens_expr(F.col("text"))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    dist = F.levenshtein(F.col("term"), F.lit(SUGGEST_INPUT))
    return (vocab.withColumn("dist", dist)
            .where(F.col("dist") <= SUGGEST_MAX_DIST)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term")).limit(5))


# ---------------------------------------------------------------------------
# explain + termvectors APIs (round 2)
# ---------------------------------------------------------------------------

EXPLAIN_TERM = "merge"
TV_DOC_ID = 7


def _explain_sql() -> str:
    from . import oracle_sql as osql

    dlq = codec.duckdb_dlq_expr("dl.dl")
    k1, b = analysis.K1, analysis.B
    return f"""
WITH {osql.corpus_ctes()},
tf AS (
  SELECT doc_id, count(*)::BIGINT AS tf FROM tok2
  WHERE term = '{EXPLAIN_TERM}' GROUP BY doc_id
),
x AS (
  SELECT tf.doc_id, tf.tf, dl.dl, {dlq} AS dlq,
         ln(1 + (s.n - (SELECT count(*) FROM tf) + 0.5)
              / ((SELECT count(*) FROM tf) + 0.5)) AS idf,
         tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {dlq} / s.avgdl)) AS tfw
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
)
SELECT doc_id, tf, dl, CAST(dlq AS BIGINT) AS dlq,
       round(idf, 4) AS idf, round(tfw, 4) AS tfw,
       round(idf * tfw, 4) AS score
FROM x ORDER BY idf * tfw DESC, doc_id ASC LIMIT 3"""


@_reg("q_explain", _explain_sql())
def q_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_explain` API analog ([lucene dep] BM25Similarity#explain /
    TransportExplainAction): the full per-doc score breakdown — tf, raw
    dl, SmallFloat-quantized dlq, idf, tf weight, final BM25 — for one
    term, top 3 docs. Cross-engine check: Spark evaluates
    codec.spark_dlq_sql while the oracle evaluates codec.duckdb_dlq_expr
    (independent formulations of the same quantizer)."""
    d = tbl(spark, sf_dir, "documents")
    toks = analysis.tokens_expr(F.col("text"))
    base = d.select("doc_id", toks.alias("t"))
    tf = (base.select("doc_id", F.explode("t").alias("term"))
          .where(F.col("term") == EXPLAIN_TERM)
          .groupBy("doc_id").agg(F.count("*").alias("tf")))
    dl = base.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = base.agg(
        F.count("*").alias("n"),
        (F.sum(F.size("t")) / F.count("*")).alias("avgdl"))
    dft = tf.agg(F.count("*").alias("df_t"))
    x = (tf.join(dl, "doc_id").crossJoin(F.broadcast(stats))
         .crossJoin(F.broadcast(dft))
         .withColumn("dlq", F.expr(codec.spark_dlq_sql("dl")).cast("long"))
         .withColumn("idf", F.log(
             1 + (F.col("n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)))
         .withColumn("tfw", F.col("tf") / (
             F.col("tf") + analysis.K1
             * (1 - analysis.B + analysis.B * F.col("dlq") / F.col("avgdl")))))
    return (x.orderBy(F.desc(F.col("idf") * F.col("tfw")), F.asc("doc_id"))
            .limit(3)
            .select("doc_id", "tf", "dl", "dlq",
                    F.round("idf", 4).alias("idf"),
                    F.round("tfw", 4).alias("tfw"),
                    F.round(F.col("idf") * F.col("tfw"), 4).alias("score")))


@_reg("termvectors", f"""
WITH t AS (
  SELECT {analysis.duckdb_tokens_nostop_expr('text')} AS a
  FROM documents WHERE doc_id = {TV_DOC_ID}
),
pos AS (
  SELECT a[CAST(i AS INT)] AS term, CAST(i - 1 AS INT) AS p
  FROM t, unnest(range(1, len(a) + 1)) AS u(i)
)
SELECT term, count(*)::BIGINT AS tf, CAST(min(p) AS INT) AS first_pos
FROM pos GROUP BY term ORDER BY term""")
def termvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_termvectors` API: per-document term vector — (term, tf,
    first position) over the analyzed stream of one doc
    (action/termvectors/TransportTermVectorsAction.java)."""
    d = tbl(spark, sf_dir, "documents").where(F.col("doc_id") == TV_DOC_ID)
    pos = d.select(F.posexplode(analysis.tokens_expr(F.col("text")))
                   .alias("p", "term"))
    return (pos.groupBy("term")
            .agg(F.count("*").alias("tf"),
                 F.min("p").cast("int").alias("first_pos"))
            .orderBy("term"))


# ---------------------------------------------------------------------------
# wildcard query — multi-term rewrite over the terms dictionary
# ---------------------------------------------------------------------------

WILDCARD_PATTERN = "s*"
_WILDCARD_LIKE = WILDCARD_PATTERN.replace("*", "%").replace("?", "_")


@_reg("q_wildcard", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents),
exp AS (
  SELECT DISTINCT term FROM tok WHERE term LIKE '{_WILDCARD_LIKE}'
  ORDER BY term ASC LIMIT 128)
SELECT DISTINCT t.doc_id, CAST(1.0 AS DOUBLE) AS score
FROM tok t JOIN exp USING (term)
ORDER BY doc_id""")
def q_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wildcard query (WildcardQueryBuilder): pattern expanded against the
    terms dictionary, docs scored CONSTANT (Lucene CONSTANT_SCORE_REWRITE).
    The oracle expresses the same relation directly — INCLUDING the engine's
    deterministic max_expansions=128 vocab cap (term asc), so engine and
    oracle compute the same relation at any vocabulary size."""
    import __spark_entry__ as em

    from . import exec as pexec

    idx = em._index_for(spark, sf_dir)
    return pexec.search_wildcard(idx, WILDCARD_PATTERN)


# ---------------------------------------------------------------------------
# function_score field_value_factor — the third score-function flavor
# (decay and random_score landed with r03 milestone 2)
# ---------------------------------------------------------------------------

FVF_TEXT, FVF_FACTOR, FVF_K = "merge sort", 0.01, 10


def _fvf_sql() -> str:
    from . import oracle_sql as osql

    frag, _ = osql._scored_ctes(FVF_TEXT)
    return f"""
WITH {frag},
base AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id),
fv AS (
  SELECT b.doc_id, b.s * ln(1 + {FVF_FACTOR} * d.n_chars) AS score_raw
  FROM base b JOIN documents d USING (doc_id)),
topk AS (
  SELECT doc_id, score_raw FROM fv
  ORDER BY score_raw DESC, doc_id ASC LIMIT {FVF_K})
SELECT doc_id, round(score_raw, 4) AS score FROM topk"""


def fs_field_value_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """function_score field_value_factor (functionscore/
    FieldValueFactorFunction.java): score = BM25 * log1p(factor * field),
    field read from the forward index (doc-values analog: a doc_id-keyed
    join to the documents table's n_chars column) BEFORE top-k selection,
    exactly like the decay variants."""
    import __spark_entry__ as em

    from . import exec as pexec

    idx = em._index_for(spark, sf_dir)
    terms = sorted(set(analysis.analyze(FVF_TEXT)))
    base = (pexec._per_term_scored(idx, terms)
            .groupBy("doc_id").agg(F.sum("score").alias("s")))
    d = tbl(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fv = base.join(d, "doc_id").select(
        "doc_id",
        (F.col("s") * F.log(1.0 + FVF_FACTOR * F.col("n_chars")))
        .alias("score_raw"))
    topk = fv.orderBy(F.desc("score_raw"), F.asc("doc_id")).limit(FVF_K)
    return topk.select("doc_id", F.round("score_raw", 4).alias("score"))


REGISTRY["fs_field_value_factor"] = Entry(fn=fs_field_value_factor,
                                          sql=_fvf_sql())


# ---------------------------------------------------------------------------
# terms_enum API — prefix-filtered vocabulary listing
# ---------------------------------------------------------------------------

TERMS_ENUM_PREFIX, TERMS_ENUM_N = "s", 20


@_reg("terms_enum", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM tok WHERE term LIKE '{TERMS_ENUM_PREFIX}%'
GROUP BY term ORDER BY term ASC LIMIT {TERMS_ENUM_N}""")
def terms_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_terms_enum API (rest/action/TermsEnumAction upstream): list index
    terms matching a prefix, term-ordered — served straight from the
    terms dictionary (term_stats), a vocab-grain scan that never touches
    postings. The oracle re-derives the dictionary (and its df) from the
    raw corpus, cross-checking the index's own stats."""
    import __spark_entry__ as em

    idx = em._index_for(spark, sf_dir)
    return (idx.term_stats
            .where(F.col("term").startswith(TERMS_ENUM_PREFIX))
            .select("term", F.col("df").cast("long").alias("df"))
            .orderBy("term").limit(TERMS_ENUM_N))


# ---------------------------------------------------------------------------
# _msearch — N independent searches planned as ONE Spark job
# ---------------------------------------------------------------------------

MSEARCH_QUERIES = ["merge sort", "hash join", "stream batch"]
MSEARCH_K = 5


def _msearch_sql() -> str:
    from . import oracle_sql as osql

    parts = [
        f"SELECT CAST({i} AS BIGINT) AS query_id, doc_id, score\n"
        f"FROM ({osql.bm25_topk_sql(text, MSEARCH_K)})"
        for i, text in enumerate(MSEARCH_QUERIES)
    ]
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM ({union}) u ORDER BY query_id, score DESC, doc_id"


def msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_msearch (action/search/MultiSearchRequest): a batch of independent
    top-k queries answered by ONE job — the candidate scan is shared and
    tagged with query_id (exec.search_many), the shape BENCH batch_7q
    measures at 0.14 s/query amortized."""
    import __spark_entry__ as em

    from . import exec as pexec

    idx = em._index_for(spark, sf_dir)
    qs = [pexec.Query(i, analysis.analyze(t), MSEARCH_K, "or")
          for i, t in enumerate(MSEARCH_QUERIES)]
    hits = pexec.search_many(idx, qs)
    return (hits.select(F.col("query_id").cast("long").alias("query_id"),
                        "doc_id", F.round("score", 4).alias("score"))
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))


REGISTRY["msearch"] = Entry(fn=msearch, sql=_msearch_sql())


# ---------------------------------------------------------------------------
# phrase suggester — "did you mean" over whole phrases (bigram LM)
# ---------------------------------------------------------------------------

SP_PREV, SP_INPUT, SP_MAXDIST, SP_N = "data", "bgg", 1, 3


def _suggest_phrase_sql() -> str:
    from .phrase import _POS_CTE

    return f"""
WITH {_POS_CTE},
vocab AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos GROUP BY term),
cand AS (
  SELECT term, df FROM vocab
  WHERE levenshtein(term, '{SP_INPUT}') <= {SP_MAXDIST}),
big AS (
  SELECT b.term, count(*) AS bigram_freq
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{SP_PREV}' GROUP BY b.term)
SELECT '{SP_PREV} ' || c.term AS suggestion,
       CAST(coalesce(g.bigram_freq, 0) AS BIGINT) AS bigram_freq,
       CAST(c.df AS BIGINT) AS df
FROM cand c LEFT JOIN big g ON c.term = g.term
ORDER BY bigram_freq DESC, df DESC, suggestion ASC LIMIT {SP_N}"""


def suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phrase suggester (search/suggest/phrase/PhraseSuggester.java): the
    misspelled token expands to edit-distance candidates from the terms
    dictionary (like the term suggester), then whole-phrase candidates are
    ranked by a REAL-WORD language model — here the corpus bigram count
    with the preceding token, ES's LaplaceScorer shape with df as the
    unigram tie-break. Reads the persisted positional index (phrase.py):
    vocab df is a (term, doc)-grain row count, the bigram leg joins the
    bucket-pruned SP_PREV positions against the flat position view —
    no corpus re-tokenize."""
    from .phrase import positions, positions_table, term_positions

    pt = positions_table(spark, sf_dir)
    vocab = pt.groupBy("term").agg(F.count("*").alias("df"))
    cand = vocab.where(
        F.levenshtein("term", F.lit(SP_INPUT)) <= SP_MAXDIST)
    a = term_positions(spark, sf_dir, SP_PREV).alias("a")
    b = positions(spark, sf_dir).alias("b")
    big = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                  & (F.col("b.pos") == F.col("a.pos") + 1))
           .groupBy(F.col("b.term").alias("term"))
           .agg(F.count("*").alias("bigram_freq")))
    out = (cand.join(big, "term", "left")
           .select(F.concat(F.lit(f"{SP_PREV} "), F.col("term"))
                   .alias("suggestion"),
                   F.coalesce("bigram_freq", F.lit(0)).cast("long")
                   .alias("bigram_freq"),
                   F.col("df").cast("long").alias("df")))
    return (out.orderBy(F.desc("bigram_freq"), F.desc("df"),
                        F.asc("suggestion")).limit(SP_N))


REGISTRY["suggest_phrase"] = Entry(fn=suggest_phrase,
                                   sql=_suggest_phrase_sql())


# ---------------------------------------------------------------------------
# prefix + regexp queries — the remaining multi-term-rewrite family
# ---------------------------------------------------------------------------

PREFIX_QUERY = "b"


@_reg("q_prefix", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents),
exp AS (
  SELECT DISTINCT term FROM tok WHERE term LIKE '{PREFIX_QUERY}%'
  ORDER BY term ASC LIMIT 128)
SELECT DISTINCT t.doc_id, CAST(1.0 AS DOUBLE) AS score
FROM tok t JOIN exp USING (term)
ORDER BY doc_id""")
def q_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefix query (PrefixQueryBuilder): terms-dictionary range scan +
    constant-score docid decode (exec.search_prefix). Distinct from
    f_prefix (a LIKE filter on a stored keyword column): this one goes
    through the INDEX — vocab expansion then postings, the multi-term
    rewrite path."""
    import __spark_entry__ as em

    from . import exec as pexec

    idx = em._index_for(spark, sf_dir)
    return pexec.search_prefix(idx, PREFIX_QUERY)


REGEXP_QUERY = "[a-c].*"


@_reg("q_regexp", f"""
WITH tok AS (
  SELECT doc_id, unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents),
exp AS (
  SELECT DISTINCT term FROM tok WHERE regexp_full_match(term, '{REGEXP_QUERY}')
  ORDER BY term ASC LIMIT 128)
SELECT DISTINCT t.doc_id, CAST(1.0 AS DOUBLE) AS score
FROM tok t JOIN exp USING (term)
ORDER BY doc_id""")
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp query (RegexpQueryBuilder): anchored whole-term regex
    expanded against the terms dictionary (exec.search_regexp), matching
    Lucene's automaton semantics (pattern matches the entire term, never
    a substring)."""
    import __spark_entry__ as em

    from . import exec as pexec

    idx = em._index_for(spark, sf_dir)
    return pexec.search_regexp(idx, REGEXP_QUERY)


# ---------------------------------------------------------------------------
# rank_feature query — static-signal saturation scoring
# ---------------------------------------------------------------------------

RF_PIVOT, RF_K = 200.0, 10


@_reg("q_rank_feature", f"""
SELECT doc_id,
       round(n_chars / (n_chars + {RF_PIVOT}), 4) AS score
FROM documents
ORDER BY score DESC, doc_id ASC LIMIT {RF_K}""")
def q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank_feature query (index/query/RankFeatureQueryBuilder.java,
    mapper/extras/RankFeatureFieldMapper upstream): scores documents by a
    static numeric signal (pagerank/popularity analog: n_chars) through
    the default SATURATION function s/(s+pivot) — monotone, bounded [0,1),
    exactly ES's formula. Runs as a pure column expression over the
    forward index: no postings, no shuffle before the top-k reduce
    (TakeOrderedAndProject)."""
    d = tbl(spark, sf_dir, "documents")
    sat = F.col("n_chars") / (F.col("n_chars") + F.lit(RF_PIVOT))
    return (d.select("doc_id", F.round(sat, 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(RF_K))


# ---------------------------------------------------------------------------
# completion suggester — weighted prefix top-N (closes the suggest family)
# ---------------------------------------------------------------------------

SC_PREFIX, SC_N = "co", 5


@_reg("suggest_completion", f"""
WITH tok AS (
  SELECT unnest({analysis.duckdb_tokens_nostop_expr('text')}) AS term
  FROM documents),
w AS (
  SELECT term, count(*) AS weight FROM tok
  WHERE term LIKE '{SC_PREFIX}%' GROUP BY term)
SELECT term, CAST(weight AS BIGINT) AS weight FROM w
ORDER BY weight DESC, term ASC LIMIT {SC_N}""")
def suggest_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """completion suggester (search/suggest/completion/
    CompletionSuggester.java upstream): search-as-you-type — the top-N
    heaviest dictionary entries under a prefix. ES stores an FST of
    (surface form, weight) built at index time and walks the prefix arc;
    the relational analog is the build-time terms dictionary (term_stats,
    weight = cf, the collection frequency) under a sargable prefix
    predicate — a vocab-grain scan, never postings. The oracle re-derives
    the dictionary + weights from the raw corpus."""
    import __spark_entry__ as em

    idx = em._index_for(spark, sf_dir)
    return (idx.term_stats
            .where(F.col("term").startswith(SC_PREFIX))
            .select("term", F.col("cf").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term")).limit(SC_N))
