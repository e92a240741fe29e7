"""Seeded randomized differential campaign (r05 brief item 2).

The r04 judge noted that several relational-wave oracles verify a SHARED
formulation (Spark and DuckDB executing the same SQL shape); the
systemic hardening is a randomized differential over the one surface
where both sides are INDEPENDENT formulations — the recursive query
tree: plan.parse_tree → exec.search_tree (a tagged-union Catalyst plan)
vs oracle_sql.tree_sql (a CTE-per-node DuckDB program). Both consume the
same node objects but share no execution code.

The generator is seeded/reproducible (random.Random(seed), no ambient
entropy) and deliberately over-weights the edge classes that produced
real bugs in past rounds:
  * stopword-only / empty-after-analysis clauses — the class of the
    r03→r04 cross_fields IndexError (empty candidate relation);
  * absent terms / absent attr values — empty legs inside non-empty
    bools;
  * must_not-only bools — the all-docs seed path;
  * random minimum_should_match including 0 and = |should|;
  * phrase legs with random slop whose bigram usually matches nothing.

Surfaces:
  * ``fuzz_cases(seed, n)`` — the deterministic case list.
  * driver key ``fuzz_tree_equiv`` — a fixed-seed batch of
    FUZZ_DRIVER_N trees; the engine returns (case_id, doc_id, score)
    for all cases, the oracle is the UNION ALL of each case's
    independently-generated tree_sql. One red case turns the key red.
  * tests/test_fuzz_differential.py — the wide campaign (N≈200) at
    sf0.001 comparing engine vs DuckDB per case.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import oracle_sql as osql
from . import plan as pplan
from .registry import Entry

REGISTRY: dict[str, Entry] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = Entry(fn=fn, sql=sql)
        return fn
    return deco


#: corpus head/mid/tail terms (FIXTURES vocab) + one rare + one absent
VOCAB = [
    "scan", "column", "window", "order", "sort", "part", "agg", "value",
    "line", "key", "join", "merge", "group", "query", "vector", "hash",
    "slow", "stream", "filter", "fast", "spark", "batch", "table", "small",
    "data", "big", "customer", "row", "dup", "zzqqabsent",
]
#: stopwords (analyze() drops them — empty-after-analysis clauses)
STOPPY = ["the", "a", "to"]
LANGS = ["en", "de", "zh", "fr", "es", "xx"]          # xx absent
REPOS = ["src0", "src3", "src7", "src19", "srcNA"]    # srcNA absent


def _leaf(rng: random.Random) -> dict:
    r = rng.random()
    if r < 0.34:
        n = rng.randint(1, 3)
        return {"match": {"query": " ".join(rng.sample(VOCAB, n))}}
    if r < 0.48:
        return {"term": {"value": rng.choice(VOCAB)}}
    if r < 0.60:
        return {"match_phrase": {"query": " ".join(rng.sample(VOCAB, 2)),
                                 "slop": rng.choice([0, 0, 1, 2])}}
    if r < 0.72:
        # stopword-heavy clause: analyzes to 0-1 terms (the bug class)
        toks = [rng.choice(STOPPY)]
        if rng.random() < 0.5:
            toks.append(rng.choice(VOCAB))
        rng.shuffle(toks)
        return {"match": {"query": " ".join(toks)}}
    if r < 0.87:
        return {"attr": {"field": "lang", "value": rng.choice(LANGS)}}
    return {"attr": {"field": "repo", "value": rng.choice(REPOS)}}


def gen_tree_dsl(rng: random.Random, depth: int = 2) -> dict:
    """One random query-DSL dict (bool nesting up to ``depth``)."""
    if depth == 0 or rng.random() < 0.25:
        return _leaf(rng)
    body: dict = {}
    for slot in ("must", "filter", "must_not"):
        n = rng.choice([0, 0, 0, 1, 1, 2])
        if n:
            body[slot] = [gen_tree_dsl(rng, depth - 1) for _ in range(n)]
    n_should = rng.choice([0, 1, 1, 2, 3])
    if n_should:
        body["should"] = [gen_tree_dsl(rng, depth - 1)
                          for _ in range(n_should)]
        if rng.random() < 0.35:
            body["minimum_should_match"] = rng.randint(0, n_should)
    if not body:
        body["should"] = [_leaf(rng)]
    return {"bool": body}


def fuzz_cases(seed: int, n: int, depth: int = 2) -> list[dict]:
    """The deterministic case list for (seed, n) — generation order is
    part of the contract (case_id i = i-th tree drawn)."""
    rng = random.Random(seed)
    return [gen_tree_dsl(rng, depth) for _ in range(n)]


FUZZ_SEED = 20260818
FUZZ_DRIVER_N = 24
FUZZ_K = 10


def fuzz_union_sql(seed: int, n: int, k: int) -> str:
    parts = []
    for i, dsl in enumerate(fuzz_cases(seed, n)):
        stmt = osql.tree_sql(pplan.parse_tree(dsl), k)
        parts.append(f"SELECT {i} AS case_id, doc_id, score FROM ({stmt}) c{i}")
    return "\nUNION ALL ".join(parts) + "\nORDER BY case_id, doc_id"


# ---------------------------------------------------------------------------
# Filter + aggregation differential (r05 — completes the VERDICT #2 scope
# "query trees / FILTERS / AGGS"). The generator draws a random predicate
# forest over `events` plus one random bucket agg + metric; the engine
# interprets the spec with the DataFrame API, the oracle with an
# independently generated DuckDB SQL string. Every case normalizes to
# one uniform shape (case_id, grp string, metric double) so a whole
# seeded batch unions into a single driver-comparable relation.
# Edge classes deliberately covered: absent term values (empty relation
# through every agg), negated predicates, min_doc_count pruning, integer
# histogram bin keys (float keys would format differently across
# engines), and GROUP BY-always (an ungrouped SQL agg returns one row on
# empty input where Spark's groupBy returns none — both sides group).

ETYPES = ["click", "error", "purchase", "signup", "view", "absent_type"]


def _fa_case(rng: random.Random) -> dict:
    preds = []
    for _ in range(rng.randint(0, 3)):
        r = rng.random()
        if r < 0.30:
            lo = round(rng.uniform(0, 250), 2)
            preds.append({"kind": "range", "field": "value", "gte": lo,
                          "lt": round(lo + rng.uniform(0.5, 120), 2),
                          "neg": rng.random() < 0.25})
        elif r < 0.55:
            preds.append({"kind": "term", "field": "event_type",
                          "value": rng.choice(ETYPES),
                          "neg": rng.random() < 0.25})
        elif r < 0.75:
            preds.append({"kind": "terms", "field": "event_type",
                          "values": sorted(rng.sample(ETYPES,
                                                      rng.randint(1, 3))),
                          "neg": rng.random() < 0.25})
        else:
            preds.append({"kind": "range", "field": "user_id",
                          "gte": rng.randint(0, 16), "lt": None,
                          "neg": False})
    a = rng.random()
    metric = rng.choice(["count", "sum", "avg", "min", "max"])
    if a < 0.40:
        agg = {"kind": "terms", "metric": metric}
    elif a < 0.70:
        agg = {"kind": "hist", "interval": rng.choice([10.0, 25.0, 50.0]),
               "metric": metric}
    else:
        agg = {"kind": "date_hist", "metric": metric}
    if rng.random() < 0.4:
        agg["min_doc_count"] = rng.choice([2, 5, 20])
    return {"preds": preds, "agg": agg}


def fa_cases(seed: int, n: int) -> list[dict]:
    rng = random.Random(seed)
    return [_fa_case(rng) for _ in range(n)]


def _fa_engine(spark: SparkSession, sf_dir: str, case: dict) -> DataFrame:
    """DataFrame-API interpretation of one filter+agg spec (the engine
    side of the differential; the SQL side is _fa_sql)."""
    from .registry import tbl

    e = tbl(spark, sf_dir, "events")
    for p in case["preds"]:
        if p["kind"] == "range":
            c = F.col(p["field"]) >= F.lit(p["gte"])
            if p["lt"] is not None:
                c = c & (F.col(p["field"]) < F.lit(p["lt"]))
        elif p["kind"] == "term":
            c = F.col(p["field"]) == F.lit(p["value"])
        else:
            c = F.col(p["field"]).isin(p["values"])
        e = e.where(~c if p["neg"] else c)
    agg = case["agg"]
    if agg["kind"] == "terms":
        grp = F.col("event_type")
    elif agg["kind"] == "hist":
        grp = F.floor(F.col("value") / F.lit(agg["interval"])) \
            .cast("long").cast("string")
    else:
        # the driver-proven idiom (agg_date_histogram): date_format under
        # the UTC session tz == DuckDB strftime over the naive timestamp
        grp = F.date_format("ts", "yyyy-MM-dd")
    m = agg["metric"]
    mexpr = (F.count("*").cast("double") if m == "count"
             else getattr(F, m)("value"))
    g = (e.groupBy(grp.alias("grp"))
         .agg(mexpr.alias("metric"), F.count("*").alias("_n")))
    if "min_doc_count" in agg:
        g = g.where(F.col("_n") >= agg["min_doc_count"])
    return g.select("grp", "metric")


def _fa_sql(case: dict) -> str:
    """Independently generated DuckDB SQL for one filter+agg spec."""
    conds = []
    for p in case["preds"]:
        if p["kind"] == "range":
            c = f"{p['field']} >= {p['gte']}"
            if p["lt"] is not None:
                c += f" AND {p['field']} < {p['lt']}"
            c = f"({c})"
        elif p["kind"] == "term":
            c = f"{p['field']} = '{p['value']}'"
        else:
            vals = ", ".join(f"'{v}'" for v in p["values"])
            c = f"{p['field']} IN ({vals})"
        conds.append(f"NOT {c}" if p["neg"] else c)
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    agg = case["agg"]
    if agg["kind"] == "terms":
        grp = "event_type"
    elif agg["kind"] == "hist":
        grp = f"CAST(FLOOR(value / {agg['interval']}) AS BIGINT)"
    else:
        grp = "strftime(ts, '%Y-%m-%d')"
    m = agg["metric"]
    mexpr = ("CAST(count(*) AS DOUBLE)" if m == "count" else f"{m}(value)")
    having = (f" HAVING count(*) >= {agg['min_doc_count']}"
              if "min_doc_count" in agg else "")
    return (f"SELECT CAST({grp} AS VARCHAR) AS grp, {mexpr} AS metric "
            f"FROM events{where} GROUP BY 1{having}")


FA_SEED = 20260819
FA_DRIVER_N = 24


def fa_union_sql(seed: int, n: int) -> str:
    parts = [f"SELECT {i} AS case_id, grp, "
             f"ROUND(metric, {osql.ROUND_DIGITS}) AS metric "
             f"FROM ({_fa_sql(c)}) f{i}"
             for i, c in enumerate(fa_cases(seed, n))]
    return "\nUNION ALL ".join(parts) + "\nORDER BY case_id, grp"


@_reg("fuzz_filter_agg_equiv", fa_union_sql(FA_SEED, FA_DRIVER_N))
def fuzz_filter_agg_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-seed filter+agg batch: FA_DRIVER_N random specs, DataFrame
    interpretation vs per-case independent SQL oracles. Collected per
    case (each agg result is a handful of bucket rows) and assembled
    driver-side like fuzz_tree_equiv / msearch."""
    rows = []
    for i, case in enumerate(fa_cases(FA_SEED, FA_DRIVER_N)):
        rows.extend((i, r["grp"], float(r["metric"]))
                    for r in _fa_engine(spark, sf_dir, case).collect())
    rows.sort()
    return (spark.createDataFrame(rows, "case_id int, grp string, metric double")
            .select("case_id", "grp",
                    F.round("metric", osql.ROUND_DIGITS).alias("metric")))


@_reg("fuzz_tree_equiv", fuzz_union_sql(FUZZ_SEED, FUZZ_DRIVER_N, FUZZ_K))
def fuzz_tree_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-seed differential batch: FUZZ_DRIVER_N random trees, engine
    top-k per tree vs per-tree independent tree_sql oracles. Executed as
    per-case local collects (each tree is a selective coordinator-gather
    query); the union is assembled driver-side like msearch."""
    import __spark_entry__ as em

    idx = em._index_for(spark, sf_dir)
    from . import exec as pexec

    rows = []
    for i, dsl in enumerate(fuzz_cases(FUZZ_SEED, FUZZ_DRIVER_N)):
        hits = pexec.search_tree(idx, pplan.parse_tree(dsl), k=FUZZ_K)
        rows.extend((i, int(r["doc_id"]), float(r["score"]))
                    for r in hits.collect())
    rows.sort()
    # round in Spark (HALF_UP, same as every other key's F.round —
    # python round() is half-even and would diverge at exact .5s)
    return (spark.createDataFrame(rows, "case_id int, doc_id long, score double")
            .select("case_id", "doc_id",
                    F.round("score", osql.ROUND_DIGITS).alias("score")))
