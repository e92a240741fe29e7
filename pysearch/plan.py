"""Query DSL front-end — the ES `_search` JSON surface (SURVEY §3.1).

Reference: search/builder/SearchSourceBuilder.java parses the JSON DSL
into a QueryBuilder tree (index/query/*QueryBuilder.java); our analog is
a dict → BoolPlan dataclass → DataFrame program (exec.search_bool_full).

Supported shapes (the P0/P1 slice):
    {"term":  {"value": "merge"}}
    {"match": {"query": "merge sort"}}                     # analyzed, OR
    {"bool":  {"must": [...], "should": [...],
               "must_not": [...], "filter": [...],
               "minimum_should_match": 1}}
Nested bools are flattened one level (must-of-must etc.); full recursive
composition is the reference's QueryBuilder tree and stays future work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import analysis


@dataclass
class BoolPlan:
    """Flattened bool query: term lists per clause kind.

    Semantics (BoolQueryBuilder, SURVEY §2.4 q_bool_full):
      must      — every term must match; contributes score
      filter    — every term must match; NO score contribution
      should    — optional; adds score; if there is no must/filter,
                  minimum_should_match defaults to 1, else 0 (ES default)
      must_not  — no term may match; no score
    """
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    filter: list[str] = field(default_factory=list)
    minimum_should_match: int | None = None
    k: int = 10

    @property
    def msm(self) -> int:
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        return 0 if (self.must or self.filter) else 1


def _clause_terms(clause) -> list[str]:
    """One sub-query dict (term/match) -> analyzed term list."""
    if isinstance(clause, str):
        return analysis.analyze(clause)
    (kind, body), = clause.items()
    if kind == "term":
        value = body["value"] if isinstance(body, dict) else body
        return [value]  # exact — not analyzed (TermQueryBuilder semantics)
    if kind == "match":
        text = body["query"] if isinstance(body, dict) else body
        return analysis.analyze(text)
    raise ValueError(f"unsupported sub-query {kind!r}")


def parse_dsl(dsl: dict, k: int = 10) -> BoolPlan:
    """ES-search-DSL dict -> BoolPlan."""
    (kind, body), = dsl.items()
    if kind in ("term", "match"):
        return BoolPlan(should=_clause_terms(dsl), minimum_should_match=1, k=k)
    if kind != "bool":
        raise ValueError(f"unsupported top-level query {kind!r}")
    plan = BoolPlan(k=k)
    for slot in ("must", "should", "must_not", "filter"):
        for sub in body.get(slot, []):
            getattr(plan, slot).extend(_clause_terms(sub))
    if "minimum_should_match" in body:
        plan.minimum_should_match = int(body["minimum_should_match"])
    return plan
