"""Query DSL front-end — the ES `_search` JSON surface (SURVEY §3.1).

Reference: search/builder/SearchSourceBuilder.java parses the JSON DSL
into a QueryBuilder tree (index/query/*QueryBuilder.java); our analog is
a dict → BoolPlan dataclass → DataFrame program (exec.search_bool_full).

Two surfaces:

* ``parse_dsl`` — FLAT BoolPlan (term/match leaves only; any nested
  ``bool`` clause raises). Kept for the simple q_bool_full path.
* ``parse_tree`` — the full RECURSIVE QueryBuilder tree (bool inside
  must/should/must_not/filter to arbitrary depth, plus attr filters and
  phrases), executed by exec.search_tree and mirrored in SQL by
  oracle_sql.tree_sql. This is the analog of the reference's
  BoolQueryBuilder tree (index/query/BoolQueryBuilder.java builds an
  arbitrary composition of QueryBuilders).
* ``parse_query_string`` — the `query_string` mini-language
  (QueryStringQueryBuilder.java / [lucene dep] classic QueryParser):
  ``+term -term field:value "a phrase" a AND b`` → tree.

Supported dict shapes:
    {"term":  {"value": "merge"}}
    {"match": {"query": "merge sort"}}                     # analyzed, OR
    {"match_phrase": {"query": "merge sort", "slop": 0}}
    {"attr":  {"field": "lang", "value": "en"}}            # keyword filter
    {"bool":  {"must": [...], "should": [...],
               "must_not": [...], "filter": [...],
               "minimum_should_match": 1}}                 # recursive
"""

from __future__ import annotations

import re as _re

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


# ---------------------------------------------------------------------------
# Recursive query tree (the real QueryBuilder-tree analog)
# ---------------------------------------------------------------------------


@dataclass
class MatchNode:
    """Scored leaf: doc matches if it contains >=1 term; score = Σ BM25
    contributions of the terms it contains (TermQuery is terms=[t])."""
    terms: list[str]


@dataclass
class PhraseNode:
    """match_phrase: terms at consecutive positions (within slop, ordered).
    Score simplification (documented divergence from Lucene's
    phrase-frequency scoring): Σ BM25 of the constituent terms, restricted
    to phrase-matching docs."""
    terms: list[str]
    slop: int = 0


@dataclass
class AttrNode:
    """Unscored keyword filter on a forward-index column (lang:en)."""
    field: str
    value: str


@dataclass
class BoolNode:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)
    minimum_should_match: int | None = None

    @property
    def msm(self) -> int:
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        return 0 if (self.must or self.filter) else 1


def parse_tree(dsl: dict):
    """ES-search-DSL dict -> recursive node tree (bool at any depth)."""
    (kind, body), = dsl.items()
    if kind == "term":
        value = body["value"] if isinstance(body, dict) else body
        return MatchNode(terms=[value])
    if kind == "match":
        text = body["query"] if isinstance(body, dict) else body
        return MatchNode(terms=analysis.analyze(text))
    if kind == "match_phrase":
        text = body["query"] if isinstance(body, dict) else body
        slop = int(body.get("slop", 0)) if isinstance(body, dict) else 0
        return PhraseNode(terms=analysis.analyze(text), slop=slop)
    if kind == "attr":
        return AttrNode(field=body["field"], value=body["value"])
    if kind == "bool":
        node = BoolNode()
        for slot in ("must", "should", "must_not", "filter"):
            for sub in body.get(slot, []):
                getattr(node, slot).append(parse_tree(sub))
        if "minimum_should_match" in body:
            node.minimum_should_match = int(body["minimum_should_match"])
        return node
    raise ValueError(f"unsupported query kind {kind!r}")


def tree_terms(node) -> set[str]:
    """All content terms referenced anywhere in the tree."""
    if isinstance(node, (MatchNode, PhraseNode)):
        return set(node.terms)
    if isinstance(node, AttrNode):
        return set()
    out: set[str] = set()
    for slot in ("must", "should", "must_not", "filter"):
        for sub in getattr(node, slot):
            out |= tree_terms(sub)
    return out


# ---------------------------------------------------------------------------
# query_string mini-language  (QueryStringQueryBuilder / classic QueryParser)
# ---------------------------------------------------------------------------

_QS_TOKEN = _re.compile(r'"[^"]*"|\S+')

#: forward-index keyword columns addressable as field:value
ATTR_FIELDS = ("lang", "repo", "path", "commit")


def parse_query_string(qs: str) -> BoolNode:
    """`+must -not field:value "a phrase" a AND b` -> BoolNode.

    Semantics (subset of Lucene's classic QueryParser, default_operator=OR):
      +clause   -> must        -clause -> must_not
      a AND b   -> both clauses become must
      "x y"     -> phrase clause      field:v (keyword field) -> filter
      content:x -> analyzed content clause     bare word -> should
    OR is the default joiner and is accepted/ignored as a keyword.
    Parentheses are NOT supported (documented; use the dict DSL for
    arbitrary nesting — this parser covers the search-box surface)."""
    node = BoolNode()
    raw = _QS_TOKEN.findall(qs or "")
    # pre-scan AND positions: tokens joined by AND both become must.
    # Operators match CASE-SENSITIVELY, mirroring Lucene's classic
    # QueryParser: a lowercase 'or'/'and' is user text, not an operator
    # (r02 advice — the old t.upper() check silently dropped literal 'or').
    toks: list[str] = [t for t in raw if t != "OR"]
    and_next: set[int] = set()
    cleaned: list[str] = []
    for t in toks:
        if t == "AND":
            if cleaned:
                and_next.add(len(cleaned) - 1)  # previous clause
                and_next.add(len(cleaned))      # next clause
        else:
            cleaned.append(t)
    for i, t in enumerate(cleaned):
        slot = "should"
        if t.startswith("+"):
            slot, t = "must", t[1:]
        elif t.startswith("-"):
            slot, t = "must_not", t[1:]
        elif i in and_next:
            slot = "must"
        if not t:
            continue
        if t.startswith('"') and t.endswith('"'):
            sub = PhraseNode(terms=analysis.analyze(t.strip('"')))
        elif ":" in t and t.split(":", 1)[0] in ATTR_FIELDS:
            f, v = t.split(":", 1)
            sub = AttrNode(field=f, value=v)
            if slot == "should":
                slot = "filter"  # keyword fields filter, they don't score
        elif ":" in t and t.split(":", 1)[0] == "content":
            sub = MatchNode(terms=analysis.analyze(t.split(":", 1)[1]))
        else:
            sub = MatchNode(terms=analysis.analyze(t))
        if isinstance(sub, MatchNode) and not sub.terms:
            continue  # stopword-only clause
        getattr(node, slot).append(sub)
    return node


_SQS_TOKEN = _re.compile(r'"[^"]*"|[^\s+|]+|\+|\|')


def parse_simple_query_string(qs: str) -> BoolNode:
    """`simple_query_string` (SimpleQueryStringQueryBuilder.java /
    [lucene dep] SimpleQueryParser): infix operators instead of
    query_string's prefixes — `+` is AND, `|` is OR, `-term` negates,
    quotes make phrases. AND binds tighter than OR; no parentheses
    (ES's () precedence is not implemented — documented subset). Bare
    whitespace joins like `+` — i.e. the default_operator=AND flavor.

    'a + b | c -d' → should( bool(must=a,b), bool(must=c, must_not=d) ).
    """
    toks = _SQS_TOKEN.findall(qs or "")
    groups: list[list[str]] = [[]]
    for t in toks:
        if t == "|":
            groups.append([])
        elif t == "+":
            continue  # AND is the in-group default joiner
        else:
            groups[-1].append(t)

    def leaf(t: str):
        if t.startswith('"') and t.endswith('"'):
            return PhraseNode(terms=analysis.analyze(t.strip('"')))
        n = MatchNode(terms=analysis.analyze(t))
        return n if n.terms else None

    outer = BoolNode()
    for g in groups:
        sub = BoolNode()
        for t in g:
            if t.startswith("-"):
                lf = leaf(t[1:])
                if lf:
                    sub.must_not.append(lf)
            else:
                lf = leaf(t)
                if lf:
                    sub.must.append(lf)
        if sub.must or sub.must_not:
            outer.should.append(sub)
    outer.minimum_should_match = 1 if outer.should else None
    return outer


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
