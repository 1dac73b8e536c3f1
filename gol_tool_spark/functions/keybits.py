"""Key-bit index: the reference's indexed-key bitmask predicate-pushdown
trick, re-expressed for a parquet/Spark store.

Reference parity: build/KeyIndexSchema.java:21-96 maps indexed keys to
categories 1..30 (config `indexed-keys`, categories separated by spaces,
keys sharing a category by '/'); each feature's *key bits* is the OR of
(1 << (category-1)) for every indexed key it carries; the query engine
prunes R-tree index buckets whose key bits don't intersect the query's
required bits (compiler/SIndexTree.java:273-359).

Spark mapping: the compile layout stores a `keybits` int column and sorts
within each pile partition by (keybits, zorder).  Sorted layout makes row
groups keybits-homogeneous, so rewriting a GOQL tag predicate to AND a
`keybits IN (matching masks)` prefilter turns into parquet row-group
pruning via min/max statistics — the same I/O skip the reference gets from
its per-tile key-index buckets, delivered by the stock parquet reader.
The IN-set is enumerated from the category-combination space (bounded by
MAX_ENUM_CATEGORIES; the reference caps at 30 categories, but parquet
IN-lists want the enumerable low tens of bits this module enforces).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one grammar, one source of truth: the selector/clause regexes are
# goql.py's own — if the GOQL grammar grows, the prefilter parses clauses
# exactly the way compile_goql does (a private re-implementation here
# could diverge and prune partitions the real predicate matches)
from .goql import _CLAUSE_RE, _COND_RE, _TOKEN_RE

MAX_CATEGORIES = 30       # KeyIndexSchema.java:58
MAX_ENUM_CATEGORIES = 16  # keep the IN-list enumeration bounded (<= 65536)


def parse_schema(s: str) -> dict[str, int]:
    """`indexed-keys` string -> {key: category number (1-based)}.
    KeyIndexSchema.java:68-96: categories split on whitespace, keys within
    a category on '/'; a key may appear in only one category."""
    out: dict[str, int] = {}
    cats = s.split()
    if len(cats) > MAX_CATEGORIES:
        raise ValueError(f"max {MAX_CATEGORIES} index categories ({len(cats)} listed)")
    for cat, group in enumerate(cats, start=1):
        for key in group.split("/"):
            if key in out:
                raise ValueError(f"key {key!r} assigned to more than one category")
            out[key] = cat
    return out


def keybits_col(tags: Column, schema: dict[str, int]) -> Column:
    """OR of (1 << (category-1)) over the indexed keys present in `tags` —
    the per-feature key bits (KeyIndexSchema semantics).  Pure column
    arithmetic: bits are disjoint per category, so summing per-category
    presence flags equals the bitwise OR."""
    by_cat: dict[int, Column] = {}
    for key, cat in schema.items():
        present = tags.getItem(key).isNotNull()
        by_cat[cat] = (by_cat[cat] | present) if cat in by_cat else present
    out = F.lit(0)
    for cat, present in by_cat.items():
        out = out + F.when(present, F.lit(1 << (cat - 1))).otherwise(F.lit(0))
    return out.cast("int")


def _selector_required_bits(clauses: str, schema: dict[str, int]) -> int:
    """Bits a feature MUST carry to match one selector: every positive tag
    clause ([k], [k=v], [k~re], numeric compares) requires key presence;
    [!k] and [k!=v] match absent keys, so they contribute nothing."""
    req = 0
    for clause in _CLAUSE_RE.findall(clauses or ""):
        m = _COND_RE.match(clause)
        if not m:
            continue
        key, op, neg = m.group("key"), m.group("op"), m.group("neg")
        if neg or op == "!=":
            continue
        cat = schema.get(key)
        if cat:
            req |= 1 << (cat - 1)
    return req


def query_required_bits(goql: str, schema: dict[str, int]) -> list[int]:
    """Per-selector required-bit masks for a GOQL selector union.  Splits
    selectors the way compile_goql does (bracket-aware — a comma inside a
    clause is a value list, not a selector boundary; naive splitting fell
    back to no-pruning on any value-list query)."""
    from .goql import _split_selectors

    reqs = []
    for sel in _split_selectors(goql):
        m = _TOKEN_RE.match(sel)
        reqs.append(_selector_required_bits(m.group("clauses") if m else "", schema))
    return reqs


def keybits_prefilter(goql: str, schema: dict[str, int], col: str = "keybits") -> Column:
    """The SIndexTree bucket-pruning rewrite: a `keybits IN (...)` Column to
    AND in FRONT of the compiled GOQL predicate.  A mask value matches when
    it covers any selector's required bits; enumeration spans the category
    combination space (bounded).  Returns lit(True) when no selector
    constrains an indexed key (no pruning possible)."""
    ncats = max(schema.values(), default=0)
    if ncats > MAX_ENUM_CATEGORIES:
        return F.lit(True)
    reqs = [r for r in query_required_bits(goql, schema)]
    if not reqs or 0 in reqs:
        return F.lit(True)  # some selector needs no indexed key: scan all
    matching = [v for v in range(1 << ncats) if any((v & r) == r for r in reqs)]
    return F.col(col).isin(matching)
