"""GOQL membership traversal: parent/child selectors as relational joins.

Reference parity: the GeoDesk feature API the gol-tool queries ride on
exposes membership traversal (Features.membersOf / parentsOf / nodesOf —
lib-level, surfaced through the query engine's filters); a gol-tool user
composes e.g. "ways matching w[highway] that contain a node matching
n[traffic_signals]".  Spark form: GOQL compiles to boolean Columns on each
side, the membership edge table connects them, and the quantified
traversal ("has at least one matching member") is a LEFT SEMI join — no
row duplication, no driver loops.

Scale shape: both joins shuffle on the membership keys (node id / parent
id), which are uniformly distributed; the child filter runs BEFORE the
join so only matching children shuffle (predicate-first, like the
reference's child-filter evaluation inside the tile walk).  AQE handles
skewed parents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.goql import compile_goql


def _apply_goql(df: DataFrame, goql: str | None, ftype: str, closed: Column | None = None) -> DataFrame:
    if not goql:
        return df
    ft = F.col("ftype") if "ftype" in df.columns else F.lit(ftype)
    cl = F.col("closed") if closed is None and "closed" in df.columns else closed
    return df.filter(compile_goql(goql, ftype=ft, closed=cl))


def parents_with_child(
    parents: DataFrame,
    membership: DataFrame,
    children: DataFrame,
    parent_goql: str | None = None,
    child_goql: str | None = None,
    parent_key: str = "way_id",
    child_key: str = "node_ref",
    child_id: str = "id",
) -> DataFrame:
    """Parents matching `parent_goql` with >= 1 member matching
    `child_goql` (the `w[highway] contains n[...]` idiom).  LEFT SEMI
    twice: children filter -> membership edge -> parents — quantified
    EXISTS with no duplication."""
    kids = _apply_goql(children, child_goql, "n")
    edges = membership.join(
        kids.select(F.col(child_id).alias(child_key)), child_key, "left_semi"
    )
    out = parents.join(edges.select(parent_key).distinct(), parent_key, "left_semi")
    return _apply_goql(out, parent_goql, "w")


def members_of(
    parents: DataFrame,
    membership: DataFrame,
    children: DataFrame,
    parent_goql: str | None = None,
    child_goql: str | None = None,
    parent_key: str = "way_id",
    child_key: str = "node_ref",
    child_id: str = "id",
    role: str | None = None,
) -> DataFrame:
    """Members (children) of parents matching `parent_goql`, optionally
    filtered by `child_goql` (Features.membersOf direction) and by member
    `role` when the membership table carries one.  Returns child rows plus
    the parent key (a child appears once per parent that contains it, like
    the reference's member iteration)."""
    sel = _apply_goql(parents, parent_goql, "w").select(parent_key)
    edges = membership.join(sel, parent_key, "left_semi")
    if role is not None and "role" in membership.columns:
        # role-filtered traversal (the reference's member-role predicate,
        # e.g. only 'outer' members)
        edges = edges.filter(F.col("role") == role)
    edges = edges.select(parent_key, child_key).distinct()
    kids = _apply_goql(children, child_goql, "n")
    return edges.join(
        kids.withColumnRenamed(child_id, child_key), child_key
    )


def parse_traversal_chain(goql: str) -> list[str]:
    """Split a `A>B>...>Z` traversal string into its selector segments.
    `>` inside [...] clauses (numeric compares like [qty>30]) is NOT a
    separator.  Two segments = parents_with_child; more = nested chains
    (relation > way > node), composed innermost-first."""
    segs: list[str] = []
    depth = start = 0
    for i, ch in enumerate(goql):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == ">" and depth == 0:
            segs.append(goql[start:i].strip())
            start = i + 1
    segs.append(goql[start:].strip())
    if len(segs) < 2 or any(not s for s in segs):
        raise ValueError(f"bad traversal {goql!r}: need A>B[>C...]")
    return segs


def parse_traversal(goql: str) -> tuple[str, str]:
    """Two-level form of parse_traversal_chain (PARENT>CHILD)."""
    segs = parse_traversal_chain(goql)
    if len(segs) != 2:
        raise ValueError(f"bad traversal {goql!r}: need PARENT>CHILD")
    return segs[0], segs[1]


def traversal_query(
    goql: str,
    parents: DataFrame,
    membership: DataFrame,
    children: DataFrame,
    **kwargs,
) -> DataFrame:
    """`w[highway]>n[signal]` string form of parents_with_child."""
    parent_goql, child_goql = parse_traversal(goql)
    return parents_with_child(
        parents, membership, children,
        parent_goql=parent_goql, child_goql=child_goql, **kwargs,
    )


def parents_of(
    membership: DataFrame,
    children: DataFrame,
    child_goql: str | None = None,
    parent_key: str = "way_id",
    child_key: str = "node_ref",
    child_id: str = "id",
) -> DataFrame:
    """Distinct parent keys having >= 1 member matching `child_goql`
    (Features.parentsOf direction, key-only form)."""
    kids = _apply_goql(children, child_goql, "n")
    return (
        membership.join(
            kids.select(F.col(child_id).alias(child_key)), child_key, "left_semi"
        )
        .select(parent_key)
        .distinct()
    )
