"""Tag diff/merge kernels — the reference's tag-table patch operations.

Reference parity: tiles/TagTableBuilder.java diff/merge with the round-trip
properties its own tests assert (TagTableBuilderTest.java:49-80):
    merge(a, diff(a, b)) == b
    diff(x, x) == empty
Used by the change-stream path (gol update) to patch feature tags.

Representation: a diff is a map<string,string> where a NULL value means
"delete this key"; any other value means upsert. All operations are
higher-order map functions — JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tags_diff(a: Column, b: Column) -> Column:
    """Patch that transforms tag map a into tag map b."""
    # upserts: keys of b whose value differs from (or is absent in) a
    upserts = F.map_filter(b, lambda k, v: a.getItem(k).isNull() | (a.getItem(k) != v))
    # deletions: keys of a absent from b -> null-valued entries
    deletions = F.map_from_arrays(
        F.filter(F.map_keys(a), lambda k: ~F.array_contains(F.map_keys(b), k)),
        F.transform(
            F.filter(F.map_keys(a), lambda k: ~F.array_contains(F.map_keys(b), k)),
            lambda _: F.lit(None).cast("string"),
        ),
    )
    return F.map_concat(upserts, deletions)


def tags_merge(a: Column, d: Column) -> Column:
    """Apply diff d to tag map a."""
    keep = F.map_filter(a, lambda k, _: ~F.array_contains(F.map_keys(d), k))
    adds = F.map_filter(d, lambda _, v: v.isNotNull())
    return F.map_concat(keep, adds)


def exclude_keys(tags: Column, exact: list[str], prefixes: list[str] | None = None) -> Column:
    """B5 build-time key exclusion (default-config.fab:14-39,
    build/TagFilter.java:13-40): drop exact keys and prefix-wildcard keys
    (e.g. 'tiger:*') at ingest."""
    def keep(k: Column, _v: Column) -> Column:
        cond = ~k.isin(*exact) if exact else F.lit(True)
        for p in prefixes or []:
            cond = cond & ~k.startswith(p)
        return cond

    return F.map_filter(tags, keep)
