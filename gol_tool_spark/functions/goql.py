"""GOQL (Geographic Object Query Language) subset -> Spark Column compiler.

Capability parity: the reference's query language (B1): CSS-like feature
selectors `na[amenity=pub][name]`, consumed by `features.select(goql)`
(QueryCommand.java:171; language documented at docs.geodesk.com/goql, README.md:19).

Supported subset (covers the reference's documented clause forms):
    types:    n w a r  (node/way/area/relation), '*' = all
    clauses:  [k]        key present
              [!k]       key absent
              [k=v]      equals (v bare, "quoted", or number)
              [k=v1,v2]  value list (docs.geodesk.com/goql: any of the
                         values matches; wildcard members allowed)
              [k!=v]     not equals; [k!=v1,v2] none-of; wildcards allowed
              [k=val*]   / [k=*fix] / [k=*mid*]  wildcard
              [k~re]     regex match
              [k>n] [k>=n] [k<n] [k<=n]  numeric compare (try_cast semantics:
                         non-numeric tag values never match — reference treats
                         tag values as packed numbers when numeric-looking,
                         StringTableBuilder.java:152-164)
    unions:   sel1, sel2   (OR of selectors — compiled into ONE predicate,
                            a single scan pass, not a union of scans)

The compiled result is a pure Column expression over (ftype: string,
tags: map<string,string>) — fully JVM-side, inside whole-stage codegen, so
GOQL filters ride predicate pushdown like any native filter.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?P<types>\*|[nwar]+)\s*(?P<clauses>(?:\[[^\]]*\])*)\s*$"""
)
_CLAUSE_RE = re.compile(r"\[([^\]]*)\]")
_COND_RE = re.compile(
    r"""^\s*(?P<neg>!)?\s*(?P<key>[A-Za-z_][\w:.-]*)\s*
        (?:(?P<op>!=|>=|<=|=|>|<|~)\s*(?P<val>.*?))?\s*$""",
    re.VERBOSE,
)


class GoqlError(ValueError):
    pass


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    return v


def _split_values(s: str) -> list[str]:
    """Split a clause value on commas outside quotes ([k=v1,v2] lists).

    A quote only OPENS a quoted span at the start of a token (value start
    or right after a list comma) — a bare apostrophe mid-value
    (`[brand=McDonald's,KFC]`) is literal text, not a quote, so the comma
    still splits.  An opened quote left unbalanced is an error rather
    than silently swallowing the rest of the list."""
    out: list[str] = []
    cur: list[str] = []
    q: str | None = None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"" and not "".join(cur).strip():
            q = ch
            cur.append(ch)
        elif ch == ",":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if q:
        raise GoqlError(f"unbalanced quote in value list: {s!r}")
    out.append("".join(cur))
    return [p.strip() for p in out]


def _split_selectors(goql: str) -> list[str]:
    """Split on commas OUTSIDE bracket clauses — a comma inside [...] is a
    value list, not a selector union (so `n[shop=bakery,butcher]` is ONE
    selector, while `n[shop=bakery], w[highway]` is two)."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    for ch in goql:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s for s in out if s.strip()]


def _compile_clause(cond: str, tags: Column) -> Column:
    m = _COND_RE.match(cond)
    if not m:
        raise GoqlError(f"bad clause [{cond}]")
    key, op, neg = m.group("key"), m.group("op"), m.group("neg")
    tag = tags.getItem(key)
    if op is None:
        # [k] presence / [!k] absence
        present = tag.isNotNull() & (tag != F.lit("no"))
        return ~tag.isNotNull() if neg else present
    if neg:
        raise GoqlError(f"'!' only valid for absence tests: [{cond}]")
    raw = (m.group("val") or "").strip()

    def _one_eq(v: str) -> Column:
        v = _unquote(v)
        if "*" in v:
            pat = v.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
            return tag.isNotNull() & tag.like(pat)
        return tag == F.lit(v)

    parts = _split_values(raw) if op in ("=", "!=") else [raw]
    if len(parts) > 1:
        # value list [k=v1,v2,...]: any-of for '=', none-of for '!='
        # (docs.geodesk.com/goql multiple-values form)
        anyof = None
        for v in parts:
            c = _one_eq(v)
            anyof = c if anyof is None else (anyof | c)
        return anyof if op == "=" else (tag.isNull() | ~anyof)
    val = _unquote(raw)
    if op == "=" and "*" in val:
        return _one_eq(raw)
    if op == "!=" and "*" in val:
        return tag.isNull() | ~_one_eq(raw)
    if op == "~":
        return tag.isNotNull() & tag.rlike(val)
    if op in (">", ">=", "<", "<="):
        # try_cast: non-numeric tag values never match instead of erroring
        # under ANSI mode (narrow-number semantics)
        num = tag.try_cast("double") if hasattr(tag, "try_cast") else tag.cast("double")
        try:
            fval = float(val)
        except ValueError as e:
            raise GoqlError(f"numeric compare needs a number: [{cond}]") from e
        return {
            ">": num > fval, ">=": num >= fval,
            "<": num < fval, "<=": num <= fval,
        }[op]
    if op == "=":
        return tag == F.lit(val)
    if op == "!=":
        # reference semantics: matches when tag is absent OR differs
        return tag.isNull() | (tag != F.lit(val))
    raise GoqlError(f"unsupported op {op!r}")


def _compile_selector(
    sel: str,
    ftype: Column,
    tags: Column,
    closed: Column | None = None,
    is_area: Column | None = None,
) -> Column:
    m = _TOKEN_RE.match(sel)
    if not m:
        raise GoqlError(f"bad selector {sel!r}")
    types = m.group("types")
    if types == "*":
        cond = F.lit(True)
    elif "a" in types and closed is not None:
        # reference 'a' semantics (lib TypeBits + compiler/AreaClassifier.
        # java:29-118): an AREA is a closed way whose tags classify it as a
        # polygon, or an explicit area feature (multipolygon relation row)
        if is_area is None:
            from ..operators.classify import is_area as _ia

            is_area = _ia(tags, closed)
        a_cond = ((ftype == "w") & closed & is_area) | (ftype == "a")
        rest = [t for t in types if t != "a"]
        cond = (a_cond | ftype.isin(*rest)) if rest else a_cond
    else:
        cond = ftype.isin(*list(types))
    for clause in _CLAUSE_RE.findall(m.group("clauses") or ""):
        cond = cond & _compile_clause(clause, tags)
    return cond


def compile_goql(
    goql: str,
    ftype: Column | str = "ftype",
    tags: Column | str = "tags",
    closed: Column | str | None = None,
    is_area: Column | str | None = None,
) -> Column:
    """Compile a GOQL selector list into one boolean Column.

    Pass `closed` (and optionally a precomputed `is_area`) to give the `a`
    type its reference semantics — "closed way classified as an area, or
    area feature" — instead of a literal ftype=='a' match; without them,
    `a` falls back to the literal match (tables that carry explicit 'a'
    rows)."""
    ftype = F.col(ftype) if isinstance(ftype, str) else ftype
    tags = F.col(tags) if isinstance(tags, str) else tags
    closed = F.col(closed) if isinstance(closed, str) else closed
    is_area = F.col(is_area) if isinstance(is_area, str) else is_area
    selectors = _split_selectors(goql)
    if not selectors:
        raise GoqlError("empty GOQL query")
    out = _compile_selector(selectors[0], ftype, tags, closed, is_area)
    for s in selectors[1:]:
        out = out | _compile_selector(s, ftype, tags, closed, is_area)
    return out
