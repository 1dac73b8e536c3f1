"""Deterministic synthetic spatial columns derived from the driver's TPC-H
tables — the shared spec between the Spark engine and the DuckDB oracle.

The driver's correctness gate runs our Spark queries AND our oracle SQL on
the same parquet; floating-point trig would drift between engines, so every
derivation here is EXACT 64-bit integer arithmetic (multiplies stay under
2^63; FLOOR-division operands stay under 2^53 so the double round-trip is
exact).  Each derivation exists twice — a Column builder and a SQL-text
builder — built from the same constants so they cannot drift.

Point synthesis (the OSM-node analogue of FIXTURES.md §2):
    pid = l_orderkey * 8 + l_linenumber                  (unique, gaps)
    u1  = (pid * 2654435761)              % 2^32
    u2  = (pid * 2246822519 + 1013904223) % 2^32
    hot = pid % 10 < 2   (20% of points in 5 clustered "urban" cells — the
                          skew driver); cluster = pid % 5
    x   = hot ? cluster*700000000 - 1500000000 + u1 % 2^20 : u1 - 2^31
    y   = hot ? (cluster*1111111111) % 3000000000 - 1500000000 + u2 % 2^20
              : u2 - 2^31

Ways = orders (members are the order's lineitems, seq = l_linenumber);
5% of memberships get a dangling node ref (pid - l_linenumber is ≡0 mod 8,
which no real pid is) — the Purgatory path (C6).
Relations = customers (members are the customer's orders); super-relations =
nations (members are customers) for the bounded fixed-point (C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

A_X = 2654435761
A_Y = 2246822519
C_Y = 1013904223
MOD32 = 1 << 32
HALF = 1 << 31
HOT_SPREAD = 1 << 20  # one z12 tile width -> maximal density skew
Z12_DIV = 1 << 20     # 2^(32-12)

# ------------------------------------------------------------- Column side


def point_id(ok, ln) -> F.Column:
    return (F.col(ok) * 8 + F.col(ln)).cast("bigint")


def point_xy(pid: F.Column) -> tuple[F.Column, F.Column]:
    u1 = (pid * A_X) % MOD32
    u2 = (pid * A_Y + C_Y) % MOD32
    hot = (pid % 10) < 2
    cluster = pid % 5
    x = F.when(hot, cluster * 700000000 - 1500000000 + (u1 % HOT_SPREAD)).otherwise(u1 - HALF)
    y = F.when(hot, (cluster * 1111111111) % 3000000000 - 1500000000 + (u2 % HOT_SPREAD)).otherwise(u2 - HALF)
    return x.cast("bigint"), y.cast("bigint")


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic nodes table: (id, x, y, tag-analogue columns, tags map
    for GOQL).  (l_orderkey, l_linenumber) is NOT unique in the driver's
    synthetic lineitem, so points aggregate per pid with deterministic
    min-representatives for the tag columns — mirrored exactly in
    POINTS_CTE for the oracle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pid = point_id("l_orderkey", "l_linenumber")
    uniq = li.groupBy(pid.alias("id")).agg(
        F.min("l_returnflag").alias("returnflag"),
        F.min("l_linestatus").alias("linestatus"),
        F.min("l_quantity").alias("qty"),
    )
    x, y = point_xy(F.col("id"))
    return uniq.select(
        "id",
        x.alias("x"),
        y.alias("y"),
        F.create_map(
            F.lit("returnflag"), F.col("returnflag"),
            F.lit("linestatus"), F.col("linestatus"),
            F.lit("qty"), F.col("qty").cast("string"),
        ).alias("tags"),
        "returnflag", "linestatus", "qty",
    )


def membership_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Way->node membership with the dangling-ref Purgatory path."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pid = point_id("l_orderkey", "l_linenumber")
    node_ref = F.when(pid % 20 == 3, pid - F.col("l_linenumber")).otherwise(pid)
    return li.select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").alias("seq"),
        node_ref.cast("bigint").alias("node_ref"),
    )


# ------------------------------------------------- sf-scaled text corpora

VOCAB_SIZE = 512
N_LANGS = ("en", "de", "fr", "es")


def documents_synth(spark: SparkSession, n_docs: int) -> DataFrame:
    """Deterministic synthetic document corpus with the driver's documents
    schema (doc_id, text, lang, source, n_chars), at ANY size — the driver
    tables cap at 5k docs at sf0.1, so dedup/ANN bench numbers there are
    overhead-dominated; this generator gives the 50k+ corpus the 100-TB
    story needs (round-2 VERDICT item 4).  Pure column expressions over
    spark.range: generation is distributed and embarrassingly parallel.

    Near-dup structure for the dedup operators: every 11th doc re-uses the
    word stream of doc_id-5 with one appended mutation word, so MinHash/
    SimHash find a known ~9% near-dup rate."""
    base = spark.range(n_docs).withColumn(
        "_dup", (F.col("id") % 11 == 10) & (F.col("id") >= 5)
    )
    seed = F.when(F.col("_dup"), F.col("id") - 5).otherwise(F.col("id"))
    length = (seed * 37 % 41 + 20).cast("int")
    # word index via xxhash64(seed, i): a REAL mixer — a linear congruence
    # here makes every doc an arithmetic progression mod the vocab, whose
    # shingle sets all overlap (degenerate corpus: every pair near-dup)
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(seed, i), F.lit(VOCAB_SIZE)).cast("string")
        ),
    )
    mut = F.when(
        F.col("_dup"), F.concat(F.lit(" m"), (F.col("id") % 97).cast("string"))
    ).otherwise(F.lit(""))
    text = F.concat(F.concat_ws(" ", words), mut)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in N_LANGS]), (seed % len(N_LANGS) + 1).cast("int")
    )
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), (seed % 8).cast("string")).alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )


def embeddings_synth(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_labels: int = 16,
    seed: int = 0,
    spread: float = 1.0,
) -> DataFrame:
    """Deterministic synthetic embeddings (vec_id, embedding array<float>,
    label) at ANY size, with real cluster structure: each label contributes
    a fixed centroid, rows add a small deterministic jitter — so ANN recall
    against the exact oracle is a meaningful number at 100k+ rows."""
    base = spark.range(n)
    label = (F.col("id") % n_labels).cast("int")
    d = F.sequence(F.lit(1), F.lit(dim))
    emb = F.transform(
        d,
        lambda i: (
            (F.pmod(F.xxhash64(label, i, F.lit(seed)), F.lit(1000)) / 250.0)
            + (F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(2001)) - 1000)
            * (spread / 1000.0)
        ).cast("float"),
    )
    return base.select(
        F.col("id").alias("vec_id"), emb.alias("embedding"), label.alias("label")
    )


def corpus_size(sf_dir: str, per_unit: int = 500_000, floor: int = 500) -> int:
    """sf-scaled corpus size: sf0.001 -> 500 docs, sf0.1 -> 50_000."""
    tail = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(tail)
    except ValueError:
        sf = 0.001
    return max(floor, int(per_unit * sf))


# ---------------------------------------------------------------- SQL side

POINTS_CTE = f"""
SELECT id,
       CASE WHEN id % 10 < 2
            THEN (id % 5) * 700000000 - 1500000000 + ((id * {A_X}) % {MOD32}) % {HOT_SPREAD}
            ELSE (id * {A_X}) % {MOD32} - {HALF} END AS x,
       CASE WHEN id % 10 < 2
            THEN ((id % 5) * 1111111111) % 3000000000 - 1500000000
                 + ((id * {A_Y} + {C_Y}) % {MOD32}) % {HOT_SPREAD}
            ELSE (id * {A_Y} + {C_Y}) % {MOD32} - {HALF} END AS y,
       returnflag, linestatus, qty
FROM (SELECT l_orderkey * 8 + l_linenumber AS id,
             MIN(l_returnflag) AS returnflag,
             MIN(l_linestatus) AS linestatus,
             MIN(l_quantity) AS qty
      FROM lineitem GROUP BY 1)
"""

# point_xy over event_id — the SQL twin used by the trajectory oracles
# (same LCG/hot-cluster formula as POINTS_CTE, keyed on the events table)
EVENTS_XY_CTE = f"""
SELECT user_id, event_id, ts,
       CASE WHEN event_id % 10 < 2
            THEN (event_id % 5) * 700000000 - 1500000000
                 + ((event_id * {A_X}) % {MOD32}) % {HOT_SPREAD}
            ELSE (event_id * {A_X}) % {MOD32} - {HALF} END AS x,
       CASE WHEN event_id % 10 < 2
            THEN ((event_id % 5) * 1111111111) % 3000000000 - 1500000000
                 + ((event_id * {A_Y} + {C_Y}) % {MOD32}) % {HOT_SPREAD}
            ELSE (event_id * {A_Y} + {C_Y}) % {MOD32} - {HALF} END AS y
FROM events
"""

# point_xy keyed on the 5-minute epoch bucket — the colocation fixture:
# events in the same bucket share a position, so contacts are temporally
# coherent (the event_id-keyed EVENTS_XY_CTE scatters same-cell events
# across days and a contact join over it is vacuous)
EVENTS_XY_T_CTE = f"""
SELECT user_id, event_id, ts,
       CASE WHEN tk % 10 < 2
            THEN (tk % 5) * 700000000 - 1500000000
                 + ((tk * {A_X}) % {MOD32}) % {HOT_SPREAD}
            ELSE (tk * {A_X}) % {MOD32} - {HALF} END AS x,
       CASE WHEN tk % 10 < 2
            THEN ((tk % 5) * 1111111111) % 3000000000 - 1500000000
                 + ((tk * {A_Y} + {C_Y}) % {MOD32}) % {HOT_SPREAD}
            ELSE (tk * {A_Y} + {C_Y}) % {MOD32} - {HALF} END AS y
FROM (SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) // 300 AS tk FROM events)
"""

MEMBERSHIP_CTE = """
SELECT l_orderkey AS way_id, l_linenumber AS seq,
       CASE WHEN (l_orderkey * 8 + l_linenumber) % 20 = 3
            THEN l_orderkey * 8
            ELSE l_orderkey * 8 + l_linenumber END AS node_ref
FROM lineitem
"""


def tile_sql(x: str, y: str, zoom: int = 12) -> str:
    """Packed tile id from x/y SQL expressions — exact in both engines
    (operands < 2^53 so FLOOR over double division is exact)."""
    if zoom == 0:
        return "0"
    div = 1 << (32 - zoom)
    col = f"CAST(FLOOR((({x}) + {HALF}) / {div}.0) AS BIGINT)"
    row = f"CAST(FLOOR(({HALF - 1} - ({y})) / {div}.0) AS BIGINT)"
    return f"({zoom * (1 << 24)} + {row} * 4096 + {col})"


def tile12_sql(x: str, y: str) -> str:
    return tile_sql(x, y, 12)


def parent_tile_sql(tile: str, from_zoom: int, to_zoom: int) -> str:
    dz = from_zoom - to_zoom
    row = f"CAST(FLOOR((CAST(FLOOR(({tile}) / 4096.0) AS BIGINT) % 4096) / {1 << dz}.0) AS BIGINT)"
    col = f"CAST(FLOOR((({tile}) % 4096) / {1 << dz}.0) AS BIGINT)"
    return f"({to_zoom * (1 << 24)} + {row} * 4096 + {col})"
