"""Grid-blocked DBSCAN over the int-Mercator plane.

Density clustering is the spatial twin of the near-dup pipeline: generate
eps-neighbor EDGES with a blocking scheme (here: eps-sized grid cells, 3x3
neighborhood join — never all-pairs), classify core points by neighbor
count, then reuse the SAME shuffle-based connected-components engine the
dedup stack runs (dedup.dup_clusters, alternating large-star/small-star)
for the transitive cluster merge.  MR-DBSCAN / DBSCAN-on-Spark literature
uses exactly this partition-local-candidates + global-merge shape.

Determinism (the gate needs bit-stable output): classic DBSCAN assigns a
border point to whichever core cluster DISCOVERS it first — order-
dependent.  Here a border point joins the MINIMUM cluster label among its
core neighbors, and cluster labels are canonicalized to the minimum core
point id of the component, so output is independent of partitioning and
scan order.

Scale notes (100-TB):
  * candidate generation is an equi-join on cell ids — one shuffle; the
    3x3 fan-out multiplies ONE side by 9 before the exchange, the dense-
    cell skew case is AQE skew-split territory (same story as the kNN
    cell-ring join in spatial_query.py).
  * distances stay in BIGINT (coords are ints, |dx| <= 2*eps, so dx^2
    never overflows) — exact, codegen-friendly, oracle-reproducible.
  * the CC merge inherits dup_clusters' O(log n) round bound and
    per-round edge-only state.

Reference parity: gol-tool has no clustering op; this extends the engine
the way its tile pyramid extends to the hex index (hexgrid.py) — a
first-class spatial-analytics operator over the same plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup


def _cell(col: str, eps: int) -> F.Column:
    # CAST(FLOOR(x / eps) AS BIGINT) over double division: |x| < 2^31 is
    # exactly representable, IEEE division + floor evaluate identically in
    # Spark and DuckDB, so the oracle reproduces cells bit-for-bit.
    return F.expr(f"CAST(FLOOR(CAST({col} AS DOUBLE) / {int(eps)}.0) AS BIGINT)")


def eps_pairs(
    pts: DataFrame,
    eps: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Unordered (id_a < id_b) pairs at L2 distance <= eps, via eps-sized
    grid cells + 3x3 neighbor equi-join.  Every qualifying pair lands in
    exactly one orientation; dropDuplicates collapses the multi-cell hits.
    """
    eps = int(eps)
    base = pts.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
        _cell(x_col, eps).alias("_cx"),
        _cell(y_col, eps).alias("_cy"),
    )
    # half-space probing (the colocation/ripley/knox trick): (0,0) plus
    # the 4 offsets lexicographically above it — a cross-cell unordered
    # pair meets on exactly one probe row with no id cut, a same-cell
    # pair keeps the _id < _ib cut; least/greatest restores the
    # id_a < id_b contract.  Identical pair set, 5/9 the exploded rows.
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) >= (0, 0)
        ]
    )
    probe = base.withColumn("_o", F.explode(offs)).select(
        F.col("_id").alias("_ib"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        (F.col("_cx") + F.col("_o.dx")).alias("_ncx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_ncy"),
        ((F.col("_o.dx") == 0) & (F.col("_o.dy") == 0)).alias("_same"),
    )
    dx = F.col("_x") - F.col("_xb")
    dy = F.col("_y") - F.col("_yb")
    return (
        # shuffle join on the cell key (not broadcast): dense eps-cells
        # are the skew AQE must be able to split — see
        # segments.segment_intersections
        base.hint("shuffle_merge").join(
            probe,
            (F.col("_cx") == F.col("_ncx"))
            & (F.col("_cy") == F.col("_ncy"))
            & (~F.col("_same") | (F.col("_id") < F.col("_ib"))),
        )
        .filter(dx * dx + dy * dy <= F.lit(eps * eps))
        .select(
            F.least("_id", "_ib").alias("id_a"),
            F.greatest("_id", "_ib").alias("id_b"),
        )
    )


def dbscan(
    pts: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """DBSCAN labels: (id, cluster, role) with role in core/border/noise.
    A point is core when its eps-ball holds >= min_pts points INCLUDING
    itself (the textbook counting); cluster = min core id of the density-
    connected component; border points take the min cluster among their
    core neighbors; noise rows carry a NULL cluster.
    """
    if int(min_pts) < 2:
        raise ValueError("min_pts must be >= 2 (at 1 every point is trivially core)")
    pairs = eps_pairs(pts, eps, id_col, x_col, y_col)
    sym = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    # sym feeds FOUR consumers (degree count, both core_edges semi-join
    # sides' source, the border candidate join) and dup_clusters
    # materializes its own copy — without pinning, the eps-neighbor
    # join subtree re-executes once per consumer.  The edge list is the
    # smallest representation of that work; materialize it once.
    sym = sym.localCheckpoint(eager=False)

    deg = sym.groupBy("u").agg((F.count(F.lit(1)) + 1).alias("_cnt"))
    core = deg.filter(F.col("_cnt") >= int(min_pts)).select(F.col("u").alias("cid"))

    core_edges = (
        sym.join(core.withColumnRenamed("cid", "u"), "u", "left_semi")
        .join(core.withColumnRenamed("cid", "v"), "v", "left_semi")
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    )
    comp = dedup.dup_clusters(core_edges, "id_a", "id_b")  # (doc_id, comp)
    core_lab = core.join(
        comp, core.cid == comp.doc_id, "left"
    ).select(
        F.col("cid").alias("id"),
        F.coalesce(F.col("comp"), F.col("cid")).alias("cluster"),
    )

    border = (
        sym.join(core.withColumnRenamed("cid", "v"), "v", "left_semi")
        .join(core.withColumnRenamed("cid", "u"), "u", "left_anti")
        .join(core_lab.withColumnRenamed("id", "v"), "v")
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )

    labeled = core_lab.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    noise = (
        pts.select(F.col(id_col).alias("id"))
        .join(labeled.select("id"), "id", "left_anti")
        .select("id", F.lit(None).cast(labeled.schema["cluster"].dataType).alias("cluster"), F.lit("noise").alias("role"))
    )
    return labeled.unionByName(noise)
