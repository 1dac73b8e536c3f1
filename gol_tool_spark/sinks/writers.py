"""Query-result sinks: the reference's `-f=` output family (A9,
QueryCommand.java:50-53,131-145 — LIST, CSV, GEOJSON(+L), WKT, COUNT, XML,
POLY, TABLE, MAP, STATS).

Formatters are column expressions (JVM-side json/string building) feeding
stock DataFrame writers, so a 100 TB export is a distributed write, not a
driver loop.  Coordinate output converts the int grid back to lon/lat at a
given decimal precision (QueryCommand.java:41-48, default 7), matching the
reference's CoordinateTransformer.FromMercator.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 4294967296.0


def lon_of(x: Column, precision: int = 7) -> Column:
    return F.round(x.cast("double") / GRID * 360.0, precision)


def lat_of(y: Column, precision: int = 7) -> Column:
    # lat = atan(sinh(2*pi*y/2^32)); sinh(v) = (e^v - e^-v)/2
    v = y.cast("double") / GRID * (2.0 * math.pi)
    return F.round(F.degrees(F.atan((F.exp(v) - F.exp(-v)) / 2.0)), precision)


def list_format(df: DataFrame, id_col: str = "id", ftype: str = "node") -> DataFrame:
    """LIST: one line per feature, `type/id` (the reference's default)."""
    return df.select(F.concat(F.lit(f"{ftype}/"), F.col(id_col).cast("string")).alias("line"))


def csv_format(df: DataFrame, cols: list[str], precision: int = 7) -> DataFrame:
    """CSV projection with lon/lat computed columns (B4: -t=lon,lat,...)."""
    out = []
    for c in cols:
        if c == "lon":
            out.append(lon_of(F.col("x"), precision).alias("lon"))
        elif c == "lat":
            out.append(lat_of(F.col("y"), precision).alias("lat"))
        else:
            out.append(F.col(c))
    return df.select(*out)


def geojson_format(df: DataFrame, id_col: str = "id", precision: int = 7) -> DataFrame:
    """GEOJSONL: one Feature object per row (GeoJsonFeaturePrinter parity
    for point geometry; way/relation geometry uses the assembled coord
    arrays the same way)."""
    props = [c for c in df.columns if c not in (id_col, "x", "y", "tile")]
    geom = F.to_json(
        F.struct(
            F.lit("Point").alias("type"),
            F.array(lon_of(F.col("x"), precision), lat_of(F.col("y"), precision)).alias("coordinates"),
        )
    )
    pstruct = F.to_json(F.struct(*[F.col(c) for c in props])) if props else F.lit("{}")
    return df.select(
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col(id_col).cast("string"),
            F.lit(',"geometry":'), geom,
            F.lit(',"properties":'), pstruct, F.lit("}"),
        ).alias("feature")
    )


def wkt_format(df: DataFrame, precision: int = 7) -> DataFrame:
    """WKT points (WktFeaturePrinter parity)."""
    return df.select(
        F.concat(
            F.lit("POINT ("),
            lon_of(F.col("x"), precision).cast("string"), F.lit(" "),
            lat_of(F.col("y"), precision).cast("string"), F.lit(")"),
        ).alias("wkt")
    )


def count_format(df: DataFrame) -> int:
    """COUNT sink (QueryCommand -f=count)."""
    return df.count()


def poly_format(ring_df: DataFrame, name: str = "polygon") -> str:
    """POLY format (PolyFeaturePrinter parity): driver-side render of ONE
    polygon ring table (ring_df: seq, x, y — rings are tiny)."""
    rows = ring_df.orderBy("seq").select(
        lon_of(F.col("x")).alias("lon"), lat_of(F.col("y")).alias("lat")
    ).collect()
    lines = [name, "1"]
    lines += [f"   {r.lon:.7E}   {r.lat:.7E}" for r in rows]
    lines += ["END", "END"]
    return "\n".join(lines)


def table_format(df: DataFrame, n: int = 20) -> str:
    """TABLE sink: fixed-width preview (driver-side, bounded rows)."""
    return df._show_string(n, 0, False) if hasattr(df, "_show_string") else str(df.limit(n).toPandas())


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def write_geojsonl(df: DataFrame, path: str, id_col: str = "id") -> None:
    geojson_format(df, id_col).write.mode("overwrite").text(path)


def osm_xml_format(df: DataFrame, id_col: str = "id", precision: int = 7) -> DataFrame:
    """XML (OSM) sink (OsmXmlFeaturePrinter parity): one <node> element per
    row with tag children — string building stays distributed."""
    tag_xml = F.when(
        F.col("tags").isNotNull() & (F.size("tags") > 0),
        F.concat_ws(
            "",
            F.transform(
                F.map_entries(F.col("tags")),
                lambda e: F.concat(
                    F.lit('  <tag k="'), e["key"], F.lit('" v="'), e["value"], F.lit('"/>\n')
                ),
            ),
        ),
    ).otherwise(F.lit(""))
    return df.select(
        F.concat(
            F.lit('<node id="'), F.col(id_col).cast("string"),
            F.lit('" lon="'), lon_of(F.col("x"), precision).cast("string"),
            F.lit('" lat="'), lat_of(F.col("y"), precision).cast("string"),
            F.lit('">\n'), tag_xml, F.lit("</node>"),
        ).alias("xml")
    )


def fab_format(df: DataFrame, id_col: str = "id") -> DataFrame:
    """FAB sink: the reference config/feature DSL style `node/<id>: k=v ...`."""
    kv = F.when(
        F.col("tags").isNotNull() & (F.size("tags") > 0),
        F.concat_ws(
            ", ",
            F.transform(F.map_entries(F.col("tags")), lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ),
    ).otherwise(F.lit(""))
    return df.select(
        F.concat(F.lit("node/"), F.col(id_col).cast("string"), F.lit(": "), kv).alias("fab")
    )


def map_html(df: DataFrame, limit: int = 1000, precision: int = 7) -> str:
    """MAP sink (MapFeaturePrinter parity): a self-contained Leaflet-style
    HTML page with the (bounded) result markers inlined. Driver-side by
    design, like the reference (browsers don't render 10^12 markers)."""
    rows = (
        df.select(lon_of(F.col("x"), precision).alias("lon"), lat_of(F.col("y"), precision).alias("lat"))
        .limit(limit)
        .collect()
    )
    markers = ",\n".join(f"[{r.lat},{r.lon}]" for r in rows)
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<link rel='stylesheet' href='https://unpkg.com/leaflet/dist/leaflet.css'/>"
        "<script src='https://unpkg.com/leaflet/dist/leaflet.js'></script></head>"
        "<body><div id='map' style='height:100vh'></div><script>"
        "var map=L.map('map').setView([0,0],2);"
        "L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png').addTo(map);"
        f"var pts=[{markers}];"
        "pts.forEach(function(p){L.circleMarker(p,{radius:4}).addTo(map);});"
        "if(pts.length)map.fitBounds(pts);"
        "</script></body></html>"
    )


def parse_poly(text: str) -> list[list[tuple[int, int]]]:
    """POLY-format reader — the `-a=file` input path (GolCommand.java:96-105
    PolyReader parity): returns rings as int-Mercator (x, y) vertex lists.
    Inverse of poly_format (lon/lat floats re-projected onto the grid)."""
    import math

    rings: list[list[tuple[int, int]]] = []
    current: list[tuple[int, int]] | None = None
    for line in text.splitlines()[1:]:  # first line = polygon name
        s = line.strip()
        if not s:
            continue
        if s == "END":
            if current is not None:
                rings.append(current)
                current = None
            continue
        parts = s.split()
        if len(parts) == 1:  # ring header (ring number / '!' for holes)
            current = []
            continue
        lon, lat = float(parts[0]), float(parts[1])
        x = int(round(lon / 360.0 * 4294967296.0))
        lat = max(min(lat, 85.0511287798066), -85.0511287798066)
        y = int(round(math.asinh(math.tan(math.radians(lat))) / (2.0 * math.pi) * 4294967296.0))
        if current is None:
            current = []
        current.append((x, y))
    return rings
