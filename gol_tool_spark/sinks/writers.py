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
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 4294967296.0


def xml_escape(c: Column) -> Column:
    """XML attribute/text escaping (EscapeXml.java:15-31): the reference
    escapes & < > \" ' in every attribute value it writes.  OSM tag keys,
    values and roles are free text — `name=Marks & Spencer` must come out
    as `Marks &amp; Spencer` or the document is malformed.  Chained
    JVM-side replaces ('&' first, so entities aren't double-escaped)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def _tag_children_xml(tags: Column) -> Column:
    """map<string,string> -> '  <tag k=".." v=".."/>\n' * N with escaped
    attributes (OsmXmlFeaturePrinter.printTags, shared by the node, way and
    relation branches — OsmXmlFeaturePrinter.java:117-177)."""
    return F.when(
        tags.isNotNull() & (F.size(tags) > 0),
        F.concat_ws(
            "",
            F.transform(
                F.map_entries(tags),
                lambda e: F.concat(
                    F.lit('  <tag k="'), xml_escape(e["key"]),
                    F.lit('" v="'), xml_escape(e["value"]), F.lit('"/>\n'),
                ),
            ),
        ),
    ).otherwise(F.lit(""))


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


def poly_format_rings(polys: DataFrame, name: str = "polygon") -> str:
    """POLY format for a relation multipolygon (rings.polygons_of output —
    one row per ring with xs/ys arrays and is_hole): outer rings numbered,
    hole rings marked with the osmosis '!' prefix, so the text round-trips
    through parse_poly/poly_rings into points_in_polygon's (exterior,
    holes) form.  Driver-side render of ONE relation's rings (bounded),
    like the reference's PolyFeaturePrinter."""
    rows = polys.orderBy("poly_idx", "is_hole", "ring_idx").collect()
    lines = [name]
    ring_no = 0
    for r in rows:
        ring_no += 1
        lines.append(f"!{ring_no}" if r.is_hole else str(ring_no))
        for x, y in zip(r.xs, r.ys):
            lon = float(x) / GRID * 360.0
            v = float(y) / GRID * (2.0 * math.pi)
            lat = math.degrees(math.atan(math.sinh(v)))
            lines.append(f"   {lon:.7E}   {lat:.7E}")
        lines.append("END")
    lines.append("END")
    return "\n".join(lines)


def table_format(df: DataFrame, n: int = 20) -> str:
    """TABLE sink: fixed-width preview (driver-side, bounded rows)."""
    return df._show_string(n, 0, False) if hasattr(df, "_show_string") else str(df.limit(n).toPandas())


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def write_geojsonl(df: DataFrame, path: str, id_col: str = "id") -> None:
    geojson_format(df, id_col).write.mode("overwrite").text(path)


def write_geojson_collection(features: DataFrame, out_file: str) -> int:
    """Wrapped GEOJSON (GeoJsonFeaturePrinter.java:42-57): the reference
    emits both line-delimited GEOJSONL and a single FeatureCollection
    document.  The features themselves are produced by the DISTRIBUTED
    formatters (one JSON object per row, any of geojson_format /
    geojson_way_format / geojson_polygon_format output); this sink writes
    the part files distributed, then stitches header + comma-joined
    features + footer on the driver as a pure streaming copy (O(bytes)
    sequential I/O, no parse, no row materialization).  Returns the
    feature count."""
    col = features.columns[0]
    parts_dir = out_file + "_parts"
    features.select(F.col(col)).write.mode("overwrite").text(parts_dir)
    import glob as _glob
    import shutil as _shutil

    n = 0
    # explicit utf-8 on both ends: Spark writes the parts as UTF-8, and a
    # C-locale driver would otherwise stitch (or crash) in ASCII
    with open(out_file, "w", encoding="utf-8") as out:
        out.write('{"type":"FeatureCollection","generator":"gol_tool_spark","features":[\n')
        for part in sorted(_glob.glob(os.path.join(parts_dir, "part-*"))):
            with open(part, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    out.write(",\n" if n else "")
                    out.write("\t" + line)
                    n += 1
        out.write("\n]}\n")
    _shutil.rmtree(parts_dir, ignore_errors=True)
    return n


def geojson_geometrycollection_format(
    member_geoms: DataFrame, id_col: str = "rel_id", geom_col: str = "geom_json"
) -> DataFrame:
    """GEOJSONL Feature with a GeometryCollection geometry for MIXED-member
    relations (GeoJsonFeaturePrinter.java:87-143: a relation that is not a
    polygon area prints the collection of its members' geometries).
    member_geoms: one row per member (rel_id, seq, geom_json) where
    geom_json is an already-rendered member geometry object (Point /
    LineString / Polygon from the sibling formatters).  Ordered by seq;
    per-relation member counts are bounded, so the collect_list stays
    small.  All string building JVM-side."""
    g = F.struct(F.col("seq"), F.col(geom_col).alias("s"))
    per_rel = member_geoms.groupBy(id_col).agg(
        F.concat_ws(
            ",", F.transform(F.array_sort(F.collect_list(g)), lambda e: e["s"])
        ).alias("gs")
    )
    return per_rel.select(
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col(id_col).cast("string"),
            F.lit(',"geometry":{"type":"GeometryCollection","geometries":['),
            F.col("gs"), F.lit(']},"properties":{}}'),
        ).alias("feature")
    )


def osm_xml_format(df: DataFrame, id_col: str = "id", precision: int = 7) -> DataFrame:
    """XML (OSM) sink (OsmXmlFeaturePrinter parity): one <node> element per
    row with tag children — string building stays distributed; attribute
    values escaped per EscapeXml.java."""
    tag_xml = _tag_children_xml(F.col("tags"))
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


def parse_poly(text: str) -> list[tuple[list[tuple[int, int]], bool]]:
    """POLY-format reader — the `-a=file` input path (GolCommand.java:96-105
    PolyReader parity): returns (ring, is_hole) pairs, ring vertices as
    int-Mercator (x, y).  A ring header starting with '!' marks a hole
    (osmosis POLY convention, honoured by the reference's PolyReader).
    Inverse of poly_format (lon/lat floats re-projected onto the grid)."""
    import math

    rings: list[tuple[list[tuple[int, int]], bool]] = []
    current: list[tuple[int, int]] | None = None
    is_hole = False
    for line in text.splitlines()[1:]:  # first line = polygon name
        s = line.strip()
        if not s:
            continue
        if s == "END":
            if current is not None:
                rings.append((current, is_hole))
                current = None
            continue
        parts = s.split()
        if len(parts) == 1:  # ring header (ring number; leading '!' = hole)
            current = []
            is_hole = parts[0].startswith("!")
            continue
        lon, lat = float(parts[0]), float(parts[1])
        x = int(round(lon / 360.0 * 4294967296.0))
        lat = max(min(lat, 85.0511287798066), -85.0511287798066)
        y = int(round(math.asinh(math.tan(math.radians(lat))) / (2.0 * math.pi) * 4294967296.0))
        if current is None:
            current = []
        current.append((x, y))
    return rings


def poly_rings(text: str) -> tuple[list[tuple[int, int]], list[list[tuple[int, int]]]]:
    """parse_poly split into the (exterior, holes) shape that
    spatial_query.points_in_polygon takes (first outer ring + all holes)."""
    parsed = parse_poly(text)
    outers = [r for r, h in parsed if not h]
    holes = [r for r, h in parsed if h]
    if not outers:
        raise ValueError("POLY file has no outer ring")
    return outers[0], holes


# --------------- non-point geometry (GeoJsonFeaturePrinter.java:101-143,
# WktFeaturePrinter.java, OsmXmlFeaturePrinter.java way/relation elements) ---

# Fixed-scale decimal rendering: CAST(round(v, p) AS DECIMAL(11, p)) prints
# identically in Spark and DuckDB ("-0.1000000"), making geometry strings
# oracle-hashable.  precision 7 is the reference's default (-p=7).


def _lon_str(x: Column, precision: int = 7) -> Column:
    return lon_of(x, precision).cast(f"decimal(11,{precision})").cast("string")


def _lat_str(y: Column, precision: int = 7) -> Column:
    return lat_of(y, precision).cast(f"decimal(11,{precision})").cast("string")


def _coords_json(coords: Column, precision: int = 7) -> Column:
    """array<struct<seq,x,y>> -> '[lon,lat],[lon,lat],...'"""
    return F.concat_ws(
        ",",
        F.transform(
            coords,
            lambda c: F.concat(
                F.lit("["), _lon_str(c["x"], precision), F.lit(","),
                _lat_str(c["y"], precision), F.lit("]"),
            ),
        ),
    )


def _coords_wkt(coords: Column, precision: int = 7) -> Column:
    return F.concat_ws(
        ", ",
        F.transform(
            coords,
            lambda c: F.concat(_lon_str(c["x"], precision), F.lit(" "), _lat_str(c["y"], precision)),
        ),
    )


def _ring_closed(coords: Column) -> Column:
    first, last = F.element_at(coords, 1), F.element_at(coords, -1)
    return (
        (F.size(coords) >= 4) & (first["x"] == last["x"]) & (first["y"] == last["y"])
    )


def geojson_way_format(
    df: DataFrame,
    id_col: str = "way_id",
    coords_col: str = "coords",
    precision: int = 7,
    as_area: bool = False,
) -> DataFrame:
    """GEOJSONL for assembled ways (measures.assemble_coords output):
    LineString, or Polygon when `as_area` and the ring is closed —
    GeoJsonFeaturePrinter.java:101-143 way branch.  Pure column expressions:
    a 100 TB way export stays a distributed write."""
    cj = _coords_json(F.col(coords_col), precision)
    geom_ls = F.concat(F.lit('{"type":"LineString","coordinates":['), cj, F.lit("]}"))
    geom_pg = F.concat(F.lit('{"type":"Polygon","coordinates":[['), cj, F.lit("]]}"))
    geom = (
        F.when(_ring_closed(F.col(coords_col)), geom_pg).otherwise(geom_ls)
        if as_area
        else geom_ls
    )
    props = [c for c in df.columns if c not in (id_col, coords_col)]
    pstruct = F.to_json(F.struct(*[F.col(c) for c in props])) if props else F.lit("{}")
    return df.select(
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col(id_col).cast("string"),
            F.lit(',"geometry":'), geom,
            F.lit(',"properties":'), pstruct, F.lit("}"),
        ).alias("feature")
    )


def wkt_way_format(
    df: DataFrame,
    coords_col: str = "coords",
    precision: int = 7,
    as_area: bool = False,
) -> DataFrame:
    """WKT LINESTRING / POLYGON for assembled ways (WktFeaturePrinter parity)."""
    cw = _coords_wkt(F.col(coords_col), precision)
    ls = F.concat(F.lit("LINESTRING ("), cw, F.lit(")"))
    pg = F.concat(F.lit("POLYGON (("), cw, F.lit("))"))
    wkt = F.when(_ring_closed(F.col(coords_col)), pg).otherwise(ls) if as_area else ls
    return df.select(wkt.alias("wkt"))


def _xy_pairs_json(xs: Column, ys: Column, precision: int = 7) -> Column:
    return F.concat_ws(
        ",",
        F.zip_with(
            xs,
            ys,
            lambda x, y: F.concat(
                F.lit("["), _lon_str(x, precision), F.lit(","), _lat_str(y, precision), F.lit("]")
            ),
        ),
    )


def geojson_polygon_format(polys: DataFrame, precision: int = 7) -> DataFrame:
    """GEOJSONL for relation multipolygons.  Input is rings.polygons_of
    output — one row per ring: (rel_id, poly_idx, is_hole, ring_idx, xs, ys).
    Emits Polygon when a relation has one outer ring, MultiPolygon otherwise,
    holes nested inside their containing outer (GeoJsonFeaturePrinter
    relation branch).  All string building is JVM-side; per-relation ring
    counts are bounded, so the collect_list aggregates stay small."""
    ring = polys.select(
        "rel_id",
        "poly_idx",
        F.struct(
            F.col("is_hole"), F.col("ring_idx"),
            F.concat(F.lit("["), _xy_pairs_json(F.col("xs"), F.col("ys"), precision), F.lit("]")).alias("s"),
        ).alias("r"),
    )
    per_poly = ring.groupBy("rel_id", "poly_idx").agg(
        F.concat(
            F.lit("["),
            F.concat_ws(",", F.transform(F.array_sort(F.collect_list("r")), lambda r: r["s"])),
            F.lit("]"),
        ).alias("poly_s")
    )
    per_rel = per_poly.groupBy("rel_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("poly_idx"), F.col("poly_s")))),
            lambda p: p["poly_s"],
        ).alias("ps")
    )
    geom = F.when(
        F.size("ps") == 1,
        F.concat(F.lit('{"type":"Polygon","coordinates":'), F.element_at("ps", 1), F.lit("}")),
    ).otherwise(
        F.concat(
            F.lit('{"type":"MultiPolygon","coordinates":['), F.concat_ws(",", F.col("ps")), F.lit("]}")
        )
    )
    return per_rel.select(
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col("rel_id").cast("string"),
            F.lit(',"geometry":'), geom, F.lit(',"properties":{}}'),
        ).alias("feature")
    )


def wkt_polygon_format(polys: DataFrame, precision: int = 7) -> DataFrame:
    """WKT POLYGON / MULTIPOLYGON from rings.polygons_of output."""
    ring = polys.select(
        "rel_id",
        "poly_idx",
        F.struct(
            F.col("is_hole"), F.col("ring_idx"),
            F.concat(
                F.lit("("),
                F.concat_ws(
                    ", ",
                    F.zip_with(
                        F.col("xs"), F.col("ys"),
                        lambda x, y: F.concat(_lon_str(x, precision), F.lit(" "), _lat_str(y, precision)),
                    ),
                ),
                F.lit(")"),
            ).alias("s"),
        ).alias("r"),
    )
    per_poly = ring.groupBy("rel_id", "poly_idx").agg(
        F.concat(
            F.lit("("),
            F.concat_ws(", ", F.transform(F.array_sort(F.collect_list("r")), lambda r: r["s"])),
            F.lit(")"),
        ).alias("poly_s")
    )
    per_rel = per_poly.groupBy("rel_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("poly_idx"), F.col("poly_s")))),
            lambda p: p["poly_s"],
        ).alias("ps")
    )
    wkt = F.when(
        F.size("ps") == 1, F.concat(F.lit("POLYGON "), F.element_at("ps", 1))
    ).otherwise(F.concat(F.lit("MULTIPOLYGON ("), F.concat_ws(", ", F.col("ps")), F.lit(")")))
    return per_rel.select("rel_id", wkt.alias("wkt"))


def osm_xml_way_format(
    membership: DataFrame, id_col: str = "way_id", tags_df: DataFrame | None = None
) -> DataFrame:
    """XML <way> elements with ordered <nd ref=...> children and <tag>
    children (OsmXmlFeaturePrinter.java:151-160 calls printTags for ways
    too).  membership: (way_id, seq, node_ref); tags_df (optional): one row
    per way (id_col, tags map) — joined in, attribute values escaped."""
    nd = F.struct(
        F.col("seq"),
        F.concat(F.lit('  <nd ref="'), F.col("node_ref").cast("string"), F.lit('"/>\n')).alias("s"),
    )
    grouped = membership.groupBy(id_col).agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(nd)), lambda e: e["s"])
        ).alias("nds")
    )
    if tags_df is not None:
        grouped = grouped.join(tags_df.select(id_col, "tags"), id_col, "left")
        tag_xml = _tag_children_xml(F.col("tags"))
    else:
        tag_xml = F.lit("")
    return grouped.select(
        F.concat(
            F.lit('<way id="'), F.col(id_col).cast("string"), F.lit('">\n'),
            F.col("nds"), tag_xml, F.lit("</way>"),
        ).alias("xml")
    )


def osm_xml_relation_format(
    members: DataFrame, id_col: str = "rel_id", tags_df: DataFrame | None = None
) -> DataFrame:
    """XML <relation> elements with ordered <member> children and <tag>
    children (OsmXmlFeaturePrinter.java:161-177).  members: (rel_id, seq,
    mtype, ref, role) — relations.split_members output; tags_df (optional):
    (id_col, tags map).  Roles are free text — escaped per EscapeXml."""
    me = F.struct(
        F.col("seq"),
        F.concat(
            F.lit('  <member type="'), F.col("mtype"),
            F.lit('" ref="'), F.col("ref").cast("string"),
            F.lit('" role="'), xml_escape(F.coalesce(F.col("role"), F.lit(""))),
            F.lit('"/>\n'),
        ).alias("s"),
    )
    grouped = members.groupBy(id_col).agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(me)), lambda e: e["s"])
        ).alias("ms")
    )
    if tags_df is not None:
        grouped = grouped.join(tags_df.select(id_col, "tags"), id_col, "left")
        tag_xml = _tag_children_xml(F.col("tags"))
    else:
        tag_xml = F.lit("")
    return grouped.select(
        F.concat(
            F.lit('<relation id="'), F.col(id_col).cast("string"), F.lit('">\n'),
            F.col("ms"), tag_xml, F.lit("</relation>"),
        ).alias("xml")
    )
