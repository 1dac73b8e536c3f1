"""gol_tool_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Capability parity target: clarisma/gol-tool (GeoDesk "GOL Tool", Java CLI that
builds and queries tiled Geographic Object Libraries from OSM data).  This is
NOT a port: the reference's mmap'd tile store, pile files and pointer linking
are replaced by DataFrame-declarative plans (Catalyst/Tungsten pick the
physical strategy); its quad-tile pyramid becomes an int-Mercator cell index
computed JVM-side with built-in column functions; its worker-pool pipeline
becomes shuffle stages.

Layout:
    kernels/    pure-numpy reference kernels (tile math, Mercator projection,
                catalog builder, ray-cast point-in-polygon, image codec/PSNR)
                — the single source of truth for spatial semantics, unit
                tested, reused by vectorized pandas UDFs.
    functions/  Column-level builders (tile ids, GOQL compiler, text metrics,
                minhash/simhash, vector math) — JVM-side expressions first.
    sources/    deterministic fixture generators + testdata loaders.
    operators/  the operator inventory of SURVEY.md §2 (tile assignment,
                way/relation resolution, spatial query, stats, kNN, dedup,
                ANN, multimodal plumbing).
    plans/      staged build pipeline (sort→validate→compile) with
                checkpoint manifest + per-partition lineage metrics.
    streaming/  change-stream (OsmChange-analogue) incremental apply.
    sinks/      query result writers (list/csv/geojson/wkt/count/stats).
"""

__version__ = "0.1.0"
