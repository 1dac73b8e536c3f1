#!/usr/bin/env bash
# spark-submit --py-files packaging evidence (BASELINE.json north_rule):
# zips the engine, submits a driver script that imports it from the zip and
# runs the tiling + query spine on sf0.001. Usage: tools/submit_demo.sh
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/gol_tool_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('/tmp/gol_tool_spark.zip', 'w') as z:
    for dp, _, fs in os.walk('gol_tool_spark'):
        for f in fs:
            if f.endswith('.py'):
                p = os.path.join(dp, f)
                z.write(p, p)
print('zipped')"
cat > /tmp/submit_job.py <<'EOF'
import json
from pyspark.sql import SparkSession, functions as F
from gol_tool_spark.functions import synth
from gol_tool_spark.operators import tiling, spatial_query

spark = SparkSession.builder.appName("submit-demo").getOrCreate()
sf = "/root/testdata/sf0.001"
pts = tiling.assign_points(synth.points_df(spark, sf))
cat = tiling.catalog_topk(tiling.rollup(tiling.density(pts.select("x", "y"))), 64, 20)
n_assigned = tiling.pile_assignment(pts, cat).filter(F.col("assigned_tile").isNotNull()).count()
n_query = spatial_query.bbox_query(
    pts, -(1 << 29), -(1 << 29), 1 << 29, 1 << 29, goql="n[returnflag=R]").count()

# gol update spine: typed store bulk-load + OsmChange merge + store query
import json as _json, os, tempfile
from pyspark.sql import functions as F2
from gol_tool_spark.streaming import changes_full as CF
td = tempfile.mkdtemp(prefix="submit_upd_")
store = os.path.join(td, "store")
nodes = pts.limit(2000).select("id", "x", "y", F2.lit(None).cast("map<string,string>").alias("tags"))
# versioned layout: the update spine publishes through the atomic
# snapshot manifest (txstore.py)
CF.write_full_store(nodes, None, None, store, layout="versioned")
os.makedirs(os.path.join(td, "ch"))
some = [r.id for r in nodes.limit(5).collect()]
with open(os.path.join(td, "ch", "d.json"), "w") as fh:
    for i, nid in enumerate(some):
        fh.write(_json.dumps({"op": "upsert", "ftype": "n", "id": nid, "x": 7 + i, "y": 9, "seq": i}) + "\n")
q = CF.apply_changes_full(spark, os.path.join(td, "ch"), store, os.path.join(td, "ck"))
assert q.awaitTermination(300)
n_moved = CF.query_store(spark, store, 0, 0, 100, 100).count()
print("SUBMIT_DEMO_RESULT " + json.dumps({"assigned": n_assigned, "bbox_goql": n_query, "updated_in_bbox": n_moved}))
spark.stop()
EOF
SPARK_BIN="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
"$SPARK_BIN" \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files /tmp/gol_tool_spark.zip \
  /tmp/submit_job.py
