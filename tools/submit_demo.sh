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
print("SUBMIT_DEMO_RESULT " + json.dumps({"assigned": n_assigned, "bbox_goql": n_query}))
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
