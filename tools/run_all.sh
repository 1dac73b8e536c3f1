#!/usr/bin/env bash
# Full local validation: unit/operator tests, Spark-vs-DuckDB correctness
# (normal + hostile-TZ), benchmark, submit demo. Scaling bench is separate
# (tools/scaling_bench.py) — run it on an idle box.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_correctness.py /root/testdata/sf0.01
SPARK_GRAFT_HOSTILE=1 python tools/check_correctness.py /root/testdata/sf0.01
python bench.py
bash tools/submit_demo.sh
