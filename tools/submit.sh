#!/usr/bin/env bash
# spark-submit entry (north_rule: run via spark-submit --py-files).
# Packages the library as a zip and submits the pipeline; on a real cluster
# swap --master for yarn/k8s and the same artifact works unchanged.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/folkscope_spark.zip
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" folkscope_spark)
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/tools/run_pipeline.py" "$@"
