#!/usr/bin/env bash
# Package the engine and run the pipeline via spark-submit --py-files,
# exactly as it would ship to a multi-executor cluster.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-$(mktemp -d /tmp/sss_submit_XXXX)}"
MASTER="${SPARK_MASTER:-local[8]}"

ZIP="$(mktemp -d)/sss_pkg.zip"
(cd "$REPO" && zip -qr "$ZIP" semantic_search_system_spark -x '*__pycache__*')

spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/scripts/spark_submit_pipeline.py" "$SF_DIR" "$OUT"

rm -f "$ZIP"
echo "output at $OUT"
