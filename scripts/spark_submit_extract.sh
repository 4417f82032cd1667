#!/usr/bin/env bash
# Run the extraction job via spark-submit --py-files at two parallelism
# levels and print both metric lines.
#
# MASTER_MODE=local-cluster (default): N vs 4N REAL executor processes
#   (local-cluster[2,1,2560] vs local-cluster[8,1,2560]) — separate
#   executor JVMs, network shuffle, the package reaching python workers
#   only through --py-files. This is the sandbox's closest stand-in for
#   the north rule's "N and 4N executors".
# MASTER_MODE=local: the pre-round-4 thread mode (local[8] vs local[32]).
#
# Usage: scripts/spark_submit_extract.sh [sf_dir] [out_base]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_BASE="${2:-/tmp/spark_graft_submit}"
MASTER_MODE="${MASTER_MODE:-local-cluster}"
ZIP=/tmp/documentai_ocr_spark.zip

cd "$REPO"
rm -f "$ZIP"
zip -qr "$ZIP" documentai_ocr_spark -x '*__pycache__*'

if [ "$MASTER_MODE" = "local-cluster" ]; then
  WIDTHS="2 8"   # executor counts (1 core each)
else
  WIDTHS="8 32"  # thread counts
fi

for W in $WIDTHS; do
  OUT="$OUT_BASE/${MASTER_MODE}_w$W"
  rm -rf "$OUT"
  if [ "$MASTER_MODE" = "local-cluster" ]; then
    MASTER="local-cluster[$W,1,2560]"
    SHUF=$((W * 2))
    EXTRA=(--conf spark.executor.memory=2g)
  else
    MASTER="local[$W]"
    SHUF=$((W * 2))
    EXTRA=()
  fi
  spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=$SHUF \
    --conf spark.driver.memory=16g \
    "${EXTRA[@]}" \
    --py-files "$ZIP" \
    documentai_ocr_spark/runner.py \
    --sf-dir "$SF_DIR" --output "$OUT" --n-buckets 64 \
    2>/dev/null | tail -1
done
