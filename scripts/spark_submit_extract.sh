#!/usr/bin/env bash
# Run the extraction job via spark-submit --py-files at two parallelism
# levels (the sandbox stand-in for N vs 4N executors) and print both
# metric lines. Usage: scripts/spark_submit_extract.sh [sf_dir] [out_base]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_BASE="${2:-/tmp/spark_graft_submit}"
ZIP=/tmp/documentai_ocr_spark.zip

cd "$REPO"
rm -f "$ZIP"
zip -qr "$ZIP" documentai_ocr_spark -x '*__pycache__*'

for CORES in 8 32; do
  OUT="$OUT_BASE/cores$CORES"
  rm -rf "$OUT"
  spark-submit \
    --master "local[$CORES]" \
    --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
    --conf spark.driver.memory=16g \
    --py-files "$ZIP" \
    documentai_ocr_spark/runner.py \
    --sf-dir "$SF_DIR" --output "$OUT" --n-buckets 64 \
    2>/dev/null | tail -1
done
