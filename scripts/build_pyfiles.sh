#!/usr/bin/env bash
# Build the spark-submit --py-files artifact: dist/pq_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pq_spark.zip
zip -qr dist/pq_spark.zip pq_spark -x '*__pycache__*'
echo "built dist/pq_spark.zip ($(du -h dist/pq_spark.zip | cut -f1))"
echo "run:  spark-submit --py-files dist/pq_spark.zip pq_spark/rollup/pipeline.py --synth-pages 100000 --out /tmp/tiers"
