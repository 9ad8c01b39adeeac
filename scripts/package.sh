#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment.
#   ./scripts/package.sh  →  dist/search_engine_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/search_engine_spark.zip
zip -qr dist/search_engine_spark.zip search_engine_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/search_engine_spark.zip"
unzip -l dist/search_engine_spark.zip | tail -2
