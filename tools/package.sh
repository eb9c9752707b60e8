#!/usr/bin/env bash
# Build the --py-files zip for spark-submit cluster deploys.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/database_delta_plugins_spark.zip
zip -qr dist/database_delta_plugins_spark.zip database_delta_plugins_spark \
    -x '*__pycache__*'
echo "dist/database_delta_plugins_spark.zip"
