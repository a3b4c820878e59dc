#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip elasticsearch_data_import_handler_spark -x '*__pycache__*'
echo "wrote $(pwd)/engine.zip"
