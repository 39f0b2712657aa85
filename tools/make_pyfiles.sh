#!/usr/bin/env bash
# Package identity_matching_spark/ for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/identity_matching_spark.zip}"
rm -f "$out"
zip -qr "$out" identity_matching_spark -x '*__pycache__*'
echo "$out"
