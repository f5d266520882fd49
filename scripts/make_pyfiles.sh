#!/bin/sh
# Package qfspark for spark-submit --py-files.
#
#   scripts/make_pyfiles.sh [out.zip]
#   spark-submit --py-files qfspark.zip your_job.py
set -e
OUT="${1:-qfspark.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
# zip only the package sources (no tests, no caches)
find qfspark -name '*.py' | sort | zip -q "$OUT" -@
echo "wrote $OUT:"
unzip -l "$OUT" | tail -3
