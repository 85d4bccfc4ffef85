#!/usr/bin/env bash
# Package the engine and run the index build via spark-submit --py-files.
#
#   bash tools/submit.sh [master] [extra job args...]
#   bash tools/submit.sh local[8] --convs 45000 --warmup
#
# The package zip is rebuilt on every invocation so executors always get
# the current code; on a real cluster replace 'local[N]' with the cluster
# master URL — nothing else changes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
shift || true

PKG="$(mktemp -d)/msq_pkg.zip"
(cd "$REPO" && zip -qr "$PKG" marginaliasearch_spark)

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-24g}" \
  --conf spark.ui.enabled=false \
  --py-files "$PKG" \
  "$REPO/tools/spark_submit_build.py" "$@"
