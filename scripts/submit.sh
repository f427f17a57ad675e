#!/bin/sh
# Package the engine and launch the pipeline via spark-submit --py-files.
# All args are forwarded; --master must come first (spark-submit convention).
#
#   scripts/submit.sh --master local[32] -- \
#       --input /tmp/pages --output /tmp/out --shards 8
set -eu

REPO_DIR=$(CDPATH= cd -- "$(dirname -- "$0")/.." && pwd)
ZIP=$(mktemp -u /tmp/blc_spark_XXXXXX).zip

(cd "$REPO_DIR" && python3 -c "
import shutil, zipfile, os
zf = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for root, dirs, files in os.walk('buildlog_consultant_spark'):
    dirs[:] = [d for d in dirs if d != '__pycache__']
    for f in files:
        p = os.path.join(root, f)
        zf.write(p, p)
zf.close()
print('packaged', '$ZIP')
")

MASTER_ARGS=""
while [ $# -gt 0 ] && [ "$1" != "--" ]; do
  MASTER_ARGS="$MASTER_ARGS $1"
  shift
done
[ $# -gt 0 ] && shift  # drop --

# shellcheck disable=SC2086
exec spark-submit $MASTER_ARGS \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO_DIR/scripts/run_job.py" "$@"
