#!/usr/bin/env bash
# Cluster launch path (north_rule): ship the engine as a zip via
# spark-submit --py-files and run the replay CLI.
#
#   tools/submit_replay.sh --events <log dir> --table <lake root> [replay args...]
#
# On a real cluster add --master yarn/k8s and executor sizing, e.g.:
#   SPARK_SUBMIT_ARGS="--master yarn --num-executors 64 --executor-cores 4 \
#       --executor-memory 16g" tools/submit_replay.sh --events ... --table ...
# Locally it defaults to local[*]; the engine itself is identical in both.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
ZIP="$(mktemp -d)/etl_spark.zip"
(cd "$REPO_ROOT" && python -c "
import zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w') as z:
    for p in sorted(pathlib.Path('etl_spark').rglob('*.py')):
        z.write(p, str(p))
")

SPARK_SUBMIT="$(python -c 'import pyspark, pathlib; print(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")')"

exec "$SPARK_SUBMIT" \
    ${SPARK_SUBMIT_ARGS:---master local[*]} \
    --py-files "$ZIP" \
    "$REPO_ROOT/tools/replay_submit_main.py" \
    "$@"
