#!/usr/bin/env bash
# spark-submit --py-files packaging smoke (north_rule launch shape).
# Builds the zip, builds a small index, runs a query — all through
# spark-submit, not `python -m`. Usage: scripts/submit_smoke.sh [master]
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${1:-local[8]}"
SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
WORK=$(mktemp -d /tmp/spidey_submit.XXXX)
trap 'rm -rf "$WORK"' EXIT

zip -qr "$WORK/spidey.zip" spidey_search_engine_spark
cat > "$WORK/driver.py" <<'EOF'
# driver file shipped to spark-submit; the engine arrives via --py-files
import sys
from spidey_search_engine_spark.cli import main
sys.exit(main(sys.argv[1:]))
EOF
cat > "$WORK/gen.py" <<'EOF'
import sys
from spidey_search_engine_spark.session import get_spark
from spidey_search_engine_spark.sources.corpus import generate_corpus_df
s = get_spark(app="submit-gen")
s.sparkContext.setLogLevel("ERROR")
generate_corpus_df(s, 1000, seed=5, partitions=8) \
    .write.mode("overwrite").parquet(sys.argv[1])
s.stop()
EOF

"$SUBMIT" --master "$MASTER" --py-files "$WORK/spidey.zip" \
    --conf spark.sql.shuffle.partitions=8 \
    "$WORK/gen.py" "$WORK/corpus" 2>/dev/null
"$SUBMIT" --master "$MASTER" --py-files "$WORK/spidey.zip" \
    --conf spark.sql.shuffle.partitions=8 \
    "$WORK/driver.py" build --input "$WORK/corpus" --output "$WORK/idx" \
    --profile code --seg-bits 8 --n-buckets 8 2>/dev/null | tail -1
"$SUBMIT" --master "$MASTER" --py-files "$WORK/spidey.zip" \
    --conf spark.sql.shuffle.partitions=8 \
    "$WORK/driver.py" query --index "$WORK/idx" --q "merge sort" --k 3 \
    2>/dev/null | tail -3
echo "SUBMIT SMOKE OK"
