#!/usr/bin/env bash
# Evidence for the north_rule's "runs via spark-submit --py-files" clause:
# package crawlspark as a zip and run the BFS crawl through spark-submit at
# two parallelism levels; the order_checksum must be identical (crawl order
# and seen-set do not depend on cluster size).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/crawlspark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/crawlspark.zip", "w") as z:
    for root, _, files in os.walk("crawlspark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "/tmp/crawlspark.zip")
EOF

SF_DIR="${1:-/root/testdata/sf0.001}"
DEPTH="${2:-6}"
for CORES in 2 8; do
  echo "--- spark-submit local[$CORES] ---"
  spark-submit --master "local[$CORES]" \
    --conf spark.sql.shuffle.partitions=$((2 * CORES)) \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    scripts/submit_job.py "$SF_DIR" "$DEPTH" 2>/dev/null | tail -1
done
