#!/usr/bin/env bash
# North-rule delivery mode: the engine packaged as --py-files and the scaling
# job launched through spark-submit (BASELINE.json: "run via spark-submit
# --py-files on a multi-executor cluster at two cluster sizes").
# Usage: SPARK_GRAFT_CPUS=16 scripts/submit_scaling.sh
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=/tmp/avgdist_rs_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/avgdist_rs_spark.zip", "w") as z:
    for root, _, files in os.walk("avgdist_rs_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --py-files "$ZIP" \
  scripts/scaling_bench.py
