#!/usr/bin/env bash
# Launch the bench exactly as the north rule prescribes: spark-submit with the
# engine shipped via --py-files (BASELINE.json:14).  On a real cluster swap
# --master local[N] for the cluster master URL; everything else is identical.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=.cache/jsonschema_jl_spark.zip
mkdir -p .cache
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile(".cache/jsonschema_jl_spark.zip", "w") as z:
    for root, _, files in os.walk("jsonschema_jl_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

CPUS="${SPARK_GRAFT_CPUS:-32}"
exec spark-submit \
  --master "local[${CPUS}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$((CPUS * 2))" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.ui.showConsoleProgress=false \
  bench.py
