#!/usr/bin/env bash
# M7 packaging: build the --py-files artifact and show the spark-submit line.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pneuma_treatment_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/pneuma_treatment_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("pneuma_treatment_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/pneuma_treatment_spark.zip")
EOF
cat <<'USAGE'
Run on a cluster:
  spark-submit \
    --py-files dist/pneuma_treatment_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    jobs/rollup_job.py --workdir <table-root> --n-convs 100000
USAGE
