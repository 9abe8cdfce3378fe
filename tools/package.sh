#!/bin/sh
# Build dist/informers_spark.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/informers_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/informers_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, names in os.walk("informers_spark"):
        if "__pycache__" in root:
            continue
        for n in names:
            if n.endswith(".py"):
                z.write(os.path.join(root, n))
print("dist/informers_spark.zip")
EOF
