#!/bin/sh
# Package the engine for spark-submit --py-files distribution.
# Usage: scripts/make_pyfiles_zip.sh [out.zip]
set -e
OUT="${1:-/tmp/rust_geo_booleanop_spark.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
python - "$OUT" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("rust_geo_booleanop_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
