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
        if "_build" in root:
            continue  # never ship compiled artifacts; executors build locally
        for f in files:
            # .c: the native kernel source rides along and is compiled on
            # each executor (content-hashed, zip-safe via importlib.resources)
            if f.endswith((".py", ".c")):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
