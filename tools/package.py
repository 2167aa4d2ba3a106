"""Build the --py-files artifact for spark-submit deployment.

    python tools/package.py            -> dist/glinerswift_spark.zip

Deploy (north-star shape):

    spark-submit \
      --py-files dist/glinerswift_spark.zip \
      --files model/manifest.json,model/weights.bin \
      jobs/run_kg.py --input s3://bucket/pages --output s3://bucket/kg
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "glinerswift_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "glinerswift_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
