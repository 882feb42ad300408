"""Build the --py-files zip for spark-submit deployment.

Usage:
    python scripts/package.py [out.zip]
    spark-submit --master <cluster> --py-files mycelium_spark.zip your_job.py

Verified in-sandbox:
    spark-submit --master local[4] --py-files mycelium_spark.zip job.py
runs the full crawl engine from outside the repo directory.
"""

import shutil
import sys
import os

out = sys.argv[1] if len(sys.argv) > 1 else "mycelium_spark.zip"
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
base = out[:-4] if out.endswith(".zip") else out
shutil.make_archive(base, "zip", root, "mycelium_spark")
print(f"{base}.zip")
