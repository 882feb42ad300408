"""Capture .explain('formatted') for named queries into plans/r06/."""
import io, os, sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
import bench
import __spark_entry__ as entry_mod

suffix = sys.argv[1]            # 'before' / 'after'
names = sys.argv[2:]
spark = bench._session(32, "cap-plans")
qs = entry_mod.queries()
os.makedirs("/root/repo/plans/r06", exist_ok=True)
for name in names:
    df = qs[name](spark, bench.SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"/root/repo/plans/r06/{name}_{suffix}.txt", "w") as f:
        f.write(buf.getvalue())
    print("captured", name, suffix)
spark.stop()
