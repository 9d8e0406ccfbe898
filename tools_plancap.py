#!/usr/bin/env python
"""Capture .explain('formatted') output for named queries into plans/r07/.

Usage: python tools_plancap.py <suffix> query1 query2 ...
Writes plans/r07/<query>_<suffix>.txt
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sharepointcrawler_spark.session import get_spark

    spark = get_spark(app_name="plancap", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    outdir = os.path.join(REPO, "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")


if __name__ == "__main__":
    main()
