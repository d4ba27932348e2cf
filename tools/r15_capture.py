"""Capture plans/r15/<query>_<suffix>.txt — the `.explain("formatted")`
evidence files for the round-15 optimization log (OPTIMIZATION_r15.md).

Usage: python tools/r15_capture.py before|after name [name...]

Writes one file per query at sf0.1. For multi-job rungs (bounded driver
collects / checkpointed iterations — see tools/plan_audit.MULTI_JOB)
the captured plan covers the FINAL job, same convention as PLANS.md.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_spark import registry  # noqa: E402
from weather_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    assert suffix in ("before", "after"), suffix
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"r15-capture-{suffix}")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
