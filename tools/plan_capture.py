"""Capture .explain('formatted') for every registered query into
plans/<tag>/<name>_<suffix>.txt (r13 optimization-round evidence).

Runs under the BENCH session profile (the perf-relevant one) against the
bench's re-chunked layout, so the captured scan shapes are the ones the
timed runs execute. Usage:

    python tools/plan_capture.py r13 before [name ...]

With no names, captures every registered query. Plan text only — nothing
is executed (except the session-setup layout rewrite bench.py also does).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    from beeper_matric_etl_tool_spark import get_spark, plans
    from bench import _prepare_bench_layout

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    query_dir = _prepare_bench_layout(spark, sf_dir)

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    specs = plans.specs()
    for name, spec in specs.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, query_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture what we can, report the rest
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt)} chars")


if __name__ == "__main__":
    main()
