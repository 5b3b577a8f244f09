"""Dump .explain('formatted') for named suite queries to plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> <query> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt for each
(round defaults to r13).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from featureform_spark.session import get_spark
    from featureform_spark.suite import all_queries

    spark = get_spark("featureform_spark_plans")
    qs = all_queries()
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the AQE-final plan (ReusedExchange, coalesced reads, runtime
        # join rewrites) only exists after execution of THIS DataFrame's
        # own QueryExecution — collect() executes it; a count() would
        # plan a different query and leave this one unexecuted
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        (out_dir / f"{name}_{suffix}.txt").write_text(
            plan
            + "\n\n== Executed (AQE-final) Plan ==\n"
            + final
        )
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython, "
              f"{plan.count('ArrowEvalPython')} ArrowEvalPython, "
              f"{final.count('ReusedExchange')} ReusedExchange(final), "
              f"{len(plan.splitlines())} lines")


if __name__ == "__main__":
    main()
