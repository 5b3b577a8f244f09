"""The no-Spark local runner (U4): the reference's pandas runner
surface re-expressed on DuckDB + pandas.

The reference ships a second execution backend for environments
without a Spark cluster — k8s jobs run SQL transformations through
pandasql over pandas frames and DF transformations by unpickling a
function and applying it to the loaded sources
(provider/scripts/k8s/offline_store_pandas_runner.py:251-380). This
module provides that contract:

- sources (parquet or csv paths) bind as ``source_0..N`` in
  first-appearance order — the same convention the Spark engine and
  the reference runner share (plans/templates.py), so ONE
  transformation string runs on either backend;
- SQL executes in DuckDB rather than pandasql's SQLite: a real
  vectorized OLAP dialect that agrees with the Spark engine on the
  suite's semantics (the driver's correctness oracle is DuckDB for
  exactly this reason);
- DF transformations accept a callable or the dill-pickled transport
  blob the registry ships cross-process (plans/transport.py), applied
  to pandas frames;
- output lands as a timestamped parquet file under the output dir and
  the path is returned, mirroring the reference's
  ``{output_uri}/{datetime}.parquet`` layout.

Scale note: this is the SMALL-data path by design (the reference uses
it for jobs that don't warrant a cluster); the Spark engine remains
the data-plane for everything else. Equivalence between the two
backends on identical inputs is pinned in tests/test_local_runner.py.
"""

from __future__ import annotations

import datetime
import os
from typing import Callable

from featureform_spark.plans.templates import substitute_template


def _load_frame(path: str):
    import pandas as pd

    if path.endswith(".csv"):
        return pd.read_csv(path)
    return pd.read_parquet(path)


def _write_output(df, output_dir: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")
    out = os.path.join(output_dir, f"{stamp}.parquet")
    df.to_parquet(out)
    return out


def execute_sql_job(
    output_dir: str, transformation: str, sources: list[str]
) -> str:
    """SQL transformation without Spark: bind each source as
    ``source_i``, run in DuckDB, write timestamped parquet
    (reference execute_sql_job, offline_store_pandas_runner.py:251-300).
    ``transformation`` may use either the pre-substituted ``source_i``
    form the coordinator ships or ``{{name.variant}}`` templates
    (then refs bind positionally)."""
    import duckdb

    if "{{" in transformation:
        transformation, _refs = substitute_template(transformation)
    con = duckdb.connect()
    frames = {}
    for i, src in enumerate(sources):
        frames[f"source_{i}"] = _load_frame(src)
        con.register(f"source_{i}", frames[f"source_{i}"])
    out = con.execute(transformation).df()
    return _write_output(out, output_dir)


def execute_df_job(
    output_dir: str,
    transformation: Callable | bytes,
    sources: list[str],
) -> str:
    """DF transformation without Spark: load sources as pandas frames,
    apply the function — given directly or as the dill transport blob
    the registry ships (plans/transport.py) — and write timestamped
    parquet (reference execute_df_job,
    offline_store_pandas_runner.py:303-380)."""
    if isinstance(transformation, (bytes, bytearray)):
        from featureform_spark.plans.transport import load_function

        fn = load_function(bytes(transformation))
    else:
        fn = transformation
    frames = [_load_frame(s) for s in sources]
    out = fn(*frames)
    return _write_output(out, output_dir)
