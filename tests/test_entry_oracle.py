"""Local mirror of the driver's correctness gate.

Runs every entry in the `__spark_entry__.queries()` registry at
sf0.001 and, for oracle-paired entries, the DuckDB SQL over the same
parquet views, comparing with the driver's semantics: row count,
column-name set, and order-insensitive values over name-sorted
columns. Rows-only entries are instead checked for run-to-run
determinism (the weaker check the driver records for them).
"""

import os

import duckdb
import pandas as pd
import pytest

from tlgs_spark.entry_queries import QUERIES

SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason=f"test data not present at {SF_DIR}",
)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_matches_oracle(name, spark, oracle_con):
    from tlgs_spark.entry_queries import resolve_sql

    spec = dict(QUERIES[name])
    spec["sql"] = resolve_sql(spec["sql"], SF_DIR)
    got = spec["fn"](spark, SF_DIR).toPandas()
    assert list(got.columns), f"{name}: no columns"

    if spec["sql"] is None:
        again = spec["fn"](spark, SF_DIR).toPandas()
        a, b = _canon(got), _canon(again)
        assert len(a) == len(b), f"{name}: nondeterministic row count"
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return

    want = oracle_con.execute(spec["sql"]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    a, b = _canon(got), _canon(want)
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b, check_exact=True)
