"""Oracle-typing lint: every ``oracle_sql()`` entry must plan in DuckDB
with driver-hashable output types.

Round 8 shipped two driver hash-reds that were value-identical but typed
wrong (ORACLE.md rules 3 and 8): an uncast ``sum(BIGINT)`` (DuckDB
HUGEINT renders ``13042561.0`` via pandas float against Spark's long)
and an int32 Spark column against a BIGINT oracle. This lint makes the
first class impossible to ship: it binds every oracle against the
sf0.001 views — no execution, schema only — and rejects any output
column whose DuckDB type is HUGEINT or unsigned (types pandas coerces to
float/object, which the driver's dtype-sensitive hash never matches).

The second class (Spark-side width drift) is covered by the
``dtype_mismatches`` comparison now wired into ``tools/check_oracle.py``,
which this module also unit-tests against the exact round-8 failures.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import canon_duck_type, canon_spark_type, dtype_mismatches

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FORBIDDEN = {"int128", "uint8", "uint16", "uint32", "uint64"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_oracle_output_type_is_hashable(duck):
    oracles = entrymod.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)  # binds/plans only; .types needs no execution
        hits = [
            f"{c}:{canon_duck_type(t)}"
            for c, t in zip(rel.columns, rel.types)
            if canon_duck_type(t) in FORBIDDEN
        ]
        if hits:
            bad[name] = hits
    assert not bad, (
        "oracle columns with non-driver-hashable DuckDB types "
        f"(cast them, e.g. CAST(sum(x) AS BIGINT) per ORACLE.md rule 8): {bad}"
    )


def test_lint_catches_the_r8_zorder_class(duck):
    # The exact pre-fix round-8 failure: DuckDB sum(BIGINT) -> HUGEINT.
    rel = duck.sql("SELECT sum(l_orderkey) AS sum_key FROM lineitem")
    assert canon_duck_type(rel.types[0]) == "int128"
    fixed = duck.sql(
        "SELECT CAST(sum(l_orderkey) AS BIGINT) AS sum_key FROM lineitem"
    )
    assert canon_duck_type(fixed.types[0]) == "int64"


def test_dtype_mismatch_catches_the_r8_covariance_class():
    # Spark int32 i/j against an oracle BIGINT: value-identical, driver
    # hash-red. The harness must flag it without executing anything.
    diffs = dtype_mismatches(
        [("i", "int"), ("j", "int"), ("cov", "double")],
        ["i", "j", "cov"],
        ["BIGINT", "BIGINT", "DOUBLE"],
    )
    assert diffs == ["i: spark=int32 oracle=int64", "j: spark=int32 oracle=int64"]
    assert not dtype_mismatches(
        [("i", "bigint"), ("cov", "double")], ["i", "cov"], ["BIGINT", "DOUBLE"]
    )


def test_canonical_type_mapping_round_trips_common_pairs():
    pairs = [
        ("bigint", "BIGINT"),
        ("int", "INTEGER"),
        ("double", "DOUBLE"),
        ("string", "VARCHAR"),
        ("boolean", "BOOLEAN"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
        ("array<double>", "DOUBLE[]"),
        ("decimal(12,2)", "DECIMAL(12,2)"),
    ]
    for s, d in pairs:
        assert canon_spark_type(s) == canon_duck_type(d), (s, d)
