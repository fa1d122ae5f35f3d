"""Data-quality check suite (dataframes_spark/quality.py): one-pass
evaluation, verdicts, and the validate() pipeline gate."""

import pytest
from pyspark.sql import functions as F

from dataframes_spark import quality as Q


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "en"),
            (2, "b@y.org", 20.0, "fr"),
            (3, None, 30.0, "en"),
            (4, "not-an-email", 200.0, "xx"),
            (4, "d@z.net", None, "en"),
        ],
        "id long, email string, score double, lang string",
    )


def test_passing_suite(frame):
    report = Q.run_checks(
        frame,
        [
            Q.row_count(1, 10),
            Q.not_null("email", max_null_fraction=0.25),
            Q.in_range("score", 0, 1000),
            Q.values_in("lang", ["en", "fr", "xx"]),
        ],
    )
    assert all(r["passed"] for r in report)
    assert len(report) == 4


def test_failing_checks_have_observed_detail(frame):
    report = {
        (r["check"], r["column"]): r
        for r in Q.run_checks(
            frame,
            [
                Q.unique("id"),                      # id 4 duplicated
                Q.not_null("email"),                 # one null
                Q.in_range("score", 0, 100),         # 200 out of range
                Q.values_in("lang", ["en", "fr"]),   # 'xx' outside
                Q.matches("email", r"[^@]+@[^@]+\.[a-z]+"),  # one junk
                Q.mean_between("score", 0, 50),      # mean 65
                Q.row_count(10),                     # only 5 rows
            ],
        )
    }
    assert not report[("unique", "id")]["passed"]
    assert "1 duplicates" in report[("unique", "id")]["observed"]
    assert not report[("not_null", "email")]["passed"]
    assert not report[("in_range", "score")]["passed"]
    assert "1 out of range" in report[("in_range", "score")]["observed"]
    assert not report[("values_in", "lang")]["passed"]
    assert not report[("matches", "email")]["passed"]
    assert not report[("mean_between", "score")]["passed"]
    assert not report[("row_count", "*")]["passed"]


def test_validate_raises_with_all_failures(frame):
    with pytest.raises(ValueError) as e:
        Q.validate(frame, [Q.unique("id"), Q.row_count(10)])
    msg = str(e.value)
    assert "unique(id)" in msg and "row_count(*)" in msg


def test_single_aggregation_for_whole_suite(frame, monkeypatch):
    # the entire suite compiles into ONE .agg(...) call (one job)
    # Spark 4: pyspark.sql.DataFrame is abstract; patch the concrete class
    cls = type(frame)
    calls = []
    orig = cls.agg

    def counting_agg(self, *a, **kw):
        calls.append(len(a))
        return orig(self, *a, **kw)

    monkeypatch.setattr(cls, "agg", counting_agg)
    Q.run_checks(
        frame,
        [Q.row_count(1), Q.not_null("email", 1.0), Q.in_range("score", 0, 1000), Q.unique("id")],
    )
    assert calls == [5]  # one agg carrying every check's expressions


def test_empty_frame_checks(spark):
    df = spark.createDataFrame([], "id long, v double")
    report = {r["check"]: r for r in Q.run_checks(df, [Q.row_count(0, 0), Q.not_null("v")])}
    assert report["row_count"]["passed"]
    assert report["not_null"]["passed"]


def test_check_report_frame(frame):
    rep = Q.check_report(frame, [Q.row_count(1), Q.unique("id")])
    assert rep.columns == ["check", "column", "passed", "observed", "expected"]
    assert rep.count() == 2


def test_empty_frame_range_and_set_checks_vacuously_true(spark):
    # F.sum over zero rows is NULL; the checks must coalesce it to 0 —
    # an empty micro-batch killed a raise-mode stream gate otherwise
    df = spark.createDataFrame([], "id long, v double, lang string")
    report = {r["check"]: r for r in Q.run_checks(
        df, [Q.in_range("v", 0, 100), Q.values_in("lang", ["en"])]
    )}
    assert report["in_range"]["passed"]
    assert report["values_in"]["passed"]


def test_matches_and_mean_vacuous_on_empty(spark):
    df = spark.createDataFrame([], "s string, v double")
    report = {r["check"]: r for r in Q.run_checks(
        df, [Q.matches("s", r"[a-z]+"), Q.mean_between("v", 0, 1)]
    )}
    assert report["matches"]["passed"]
    assert report["mean_between"]["passed"]
    assert report["matches"]["observed"] == "no values"


def test_unique_approx_mode(spark):
    # a truly-unique column passes the approx gate; a ~50%-duplicate
    # column fails it (dup mass far beyond the 3*rsd error band); exact
    # mode still reports the precise duplicate count alongside
    df = spark.createDataFrame([(i, i // 2) for i in range(1000)], ["id", "half"])
    rep = {
        (r["check"], r["column"]): r
        for r in Q.run_checks(
            df,
            [Q.unique("id", approx=True), Q.unique("half", approx=True), Q.unique("half")],
        )
    }
    assert rep[("unique_approx", "id")]["passed"]
    assert not rep[("unique_approx", "half")]["passed"]
    assert "rsd" in rep[("unique_approx", "half")]["expected"]
    assert "500 duplicates" in rep[("unique", "half")]["observed"]


def test_unique_approx_empty_vacuously_true(spark):
    df = spark.createDataFrame([], "id long")
    assert Q.run_checks(df, [Q.unique("id", approx=True)])[0]["passed"]
