"""Declarative data-quality checks (operators/checks.py)."""

import pytest
from pyspark.sql import Row

from ratatool_spark.operators.checks import run_checks


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            Row(id=1, v=5.0, tag="a", fk=10),
            Row(id=2, v=50.0, tag="b", fk=10),    # v out of range
            Row(id=2, v=None, tag="zz", fk=99),   # dup id, null v, bad tag, orphan fk
            Row(id=4, v=1.0, tag="a", fk=None),   # null fk: not an orphan
        ]
    )


@pytest.fixture(scope="module")
def refs(spark):
    return spark.createDataFrame([Row(k=10), Row(k=11)])


def test_checks_exact_violation_counts(spark, dirty, refs):
    out = {r["check_name"]: r for r in run_checks(
        dirty,
        [
            {"kind": "not_null", "col": "v"},
            {"kind": "in_range", "col": "v", "lo": 0.0, "hi": 10.0},
            {"kind": "accepted_values", "col": "tag", "values": ["a", "b"]},
            {"kind": "matches", "col": "tag", "pattern": "^[ab]$"},
            {"kind": "unique", "cols": ["id"]},
            {"kind": "foreign_key", "col": "fk", "ref": refs, "ref_col": "k"},
        ],
    ).collect()}
    assert out["not_null:v"]["n_violations"] == 1
    # in_range: 50.0 out + null v counts as violation → 2
    assert out["in_range:v"]["n_violations"] == 2
    assert out["accepted_values:tag"]["n_violations"] == 1
    assert out["matches:tag"]["n_violations"] == 1
    # unique: both rows with id=2 count
    assert out["unique:id"]["n_violations"] == 2
    # fk: one orphan (99); the null fk row is exempt
    assert out["foreign_key:fk"]["n_violations"] == 1
    assert not out["unique:id"]["passed"]


def test_checks_all_pass(spark, refs):
    clean = spark.createDataFrame([Row(id=1, fk=10), Row(id=2, fk=11)])
    out = run_checks(
        clean,
        [
            {"kind": "not_null", "col": "id"},
            {"kind": "unique", "cols": ["id"]},
            {"kind": "foreign_key", "col": "fk", "ref": refs, "ref_col": "k"},
        ],
    ).collect()
    assert all(r["passed"] for r in out)
    assert len(out) == 3


def test_checks_empty_raises(spark, dirty):
    with pytest.raises(ValueError):
        run_checks(dirty, [])
    with pytest.raises(ValueError):
        run_checks(dirty, [{"kind": "nope", "col": "v"}])


def test_row_checks_single_scan(spark):
    """All row-level checks fuse into one scan + one aggregation."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = run_checks(
        df,
        [
            {"kind": "not_null", "col": "o_orderkey"},
            {"kind": "in_range", "col": "o_totalprice", "lo": 0.0, "hi": 1e9},
            {"kind": "accepted_values", "col": "o_orderstatus",
             "values": ["F", "O", "P"]},
        ],
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan") == 1


def test_observe_checks_batch_rides_existing_action(spark, dirty):
    """Observable metrics: violation counters come back from the caller's
    OWN action — no extra scan/job for monitoring."""
    from ratatool_spark.operators.checks import observe_checks

    out, obs = observe_checks(
        dirty,
        [
            {"kind": "not_null", "col": "v"},
            {"kind": "in_range", "col": "v", "lo": 0.0, "hi": 10.0},
        ],
    )
    n = out.count()  # the caller's action
    m = obs.get
    assert n == 4 and m["rows"] == 4
    assert m["not_null:v"] == 1
    assert m["in_range:v"] == 2


def test_observe_checks_streaming_metrics(spark, tmp_path):
    """Streaming: metrics surface through observedMetrics per batch."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.checks import observe_checks

    src = str(tmp_path / "src")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    out, _ = observe_checks(
        stream, [{"kind": "not_null", "col": "text"}], name="q"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [p.observedMetrics.get("q") for p in q.recentProgress
               if p.observedMetrics.get("q") is not None]
    assert metrics, "no observed metrics surfaced"
    assert sum(m["rows"] for m in metrics) == spark.read.parquet(src).count()
    assert all(m["not_null:text"] == 0 for m in metrics)


def test_observe_checks_rejects_non_row_kinds(spark, dirty):
    from ratatool_spark.operators.checks import observe_checks

    import pytest as _pt
    with _pt.raises(ValueError):
        observe_checks(dirty, [{"kind": "unique", "cols": ["id"]}])


def test_cli_profile_and_run_checks(spark, tmp_path):
    import json

    from ratatool_spark.cli import main

    src = str(tmp_path / "in.parquet")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(src)

    out1 = str(tmp_path / "prof")
    assert main(["profile", "--input", src, "--output", out1,
                 "--columns", "o_orderkey,o_orderstatus"]) == 0
    prof = spark.read.parquet(out1)
    assert prof.count() == 2

    # passing suite → rc 0
    suite = [{"kind": "not_null", "col": "o_orderkey"}]
    cf = tmp_path / "checks.json"
    cf.write_text(json.dumps(suite))
    out2 = str(tmp_path / "rep0")
    assert main(["runChecks", "--input", src, "--checks", str(cf),
                 "--output", out2]) == 0

    # failing suite → rc 1, report still written
    suite = [{"kind": "accepted_values", "col": "o_orderstatus",
              "values": ["NOPE"]}]
    cf.write_text(json.dumps(suite))
    out3 = str(tmp_path / "rep1")
    assert main(["runChecks", "--input", src, "--checks", str(cf),
                 "--output", out3]) == 1
    rep = spark.read.parquet(out3).collect()
    assert len(rep) == 1 and not rep[0]["passed"]
