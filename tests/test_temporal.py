"""asof_join unit semantics: inclusive backward match, forward direction,
no-match NULLs, per-key isolation."""

from document_parser_spark.operators.temporal import asof_join


def test_asof_backward_inclusive_and_nulls(spark):
    probe = spark.createDataFrame(
        [(1, 5, "p1"), (1, 10, "p2"), (1, 20, "p3"), (2, 7, "p4")],
        ["k", "ts", "tag"],
    )
    build = spark.createDataFrame(
        [(1, 10, "b10"), (1, 15, "b15"), (3, 1, "bx")], ["k", "ts", "val"]
    )
    out = {
        r["tag"]: r["asof_val"]
        for r in asof_join(probe, build, ["k"], "ts", ["val"]).collect()
    }
    assert out == {"p1": None, "p2": "b10", "p3": "b15", "p4": None}


def test_asof_forward(spark):
    probe = spark.createDataFrame([(1, 5, "p1"), (1, 16, "p2")], ["k", "ts", "tag"])
    build = spark.createDataFrame([(1, 10, "b10"), (1, 15, "b15")], ["k", "ts", "val"])
    out = {
        r["tag"]: r["asof_val"]
        for r in asof_join(probe, build, ["k"], "ts", ["val"], direction="forward").collect()
    }
    assert out == {"p1": "b10", "p2": None}
