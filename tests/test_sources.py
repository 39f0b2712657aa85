"""Federated-source fan-out (S3/O1): loader-callable remotes, lazy
invocation, and the remote-limit cap (IdentityMatching.java:1059-1096;
application.yaml remote cap)."""

from identity_matching_spark.sources.tables import union_sources


def _df(spark, tag, n=3):
    return spark.createDataFrame([(tag, i) for i in range(n)], ["src", "v"])


def test_union_sources_accepts_loader_callables(spark):
    calls = []

    def loader(tag):
        def _load():
            calls.append(tag)
            return _df(spark, tag)
        return _load

    out = union_sources(_df(spark, "local"), [loader("r1"), _df(spark, "r2"), loader("r3")])
    srcs = {r["src"] for r in out.select("src").distinct().collect()}
    assert srcs == {"local", "r1", "r2", "r3"}
    assert calls == ["r1", "r3"]


def test_union_sources_never_invokes_loaders_beyond_cap(spark):
    calls = []

    def loader(tag):
        def _load():
            calls.append(tag)
            return _df(spark, tag)
        return _load

    out = union_sources(
        _df(spark, "local"),
        [loader("r1"), loader("r2"), loader("r3"), loader("r4"), loader("r5")],
        remote_limit=2,
    )
    assert out.count() == 9  # local + 2 remotes x 3 rows
    # the capped-out loaders were never called (the reference never calls
    # servers beyond the remote limit either)
    assert calls == ["r1", "r2"]


def test_union_sources_cross_session_remote(spark):
    """A remote loaded in a SEPARATE SparkSession (same context — the
    in-process stand-in for a second warehouse/catalog) participates in
    the capped fan-out."""
    remote_session = spark.newSession()
    out = union_sources(
        _df(spark, "local"),
        [lambda: _df(remote_session, "warehouse2")],
    )
    assert out.count() == 6
    assert {r["src"] for r in out.select("src").distinct().collect()} == {
        "local", "warehouse2"
    }
