"""Branch coverage for sources/iceberg.overwrite_partitions.

The container ships no Iceberg jars, so in every integration test the
probe fails and only the parquet dynamic-partition-overwrite fallback
executes (tests/test_resume.py). These tests drive the Iceberg branch
itself through the writer-V2 call surface with fakes — asserting the
identifier handling and the create-vs-overwrite decision — so the
branch is not dead code in the suite (round-3 verdict item 8). No JVM
involved: the fakes implement exactly the attributes the function
touches.
"""

from ds2_spark.sources import iceberg as ice


class _FakeWriterV2:
    def __init__(self, table, calls):
        self._table = table
        self._calls = calls

    def partitionedBy(self, col):
        self._calls.append(("partitionedBy", str(col)))
        return self

    def createOrReplace(self):
        self._calls.append(("createOrReplace", self._table))

    def overwritePartitions(self):
        self._calls.append(("overwritePartitions", self._table))


class _FakeParquetWriter:
    def __init__(self, calls):
        self._calls = calls

    def mode(self, m):
        self._calls.append(("mode", m))
        return self

    def partitionBy(self, col):
        self._calls.append(("partitionBy", col))
        return self

    def parquet(self, path):
        self._calls.append(("parquet", path))


class _FakeConf:
    def __init__(self, calls):
        self._calls = calls

    def set(self, k, v):
        self._calls.append(("conf", k, v))


class _FakeSpark:
    def __init__(self, table_exists, calls):
        self._exists = table_exists
        self.conf = _FakeConf(calls)
        self.catalog = self

    def tableExists(self, t):
        return self._exists


class _FakeDF:
    def __init__(self, table_exists, calls):
        self.sparkSession = _FakeSpark(table_exists, calls)
        self._calls = calls
        self.write = _FakeParquetWriter(calls)

    def writeTo(self, table):
        return _FakeWriterV2(table, self._calls)

    def __getitem__(self, col):
        return f"col:{col}"


def test_iceberg_branch_creates_missing_table(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
    calls = []
    engine = ice.overwrite_partitions(
        _FakeDF(table_exists=False, calls=calls),
        "/tmp/ckpt", "epoch", table="ckpt.db.stage",
    )
    assert engine == "iceberg"
    assert calls == [
        ("partitionedBy", "col:epoch"),
        ("createOrReplace", "ckpt.db.stage"),
    ]


def test_iceberg_branch_overwrites_existing_partitions(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
    calls = []
    engine = ice.overwrite_partitions(
        _FakeDF(table_exists=True, calls=calls),
        "/tmp/ckpt", "epoch", table="ckpt.db.stage",
    )
    assert engine == "iceberg"
    assert calls == [("overwritePartitions", "ckpt.db.stage")]


def test_no_identifier_uses_parquet_even_with_jars(monkeypatch):
    """`table=None` must take the parquet path regardless of classpath
    (the documented contract: the identifier is required for Iceberg)."""
    monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
    calls = []
    engine = ice.overwrite_partitions(
        _FakeDF(table_exists=True, calls=calls), "/tmp/ckpt", "epoch",
    )
    assert engine == "parquet"
    assert calls == [
        ("conf", "spark.sql.sources.partitionOverwriteMode", "dynamic"),
        ("mode", "overwrite"),
        ("partitionBy", "epoch"),
        ("parquet", "/tmp/ckpt"),
    ]


def test_probe_unavailable_falls_back(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda s: False)
    calls = []
    engine = ice.overwrite_partitions(
        _FakeDF(table_exists=True, calls=calls),
        "/tmp/ckpt", "epoch", table="ckpt.db.stage",
    )
    assert engine == "parquet"
    assert calls[-1] == ("parquet", "/tmp/ckpt")
