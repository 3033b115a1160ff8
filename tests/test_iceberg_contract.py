"""Iceberg-branch behavior pin (catalog.py): no Iceberg jars exist in this
sandbox (``iceberg_available`` is False), so the ``iceberg:`` code paths can
never run for real here. These contract tests monkeypatch the DataFrame /
reader seams and assert the EXACT calls the branch makes — the behavior is
pinned even though the connector is unreachable offline (SURVEY §7
degradation path: parquet mode carries the same semantics and is fully
exercised elsewhere)."""

from __future__ import annotations

from tika_wrap_spark import catalog


def _df_cls(spark):
    # Spark 4: the classic DataFrame subclass overrides writeTo — patch the
    # concrete class an actual df instance has
    return type(spark.range(1))


def test_iceberg_not_available_in_sandbox(spark):
    # documented-unreachable: the gate itself must say so
    assert catalog.iceberg_available(spark) is False


class _FakeWriterV2:
    def __init__(self, calls: dict, table: str) -> None:
        self._calls = calls
        self._calls["table"] = table

    def overwritePartitions(self) -> None:
        self._calls["overwritePartitions"] = True

    def append(self) -> None:
        self._calls["append"] = True


def test_overwrite_partitions_iceberg_calls_writeto_overwrite(spark, monkeypatch):
    """iceberg: locations must use the DataFrameWriterV2
    ``writeTo(table).overwritePartitions()`` — the Iceberg dynamic-overwrite
    idempotent-write semantics the parquet branch mirrors with
    partitionOverwriteMode=dynamic."""
    calls: dict = {}
    monkeypatch.setattr(
        _df_cls(spark), "writeTo", lambda self, tbl: _FakeWriterV2(calls, tbl), raising=True
    )
    catalog.overwrite_partitions(spark.range(3), "iceberg:db.extracted", ["part_key"])
    assert calls == {"table": "db.extracted", "overwritePartitions": True}


def test_append_table_iceberg_calls_writeto_append(spark, monkeypatch):
    calls: dict = {}
    monkeypatch.setattr(
        _df_cls(spark), "writeTo", lambda self, tbl: _FakeWriterV2(calls, tbl), raising=True
    )
    catalog.append_table(spark.range(3), "iceberg:db.lineage")
    assert calls == {"table": "db.lineage", "append": True}


def test_read_table_iceberg_uses_iceberg_source(spark, monkeypatch):
    calls: dict = {}

    class _FakeReader:
        def format(self, fmt: str):
            calls["format"] = fmt
            return self

        def load(self, path: str):
            calls["path"] = path
            return "sentinel-df"

    monkeypatch.setattr(
        type(spark), "read", property(lambda self: _FakeReader()), raising=True
    )
    out = catalog.read_table(spark, "iceberg:db.extracted")
    assert out == "sentinel-df"
    assert calls == {"format": "iceberg", "path": "db.extracted"}


def test_parquet_paths_never_touch_iceberg_branch(spark, tmp_path, monkeypatch):
    """Plain paths must not construct a V2 writer at all."""
    def _boom(self, tbl):  # noqa: ANN001
        raise AssertionError("writeTo must not be called for parquet locations")

    monkeypatch.setattr(_df_cls(spark), "writeTo", _boom, raising=True)
    loc = str(tmp_path / "plain")
    catalog.append_table(spark.range(3).withColumnRenamed("id", "doc_id"), loc)
    assert catalog.read_table(spark, loc).count() == 3
