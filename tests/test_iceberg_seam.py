"""Iceberg backend seam: jar detection, routing, and (jar-present only)
the real catalog path. In this sandbox the jar is absent, so the REAL
Iceberg write is skipped — but the seam's selection logic is fully
exercised: emulated by default, Iceberg when the probe + catalog say so,
loud error when an Iceberg-written archive meets a catalog-less session."""

import os
import shutil
import tempfile

import pandas as pd
import pytest

from tstore_spark.model.descriptor import TableDescriptor
from tstore_spark.model.tslong import TSLong
from tstore_spark.sources import archive as A
from tstore_spark.sources import iceberg_archive as IA


def _tiny_tslong(spark):
    pdf = pd.DataFrame(
        {
            "url": ["a", "a", "b", "b"],
            "warc_ts": pd.date_range("2024-02-01", periods=4, freq="h"),
            "text": ["t1", "t2", "t3", "t4"],
        }
    ).astype({"warc_ts": "datetime64[us]"})
    d = TableDescriptor("url", "warc_ts", {"content": ["text"]}, [], ["day"])
    return TSLong(spark.createDataFrame(pdf), d)


def test_jar_absent_in_sandbox_and_env_overrides(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ICEBERG", raising=False)
    assert IA.iceberg_jar_present() is False  # sandbox reality
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG", "1")
    assert IA.iceberg_jar_present() is True
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG", "0")
    assert IA.iceberg_jar_present() is False


def test_enabled_requires_jar_and_catalog(spark, monkeypatch):
    # jar absent -> disabled regardless of session conf
    monkeypatch.delenv("SPARK_GRAFT_ICEBERG", raising=False)
    assert IA.iceberg_enabled(spark) is False
    # jar "present" (forced) but session has no catalog conf -> still
    # disabled: a plain session must keep the emulated path
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG", "1")
    assert IA.iceberg_enabled(spark) is False


def test_write_routes_emulated_by_default(spark, tmp_path):
    base = str(tmp_path / "arch")
    A.write_archive(_tiny_tslong(spark), base, num_buckets=2)
    assert os.path.isdir(os.path.join(base, "pages"))  # emulated layout
    _, _, meta = A.read_metadata_all(base)
    assert meta.get("backend") != "iceberg"
    out = A.open_archive(spark, base)
    assert out.df.count() == 4


def test_write_routes_iceberg_when_enabled(spark, tmp_path, monkeypatch):
    """Code-path selection: with the seam forced on, write_archive must
    dispatch to the Iceberg writer (recorded via monkeypatch — no real
    catalog exists in this sandbox)."""
    calls = {}

    def fake_enabled(s):
        return True

    def fake_write(tslong, base_dir, attrs, num_buckets, mode,
                   check_static_uniqueness, stats_columns):
        calls["write"] = dict(base_dir=base_dir, num_buckets=num_buckets, mode=mode)

    monkeypatch.setattr(IA, "iceberg_enabled", fake_enabled)
    monkeypatch.setattr(IA, "write_archive_iceberg", fake_write)
    base = str(tmp_path / "arch_ice")
    A.write_archive(_tiny_tslong(spark), base, num_buckets=4, mode="overwrite")
    assert calls["write"] == dict(base_dir=base, num_buckets=4, mode="overwrite")
    # nothing written by the emulated path
    assert not os.path.isdir(os.path.join(base, "pages"))


def test_open_iceberg_archive_without_catalog_is_loud(spark, tmp_path):
    """An archive stamped backend=iceberg opened by a catalog-less session
    must raise, never silently fall back to a nonexistent parquet dir."""
    base = str(tmp_path / "arch_stamped")
    d = TableDescriptor("url", "warc_ts", {"content": ["text"]}, [], ["day"])
    A.write_metadata(base, d, 2, extra_meta={"backend": "iceberg"})
    with pytest.raises(ValueError, match="Iceberg"):
        A.open_archive(spark, base)


def test_open_routes_iceberg_when_enabled(spark, tmp_path, monkeypatch):
    calls = {}
    base = str(tmp_path / "arch_open")
    d = TableDescriptor("url", "warc_ts", {"content": ["text"]}, [], ["day"])
    A.write_metadata(base, d, 2, extra_meta={"backend": "iceberg"})

    def fake_open(*a, **k):
        calls["open"] = a[1]
        return "SENTINEL"

    monkeypatch.setattr(IA, "iceberg_enabled", lambda s: True)
    monkeypatch.setattr(IA, "open_archive_iceberg", fake_open)
    got = A.open_archive(spark, base, ids=["a"])
    assert calls["open"] == base
    assert got == "SENTINEL"


def test_table_identifier_stable():
    a = IA.table_identifier("/data/archives/x")
    b = IA.table_identifier("/data/archives/x/")  # trailing slash normalizes
    c = IA.table_identifier("/data/archives/y")
    assert a == b != c
    assert a.startswith("tstore.archive_") and a.endswith(".pages")


@pytest.mark.skipif(not IA.iceberg_jar_present(), reason="no Iceberg runtime jar in this sandbox")
def test_real_iceberg_roundtrip(tmp_path):  # pragma: no cover - jar-present envs only
    """The real path, exercised wherever the runtime jar exists: write via
    the catalog with native hidden partitioning, reopen, filter."""
    from tstore_spark.session import get_spark

    spark = get_spark("iceberg-e2e", extra_conf=IA.catalog_conf(str(tmp_path / "wh")))
    base = str(tmp_path / "arch_real")
    A.write_archive(_tiny_tslong(spark), base, num_buckets=2)
    _, _, meta = A.read_metadata_all(base)
    assert meta["backend"] == "iceberg"
    out = A.open_archive(spark, base, ids=["a"])
    assert out.df.count() == 2


def test_golden_writeto_statement_chain(spark, tmp_path, monkeypatch):
    """Round 5 GOLDEN CONTRACT: record the exact writeTo call sequence the
    seam emits through a fake writer, so a future environment with the real
    runtime jar can diff actual behavior against this recorded chain (the
    sandbox has no jar; routing alone proved selection, not the statements).
    """
    from pyspark.sql import DataFrame

    calls = {}

    class FakeWriter:
        def __init__(self, df, ident):
            calls["identifier"] = ident
            calls["fact_columns"] = list(df.columns)

        def partitionedBy(self, *cols):
            # Column reprs like Column<'days(warc_ts)'> -> days(warc_ts)
            calls["partitioned_by"] = [
                str(c).split("'")[1] if "'" in str(c) else str(c) for c in cols
            ]
            return self

        def createOrReplace(self):
            calls["terminal"] = "createOrReplace"

        def append(self):
            calls["terminal"] = "append"

    # patch the CONCRETE class (pyspark.sql.classic overrides writeTo)
    monkeypatch.setattr(
        type(_tiny_tslong(spark).df), "writeTo",
        lambda self, ident: FakeWriter(self, ident),
    )

    base = str(tmp_path / "golden_arch")
    tl = _tiny_tslong(spark)
    IA.write_archive_iceberg(
        tl, base, num_buckets=2, stats_columns={"text_len": __import__("pyspark.sql.functions", fromlist=["length"]).length("text")}
    )

    import hashlib

    tag = hashlib.md5(os.path.abspath(base).encode()).hexdigest()[:12]
    # --- the recorded golden chain ---
    assert calls["identifier"] == f"tstore.archive_{tag}.pages"
    assert calls["fact_columns"] == ["url", "warc_ts", "text", "text_len"]
    assert calls["partitioned_by"] == ["days(warc_ts)", "bucket(2, url)"]
    assert calls["terminal"] == "createOrReplace"

    # append mode terminates with append() on the same chain
    IA.write_archive_iceberg(tl, base, num_buckets=2, mode="append")
    assert calls["terminal"] == "append"
    assert calls["partitioned_by"] == ["days(warc_ts)", "bucket(2, url)"]

    # descriptor metadata rides NEXT TO the warehouse path with the backend
    # marker + table identity (read_metadata_all keeps working identically)
    d, nb, meta = A.read_metadata_all(base)
    assert meta["backend"] == "iceberg"
    assert meta["iceberg_table"] == f"tstore.archive_{tag}.pages"
    assert nb == 2 and d.time_var == "warc_ts" and d.id_var == "url"


def test_golden_open_reads_recorded_table_identity(spark, tmp_path, monkeypatch):
    """The read side resolves the SAME identifier the write recorded into
    metadata (spark.table faked to return a real frame so the time/id
    filters run for real downstream)."""
    from pyspark.sql import DataFrame, functions as F

    base = str(tmp_path / "golden_arch2")
    tl = _tiny_tslong(spark)

    class FakeWriter:
        def __init__(self, df, ident):
            pass

        def partitionedBy(self, *cols):
            return self

        def createOrReplace(self):
            pass

        def append(self):
            pass

    monkeypatch.setattr(
        type(tl.df), "writeTo", lambda self, ident: FakeWriter(self, ident)
    )
    IA.write_archive_iceberg(tl, base, num_buckets=2)

    seen = {}
    real_frame = tl.df

    def fake_table(ident):
        seen["identifier"] = ident
        return real_frame

    monkeypatch.setattr(spark, "table", fake_table)
    out = IA.open_archive_iceberg(
        spark, base, start_time="2024-02-01 01:00:00", end_time="2024-02-01 02:00:00"
    )
    import hashlib

    tag = hashlib.md5(os.path.abspath(base).encode()).hexdigest()[:12]
    assert seen["identifier"] == f"tstore.archive_{tag}.pages"
    # the time filter really applied over the faked table
    assert out.df.count() == 2
