"""IO: catalog/resolver, readers, writers, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from uofi_payroll_etl_main_demo_spark.io import (
    build_file_inventory,
    read_csv,
    read_parquet_table,
    read_tables,
    resolve_source,
    write_csv,
    write_parquet,
)
from uofi_payroll_etl_main_demo_spark.io.writers import date_stamped_name


def test_inventory_and_resolver(spark, sf_dir):
    inv = build_file_inventory(spark, sf_dir)
    assert inv.count() == 10
    assert set(inv.columns) >= {"file_name", "file_path", "extension", "size_bytes"}
    hit = resolve_source(inv, name_contains="LINE", extensions=[".parquet"])
    assert hit and hit.endswith("lineitem.parquet")
    assert resolve_source(inv, name_contains="zzz-missing") is None
    regex_hit = resolve_source(inv, name_regex=r"^ord.*\.parquet$")
    assert regex_hit and regex_hit.endswith("orders.parquet")


def test_read_tables(spark, sf_dir):
    tables = read_tables(spark, sf_dir, ["region", "nation"])
    assert tables["region"].count() == 5
    assert tables["nation"].count() == 25


def test_events_nanos_timestamp(spark, sf_dir):
    ev = read_parquet_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "out_csv")
    write_csv(df, path, single_file=True)
    back = read_csv(spark, path)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id int, part string"
    )
    path = str(tmp_path / "out_parquet")
    write_parquet(df, path, partition_by=["part"])
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning: reading one partition only touches its files
    assert back.filter(F.col("part") == "a").count() == 2


def test_jsonl_roundtrip(spark, tmp_path):
    from uofi_payroll_etl_main_demo_spark.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", None)],
        "id bigint, name string, vec array<double>",
    )
    path = str(tmp_path / "out_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    assert sorted(
        (r["id"], r["name"], r["vec"]) for r in back.collect()
    ) == [(1, "a", [1.0, 2.0]), (2, "b", None)]


def test_write_partitioned_sorted_layout(spark, tmp_path):
    """One file per partition dir; rows sorted within each file (parquet
    row-group stats usable for pruning)."""
    import glob

    from uofi_payroll_etl_main_demo_spark.io import write_partitioned_sorted

    df = spark.createDataFrame(
        [(p, i * 37 % 100, f"r{i}") for p in ("a", "b") for i in range(50)],
        "part string, k int, v string",
    )
    path = str(tmp_path / "psorted")
    write_partitioned_sorted(df, path, partition_by=["part"], sort_by=["k"])
    for p in ("a", "b"):
        files = glob.glob(f"{path}/part={p}/*.parquet")
        assert len(files) == 1
        import pyarrow.parquet as pq

        ks = pq.read_table(files[0], columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)
    back = spark.read.parquet(path)
    assert back.count() == 100


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """Ingesting an evolved schema: mergeSchema widens the parquet read
    across generations; unionByName(allowMissingColumns) aligns frames
    — the two tools that keep a long-lived table readable after columns
    are added."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id bigint, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    )
    v1.write.parquet(f"{path}/gen=1")
    v2.write.parquet(f"{path}/gen=2")
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}  # old rows null-fill the new column
    from uofi_payroll_etl_main_demo_spark.operators import union_by_name

    u = union_by_name(v1, v2)
    assert u.count() == 2 and "score" in u.columns


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import glob

    from uofi_payroll_etl_main_demo_spark.io import compact_parquet

    path = str(tmp_path / "fragmented")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)  # 40 tiny files
    assert len(glob.glob(f"{path}/*.parquet")) == 40
    n_files = compact_parquet(spark, path, target_file_mb=128)
    assert n_files == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))


def test_python_datasource_synthetic_docs(spark):
    """Python Data Source API connector: registered format, partition
    fan-out honored, deterministic under any parallelism."""
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.io.datasources import (
        HAS_PYTHON_DATASOURCE,
        SyntheticDocsDataSource,
    )

    if not HAS_PYTHON_DATASOURCE:
        _pytest.skip("Python DataSource API needs Spark 4+")
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 2000)
        .option("partitions", 8)
        .load()
    )
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 8
    assert df.columns == ["doc_id", "text", "lang", "source"]
    # content is a function of doc_id alone, not of partitioning
    df3 = (
        spark.read.format("synthetic_docs")
        .option("n", 2000)
        .option("partitions", 3)
        .load()
    )
    assert df.exceptAll(df3).count() == 0 and df3.exceptAll(df).count() == 0
    # the generated corpus feeds the engine's text operators directly
    from uofi_payroll_etl_main_demo_spark.ext.textstats import document_stats

    assert document_stats(df).count() == 2000


def test_date_stamped_name():
    from datetime import datetime

    assert date_stamped_name("rpt", "csv", datetime(2026, 8, 13)) == "rpt_08132026.csv"


def test_excel_roundtrip(spark, tmp_path):
    # runs with or without openpyxl: the bridge falls back to the
    # pure-stdlib SpreadsheetML reader/writer (io/xlsx_lite.py)
    from uofi_payroll_etl_main_demo_spark.io import read_excel, write_excel

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b & <c>", None)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "wb.xlsx")
    write_excel(df, path)
    back = read_excel(spark, path)
    rows = {int(r["id"]): r for r in back.collect()}
    assert rows[1]["name"] == "a" and float(rows[1]["score"]) == 1.5
    assert rows[2]["name"] == "b & <c>"
    assert rows[2]["score"] is None or rows[2]["score"] != rows[2]["score"]


def test_xlsx_lite_roundtrip_and_types(tmp_path):
    from uofi_payroll_etl_main_demo_spark.io.xlsx_lite import (
        read_xlsx,
        write_xlsx,
    )

    rows = [
        ["id", "name", "ok", "score"],
        [1, "héllo <&> \"quoted\"", True, 2.25],
        [2, None, False, -0.5],
    ]
    path = str(tmp_path / "lite.xlsx")
    write_xlsx(rows, path)
    back = read_xlsx(path)
    assert back[0] == ["id", "name", "ok", "score"]
    assert back[1] == [1.0, 'héllo <&> "quoted"', True, 2.25]
    assert back[2] == [2.0, None, False, -0.5]
    # sheet selection by name + missing sheet error
    assert read_xlsx(path, "Sheet1") == back
    with pytest.raises(ValueError):
        read_xlsx(path, "NoSuchSheet")


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=12, payload_bytes=64)
    feats = extract_features(media, feature_dim=4)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert r["n_bytes"] == 64
        assert len(r["feature"]) == 4
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # normalized histogram


def test_multimodal_decode_stub_raises(spark):
    media = synthetic_media(spark, n=2)
    with pytest.raises(Exception) as ei:
        extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=12)
    plan = frame_sample_plan(media, every_ms=500)
    assert plan.columns == ["media_id", "frame_ms"]
    videos = plan.select("media_id").distinct().count()
    assert videos > 0


def test_audio_decode_real_wav_features(spark):
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_features,
        synthetic_av_media,
    )
    import pyspark.sql.functions as F

    media = synthetic_av_media(spark, n=8).filter(
        F.col("meta.mime") == "audio/wav"
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert len(rows) == 4
    for i, r in rows.items():
        freq = 440.0 * (1 + (i // 2) % 8)
        assert r["sample_rate"] == 8000
        assert r["duration_ms"] == pytest.approx(250.0, abs=1.0)
        # pure sine: RMS = amp/sqrt(2), centroid at the tone frequency
        assert r["rms"] == pytest.approx(0.5 / 2**0.5, rel=1e-3)
        assert r["spectral_centroid_hz"] == pytest.approx(freq, rel=0.05)
        # zero crossings of a sine: 2*freq per second
        assert r["zero_cross_rate"] * 8000 == pytest.approx(
            2 * freq, rel=0.05
        )


def test_image_decode_real_ppm_features(spark):
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_features,
        synthetic_av_media,
    )
    import pyspark.sql.functions as F

    media = synthetic_av_media(spark, n=8).filter(
        F.col("meta.modality") == "image"
    )
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(rows) == 4
    for i, r in rows.items():
        assert (r["width"], r["height"]) == (16, 12)
        # top half red 200 -> mean_r = 100 exactly; green all zero
        assert r["mean_r"] == pytest.approx(100.0)
        assert r["mean_g"] == 0.0
        blue = 100 + (i % 5) * 20
        assert r["mean_b"] == pytest.approx(blue / 2)
        assert len(r["thumb4"]) == 16
        # top-left thumb block is pure red stripe: gray = 200/3
        assert r["thumb4"][0] == pytest.approx(200 / 3, rel=1e-4)


def test_wav_ppm_roundtrip_exact():
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_ppm,
        decode_wav,
        ppm_bytes,
        wav_bytes,
    )

    x = np.linspace(-1, 1, 1001)
    got, sr = decode_wav(wav_bytes(x, 22050))
    assert sr == 22050 and got.size == x.size
    assert np.abs(got - x).max() < 1 / 32767 * 1.01  # 16-bit quantization
    px = (np.arange(5 * 7 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    assert (decode_ppm(ppm_bytes(px)) == px).all()


def test_jsonl_source_analytics_parity(spark, sf_dir, tmp_path):
    """Cross-format consistency: the JSONL source must feed the
    analytics stack identically to parquet — doc stats computed over a
    documents roundtrip through JSONL equal the parquet-sourced result
    row for row."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import document_stats
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_jsonl,
        read_parquet_table,
    )
    from uofi_payroll_etl_main_demo_spark.io.writers import write_jsonl

    docs = read_parquet_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema=docs.schema)

    def stats(df):
        out = document_stats(df).select("doc_id", "n_tokens", "n_chars")
        return sorted(tuple(r) for r in out.collect())

    assert stats(back) == stats(docs)
    assert back.count() == docs.count()


def test_orc_source_analytics_parity(spark, sf_dir, tmp_path):
    """Cross-format consistency: ORC roundtrip feeds the analytics
    stack identically to parquet, and the ORC scan prunes columns +
    pushes filters like the parquet one."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import document_stats
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_orc,
        read_parquet_table,
    )
    from uofi_payroll_etl_main_demo_spark.io.writers import write_orc

    docs = read_parquet_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)

    def stats(df):
        out = document_stats(df).select("doc_id", "n_tokens", "n_chars")
        return sorted(tuple(r) for r in out.collect())

    assert stats(back) == stats(docs)
    assert back.count() == docs.count()
    # scan posture: filter + projection reach the ORC scan
    plan = (
        back.filter(F.col("doc_id") < 10)
        .select("doc_id")
        ._sc._jvm.PythonSQLUtils.explainString(
            back.filter(F.col("doc_id") < 10)
            .select("doc_id")
            ._jdf.queryExecution(),
            "formatted",
        )
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in plan
    assert "struct<doc_id:bigint>" in plan.replace("ReadSchema: ", "")
