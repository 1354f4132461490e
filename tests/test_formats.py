"""Source/sink format coverage: JSONL (with corrupt-record quarantine),
plain text with provenance, ORC, JSON and XML round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_scraping_etl_tutorial_spark.sources.corpus import (
    jsonl_quality_split,
    read_jsonl_corpus,
    read_text_corpus,
    read_xml,
    write_jsonl,
    write_xml,
)
from airflow_scraping_etl_tutorial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_round_trip_and_quarantine(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    p = str(tmp_path / "corpus")
    write_jsonl(docs, p)

    # inject malformed lines alongside the good part files
    (tmp_path / "corpus" / "bad.json").write_text(
        '{"doc_id": broken not json\n{"doc_id": 1, "text": "ok", "lang": "en", '
        '"source": "s", "n_chars": 2}\n'
    )
    df = read_jsonl_corpus(spark, p)
    good, bad = jsonl_quality_split(df)
    assert good.count() == docs.count() + 1  # originals + the one valid line
    assert bad.count() == 1  # the broken line quarantined, not dropped
    assert "broken" in bad.first()._corrupt_record
    # typed columns survived the round trip
    assert dict(good.dtypes)["n_chars"] == "bigint"


def test_text_corpus_provenance(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.txt").write_text("only line\n")
    df = read_text_corpus(spark, str(tmp_path / "*.txt"))
    rows = df.collect()
    assert len(rows) == 3
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(
            (r.line_no, r.text)
        )
    assert sorted(by_file["a.txt"]) == [(1, "line one"), (2, "line two")]
    assert by_file["b.txt"] == [(1, "only line")]


def test_orc_round_trip(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    p = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    # predicate pushdown works on ORC scans too
    assert back.filter(F.col("o_orderkey") == 42).count() == 1


def test_json_typed_round_trip(spark, tmp_path):
    nation = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(p)
    back = spark.read.schema(nation.schema).json(p)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_xml_round_trip(spark, tmp_path):
    """Spark 4 ships XML natively (spark-xml merged upstream) — unlike
    Avro there is no jar gate. Values and explicit-schema read-back
    must survive a write/read cycle."""
    nation = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_xml")
    write_xml(nation, p, row_tag="nation")
    # the helper under test: inferred-schema read (types may widen,
    # int -> long, so compare values not dtypes)
    inferred = read_xml(spark, p, row_tag="nation")
    assert set(inferred.columns) == set(nation.columns)
    assert sorted(
        (int(r.n_nationkey), r.n_name) for r in inferred.collect()
    ) == sorted((int(r.n_nationkey), r.n_name) for r in nation.collect())
    # explicit-schema read-back: exact schema round-trip
    back = spark.read.format("xml").option("rowTag", "nation").schema(
        nation.schema
    ).load(p)
    assert back.schema == nation.schema
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == sorted(
        (r.n_nationkey, r.n_name) for r in nation.collect()
    )


def test_xml_custom_row_tag_and_projection(spark, tmp_path):
    """row_tag selects the repeated element; a projected read returns
    only the asked-for fields (column pruning happens post-parse for
    row-wise text formats — the docstring's convert-to-parquet advice)."""
    region = load(spark, SF_DIR, "region")
    p = str(tmp_path / "region_xml")
    write_xml(region, p, row_tag="r")
    got = read_xml(spark, p, row_tag="r").select("r_name")
    assert set(got.columns) == {"r_name"}
    assert got.count() == region.count()


def test_avro_gated(spark, tmp_path):
    """Avro needs the spark-avro package jar — absent here; the error
    must name the missing format, not fail silently."""
    nation = load(spark, SF_DIR, "nation")
    with pytest.raises(Exception, match="(?i)avro"):
        nation.write.format("avro").save(str(tmp_path / "nation_avro"))
