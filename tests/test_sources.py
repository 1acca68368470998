"""Source readers: delimiter/encoding sniff, structure detection, JDBC
partition options, JSON bronze landing."""

import os

from pyspark.sql import functions as F

from fao_elt_pipelines_spark.sources import readers as R


def test_sniff_delimiter():
    assert R.sniff_delimiter(["a,b,c", "1,2,3"]) == ","
    assert R.sniff_delimiter(["a\tb\tc", "1\t2\t3"]) == "\t"
    assert R.sniff_delimiter(["a|b|c|d", "1|2|3|4"]) == "|"


def test_read_delimited_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.tsv")
    with open(p, "w") as f:
        f.write("k\tv\n1\tx\n2\ty\n3\tz\n")
    df = R.read_delimited(spark, p)
    assert df.columns == ["k", "v"]
    assert df.count() == 3
    assert df.filter(F.col("k") == 2).first()["v"] == "y"


def test_sniff_encoding_latin1(tmp_path):
    p = str(tmp_path / "latin.csv")
    with open(p, "wb") as f:
        f.write("name\nCôte\n".encode("latin-1"))
    assert R.sniff_encoding(p) == "ISO-8859-1"  # the JVM-canonical name


def test_detect_structure_parquet(spark, sf_dir):
    info = R.detect_structure(spark, f"{sf_dir}/orders.parquet")
    assert info["row_count_exact"] is True
    assert info["estimated_rows"] == 1500
    assert info["dtype_classes"]["o_totalprice"] == "numeric"
    assert info["dtype_classes"]["o_orderdate"] == "datetime"
    assert info["dtype_classes"]["o_orderpriority"] == "object"
    assert len(info["sample"]) == 5


def test_jdbc_partition_opts():
    opts = R.jdbc_partitioned_opts("jdbc:postgresql://h/db", "t", "id", 0, 1_000_000, 32)
    assert opts["numPartitions"] == "32"
    assert opts["partitionColumn"] == "id"
    assert int(opts["upperBound"]) > int(opts["lowerBound"])


def test_read_json_bronze(spark, tmp_path):
    p = str(tmp_path / "b.jsonl")
    with open(p, "w") as f:
        f.write('{"area": "China", "value": 5}\n{"area": "India", "value": 7}\n')
    df = R.read_json_bronze(spark, p, source_url="u", api_endpoint="/e")
    assert df.columns == ["id", "data", "loaded_at", "source_url", "api_endpoint"]
    assert df.count() == 2
    got = df.select(F.get_json_object("data", "$.area").alias("a")).orderBy("a").collect()
    assert [r["a"] for r in got] == ["China", "India"]


def test_preflight_process_level(tmp_path):
    """scripts/preflight.py (the validate_setup analogue) passes in this
    environment end-to-end and fails cleanly on a broken fixture dir."""
    import json
    import os
    import subprocess
    import sys

    from tests.conftest import SF_DIR

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "preflight.py"),
         "--sf-dir", SF_DIR],
        capture_output=True, text=True, timeout=300,
    )
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert out.returncode == 0 and doc["preflight"] == "pass", out.stderr[-800:]
    assert doc["checks"]["spark_session"]["ok"]

    bad = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "preflight.py"),
         "--sf-dir", str(tmp_path), "--skip-spark"],
        capture_output=True, text=True, timeout=120,
    )
    doc2 = json.loads(bad.stdout.strip().splitlines()[-1])
    assert bad.returncode == 1 and doc2["checks"]["fixtures"]["ok"] is False


def test_docs_gen_process_level(tmp_path):
    """scripts/docs_gen.py (the dbt-docs-generate analogue) emits a catalog
    whose stage nodes carry live-inferred schemas and the dbt ref() DAG."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "docs_gen.py"),
         "--out", str(tmp_path), "--skip-registry", "--cores", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-800:]
    cat = json.load(open(tmp_path / "catalog.json"))
    names = {n["name"]: n for n in cat["nodes"]}
    assert "gold_price_production_analysis" in names
    gp = names["gold_price_production_analysis"]
    assert set(gp["depends_on"]) == {"silver_prices_cleaned", "silver_production_cleaned"}
    assert any(c["name"] == "commodity_scale" for c in gp["columns"])
    assert (tmp_path / "DOCS.md").exists()


def test_jdbc_live_partitioned_read(spark, tmp_path):
    """S8 against a LIVE database: Spark writes then range-partition-reads
    an embedded Derby DB (the JDBC engine bundled with Spark) through
    jdbc_partitioned_opts — N concurrent predicate-range readers, no
    LIMIT/OFFSET walk (reference pg_client.py:205-245). Proves the
    options against a real JDBC endpoint, not just their shape."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.range(0, 1000).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id % 7 AS INT) AS grp", "CAST(id * 1.5 AS DOUBLE) AS val"
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "events")
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        .save()
    )

    opts = R.jdbc_partitioned_opts(url, "events", "id", 0, 1000, num_partitions=8)
    df = (
        spark.read.format("jdbc")
        .options(**opts)
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # the parallel range scan is real
    assert df.count() == 1000
    got = {r["id"]: (r["grp"], r["val"]) for r in df.collect()}
    assert got[999] == (999 % 7, 999 * 1.5)
    # predicate pushdown reaches the database
    assert df.filter(F.col("id") < 10).count() == 10
