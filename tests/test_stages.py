"""FAO stage-parity tests: the reference's dbt schema tests + singular test
re-expressed as pytest (SURVEY.md §5), plus UDF/expr equivalence for the
mandated Arrow normalization stage."""

import pytest
from pyspark.sql import functions as F

from fao_elt_pipelines_spark.plans import stages as S


@pytest.fixture(scope="module")
def bronze_prices(spark):
    return S.fao_bronze_fixture(spark, "prices", 200).cache()


@pytest.fixture(scope="module")
def bronze_prod(spark):
    return S.fao_bronze_fixture(spark, "production", 200).cache()


@pytest.fixture(scope="module")
def silver_prices(spark, bronze_prices):
    return S.silver_prices_cleaned(bronze_prices).cache()


@pytest.fixture(scope="module")
def silver_prod(spark, bronze_prod):
    return S.silver_production_cleaned(bronze_prod).cache()


def test_silver_prices_contract(silver_prices):
    # dbt unique + not_null on price_id (silver/schema.yml:7-15)
    assert silver_prices.groupBy("price_id").count().filter("count > 1").count() == 0
    for c in ["price_id", "price_value", "year", "country_name", "area_code"]:
        assert silver_prices.filter(F.col(c).isNull()).count() == 0
    # filters applied (silver_prices_cleaned.sql:66-68)
    assert silver_prices.filter((F.col("price_value") <= 0) | (F.col("year") < 1990)).count() == 0
    # accepted_values on the quality flag (silver/schema.yml:17-20)
    flags = {r[0] for r in silver_prices.select("is_valid_price").distinct().collect()}
    assert flags <= {True, False}


def test_standardization_branches(silver_prices):
    pairs = dict(
        silver_prices.select("country_name", "country_name_standardized").distinct().collect()
    )
    assert pairs["Côte d'Ivoire"] == "Ivory Coast"
    assert pairs["China, mainland"] == "China"
    assert pairs["United States of America"] == "USA"
    assert pairs["India"] == "India"  # ELSE branch


def test_udf_and_expr_standardization_agree(spark, bronze_prices):
    a = S.silver_prices_cleaned(bronze_prices, use_udf=False).select(
        "price_id", "country_name_standardized"
    )
    b = S.silver_prices_cleaned(bronze_prices, use_udf=True).select(
        "price_id", "country_name_standardized"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_unit_conversion_branch(silver_prod):
    kt = silver_prod.filter(F.col("unit") == "1000 t")
    assert kt.count() > 0
    assert kt.filter(
        F.col("production_metric_tons") != F.col("production_value") * 1000
    ).count() == 0
    t = silver_prod.filter(F.col("unit") == "t")
    assert t.filter(F.col("production_metric_tons") != F.col("production_value")).count() == 0
    # element filter (silver_production_cleaned.sql:71)
    assert silver_prod.filter(F.col("element_name") != "Production").count() == 0


def test_top_countries_ranks(spark, silver_prices, silver_prod):
    top = S.silver_top_countries(silver_prices, silver_prod).cache()
    # rank 1 has the max production; ranks are dense over non-nulls
    first = top.orderBy("production_rank").first()
    mx = top.agg(F.max("total_production")).collect()[0][0]
    assert first["total_production"] == mx
    assert top.filter(F.col("production_rank") == 1).count() >= 1
    # unique per (country, area_code) — full outer join key integrity
    assert top.groupBy("country_name_standardized", "area_code").count().filter(
        "count > 1"
    ).count() == 0


def test_gold_country_metrics_tiers_and_change(spark, silver_prices, silver_prod):
    gold = S.gold_country_metrics(silver_prod, silver_prices).cache()
    tiers = {r[0] for r in gold.select("producer_scale").distinct().collect()}
    assert tiers <= {"Major Producer", "Medium Producer", "Small Producer"}
    assert gold.filter(F.col("total_production_all_years") <= 0).count() == 0
    # unique country grain (gold/schema.yml)
    assert gold.groupBy("country_name_standardized", "area_code").count().filter(
        "count > 1"
    ).count() == 0


def test_gold_regional_summary(spark, silver_prices, silver_prod):
    reg = S.gold_regional_summary(spark, silver_prod, silver_prices).cache()
    regions = {r[0] for r in reg.select("region").collect()}
    assert regions <= set(S.REGION_MAP.keys())
    assert reg.groupBy("region").count().filter("count > 1").count() == 0
    assert reg.filter(F.col("total_market_value") < 0).count() == 0


def test_gold_price_production_analysis(spark, silver_prices, silver_prod):
    """dbt schema tests for gold_price_production_analysis
    (gold/schema.yml:23-39): item_name not_null, accepted_values on
    commodity_scale and price_tier; plus grain uniqueness, the HAVING
    floor, and the null-guarded market value (sql:44-49)."""
    gold = S.gold_price_production_analysis(silver_prod, silver_prices).cache()
    assert gold.count() > 0
    assert gold.filter(F.col("item_name").isNull()).count() == 0
    scales = {r[0] for r in gold.select("commodity_scale").distinct().collect()}
    assert scales <= {"Major Commodity", "Medium Commodity", "Minor Commodity"}
    tiers = {r[0] for r in gold.select("price_tier").distinct().collect()}
    assert tiers <= {"Premium Product", "Standard Product", "Basic Product"}
    # one row per (item_name, item_code)
    assert gold.groupBy("item_name", "item_code").count().filter("count > 1").count() == 0
    # HAVING COUNT(DISTINCT year) >= 5 (sql:89)
    assert gold.filter(F.col("years_with_data") < 5).count() == 0
    # market value only when both sides positive (sql:44-49): with full
    # price+production coverage in the fixture it must be non-negative
    assert gold.filter(F.col("total_market_value") < 0).count() == 0


def test_required_countries_singular(spark, silver_prices):
    missing = S.required_countries_test(silver_prices, spark)
    assert missing.count() == 0
