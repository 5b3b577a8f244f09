"""Warehouse option-mapping contracts (S6/S7): exact vendor option sets
and validation, matching offline_store_spark_runner.py:990-1031."""

import pytest

from featureform_spark.sources.warehouse import (
    bigquery_options,
    read_bigquery,
    read_snowflake,
    snowflake_options,
)

SF_CREDS = {
    "sfURL": "acct.snowflakecomputing.com",
    "sfUser": "u",
    "sfPassword": "p",
    "sfWarehouse": "wh",
}
BQ_CREDS = {"bqProjectId": "proj", "bqDatasetId": "ds", "bqCreds": "b64json"}


def test_snowflake_option_contract():
    opts = snowflake_options(SF_CREDS, "db", "public", "events")
    assert opts == {
        "sfURL": "acct.snowflakecomputing.com",
        "sfUser": "u",
        "sfPassword": "p",
        "sfWarehouse": "wh",
        "sfDatabase": "db",
        "sfSchema": "public",
        "dbtable": "events",
    }


def test_snowflake_validation():
    with pytest.raises(ValueError, match="sfPassword"):
        snowflake_options({**SF_CREDS, "sfPassword": ""}, "db", "s", "t")
    with pytest.raises(ValueError, match="empty"):
        snowflake_options(SF_CREDS, "db", "s", "  ")


def test_bigquery_option_contract():
    opts = bigquery_options(BQ_CREDS, "events")
    assert opts == {
        "credentials": "b64json",
        "parentProject": "proj",
        "viewsEnabled": "true",
        "table": "proj.ds.events",
    }


def test_bigquery_validation():
    with pytest.raises(ValueError, match="bqCreds"):
        bigquery_options({"bqProjectId": "p", "bqDatasetId": "d"}, "t")
    with pytest.raises(ValueError, match="empty"):
        bigquery_options(BQ_CREDS, "")


def test_reads_gated_without_connector_jar(spark):
    with pytest.raises(RuntimeError, match="snowflake"):
        read_snowflake(spark, SF_CREDS, "db", "s", "t")
    with pytest.raises(RuntimeError, match="bigquery"):
        read_bigquery(spark, BQ_CREDS, "t")


def test_snowflake_jdbc_url_and_validation():
    from featureform_spark.sources.warehouse import (
        read_snowflake_jdbc,
        snowflake_jdbc_url,
    )

    url = snowflake_jdbc_url(SF_CREDS, "db", "public")
    assert url.startswith("jdbc:snowflake://acct.snowflakecomputing.com/?")
    assert "db=db" in url and "schema=public" in url and "warehouse=wh" in url
    # same validation as the vendor path
    with pytest.raises(ValueError, match="Snowflake credentials"):
        read_snowflake_jdbc(None, {"sfURL": "x"}, "db", "public", "t")
    with pytest.raises(ValueError, match="table name"):
        read_snowflake_jdbc(None, SF_CREDS, "db", "public", " ")
