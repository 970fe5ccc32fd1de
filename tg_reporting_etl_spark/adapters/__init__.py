from tg_reporting_etl_spark.adapters import oracle, testdata

__all__ = ["oracle", "testdata"]
