from alerta_spark.plans.catalog import QUERIES, queries, oracle_sql  # noqa: F401
