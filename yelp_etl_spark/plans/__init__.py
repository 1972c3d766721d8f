from yelp_etl_spark.plans.catalog import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "oracle_sql_map", "query_map"]
