from yelp_etl_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
