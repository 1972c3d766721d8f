from yelp_etl_spark.operators.projection import flatten_structs, prefix_columns
from yelp_etl_spark.operators.cleaning import normalize_nullish_strings, safe_cast
from yelp_etl_spark.operators.dates import add_date_features, date_feature_columns
from yelp_etl_spark.operators.explode import explode_delimited
from yelp_etl_spark.operators.enrich import enrich

__all__ = [
    "flatten_structs",
    "prefix_columns",
    "normalize_nullish_strings",
    "safe_cast",
    "add_date_features",
    "date_feature_columns",
    "explode_delimited",
    "enrich",
]
