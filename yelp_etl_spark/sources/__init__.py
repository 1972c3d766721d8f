from yelp_etl_spark.sources.readers import load_table, load_tables, read_json
from yelp_etl_spark.sources.writers import WriteSpec, write_table

__all__ = ["load_table", "load_tables", "read_json", "WriteSpec", "write_table"]
