from yelp_etl_spark.cli import main

main()
