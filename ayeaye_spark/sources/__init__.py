"""ayeaye_spark.sources"""
