"""ayeaye_spark.streaming"""
