"""ayeaye_spark.operators"""
