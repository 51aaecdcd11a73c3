"""ayeaye_spark.functions"""
