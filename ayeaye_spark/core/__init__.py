"""ayeaye_spark.core"""
