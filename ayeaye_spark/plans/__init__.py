"""ayeaye_spark.plans"""
