"""Count EXECUTED mapInPandas tasks during build+run of a catalog query
(accumulator incremented once per task inside the wrapped user func) —
the honest runtime evidence for 'the signature pass ran once vs twice'
that a post-execution explain cannot show."""
import os, sys
HERE = sys.argv[1]
names = sys.argv[2:]
sys.path.insert(0, HERE)
from pyspark.sql.classic.dataframe import DataFrame as CDF
from ayeaye_spark.catalog import QUERIES
from ayeaye_spark.core.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("count_arrow")
spark.range(10).mapInPandas(lambda it: it, "id long").collect()
acc = spark.sparkContext.accumulator(0)
orig = CDF.mapInPandas
def patched(self, func, schema, barrier=False, profile=None):
    def wrapper(it):
        acc.add(1)
        return func(it)
    return orig(self, wrapper, schema, barrier)
CDF.mapInPandas = patched
for name in names:
    start = acc.value
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    print(f"{name}: mapInPandas task executions = {acc.value - start}")
spark.stop()
