"""Hottest/coldest measurement from GHCN-D-shaped climate data.

Spark-first port of the reference's NOAA climatology example
(``examples/noaa_climatology.py:28-84``): headerless gzipped CSV with
``field_names``, filter to TMAX/TMIN, cast tenths-of-°C strings to
numbers, global argmax/argmin.  The reference streams rows and keeps a
running max; here ``max_by``/``min_by`` aggregate with partial+final
combine across partitions (the distributed version of the same pass).
The real dataset lives on S3 (``s3+gz+csv://``) — the engine_url is the
only thing that changes.
"""

import os
import sys

# allow running as a plain script: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ayeaye_spark import Connect, Model

GHCND_FIELDS = ["ID", "DATE", "ELEMENT", "VALUE", "M_FLAG", "Q_FLAG", "S_FLAG", "OBS_TIME"]


class NoaaExtremes(Model):
    measurements = Connect(
        engine_url="gz+csv://{data_path}/ghcnd_sample.csv.gz",
        field_names=GHCND_FIELDS,
    )

    def build(self):
        temps = (
            self.measurements.df.where(F.col("ELEMENT").isin("TMAX", "TMIN"))
            .withColumn("v", F.col("VALUE").cast("double") / 10.0)
        )
        row = temps.agg(
            F.max_by(F.struct("ID", "DATE", "v"), "v").alias("hottest"),
            F.min_by(F.struct("ID", "DATE", "v"), "v").alias("coldest"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        self.add_stat("measurements", row["n"])
        hot, cold = row["hottest"], row["coldest"]
        self.log(f"Hottest: {hot['v']}C at {hot['ID']} on {hot['DATE']}")
        self.log(f"Coldest: {cold['v']}C at {cold['ID']} on {cold['DATE']}")
        self.hottest, self.coldest = hot, cold


if __name__ == "__main__":
    from ayeaye_spark import connector_resolver

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    with connector_resolver.context(data_path=data):
        NoaaExtremes().go()
