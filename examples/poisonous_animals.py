"""Group poisonous animals by the country they're found in.

Spark-first port of the reference acceptance model
(``examples/poisonous_animals.py:6-26``): the defaultdict(list) loop
becomes ``groupBy(where) + sorted collect_list`` — same logged output,
but the aggregation distributes.
"""

import os
import sys

# allow running as a plain script: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ayeaye_spark import Connect, Model
from ayeaye_spark.operators.relational import group_collect


class PoisonousAnimals(Model):
    poisonous_animals = Connect(engine_url="json://{data_path}/poisonous_animals.json")

    def build(self):
        df = self.poisonous_animals.as_dataframe(self.spark, "animals")
        grouped = group_collect(df, ["where"], "name", out_col="names", sep=",")
        for row in sorted(grouped.collect(), key=lambda r: r["where"]):
            self.log(f"In {row['where']} you could find {row['names']}")


if __name__ == "__main__":
    from ayeaye_spark import connector_resolver

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    with connector_resolver.context(data_path=data):
        PoisonousAnimals().go()
