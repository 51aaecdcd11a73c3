"""Days-per-month each colour was someone's favourite.

Spark-first port of the reference acceptance model
(``examples/favourite_colours.py:7-110``): the hand-rolled month-walking
loop becomes ``explode(sequence(start, end - 1 day))`` + groupBy(colour,
month) — end-exclusive day counting, matching the reference's
``(end - start).days`` semantics.  Pre/post checks are DataFrame
aggregates instead of row loops:

* pre:  single-year precondition over start+end years;
* post: conservation — total input days == total output days (the
  reference uses this model to show a post-check catching bad data:
  a swapped start/end pair makes the explode count diverge from the
  abs()-based input total).
"""

import os
import sys

# allow running as a plain script: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ayeaye_spark import AccessMode, Connect, Model


class FavouriteColours(Model):
    favourite_colours = Connect(engine_url="csv://{data_path}/favourite_colours.csv")
    favourites_summary = Connect(
        engine_url="json://{output_path}/favourite_colours_summary.json;indent=4",
        access=AccessMode.READWRITE,
    )

    def _spans(self):
        return self.favourite_colours.df.select(
            "colour",
            F.to_date("start").alias("start_d"),
            F.to_date("end").alias("end_d"),
        )

    def pre_build_check(self) -> bool:
        years = (
            self._spans()
            .select(F.year("start_d").alias("y"))
            .union(self._spans().select(F.year("end_d")))
            .distinct()
            .collect()
        )
        if len(years) != 1:
            seen = sorted(r["y"] for r in years)
            self.log(
                "This model is only designed to work with data from a single year. "
                f"Both {seen[0]} and {seen[-1]} have been found in the input dataset.",
                "ERROR",
            )
            return False
        return True

    def build(self):
        # rows with end <= start contribute no days (the reference's loop
        # never entered for a negative delta — that asymmetry vs the
        # abs()-based input total is exactly what post_build_check catches)
        days = self._spans().where(F.col("end_d") > F.col("start_d")).withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.col("start_d"),
                    F.date_sub("end_d", 1),
                    F.expr("interval 1 day"),
                )
            ),
        )
        summary = (
            days.groupBy("colour", F.date_format("day", "MMMM").alias("month"))
            .agg(F.count(F.lit(1)).alias("n_days"))
            .collect()
        )
        by_colour: dict[str, dict[str, int]] = {}
        for row in summary:
            by_colour.setdefault(row["colour"], {})[row["month"]] = row["n_days"]
        self.favourites_summary.data = by_colour
        self.log("Done!")

    def post_build_check(self) -> bool:
        input_days = (
            self._spans()
            .agg(F.sum(F.abs(F.datediff("end_d", "start_d"))).alias("d"))
            .collect()[0]["d"]
        )
        output_days = sum(
            days
            for months in self.favourites_summary.data.as_native().values()
            for days in months.values()
        )
        if input_days != output_days:
            self.log(
                "Total days in input doesn't match total days in output. "
                f"Input has {input_days} days and output has {output_days} days.",
                "ERROR",
            )
            return False
        return True


if __name__ == "__main__":
    from ayeaye_spark import connector_resolver

    here = os.path.dirname(os.path.abspath(__file__))
    with connector_resolver.context(data_path=os.path.join(here, "data"), output_path=here):
        FavouriteColours().go()
