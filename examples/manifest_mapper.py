"""Manifest-driven one-file-in → one-file-out filtering.

Spark-first port of the reference acceptance model
(``examples/manifest_mapper.py:21-58``): a manifest lists input files;
each is filtered to Australian animals and written to a corresponding
``australian_``-prefixed output.  The per-file loop stays driver-side
(file-identity fan-out, SURVEY §7 "per-file identity"); each file's
filter is a Spark job.  At scale the same semantics collapse into ONE
job: MultiConnector read + ``input_file_name()`` + partitioned write —
shown in :meth:`AustralianAnimals.build_single_pass`.
"""

import os
import sys

# allow running as a plain script: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ayeaye_spark import AccessMode, Connect, Model, connector_for
from ayeaye_spark.core.manifest import ManifestMapper


class FileMapper(ManifestMapper):
    def map_menagerie(self):
        return [(f, "json://{input_path}/" + f) for f in self.manifest_items]

    def map_oz_animals(self):
        return [
            (f, "ndjson://{output_path}/australian_" + f + ";single_file")
            for f in self.manifest_items
        ]


animals_mapper = FileMapper("json://{input_path}/animals_manifest.json", "animal_files")


class AustralianAnimals(Model):
    animals_manifest = Connect(engine_url="json://{input_path}/animals_manifest.json")
    menagerie = Connect(engine_url=animals_mapper.menagerie)
    australian_animals = Connect(
        engine_url=animals_mapper.oz_animals, access=AccessMode.WRITE
    )

    def build(self):
        for mapping in animals_mapper:
            source = connector_for(mapping.menagerie)
            animals = source.as_dataframe(self.spark, "animals")
            filtered = animals.where(F.col("where") == "Australia")
            self.australian_animals[mapping.oz_animals].write(filtered)
        self.log("All done!")

    def build_single_pass(self, output_dir: str):
        """Scale variant: every manifest file in ONE Spark job — multi-path
        read tagged with ``input_file_name()``, one partitioned write."""
        df = self.menagerie.df  # MultiConnector union tagged with source_url
        exploded = df.select(
            F.explode("animals").alias("animal"),
            F.element_at(F.split("source_url", "/"), -1).alias("source_file"),
        ).select("animal.*", "source_file")
        (
            exploded.where(F.col("where") == "Australia")
            .write.mode("overwrite")
            .partitionBy("source_file")
            .json(output_dir)
        )


if __name__ == "__main__":
    from ayeaye_spark import connector_resolver

    here = os.path.dirname(os.path.abspath(__file__))
    with connector_resolver.context(
        input_path=os.path.join(here, "data"), output_path=here
    ):
        AustralianAnimals().go()
