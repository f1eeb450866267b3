"""Input/output source abstraction: Iceberg tables when a catalog is
configured, parquet paths otherwise.

The north rule targets Iceberg-backed sequence tables. This sandbox has
no Iceberg runtime jars, so the Iceberg branch is exercised only for
its plumbing (format detection, option passing) and documented; the
parquet branch is the tested fallback. On a real cluster:

  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
    --conf spark.sql.catalog.lake.type=rest ...

and pass ``lake.db.sequences`` as the table. Reads then get partition
pruning + min/max file skipping from Iceberg metadata for free (the
`source` filter and `n_tok` ranges both prune), and sink commits map to
atomic Iceberg snapshot appends with counts available from snapshot
summary metadata (no file re-reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["is_table_identifier", "read_sequences", "write_sink"]


def is_table_identifier(location: str) -> bool:
    """Catalog table identifier (db.table / cat.db.table) vs filesystem
    path."""
    return "/" not in location and not location.startswith(("file:", "s3:", "hdfs:"))


def read_sequences(spark: SparkSession, location: str) -> DataFrame:
    """Read the tokenized-sequence table from an Iceberg table
    identifier or a parquet path."""
    if is_table_identifier(location):
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_sink(df: DataFrame, location: str, mode: str = "append") -> None:
    """Write a sink: Iceberg append (atomic snapshot commit) for table
    identifiers, parquet for paths. The pipeline's staging+rename
    commit protocol applies only to the parquet branch — Iceberg
    commits are already atomic."""
    if is_table_identifier(location):
        writer = df.writeTo(location)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    df.write.mode(mode).parquet(location)
