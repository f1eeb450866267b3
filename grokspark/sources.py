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

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "is_table_identifier",
    "read_sequences",
    "read_raw_lines",
    "write_sink",
]


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


def read_raw_lines(
    spark: SparkSession, path: str, source: Optional[str] = None
) -> DataFrame:
    """Ingest adapter: raw text log files -> the tokenized-sequence
    table shape ``(doc_id, tokens: array<int>, n_tok, source)`` the
    whole pipeline consumes. This is how a user of the reference
    library (who has plain ``*.log`` files, not pre-tokenized tables)
    plugs straight into grokspark.

    Encoding runs vectorized in mapInPandas (one Arrow pass — the same
    place a real tokenizer would run). ``source`` is a fixed label; if
    None, each row gets its file's basename sans extension.

    doc_id is ``<file-basename>#<partition>-<offset>`` — deterministic
    for a fixed file set and split plan (line offsets are per input
    split, which Spark derives from file sizes). Pipelines that need a
    content-stable id should derive one downstream (e.g.
    ``fingerprint``)."""
    import os

    import pandas as pd

    lines = spark.read.text(path).withColumn("_file", F.input_file_name())
    fixed_source = source

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        offset = 0
        for pdf in batches:
            out_rows = []
            for value, fname in zip(pdf["value"], pdf["_file"]):
                base = os.path.basename(fname)
                stem = base.rsplit(".", 1)[0]
                tokens = list((value or "").encode("utf-8"))
                out_rows.append(
                    {
                        "doc_id": f"{base}#{pid}-{offset}",
                        "tokens": tokens,
                        "n_tok": len(tokens),
                        "source": fixed_source if fixed_source is not None else stem,
                    }
                )
                offset += 1
            yield pd.DataFrame(out_rows)

    return lines.mapInPandas(
        encode, schema="doc_id string, tokens array<int>, n_tok int, source string"
    )


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
