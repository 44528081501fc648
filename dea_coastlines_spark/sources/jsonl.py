"""JSONL (newline-delimited JSON) corpus source/sink.

The dominant ingress format for web-scale text corpora (crawl dumps,
processed shards) is JSONL. The reference ingests via files/datacube
(coastlines/raster.py:240-280 loads per-path rasters; the tabular
analog here is line-per-document JSON). Design rules for 100 TB:

* **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a full extra pass over the input just to infer types —
  a double scan of the corpus. The reader REQUIRES a schema; typos
  surface as all-NULL columns in the first validation query instead of
  silently re-typing the table. Column pruning and predicate pushdown
  then work normally (Spark's JSON reader prunes parsed fields).
* **Malformed lines are data, not crashes.** Crawl-derived JSONL always
  carries some broken lines (truncated shards, encoding damage, stray
  log lines). PERMISSIVE mode + `columnNameOfCorruptRecord` turns each
  unparseable line into a row whose corrupt column holds the raw text
  and whose data columns are NULL — the pipeline counts/quarantines
  them instead of dying mid-job (FAILFAST) or silently dropping them
  (DROPMALFORMED). This mirrors the corpus-integrity gate's
  flag-don't-crash contract (operators/integrity.py).
* **Executor-parallel writes.** The sink is a thin wrapper over
  `DataFrameWriter.json` — one shard per task, no driver funnel, the
  same shape as the GeoJSONSeq/WebDataset sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

DEFAULT_CORRUPT_COL = "_corrupt_line"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = DEFAULT_CORRUPT_COL,
) -> DataFrame:
    """Scan a JSONL corpus with a pinned schema and malformed-line
    capture.

    Returns the data columns of `schema` plus `corrupt_col` (string):
    NULL for parsed rows, the raw line text for unparseable ones (data
    columns NULL on those rows). Split with `split_corrupt`.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field"
        )
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame,
    corrupt_col: str = DEFAULT_CORRUPT_COL,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): parsed rows without the corrupt column, and the
    quarantine table of raw unparseable lines.

    materialize=True (default) localCheckpoints the parsed scan before
    splitting. Two reasons, both structural: (1) Spark refuses a query
    over a raw JSON scan whose referenced columns prune down to ONLY
    the corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN — exactly what a quarantine count/write does); (2) without
    it each branch re-parses the whole corpus — a one-pass split
    inherently requires materializing the parse once. Callers that
    aggregate both classes in a single scan (CASE WHEN on the corrupt
    column) should do that directly on the reader's output instead of
    splitting — see q_jsonl_ingest."""
    if materialize:
        df = df.localCheckpoint(eager=False)
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Executor-parallel JSONL sink: one shard per task via the built-in
    JSON writer (each row one line, keys in schema order, non-ASCII
    preserved as UTF-8)."""
    df.write.mode(mode).json(path)
