"""Readers (SURVEY §2.1 S1–S5, S13).

Covers the reference's source surface — glob CSV scans with header
(hot/spark_energy.py:26), quote/escape/multiline tolerance
(relation_graph/danmaku_analysis_cluster.py:120), filename-provenance
columns (hot/spark_energy.py:27), HDFS-or-local URIs — plus the driver's
parquet testdata, always with explicit schemas (no inferSchema; the
reference's ``inferSchema=True`` costs an extra full scan per read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigdataproject_spark.schemas import DANMAKU_RAW, EVENTS_RAW, TESTDATA_TABLES


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    multiline: bool = False,
    with_filename: str | None = None,
) -> DataFrame:
    """CSV scan with explicit schema (S1–S3).

    ``path`` may be a glob (``.../danmaku_*.csv``) — Spark unions all
    matching files in one scan, any Hadoop-compatible FS (S5). With
    ``with_filename`` set, adds the source-file column the reference uses
    to carry the episode key (S4, hot/spark_energy.py:27).

    Scale note: one Spark file-partition per ~128MB split regardless of the
    number of input files; small-file explosion is handled by Spark's file
    coalescing (maxPartitionBytes), not per-file tasks.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", True)
        .option("encoding", "UTF-8")
    )
    if multiline:
        # Tolerates embedded newlines/quotes in text fields
        # (ref: danmaku_analysis_cluster.py:120).
        reader = reader.option("multiLine", True).option("escape", '"').option("quote", '"')
    df = reader.csv(path)
    if with_filename is not None:
        df = df.withColumn(with_filename, F.input_file_name())
    return df


def read_danmaku_csv(
    spark: SparkSession, path: str, *, typed: bool = False, multiline: bool = True
) -> DataFrame:
    """Danmaku fact-table scan, reference-compatible (S1+S3+S4).

    Reads all-string like the graph job (danmaku_analysis_cluster.py:120)
    and extracts the episode key ``bvid`` from the filename
    (hot/spark_energy.py:27,31). With ``typed=True`` applies the cast-null
    validity trick on ``video_time`` (hot/spark_energy.py:32): rows whose
    media time fails to parse as double are dropped.

    ``multiline``: the reference's two pipelines disagree — the graph job
    reads with multiLine/escape (danmaku_analysis_cluster.py:120), the
    energy job with plain defaults (spark_energy.py:26), which parses rows
    after an unbalanced quote differently. Pick per golden target.
    """
    df = read_csv(spark, path, DANMAKU_RAW, multiline=multiline, with_filename="_file")
    df = df.withColumn(
        "bvid", F.regexp_extract(F.col("_file"), r"(BV[a-zA-Z0-9]+)", 1)
    ).drop("_file")
    if typed:
        # try_cast: NULL on malformed input regardless of ANSI mode, which
        # reproduces the reference's legacy-cast drop semantics under Spark 4.
        vt = F.col("video_time").try_cast("double")
        df = df.withColumn("video_time", vt).filter(vt.isNotNull())
    return df


_EVENTS_TS_IS_NANOS: dict[str, bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """Sniff a parquet footer once per path: is the ``ts`` column stored as
    TIMESTAMP(NANOS) (older testdata generations) or TIMESTAMP(MICROS)?

    ``path`` may be an events.parquet file or a directory of part files.
    Footer-only read (no data pages) — cheap even on a 100 TB table, and
    keeps the loader correct across driver testdata regenerations.
    """
    if path not in _EVENTS_TS_IS_NANOS:
        try:
            import glob
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            f = path
            if os.path.isdir(path):
                parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
                if not parts:
                    # empty drop folder (normal for a file stream that
                    # hasn't received data yet) — answer False now but
                    # DON'T cache, so the sniff re-runs once files land
                    return False
                f = parts[0]
            try:
                schema = pq.read_schema(f)
            except Exception:
                # ANY failed footer read is treated as transient (a part
                # file mid-write raises pyarrow ArrowInvalid — a
                # ValueError, not an OSError — and a momentary FS error
                # raises OSError): answer False for THIS call only.
                # Caching a failed read would pin a misclassification for
                # the whole process even though the driver regenerates
                # testdata in place between rounds.
                return False
            # Membership check, not field()+catch: older pyarrow returns
            # None from schema.field(missing) instead of raising KeyError,
            # which would fall to the transient handler and defeat the
            # cache (footer I/O re-run on every load). `in schema.names`
            # is deterministic across pyarrow versions.
            if "ts" not in schema.names:
                # Footer read fine, no ts column — deterministic for this
                # file: cache so every load doesn't re-run metadata I/O.
                _EVENTS_TS_IS_NANOS[path] = False
                return False
            t = schema.field("ts").type
            # TIMESTAMP(NANOS) or a raw int64 epoch-ns column — both are
            # the legacy layout the div-1000 path handles.
            _EVENTS_TS_IS_NANOS[path] = (
                getattr(t, "unit", None) == "ns" or t == pa.int64()
            )
        except Exception:
            # Anything unexpected outside the footer read (e.g. glob or
            # isdir failure) — treat as transient, don't cache.
            return False
    return _EVENTS_TS_IS_NANOS[path]


def _events_ts_is_nanos(sf_dir: str) -> bool:
    return events_ts_is_nanos(f"{sf_dir}/events.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table from ``{sf_dir}/{name}.parquet``.

    Parquet scans get column pruning + predicate pushdown for free; the
    explicit schema keeps types stable across scale factors.

    ``events.ts`` may be parquet TIMESTAMP(NANOS) (older driver testdata:
    Spark reads it as long via ``nanosAsLong`` and we truncate ns→µs — the
    same truncation DuckDB applies on read) or TIMESTAMP(MICROS) (current
    testdata: read natively as TimestampType). The footer sniff picks.
    """
    # Oracle comparisons assume UTC timestamp rendering; pin it even when
    # the caller's session (e.g. the driver harness's own SparkSession)
    # didn't come from our factory. Runtime-settable SQL conf — no-op on
    # already-UTC sessions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events" and _events_ts_is_nanos(sf_dir):
        raw = spark.read.schema(EVENTS_RAW).parquet(f"{sf_dir}/{name}.parquet")
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    schema = TESTDATA_TABLES[name]
    return spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_splits: int | None = None) -> DataFrame:
    """Fan an expensive per-row map pass out to the session's parallelism
    when the source yields fewer input splits than that.

    A small single-row-group parquet file is ONE Spark split no matter
    the config (byte-range splitting cannot cross a row-group boundary),
    so a heavy map pass — interpreted HOF chains over token arrays —
    runs on one core of 32 (measured: the whole sf0.1 textstats pass on
    a single 594 KB/5000-doc split). The guarded round-robin repartition
    trades one tiny local shuffle for full-width parallelism.

    At 100 TB the guard makes this the IDENTITY: input splits ≫ the
    cluster's core count, so no exchange ever enters the plan and the
    pass stays a pure scan-stage map. The split count comes from
    driver-side plan metadata (``getNumPartitions`` compiles the RDD
    DAG but runs no job, scans no data).

    The width target is ``defaultParallelism`` (total executor cores) —
    NOT ``spark.sql.shuffle.partitions``: that is a reduce-side
    memory-sizing knob, routinely raised several-fold above core count
    so reduce partitions fit in memory, and using it here turned that
    tuning into a full-corpus-text repartition (the 10x rehearsal,
    sized at shuffle.partitions=256 on 32 cores, grew an 825 MB
    document-text exchange inside every fan_out consumer that a
    32-core width target makes the identity)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if min_splits is None:
        min_splits = target
    if df.rdd.getNumPartitions() >= min_splits:
        return df
    return df.repartition(target)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | None = None,
    with_filename: str | None = None,
) -> DataFrame:
    """JSON-Lines document ingestion — the de-facto interchange format of
    LLM training corpora (one JSON object per line). Explicit schema
    (default: the ``documents`` table shape) — never ``inferSchema``,
    which costs an extra full scan and drifts types between drops.

    Corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode) instead
    of failing the 100 TB job; callers triage
    ``df.cache().filter(col('_corrupt_record').isNotNull())`` (the cache
    is Spark's documented requirement — a raw JSON scan can't be queried
    on the corrupt column alone). ``path`` may be a
    glob over any Hadoop-compatible FS; ``multiLine`` stays False so
    splits stay line-aligned and a single file still parallelizes by
    128 MB split, not by file."""
    from pyspark.sql.types import StringType, StructField

    base = schema if schema is not None else TESTDATA_TABLES["documents"]
    if "_corrupt_record" not in base.fieldNames():
        base = StructType(
            list(base.fields) + [StructField("_corrupt_record", StringType())]
        )
    df = (
        spark.read.schema(base)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if with_filename is not None:
        df = df.withColumn(with_filename, F.input_file_name())
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once."""
    if not names:
        names = tuple(TESTDATA_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}
