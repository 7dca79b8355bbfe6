"""Kafka stream source (SURVEY.md §2.1 "Stream source" row, scale path).

The container has no Kafka connector jar (and no network), so this module
is the import-try-gated wrapper the survey calls for: the PLUMBING —
building the reader and parsing Kafka's wire schema into the engine's
`events` schema — is real and unit-tested; only broker connectivity is
environment-dependent.

Design split that makes this testable without a broker:
- `kafka_stream_reader(...)` builds `spark.readStream.format("kafka")` and
  surfaces a clear RuntimeError if the connector jar is absent (Spark
  otherwise fails with an opaque DATA_SOURCE_NOT_FOUND at load() time).
- `parse_kafka_events(df)` is a PURE DataFrame→DataFrame transform from
  the fixed Kafka source schema (key/value binary, topic, partition,
  offset, timestamp) to typed `events` rows — identical logic for a real
  stream or a batch DataFrame mocked with the same schema, which is how
  tests/test_sources.py drives it.

At scale: one Spark input partition per Kafka topic-partition; watermark
on the parsed event time (not Kafka ingest time) before any stateful op;
`maxOffsetsPerTrigger` bounds micro-batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kafka's fixed wire schema for a record's parsed JSON value → events row.
EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Build the Kafka readStream. Raises RuntimeError with remediation if
    the spark-sql-kafka connector is not on the classpath (it is not in
    this container)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent → opaque Spark error
        raise RuntimeError(
            "Kafka connector unavailable: add the spark-sql-kafka-0-10 "
            "package matching your Spark version (e.g. spark-submit "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>). "
            f"Underlying error: {type(exc).__name__}: {exc}"
        ) from exc


def parse_kafka_events(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire format → typed events rows (pure transform, no source
    dependency): JSON-decode `value`, keep Kafka position columns for
    exactly-once bookkeeping downstream."""
    parsed = kafka_df.select(
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        # No explicit timestampFormat: Spark's default JSON timestamp path
        # is the lenient stringToTimestamp parser, which accepts any ISO-8601
        # fractional precision up to µs as well as 'Z'/offset suffixes. A
        # pinned pattern would silently null every ts whose wire encoding
        # deviates from it (e.g. '.123', no fraction, or offset-suffixed).
        # VERSION DEPENDENCY (ADVICE r4): this lenient fallback is the
        # behavior of Spark >= 3.0 with the default
        # spark.sql.legacy.timeParserPolicy=CORRECTED; under LEGACY policy
        # (or Spark 2.x) the pre-Proleptic SimpleDateFormat path can null
        # variable-fraction wire timestamps again. The engine pins Spark 4.x
        # and tests/test_sources.py drives the varied-suffix matrix
        # ('.1'/'.123456'/no-fraction/'Z'/'+02:00') as the regression guard;
        # if this module is ever lifted onto a reconfigured runtime, keep
        # CORRECTED or parse ts as string + explicit to_timestamp.
        F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA).alias("ev"),
    )
    return parsed.select(
        "topic",
        "kafka_partition",
        "kafka_offset",
        F.col("ev.event_id").alias("event_id"),
        F.col("ev.ts").alias("ts"),
        F.col("ev.user_id").alias("user_id"),
        F.col("ev.event_type").alias("event_type"),
        F.col("ev.value").alias("value"),
        F.col("ev.props").alias("props"),
    )


def split_dead_letter(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split parsed Kafka rows into (good, dead_letter).

    PERMISSIVE from_json keeps a row whose value failed to decode — every
    struct field, including ``ts``, comes back NULL. Left unsplit those
    rows flow into watermarks/stateful ops with a null event time and
    silently corrupt results. The dead-letter side keeps the Kafka
    position columns so the offending records can be replayed or counted
    (e.g. ``dead.groupBy("topic").count()`` as a stream metric sink).
    """
    is_dead = F.col("ts").isNull() | F.col("event_id").isNull()
    return parsed.filter(~is_dead), parsed.filter(is_dead)
