"""Round-3 extension pack #13: ingestion-edge completions — the Kafka
wire-format parse path surfaced as a graded key (driven by a mocked wire
batch, since no broker exists in the container), and term-blocklist
content filtering, the policy-filter stage of a corpus pipeline.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. All patterns here are public
knowledge — Kafka's fixed source schema (key/value binary + topic/
partition/offset/timestamp) as documented for spark-sql-kafka, and
wordlist-based content filtering as described for every public corpus
pipeline (C4's badwords filter et al.) — expressed on the public PySpark
DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): the Kafka key proves the parse
by aggregate identity — whatever survives encode→wire→decode must
aggregate exactly like the original table (counts, integer cents, exact
offsets from integer rank); the blocklist key counts exact word matches
over split arrays (no substring false positives, no regex divergence).

Scale posture (SURVEY.md §7.6):
- The wire parse is from_json over value bytes — per-partition,
  shuffle-free; Kafka topic-partitions map 1:1 to input partitions and
  the offset bookkeeping columns ride along for exactly-once sinks.
- Blocklist filtering is an array-intersect per document (JVM
  higher-order functions, no explode of the full corpus for the
  flag decision; the per-term histogram explodes MATCHES only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load
from classification_problem_with_pyspark_spark.sources.kafka import parse_kafka_events

BLOCKLIST = ("slow", "big", "small", "merge", "scan")


@register(
    "source_kafka_wire_parse",
    oracle="""
    WITH wire AS (
        SELECT *, CAST(user_id % 8 AS BIGINT) AS kafka_partition,
               row_number() OVER (PARTITION BY user_id % 8
                                  ORDER BY ts, event_id) - 1 AS kafka_offset
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(count(DISTINCT kafka_partition) AS BIGINT) AS n_partitions,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(max(kafka_offset) AS BIGINT) AS max_offset_seen,
           max(ts) AS last_ts
    FROM wire GROUP BY 1 ORDER BY 1
    """,
)
def source_kafka_wire_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka wire-format parse, hash-checked (SURVEY.md §2.1): serialize
    the events table into Kafka's exact source schema — JSON value
    bytes, key bytes, topic, partition (user_id mod 8 — the keyed-
    producer layout that keeps a user's events in one partition, hence
    ordered), monotone per-partition offsets, ingest timestamp — then
    run the REAL `parse_kafka_events` transform (sources/kafka.py) over
    the wire batch and aggregate the decoded rows. The oracle computes
    the same aggregate from the original table: a hash match proves
    encode→wire→decode is lossless for every column (timestamps at µs,
    money to the cent) AND that the offset bookkeeping columns carried
    through the parse intact.

    This closes the gap the container forces: no broker exists, so the
    connector path (`kafka_stream_reader`) stays import-try-gated, but
    the entire VALUE path — the part that actually transforms data — is
    now driver-graded, not just unit-tested. The same transform binds
    to a live readStream unchanged.

    Scale: encode/decode are per-partition (zero shuffle until the
    final aggregate); one Spark partition per topic-partition;
    watermark on the PARSED event time downstream, never ingest time.
    """
    e = load(spark, sf_dir, "events")
    woff = Window.partitionBy(F.col("user_id") % 8).orderBy("ts", "event_id")
    wire = e.select(
        F.lit("events").alias("topic"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        (F.row_number().over(woff) - 1).cast("long").alias("offset"),
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
            # µs wire precision, mirroring parse_kafka_events' decode format
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
        )
        .cast("binary")
        .alias("value"),
        F.col("ts").alias("timestamp"),
    )
    parsed = parse_kafka_events(wire)
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("kafka_partition").alias("n_partitions"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
            F.max("kafka_offset").cast("long").alias("max_offset_seen"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "llm_blocklist_filter",
    oracle="""
    SELECT d.lang, w.term,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs_hit
    FROM documents d,
         UNNEST(list_filter(string_split(d.text, ' '),
                t -> list_contains(['slow','big','small','merge','scan'], t)))
             AS w(term)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def llm_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist content filter (SURVEY.md §2.12), the policy-
    filter stage every public corpus pipeline runs (C4's badwords list
    is the canonical example — here the list is a 5-term fixture over
    the synthetic vocabulary): per (lang, term), how many times each
    blocklisted term occurs and how many documents it taints.

    EXACT-WORD semantics: terms match against the split word array, not
    substrings — "scan" never matches "scanner" — which is both the
    correct policy behavior and what keeps the two engines trivially
    identical (no regex dialect in play). The flag decision per doc is
    an array intersect (JVM higher-order filter, no corpus explode);
    only the MATCHES explode for the per-term histogram.

    Scale: the blocklist is a literal in the plan (broadcast by
    construction); real lists (thousands of terms) move to a broadcast
    join against the exploded match stream or a JVM-side set in a
    higher-order lambda — same shape. One shuffle: the final group.
    """
    d = load(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in BLOCKLIST])
    matches = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.array_contains(terms, w))
        ).alias("term"),
    )
    return (
        matches.groupBy("lang", "term")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs_hit"),
        )
        .orderBy("lang", "term")
    )
