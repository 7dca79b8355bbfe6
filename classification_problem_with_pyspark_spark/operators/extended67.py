"""Round-3 extension pack #67: IVF cell-balance audit and
time-in-state accounting.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — inverted-file (IVF) cell-balance auditing (an ANN index's
tail latency is set by its most overloaded posting list; FAISS docs
call unbalanced inverted lists the first thing to check) and
time-in-state accounting (duration-weighted state occupancy from an
event log — the process-mining twin of the transition-count matrix,
and the sojourn-time statistic of any Markov-chain analysis) —
re-expressed on the public PySpark DataFrame API over the driver's
testdata.

Hash-parity discipline (round-3 standard): IVF cells come from the
registry's SRP-style sign-bit coarse quantizer (deterministic
projections derived from md5 seeds — no trained centroids to drift);
balance ratios fold floor-micro division. State intervals close at the
user's NEXT event under the (ts, event_id) total order; durations are
exact floored epoch seconds (UTC pinned by the catalog loader), and
each user's final open state is excluded on both engines (no end, no
duration — stated, not implied).

Scale posture (SURVEY.md §7.6): the cell census is one groupBy over
the assignment expression (the index build's own first pass); state
durations are one LEAD window inside the per-user partitioning plus a
state-level rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

IVF_BITS = 4  # 2^4 = 16 coarse cells from sign-bit projections


def _bit_sql(b: int) -> str:
    """Sign bit b of Σ ±qᵢ over INTEGER-quantized dims (the SRP-family
    exact-integer projection discipline — order-insensitive by
    construction), signs md5-seeded per (b, i) with the 'ivf_' prefix
    so the cells are independent of the emb_srp_signature planes."""
    return (
        "(CASE WHEN (SELECT SUM(CASE WHEN CAST(('0x' || substr(md5('ivf_'"
        f" || CAST({b} AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 15))"
        " AS BIGINT) % 2 = 0"
        " THEN CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)"
        " ELSE -CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)"
        " END) FROM range(64) t(i)) > 0 THEN 1 ELSE 0 END)"
    )


@register(
    "emb_ivf_cell_balance",
    oracle=f"""
    WITH assigned AS (
        SELECT e.vec_id,
               {" + ".join(f"({1 << b} * {_bit_sql(b)})" for b in range(IVF_BITS))}
                   AS cell
        FROM embeddings e
    ),
    cells AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM assigned GROUP BY cell
    ),
    tot AS (
        SELECT CAST(SUM(n_vecs) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MAX(n_vecs) AS BIGINT) AS max_cell
        FROM cells
    )
    SELECT c.cell, c.n_vecs,
           CAST((1000000 * c.n_vecs) // t.n AS BIGINT) AS share_micro,
           CAST((1000000 * t.max_cell * t.n_cells) // t.n AS BIGINT)
               AS imbalance_micro
    FROM cells c, tot t
    ORDER BY c.cell
    """,
)
def emb_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance audit (SURVEY.md §2.12): the posting-list size
    census of a {1 << IVF_BITS}-cell coarse quantizer (sign-bit random
    projections, md5-seeded — the same SRP family as
    `emb_srp_signature`, here playing the IVF coarse role), with each
    cell's corpus share and the global imbalance factor
    max·cells/total (1.0 = perfectly balanced). ANN tail latency is
    set by the fattest posting list — nprobe hits it eventually — so
    this census is the first audit FAISS operators run on a new
    index, and rebalancing (re-training centroids, splitting hot
    cells) is driven by exactly these numbers.

    Exactness: dims quantize to integer micro units before the
    projection sum (the SRP-family discipline), so the sign test is
    exact integer arithmetic — no float ever enters the plan.

    Scale: cell assignment is a per-row expression (the index
    build's own map pass); the census is one groupBy over
    2^{IVF_BITS} cells. The audit costs one scan — the rebuild it
    prevents costs the whole index.

    r13 optimization (guide §4.2): the ±1 sign matrix is md5 of
    CONSTANTS — (bit, dim) only, never data — so each task builds it
    ONCE with hashlib (replaying the exact
    conv(substr(md5(…),1,15),16,10) %2 rule; the oracle itself iterates
    i over range(64), so the 64-dim domain is the key's stated
    contract) and the projection is one exact INT64 matrix product per
    Arrow batch. The former explode(64×) → crossJoin({IVF_BITS}×) → two
    keyed shuffles — N·512 rows, each paying an md5 per row — become
    zero shuffles before the {1 << IVF_BITS}-cell census groupBy, and
    256 md5s per TASK instead of per VECTOR. Quantization replays
    ROUND's half-away-from-zero ties (floor(x+.5)/ceil(x-.5)) and
    integer sums are order-insensitive, so cells are bit-identical.
    (A plan-literal zip_with/aggregate fold was measured FIRST and
    rejected: the 256-literal plan analysis + interpreted lambdas read
    0.79× of the explode form; the batch matmul is the §4.2 shape.)
    """
    import hashlib

    import numpy as np
    import pandas as pd

    n_bits = IVF_BITS

    def cell_batches(batches):
        w = np.array(
            [
                [
                    1
                    - 2
                    * (
                        int(
                            hashlib.md5(f"ivf_{b}_{d}".encode()).hexdigest()[:15],
                            16,
                        )
                        % 2
                    )
                    for d in range(64)
                ]
                for b in range(n_bits)
            ],
            dtype=np.int64,
        )
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1_000_000.0
            q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
            s = q @ w.T  # exact int64
            cells = ((s > 0).astype(np.int64) << np.arange(n_bits)).sum(axis=1)
            yield pd.DataFrame({"cell": cells.astype(np.int32)})

    e = load(spark, sf_dir, "embeddings").select("embedding").repartition(32)
    cells = (
        e.mapInPandas(cell_batches, schema="cell int")
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"))
    )
    tot = cells.agg(
        F.sum("n_vecs").cast("long").alias("n"),
        F.count("*").alias("n_cells"),
        F.max("n_vecs").cast("long").alias("max_cell"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vecs",
            F.expr("CAST((1000000 * n_vecs) DIV n AS BIGINT)").alias(
                "share_micro"
            ),
            F.expr(
                "CAST((1000000 * max_cell * n_cells) DIV n AS BIGINT)"
            ).alias("imbalance_micro"),
        )
        .orderBy("cell")
    )


@register(
    "events_time_in_state",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS t,
               LEAD(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS t_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    closed AS (
        SELECT event_type, t_next - t AS dur_s
        FROM seq WHERE t_next IS NOT NULL
    ),
    tot AS (SELECT CAST(SUM(dur_s) AS BIGINT) AS total FROM closed)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(dur_s) // COUNT(*) AS BIGINT) AS mean_s,
           CAST(MAX(dur_s) AS BIGINT) AS max_s,
           CAST((1000000 * SUM(dur_s)) // (SELECT total FROM tot) AS BIGINT)
               AS occupancy_micro
    FROM closed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state accounting (SURVEY.md §2.4): each event puts its
    user INTO a state (the event type) until the user's next event;
    the rollup reports, per state, interval counts, total and mean
    sojourn seconds, and the state's share of all accounted time —
    the duration-weighted occupancy that `events_transition_matrix`
    (pure counts) cannot see: a state entered rarely but held for
    hours dominates occupancy while barely registering in
    transitions. The process-mining sojourn table and the empirical
    holding-time vector of the user journey Markov chain, in one
    relation.

    Each user's final event opens a state with no close — excluded on
    both engines (no end, no duration; censoring it into the data
    edge would fabricate time). Durations are exact floored epoch
    seconds under the (ts, event_id) total order.

    Scale: one LEAD window inside the per-user shuffle + a
    state-level rollup — the same one-pass shape as sessionization.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_timestamp("ts").cast("long")
    seq = e.select(
        "event_type",
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    )
    closed = seq.where(F.col("t_next").isNotNull()).select(
        "event_type", (F.col("t_next") - F.col("t")).alias("dur_s")
    )
    tot = closed.agg(F.sum("dur_s").cast("long").alias("total"))
    return (
        closed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_s").cast("long").alias("total_s"),
            F.expr("CAST(SUM(dur_s) DIV COUNT(*) AS BIGINT)").alias("mean_s"),
            F.max("dur_s").cast("long").alias("max_s"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_intervals",
            "total_s",
            "mean_s",
            "max_s",
            F.expr("CAST((1000000 * total_s) DIV total AS BIGINT)").alias(
                "occupancy_micro"
            ),
        )
        .orderBy("event_type")
    )
