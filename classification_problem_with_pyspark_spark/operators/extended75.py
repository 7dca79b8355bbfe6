"""Round-3 extension pack #75: degree assortativity and directed flow
reciprocity.

Provenance note (SURVEY.md §0): /root/reference was EMPTY this session; no
file:line citations into it are possible. Both patterns are public
knowledge — degree assortativity (Newman, PRL 2002: the Pearson
correlation of end-point degrees over the edge list — do hubs attach
to hubs?) and directed-graph reciprocity (the share of directed edges
whose reverse also exists, weighted and unweighted — the mutuality
statistic of trade-flow and social graphs) — re-expressed on the
public PySpark DataFrame API over the driver's testdata.

Hash-parity discipline (round-3 standard): assortativity folds the
t-test discipline — exact integer degree moments over the directed
edge list (each undirected edge contributes both orientations, the
standard convention), one ROUND-6 double close; reciprocity is pure
integer set/weight algebra over the nation-flow digraph (min(w, w')
mutual mass — the weighted-reciprocity definition).

Scale posture (SURVEY.md §7.6): both run on ALREADY-AGGREGATED graph
relations (the co-purchase edge list / the 25×25 nation-flow matrix);
degrees are one groupBy, the moment fold is map-side combinable, and
reciprocity is a self-join on the reversed key of a dim-sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classification_problem_with_pyspark_spark.registry import register
from classification_problem_with_pyspark_spark.sources.catalog import load

_EDGES_SQL = """
    edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    )
"""


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM edges GROUP BY src
    ),
    pairs AS (
        SELECT da.d AS dx, db.d AS dy
        FROM edges e
        JOIN deg da ON da.node = e.src
        JOIN deg db ON db.node = e.dst
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(dx) AS BIGINT) AS sx,
               CAST(SUM(dy) AS BIGINT) AS sy,
               CAST(SUM(dx * dy) AS BIGINT) AS sxy,
               CAST(SUM(dx * dx) AS BIGINT) AS sxx,
               CAST(SUM(dy * dy) AS BIGINT) AS syy
        FROM pairs
    )
    SELECT m AS n_directed_edges,
           ROUND((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS assortativity
    FROM mom
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (SURVEY.md §2.4b): the Pearson correlation
    of end-point degrees over the co-purchase edge list (Newman 2002)
    — positive means hubs favor hubs (social-network shape), negative
    means hubs bridge leaves (technological/dependency shape), and
    the sign drives epidemic/failure-cascade behavior on the graph.
    Completes the structural family: degree distribution (the
    marginal), triangles/k-core (local density), assortativity (the
    joint degree structure).

    Each undirected edge contributes both orientations (the standard
    convention, stated); degree moments are exact integers and the
    close is one ROUND-6 double — the t-test discipline on a graph.

    Exactness: integer degrees and moments; magnitudes ≲ m·d² — far
    inside int64 at any co-purchase density this fixture reaches.

    Scale: degrees from one groupBy over the edge list, a dim-keyed
    join back, one map-side-combinable moment pass. The edge build
    is the shared fact-sized cost the whole graph family amortizes.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    pairs = (
        edges.join(deg.select(F.col("node").alias("src"), F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst")
        .select("dx", "dy")
    )
    mom = pairs.agg(
        F.count("*").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    return mom.select(
        F.col("m").alias("n_directed_edges"),
        F.round(
            (
                F.col("m").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / F.sqrt(
                (
                    F.col("m").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * (
                    F.col("m").cast("double") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("assortativity"),
    )


@register(
    "graph_flow_reciprocity",
    oracle="""
    WITH flows AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY s.s_nationkey, c.c_nationkey
    ),
    paired AS (
        SELECT f.src, f.dst, f.w,
               COALESCE(r.w, 0) AS w_rev
        FROM flows f
        LEFT JOIN flows r ON r.src = f.dst AND r.dst = f.src
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN w_rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_reciprocated,
               CAST(SUM(w) AS BIGINT) AS total_w,
               CAST(SUM(least(w, w_rev)) AS BIGINT) AS mutual_w
        FROM paired
    )
    SELECT n_edges, n_reciprocated, total_w, mutual_w,
           CAST((1000000 * n_reciprocated) // n_edges AS BIGINT)
               AS edge_reciprocity_micro,
           CAST((1000000 * mutual_w) // total_w AS BIGINT)
               AS weighted_reciprocity_micro
    FROM tot
    """,
)
def graph_flow_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed flow reciprocity (SURVEY.md §2.4b): over the
    supplier-nation → customer-nation trade digraph, the share of
    directed edges whose REVERSE edge exists, and the weighted
    variant Σmin(w, w⃖)/Σw — how much of the flow mass is mutual
    trade vs one-way export. The mutuality statistic of trade-flow
    and social graphs; the same 25×25 flow matrix PageRank ranks,
    read for symmetry instead of centrality.

    Exactness: integer flow counts; min/coalesce algebra; floor-micro
    shares. Self-loops (domestic trade) are excluded by contract —
    reciprocity is about OTHERS reciprocating.

    Scale: the digraph aggregates to ≤ |nations|² rows before any
    graph logic (the bounded-matrix discipline of
    `graph_pagerank_nation_flow`); the reverse lookup is a self-join
    on the reversed key of that tiny relation.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    flows = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    rev = flows.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w").alias("w_rev")
    )
    paired = flows.join(rev, ["src", "dst"], "left").select(
        "w", F.coalesce("w_rev", F.lit(0)).alias("w_rev")
    )
    tot = paired.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.when(F.col("w_rev") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_reciprocated"),
        F.sum("w").cast("long").alias("total_w"),
        F.sum(F.least("w", "w_rev")).cast("long").alias("mutual_w"),
    )
    return tot.select(
        "n_edges",
        "n_reciprocated",
        "total_w",
        "mutual_w",
        F.expr("CAST((1000000 * n_reciprocated) DIV n_edges AS BIGINT)").alias(
            "edge_reciprocity_micro"
        ),
        F.expr("CAST((1000000 * mutual_w) DIV total_w AS BIGINT)").alias(
            "weighted_reciprocity_micro"
        ),
    )
