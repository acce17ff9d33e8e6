"""Link-graph analytics for corpus curation: fixed-iteration PageRank.

Web-crawl curation weights documents by the authority of their source
host (the CommonCrawl/CCNet-style quality prior), which is PageRank over
the host link graph. Next to :func:`osmgraft.operators.dedup.
connected_components` (iterative, unweighted, converges by closure) this
is the engine's iterative WEIGHTED graph algorithm: a value is propagated
and re-aggregated along edges each round, so the per-round plan — not a
global structure — is the scale story:

- ranks join edges co-partitioned on ``src`` (one shuffle), contributions
  aggregate on ``dst`` (second shuffle); both keys are graph-node ids, so
  a 10^9-node graph runs at ordinary join/agg scale. No driver-side data
  beyond two scalars per round (node count, dangling mass).
- each round ends in a lazy ``localCheckpoint`` (same rail as
  connected_components): the plan stays one-round deep instead of
  growing linearly with iterations.
- dangling mass (nodes with no out-edges) is redistributed uniformly via
  ONE scalar aggregate per round — the textbook correction, without
  materializing dangling edges.

Determinism / oracle parity: a floating-point PageRank is order-dependent
twice over — the per-node contribution sum AND the dangling-mass sum
change with partitioning. Ranks therefore live as int64 fixed-point
(1e-12 resolution) END TO END inside the loop: every sum is an integer
sum (order-free, engine-exact), every per-row conversion is a single
correctly-rounded double op with a deterministic result, and each round
re-floors to int64 so nothing compounds. The DuckDB oracle
(:func:`pagerank_oracle_sql`) replays the identical recurrence with T
unrolled CTEs, value-identical rather than approximately equal.

No reference analogue; builder-brief training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000_000_000  # 1e-12 fixed point for order-free rank sums


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank after exactly ``iterations`` synchronous rounds.

    ``edges`` are directed (src, dst) pairs; parallel duplicates count
    once (standard adjacency semantics — dedup'd up front). Nodes are
    everything appearing as src or dst. Returns ``(id, rank)`` with
    ranks from the recurrence

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/deg(u) + D/N)

    where D is the total rank on dangling nodes this round. Ranks sum to
    ~1 (up to the 1e-12 quantization) every round.

    Fixed iteration count, not convergence-tested: curation wants a
    reproducible artifact, and at web scale each round costs the same
    two shuffles — the caller picks the budget.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    sc = F.lit(float(_SCALE))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    # out-degree is static: fold it into the node frame ONCE so no round
    # pays a ranks-deg join; each rank frame carries (id, deg, ri) across
    # its checkpoint (+8 B/row, one join saved per iteration)
    nd = nodes.join(deg, "id", "left").localCheckpoint(eager=False)
    # N crosses the driver once (a scalar); every per-node value stays
    # distributed. ri = rank * 1e12 held as int64.
    n = nodes.count()
    ranks = nd.withColumn("ri", F.floor(F.lit(1.0 / n) * sc).cast("long"))
    for _ in range(iterations):
        # dangling mass: an integer sum — order-free — of one tiny aggregate
        dang_i = int(
            ranks.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("ri"), F.lit(0)))
            .first()[0]
        )
        contrib = (
            ranks.where(F.col("deg").isNotNull())
            .join(e, F.col("id") == F.col("src"))
            .select(
                F.col("dst").alias("id"),
                # one correctly-rounded double chain per row, re-floored:
                # deterministic in any engine, then summed as int64
                F.floor(F.col("ri") / sc / F.col("deg") * sc).cast("long").alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_s"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce(F.col("_s"), F.lit(0)) / sc + F.lit(float(dang_i)) / sc / n)
        )
        ranks = (
            nd.join(contrib, "id", "left")
            .select("id", "deg", F.floor(new_rank * sc).cast("long").alias("ri"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", (F.col("ri") / sc).alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 5,
    damping: float = 0.85,
) -> str:
    """ANSI-SQL replica of :func:`pagerank` with the iterations unrolled
    as chained CTEs (recursive CTEs cannot aggregate over the recursive
    term). ``edges_cte`` is a SQL fragment yielding (src, dst).

    Every arithmetic step — literal values, operation order, the int64
    fixed-point carries — mirrors the Spark plan term-for-term, so the
    result is value-identical, not approximately equal."""
    d = damping
    s = float(_SCALE)
    sql = [
        f"with e as (select distinct src, dst from ({edges_cte})), ",
        "nodes as (select src as id from e union select dst from e), ",
        "deg as (select src as id, count(*) as deg from e group by src), ",
        "n1 as (select count(*) as n from nodes), ",
        f"pr0 as (select id, cast(floor((1.0 / n) * {s}) as bigint) as ri "
        "from nodes cross join n1), ",
    ]
    for i in range(iterations):
        p, q = f"pr{i}", f"pr{i + 1}"
        sql.append(
            f"dang{i} as (select coalesce(sum(ri), 0) as dm from {p} "
            "left join deg using (id) where deg is null), "
            f"c{i} as (select dst as id, "
            f"sum(cast(floor(ri / {s} / deg * {s}) as bigint)) as s "
            f"from {p} join deg using (id) join e on {p}.id = e.src group by dst), "
            f"{q} as (select id, cast(floor((({1.0} - {d}) / n + {d} * "
            f"(coalesce(s, 0) / {s} + dm / {s} / n)) * {s}) as bigint) as ri "
            f"from nodes left join c{i} using (id) cross join n1 cross join dang{i}), "
        )
    body = "".join(sql).rstrip().rstrip(",")
    return f"{body} select id, ri / {s} as rank from pr{iterations}"


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    id_col: str = "id",
) -> DataFrame:
    """Hop-bounded multi-source shortest paths (synchronous Bellman-Ford):
    after exactly ``n_rounds`` relaxation rounds, ``(id, dist)`` holds the
    cheapest cost of any path of <= ``n_rounds`` edges from the nearest
    source (unreached nodes absent). The network-distance primitive the
    snap/match family feeds: travel cost from depots/stations over the
    way graph, at the same per-round plan cost as :func:`pagerank`.

    Weights must be NON-NEGATIVE int64 (the caller quantizes meters or
    millis); integer min/plus is exact and order-free, so the result is
    partitioning-invariant and replays value-identically in any engine
    (:func:`sssp_oracle_sql` unrolls the rounds as chained CTEs).

    Per round: the frontier joins edges co-partitioned on the node key
    (one shuffle), relaxations union the running map and take the per-id
    min (second shuffle, map-side combinable) — no driver-side data ever;
    a lazy localCheckpoint per round keeps lineage one round deep. A
    fixed round budget, not convergence, bounds the work: at planet
    scale ``n_rounds`` is the graph-diameter budget the caller pays for,
    and the K-hop semantics are themselves useful (isochrone-style
    reachability tiers).
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(w).cast("long").alias("_w")
    ).localCheckpoint(eager=False)
    dist = sources.select(F.col(id_col).alias("id")).distinct().withColumn(
        "dist", F.lit(0).cast("long")
    )
    for _ in range(n_rounds):
        relax = dist.join(e, dist["id"] == e["_s"]).select(
            F.col("_d").alias("id"), (F.col("dist") + F.col("_w")).alias("dist")
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def sssp_oracle_sql(edges_cte: str, sources_cte: str, n_rounds: int) -> str:
    """ANSI-SQL replica of :func:`sssp`: the rounds unrolled as chained
    CTEs (min over the recursive term is not legal in a recursive CTE),
    integer min/plus — value-identical, not approximate. ``edges_cte``
    yields (src, dst, w); ``sources_cte`` yields (id)."""
    sql = [
        f"with e as (select src, dst, cast(w as bigint) as w from ({edges_cte})), ",
        f"d0 as (select id, cast(0 as bigint) as dist from "
        f"(select distinct id from ({sources_cte})) s), ",
    ]
    for i in range(n_rounds):
        sql.append(
            f"r{i} as (select e.dst as id, d{i}.dist + e.w as dist "
            f"from d{i} join e on e.src = d{i}.id), "
            f"d{i + 1} as (select id, min(dist) as dist from "
            f"(select * from d{i} union all select * from r{i}) u group by id), "
        )
    body = "".join(sql).rstrip().rstrip(",")
    return f"{body} select id, dist from d{n_rounds}"
