"""Link-graph analytics — PageRank over crawl hyperlink edges.

A web-scale index wants a query-independent document prior, and the
classic one is PageRank over the crawl's link graph (Brin & Page 1998;
the iterated power method below is the standard published formulation).
The reference engine has no link analysis (its corpus is a flat TSV);
at 10^12 pages it is a first-class ranking signal, so it ships here as
an operator with a fully unrolled SQL oracle.

Spark shape per power iteration:

    contribs = edges ⋈ ranks (on src)  → groupBy(dst).sum(rank/outdeg)
    ranks'   = nodes ⟕ contribs        → (1−d)/N + d·(contrib + dangling/N)

* ``edges``+``outdeg`` are computed once, persisted, and re-joined every
  iteration — the join key never changes, so on a real cluster both
  sides should be bucketed/co-partitioned by src (here AQE handles it).
* dangling mass (ranks of nodes with no out-links) is redistributed
  uniformly each iteration, keeping the rank vector a probability
  distribution — the textbook correction, and a 1-row broadcast agg.
* iteration count is FIXED (no driver-side convergence loop reading the
  whole vector): at 10^12 nodes a convergence test is itself a job, and
  fixed-k power iteration is what production systems run. Lineage is
  truncated every few iterations (localCheckpoint) so the plan does not
  grow unboundedly with k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import PersistRegistry

_PERSISTED = PersistRegistry()

# truncate lineage this often: each iteration stacks two joins + an agg
# onto the plan, and past ~8 stacked iterations analysis/codegen time
# dominates the actual work
_CHECKPOINT_EVERY = 4


def release_caches() -> None:
    """Unpersist frames retained by the last pagerank() call."""
    _PERSISTED.drain()


def pagerank(edges: DataFrame, n_iter: int = 5, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """→ (node, rank) after ``n_iter`` power iterations at the given
    damping, starting uniform. Duplicate edges count once (distinct);
    self-loops participate like any edge. Ranks sum to 1 (dangling mass
    redistributed uniformly).

    The returned frame is backed by persisted intermediates released on
    the next pagerank() call or via release_caches()."""
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0: {n_iter}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")
    release_caches()
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    _PERSISTED.add(nodes)
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # weighted edges: (src, dst, 1/deg) — the only per-iteration join
    # input; persisted once, its partitioning reused by every iteration
    we = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).persist()
    _PERSISTED.add(we)
    n = nodes.count()  # also materializes the persisted node set
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        contrib = (
            we.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("contrib"))
        )
        # dangling = total rank minus rank held by nodes WITH out-links
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "node"),
                       "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def synth_edges(docs: DataFrame, n_docs: int, fanout: int = 3,
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic link graph over a document table:
    doc i links to (i²·13 + j·31 + 7) mod N for j in 1..fanout — the
    quadratic makes in-degrees collide (a linear map would be a
    bijection per j, i.e. a regular graph with the uniform stationary
    distribution, proving nothing). Used by the driver contract and
    tests (the corpus carries no real hyperlink column); the FORMULA is
    mirrored verbatim in the SQL oracle. Narrow (explode over a literal
    sequence), no shuffle."""
    return docs.select(
        F.col(id_col).alias("src"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(fanout)),
                lambda j: (F.col(id_col) * F.col(id_col) * 13 + j * 31 + 7)
                % n_docs,
            )
        ).alias("dst"),
    )


def pagerank_oracle_parts(n_iter: int = 5, damping: float = 0.85,
                          fanout: int = 3) -> tuple[list[str], str]:
    """(CTE definitions, final rank CTE name) for the unrolled power
    iteration — exposed separately so composite oracles (e.g. BM25 +
    PageRank prior) can splice the chain into a larger WITH clause.
    CTE names (nn/e/nodes/outdeg/r*/dm*/c*) are chosen not to collide
    with the retrieval oracles' names (tok/tf/dl/stats/df/q/w)."""
    d = repr(float(damping))
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"""e AS (SELECT DISTINCT doc_id AS src,
                       (doc_id * doc_id * 13 + j * 31 + 7)
                           % (SELECT n FROM nn) AS dst
                FROM documents, generate_series(1, {fanout}) AS t(j))""",
        """nodes AS (SELECT src AS node FROM e
                   UNION SELECT dst FROM e)""",
        """outdeg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)""",
        """r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank
                FROM nodes)""",
    ]
    for i in range(n_iter):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(f"""dm{i} AS (
            SELECT COALESCE(SUM(rank), 0) AS m FROM {p}
            WHERE node NOT IN (SELECT src FROM outdeg))""")
        parts.append(f"""c{i} AS (
            SELECT e.dst AS node, SUM({p}.rank / outdeg.deg) AS contrib
            FROM e JOIN {p} ON e.src = {p}.node
            JOIN outdeg ON e.src = outdeg.src
            GROUP BY e.dst)""")
        parts.append(f"""{c} AS (
            SELECT nodes.node,
                   (1 - {d}) / (SELECT n FROM nn)
                   + {d} * (COALESCE(c{i}.contrib, 0)
                            + (SELECT m FROM dm{i}) / (SELECT n FROM nn))
                   AS rank
            FROM nodes LEFT JOIN c{i} USING (node))""")
    return parts, f"r{n_iter}"


def pagerank_oracle_sql(n_iter: int = 5, damping: float = 0.85,
                        fanout: int = 3) -> str:
    """DuckDB oracle for pagerank(synth_edges(documents)) — the power
    iteration unrolled as one CTE chain per iteration (deterministic,
    no recursion), mirroring the engine's dangling-mass redistribution
    exactly. Generated so engine and oracle share iteration count,
    damping, and the edge formula."""
    parts, final = pagerank_oracle_parts(n_iter, damping, fanout)
    parts_sql = ",\n".join(parts)
    return (f"WITH {parts_sql}\n"
            f"SELECT node, ROUND(rank, 6) AS rank FROM {final}")
