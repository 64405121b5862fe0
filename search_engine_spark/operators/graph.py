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


def connected_components(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """→ (node, component): undirected connected components, component =
    the MINIMUM node id in each component (the deterministic canonical
    representative — the same min-id convention as every dedup operator
    here).

    This is what turns a near-duplicate PAIR set (simhash_pairs,
    embedding_near_dups, minhash candidates) into dedup CLUSTERS: pairs
    are edges, a cluster is a component, and `component` is the survivor
    every member collapses to — transitively, so A~B~C dedups to one doc
    even when A~C was never emitted as a pair.

    Algorithm: hash-min label propagation. Labels start at the node id;
    each round every node takes the min of its own label and its
    neighbors' labels; converged when no label changes. Rounds needed =
    graph diameter (≤ log-ish for the star/clique shapes near-dup graphs
    take; bounded by ``max_iter`` against pathological chains — a path
    graph of length > max_iter raises rather than returning wrong
    components). Per round: one join edges⋈labels + one min-agg — both
    keyed on node ids, co-partitionable on a real cluster; the
    convergence probe reads ONE scalar (changed-row count) per round,
    never the vector. Lineage truncates every _CHECKPOINT_EVERY rounds
    like pagerank.

    Like pagerank, the returned frame is backed by persisted
    intermediates released at the next graph-module call (module
    convention: one live graph result at a time) or via
    release_caches()."""
    release_caches()
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"),
                            F.col(src_col).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    _PERSISTED.add(sym)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    _PERSISTED.add(labels)
    labels.count()
    for i in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b")
                     .withColumnRenamed("component", "_nc"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("_nc").alias("_m"))
        )
        nxt = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"),
                        F.coalesce(F.col("_m"), F.col("component")))
                .alias("component"),
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            _PERSISTED.add(nxt)
        changed = (
            nxt.withColumnRenamed("component", "_new")
            .join(labels, "node")
            .filter(F.col("_new") != F.col("component"))
            .limit(1).count()
        )
        labels = nxt
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter — raise it for chain-shaped "
        "graphs)")


def dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b") -> DataFrame:
    """→ (doc_id, rep): transitive dedup clusters from a near-dup pair
    frame — every doc that appears in any pair, mapped to its cluster's
    min-id representative (connected_components on the pair graph).
    Docs in no pair are their own singletons and are simply absent here
    (semantics match the pairwise operators: absent = keep)."""
    cc = connected_components(pairs, src_col=a_col, dst_col=b_col)
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("rep"))


def anchor_index(edges: DataFrame, anchor_col: str = "anchor",
                 dst_col: str = "dst", cache: bool = True):
    """Build the ANCHOR-FIELD inverted index from inbound-link anchor
    text → an operators.search.InvertedIndex over (term, target-doc)
    postings.

    Anchor text is the second classic query-independent web signal after
    PageRank: the words other pages use to link to a document often
    describe it better than its own body (the reference engine has no
    link data at all — its corpus is a flat TSV). Semantics: each edge's
    anchor tokenizes independently (lowercase, whitespace split — the
    JVM-expressible simple analyzer, so the whole build is one narrow
    explode plus two aggregations); a term's tf against a target doc is
    its TOTAL count across all inbound links, the standard
    count-weighted anchor model. Duplicate edges contribute duplicate
    anchors by design (two links are two endorsements).

    Scale shape: identical to the body postings build — explode is
    narrow, both aggs key on (term, doc_id)/(doc_id), so a mega-indegree
    page (every crawl has them) spreads across reducers by term instead
    of hot-spotting one. dl rides in the postings like the body index
    (no doc_stats join at query time). Score it with
    search.search_freetext_tokens or blend body+anchor via
    search.search_fielded."""
    from ..functions.analyzer import AnalyzerConfig
    from .search import InvertedIndex

    toks = edges.select(
        F.col(dst_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(anchor_col), F.lit(""))),
                        r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    doc_stats = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    postings = (
        toks.groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
        .join(doc_stats, "doc_id")
    )
    term_stats = postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    if cache:
        postings = postings.cache()
        doc_stats = doc_stats.cache()
        term_stats = term_stats.cache()
    row = doc_stats.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total"),
    ).collect()[0]
    n, total = row["n"], int(row["total"])
    stats = {"n_docs": n, "total_len": total,
             "avgdl": (total / n) if n else 0.0}
    return InvertedIndex(postings=postings, doc_stats=doc_stats,
                         term_stats=term_stats, stats=stats,
                         analyzer=AnalyzerConfig.simple())


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


def hits(edges: DataFrame, n_iter: int = 5,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """HITS (Kleinberg hubs & authorities) → (node, hub, authority)
    after ``n_iter`` mutual-reinforcement iterations with L2
    normalization per half-step (the classic formulation): authority =
    normalized in-link hub mass, hub = normalized out-link authority
    mass. Complements PageRank on the same link graph: PageRank ranks
    global endorsement, HITS separates directories (hubs) from
    destinations (authorities).

    Same plan shape as pagerank: ONE persisted distinct-edge frame
    reused by every iteration's two joins; normalization is a 1-row
    aggregate broadcast back (never a shuffle of the score frame);
    duplicate edges count once. Nodes with no in-links hold authority 0
    (resp. hubs 0 for no out-links); scores start at 1 (the per-step
    normalization makes the start scale irrelevant)."""
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0: {n_iter}")
    release_caches()
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst")).distinct().persist())
    _PERSISTED.add(e)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    _PERSISTED.add(nodes)
    if nodes.count() == 0:
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("authority"))

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = nodes.select("node", F.lit(1.0).alias("authority"))
    for _ in range(n_iter):
        # each half-step references its predecessor TWICE (mass join +
        # norm aggregate), so an unmaterialized chain grows the logical
        # plan 4x per iteration — persist+count pins every half-step to
        # a node-count-sized cache (the per-iteration checkpoint any
        # distributed HITS needs; same discipline as pagerank's
        # lineage truncation, applied every step because of the double
        # reference)
        raw_a = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_ra"))
        ).persist()  # referenced twice within the half-step (mass + norm)
        _PERSISTED.add(raw_a)
        a_norm = raw_a.agg(
            F.sqrt(F.sum(F.col("_ra") * F.col("_ra"))).alias("_n"))
        auths = (
            nodes.join(raw_a, "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select("node",
                    F.coalesce(F.col("_ra") / F.col("_n"), F.lit(0.0))
                    .alias("authority"))
        )
        auths = auths.localCheckpoint(eager=True)
        raw_h = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("_rh"))
        ).persist()  # referenced twice within the half-step (mass + norm)
        _PERSISTED.add(raw_h)
        h_norm = raw_h.agg(
            F.sqrt(F.sum(F.col("_rh") * F.col("_rh"))).alias("_n"))
        hubs = (
            nodes.join(raw_h, "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .select("node",
                    F.coalesce(F.col("_rh") / F.col("_n"), F.lit(0.0))
                    .alias("hub"))
        )
        # localCheckpoint (not persist): the double reference makes the
        # LOGICAL plan grow ~4x per iteration, and caching does not stop
        # the analyzer from walking that tree — checkpointing pins each
        # half-step to its materialized RDD, same as pagerank:112
        hubs = hubs.localCheckpoint(eager=True)
    return (nodes.join(hubs, "node", "left")
            .join(auths, "node", "left")
            .select("node",
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                    F.coalesce("authority", F.lit(0.0)).alias("authority")))


def hits_oracle_sql(n_iter: int = 5, fanout: int = 3) -> str:
    """DuckDB oracle for hits(synth_edges(documents)) — the mutual
    reinforcement unrolled as one CTE pair per iteration with the same
    L2 half-step normalization (shared edge formula with the pagerank
    oracle)."""
    if n_iter < 1:
        raise ValueError("hits_oracle_sql needs n_iter >= 1")
    # CTE discipline: DuckDB INLINES CTEs — a sub-CTE referenced twice
    # is evaluated twice, and a per-iteration double reference compounds
    # to 2^iters. Each half-step below references its predecessor ONCE
    # (the L2 norm comes from a SUM(..) OVER () window in the same
    # subquery, not a second scalar-subquery scan), keeping the unrolled
    # chain linear like the pagerank oracle.
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"""e AS (SELECT DISTINCT doc_id AS src,
                       (doc_id * doc_id * 13 + j * 31 + 7)
                           % (SELECT n FROM nn) AS dst
                FROM documents, generate_series(1, {fanout}) AS t(j))""",
        """nodes AS (SELECT src AS node FROM e
                   UNION SELECT dst FROM e)""",
        "h0 AS (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    for i in range(n_iter):
        hp, hn = f"h{i}", f"h{i + 1}"
        parts.append(f"""a{i} AS (
            SELECT nodes.node, COALESCE(t.ra / t.nrm, 0) AS authority
            FROM nodes LEFT JOIN (
                SELECT node, ra, sqrt(SUM(ra * ra) OVER ()) AS nrm
                FROM (SELECT e.dst AS node, SUM({hp}.hub) AS ra
                      FROM e JOIN {hp} ON e.src = {hp}.node
                      GROUP BY e.dst)
            ) t USING (node))""")
        parts.append(f"""{hn} AS (
            SELECT nodes.node, COALESCE(t.rh / t.nrm, 0) AS hub
            FROM nodes LEFT JOIN (
                SELECT node, rh, sqrt(SUM(rh * rh) OVER ()) AS nrm
                FROM (SELECT e.src AS node, SUM(a{i}.authority) AS rh
                      FROM e JOIN a{i} ON e.dst = a{i}.node
                      GROUP BY e.src)
            ) t USING (node))""")
    parts_sql = ",\n".join(parts)
    last = n_iter - 1
    return (f"WITH {parts_sql}\n"
            f"SELECT nodes.node, ROUND(h{n_iter}.hub, 6) AS hub,"
            f" ROUND(a{last}.authority, 6) AS authority\n"
            f"FROM nodes LEFT JOIN h{n_iter} USING (node)"
            f" LEFT JOIN a{last} USING (node)")
