"""Graph-stack stress at crawl scale: distributed synthetic host graph with
PLANTED structure, exact expected answers, wall-clock timings.

    python -m tstore_spark.tools.graph_stress [local[N]] [n_edges]

Generates the edge list entirely JVM-side (no Python in the generator): the
host universe is split into COMMUNITIES of ``community_size`` hosts; every
community gets a Hamiltonian ring (guaranteed connected) plus seeded-hash
intra-community chords up to the requested edge budget. Ground truth is
exact and countable:

- connected_components must find EXACTLY n_hosts/community_size components,
  each of size community_size, labeled by its minimum host id;
- pagerank's integer recursion must be bit-identical across parallelism
  levels (rank multisets compared between local[2] and the requested
  master) — the same exactness bar parcheck holds the rollup cascade to;
- total rank mass never exceeds ``scale`` (integer division only leaks);
- k_core(k=2) over the graph plus a planted 5-node pendant tail per
  community must peel EXACTLY the tails (every ring node keeps degree
  >= 2) — a multi-round peel with countable truth at a million edges;
- bfs_hops from community 0's anchor must reach EXACTLY community 0's
  hosts plus its tail (communities are disconnected), bit-identical
  across parallelism.

Prints one JSON line with edges/sec per stage.
"""

from __future__ import annotations

import json
import sys
import time


def synth_host_graph(spark, n_edges: int, community_size: int = 1000):
    """Deterministic community-structured edge list, all Catalyst exprs.

    Ring edges come first (one per host: i -> i+1 mod size within the
    community); remaining budget becomes hash chords (i -> xxhash64-derived
    peer in the same community). Host ids are strings ('h<k>') so the run
    exercises the string-keyed path the crawl graph uses.
    """
    from pyspark.sql import functions as F

    # ring uses one edge per host; cap hosts at half the budget (rounded to
    # whole communities) so chords get the other half
    n_hosts = max(community_size, (n_edges // 2) - ((n_edges // 2) % community_size))
    ring = (
        spark.range(n_hosts)
        .select(
            F.col("id").alias("_src"),
            (
                (F.col("id") - F.col("id") % community_size)
                + (F.col("id") + 1) % community_size
            ).alias("_dst"),
        )
    )
    n_chords = max(0, n_edges - n_hosts)
    chords = (
        spark.range(n_chords)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_hosts)).alias("_src"),
            F.col("id").alias("_i"),
        )
        .select(
            "_src",
            (
                (F.col("_src") - F.col("_src") % community_size)
                + F.pmod(F.xxhash64(F.col("_i"), F.lit(2)), F.lit(community_size))
            ).alias("_dst"),
        )
        .where(F.col("_src") != F.col("_dst"))
    )
    # distinct: a chord can coincide with a ring edge or another chord, and
    # pagerank's contract (like host_edges') is a simple graph
    edges = (
        ring.unionByName(chords)
        .select(
            F.concat(F.lit("h"), F.col("_src").cast("string")).alias("src"),
            F.concat(F.lit("h"), F.col("_dst").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return edges, n_hosts


def main(master: str = "local[16]", n_edges: int = 1_000_000) -> dict:
    from pyspark.sql import functions as F

    from tstore_spark.operators.graph import connected_components, pagerank
    from tstore_spark.session import get_spark

    community = 1000
    spark = get_spark(app_name="graph_stress", master=master)
    edges, n_hosts = synth_host_graph(spark, n_edges, community)
    edges = edges.repartition(32).localCheckpoint(eager=True)  # freeze the input
    n_real = edges.count()
    out = {"master": master, "n_edges": n_real, "n_hosts": n_hosts}

    t0 = time.time()
    comp = connected_components(edges)
    sizes = (
        comp.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    dt = time.time() - t0
    want_components = n_hosts // community
    got = {r["n"]: r["k"] for r in sizes}
    assert got == {community: want_components}, f"component structure wrong: {got}"
    out["components"] = {"seconds": round(dt, 2), "edges_per_sec": int(n_real / dt)}

    t0 = time.time()
    ranks = pagerank(edges, iterations=5)
    mass = ranks.agg(F.sum("rank")).head()[0]
    dt = time.time() - t0
    assert mass <= 10**12, mass
    out["pagerank"] = {
        "seconds": round(dt, 2),
        "edges_per_sec_per_iter": int(5 * n_real / dt / 5),
        "mass_retained": round(mass / 10**12, 6),
    }

    # exactness under partitioning: the (node, rank) multiset digest must be
    # identical when the input arrives in 3 partitions vs 32 (integer sums
    # are order-independent — the property the whole recursion rests on)
    def digest(df):
        return (
            df.select(F.xxhash64("node", "rank").alias("h"))
            .agg(F.expr("bit_xor(h)"))
            .head()[0]
        )

    h_a = digest(ranks)
    h_b = digest(pagerank(edges.repartition(3), iterations=5))
    assert h_a == h_b, "pagerank differs across partitioning"
    out["deterministic_across_partitioning"] = True

    # ------------------------------------------------------------------
    # k-core + BFS with planted truth: hang a 5-node pendant tail off each
    # community's anchor host. k=2 peeling must eat EXACTLY the tails
    # (ring nodes keep degree >= 2); BFS from community 0's anchor must
    # reach EXACTLY its community + its tail.
    # ------------------------------------------------------------------
    from tstore_spark.operators.graph import bfs_hops, k_core

    n_comm = n_hosts // community
    comm = spark.range(n_comm)
    anchor = F.concat(F.lit("h"), (F.col("id") * community).cast("string"))
    tail_parts = []
    for i in range(5):
        src = anchor if i == 0 else F.concat(
            F.lit("t"), F.col("id").cast("string"), F.lit(f"_{i - 1}")
        )
        dst = F.concat(F.lit("t"), F.col("id").cast("string"), F.lit(f"_{i}"))
        tail_parts.append(comm.select(src.alias("src"), dst.alias("dst")))
    tails = tail_parts[0]
    for p in tail_parts[1:]:
        tails = tails.unionByName(p)
    with_tails = edges.unionByName(tails).localCheckpoint(eager=True)

    t0 = time.time()
    core = k_core(with_tails, k=2, max_rounds=12)
    n_core, min_deg, n_tail_in_core = core.agg(
        F.count(F.lit(1)),
        F.min("degree"),
        F.count(F.when(F.col("node").startswith("t"), 1)),
    ).head()
    dt = time.time() - t0
    assert (n_core, n_tail_in_core) == (n_hosts, 0) and min_deg >= 2, (
        n_core, min_deg, n_tail_in_core,
    )
    out["k_core"] = {"seconds": round(dt, 2), "edges_per_sec": int(n_real / dt)}

    t0 = time.time()
    reach = bfs_hops(with_tails, ["h0"], max_hops=600, directed=False)
    n_reach, n_tail_reach, max_h = reach.agg(
        F.count(F.lit(1)),
        F.count(F.when(F.col("node").startswith("t0_"), 1)),
        F.max("hops"),
    ).head()
    dt = time.time() - t0
    assert (n_reach, n_tail_reach) == (community + 5, 5), (n_reach, n_tail_reach)
    out["bfs"] = {
        "seconds": round(dt, 2),
        "reached": int(n_reach),
        "max_hops": int(max_h),
    }
    h_a = digest(reach.withColumnRenamed("hops", "rank"))
    h_b = digest(
        bfs_hops(with_tails.repartition(3), ["h0"], max_hops=600, directed=False)
        .withColumnRenamed("hops", "rank")
    )
    assert h_a == h_b, "bfs differs across partitioning"
    spark.stop()
    return out


if __name__ == "__main__":
    m = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    print(json.dumps(main(m, n)))
