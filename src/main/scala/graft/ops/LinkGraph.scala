package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank over the crawl's host graph — the classic frontier
  * prioritizer (Page et al. 1999; Cho/Garcia-Molina/Page WWW'98 showed
  * PageRank-ordered crawling finds important pages first). The
  * reference schedules purely by recency (`WebCrawler.Core`'s
  * newest-first catalog order); a 10^10-URL frontier also needs a
  * global host-importance signal to split the politeness budget, which
  * is what this operator computes from the observed link graph.
  *
  * All arithmetic is 64-bit integer (rank fixed-point at `base`,
  * damping as a percent, every division an integer `div`), so the
  * result is bit-reproducible across engines and cluster sizes — a
  * DuckDB oracle replays the iterations exactly. Deviation from the
  * textbook formulation, chosen for determinism and mirrored by the
  * oracle: dangling-host mass is dropped (not redistributed), i.e. a
  * host with no outlinks leaks its damped mass to teleport only.
  *
  * Scale shape (the plan you'd want at 10^8 hosts):
  *  - edges are normalized (self-loops out, duplicates collapsed),
  *    joined ONCE with out-degrees, hash-partitioned by `src` and
  *    persisted — the expensive side never moves again (the cached
  *    scan keeps its outputPartitioning, so per-iteration joins
  *    reshuffle only the slim rank table);
  *  - each iteration moves (host, long) pairs twice: ranks shuffle to
  *    the edge partitioning for the contribution join, contributions
  *    hash-aggregate onto `dst` (map-side partial sums first);
  *  - per-iteration `localCheckpoint` truncates the lineage, the
  *    `dupClusters` precedent — an iterative plan otherwise doubles
  *    per round;
  *  - no driver collection anywhere; node count never materializes on
  *    the driver.
  */
object LinkGraph {

  /** Iterative damped rank over a directed host graph.
    *
    * @param edges   (src, dst) string pairs; duplicates and self-loops
    *                are removed here so callers can pass raw sightings
    * @param iterations fixed iteration count (rank is deterministic in
    *                it; convergence detection would cost an extra
    *                action per round for nothing at fixed depth)
    * @param base    fixed-point scale: every node starts at `base`
    * @param dampPct damping factor in percent (85 = the classic 0.85)
    * @return (host, rank_score) — one row per node that appears as an
    *         endpoint; rank_score in [base*(100-dampPct)/100, …]
    */
  def hostRank(edges: DataFrame, iterations: Int,
               base: Long = 1000000000000L, dampPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampPct >= 0 && dampPct <= 100)
    val e0 = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    // the heavy side: partition by the join key once, cache — iterations
    // reuse the exchange and shuffle only (host, rank) pairs
    val e = e0.join(deg, "src").repartition(col("src")).persist()
    val nodes = e0.select(col("src").as("host"))
      .union(e0.select(col("dst").as("host"))).distinct().persist()
    val teleport = base / 100L * (100L - dampPct) +
      base % 100L * (100L - dampPct) / 100L // == base*(100-d)/100 w/o overflow
    var r = nodes.select(col("host"), lit(base).as("rank_score"))
    for (_ <- 1 to iterations) {
      val sums = e.join(r, e("src") === r("host"))
        .select(col("dst"),
          expr("rank_score div deg").cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      r = nodes.join(sums, nodes("host") === sums("dst"), "left")
        .select(col("host"),
          (lit(teleport) +
            expr(s"$dampPct * coalesce(c, 0L) div 100").cast("long"))
            .as("rank_score"))
        .localCheckpoint()
    }
    e.unpersist(); nodes.unpersist()
    r
  }
}
