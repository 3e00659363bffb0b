package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list —
  * iterative min-label propagation (the standard large-graph formulation,
  * cf. GraphX/Pregel connected components): every node starts labeled
  * with itself; each round every node takes the minimum label among
  * itself and its neighbors; fixpoint after O(component diameter)
  * rounds. Near-dup pair lists have tiny diameters (dup clusters are
  * dense), so 3-5 rounds close real corpora.
  *
  * Scale shape per round: one join edges⋈labels (shuffle on node id) +
  * one min-aggregate — both keyed, no cartesian anywhere; the edge list
  * is re-used every round (persisted), labels shrink to |V|. The driver
  * only sees the converged/changed COUNT per round (a scalar), never the
  * data. */
object ClusterOps {

  /** @param edges two long columns (src, dst), undirected, self-loops ok
    * @return (id, component) — component = min node id reachable */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
    // symmetrize once, and pin it PRE-PARTITIONED on dst — the key every
    // round's propagation join probes — so the cached edge list is never
    // re-exchanged: each round shuffles only the |V|-row label table
    // (before r15 the |E|-row edge side re-shuffled every round because
    // distinct() leaves it partitioned on the (src, dst) composite)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // handle to the superseded round's checkpointed block set: a
    // localCheckpoint's blocks are NOT registered with the cacheManager,
    // so Dataset.unpersist on a checkpointed round is a silent no-op and
    // the |V|-row blocks would otherwise linger until the ContextCleaner
    // GCs the old RDD — slow storage-memory release on long chains
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // each node's candidate = min over neighbors' current labels
      val viaNeighbors = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("component")).as("n_comp"))
      // Lineage truncation, not just caching: each round's plan embeds
      // the previous labels TWICE (the propagation join and the changed
      // count), so without truncation the analyzed plan doubles per
      // round — exponential, and a deep component chain (long edit
      // sequences in the CDC graph) overflows plan-string/driver memory
      // long before the data is big. localCheckpoint materializes the
      // |V|-row label table (which the changed-count forces anyway) and
      // the plan restarts O(1) — the GraphOps.pageRank cadence lesson,
      // applied every round because BOTH consumers need the
      // materialization here. Labels are integer mins: plan-independent,
      // so oracle rows are untouched.
      // the changed flag rides INSIDE the checkpointed round (computed
      // where old and new labels are already side by side), so the
      // convergence probe is a count over checkpoint blocks instead of a
      // second |V|⋈|V| join per round
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"),
          (coalesce(col("n_comp"), col("component")) < col("component")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).count()
      // round 1: frees the persisted seed table; later rounds: inert for
      // the checkpointed Dataset, so also unpersist the backing RDD whose
      // handle was saved when that round was current
      labels.unpersist()
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = next.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
        case _ => None
      }
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("component"))
  }

  /** Near-dup CLUSTERS of the document corpus: connected components over
    * the verified n-gram Jaccard pairs — the dedup decision step (keep
    * one representative per component, not per pair; transitive chains
    * a~b~c collapse into one cluster even when a,c are not themselves a
    * pair). Rows-only (component structure mirrors the engine-internal
    * pair set); fixpoint semantics pinned by spec on planted graphs. */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.ngramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs)
      .select(col("component").as("cluster_id"), col("id").as("doc_id"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Quality survivorship over NEAR-dup clusters — the production
    * decision rule after clustering: each cluster keeps its
    * BEST-QUALITY member (min stop-ratio, doc_id tie — the
    * `DedupOps.qualitySurvivor` currency applied transitively), not the
    * smallest id ([[clusterCapSample]]) and not per-pair greedy (which
    * can evict every member of a chain). Output: one row per cluster
    * with the survivor, its quality, and the member count.
    *
    * Scale shape: clusters are a vanishing fraction of the corpus; the
    * survivor is a `min(struct(sr, doc_id))` aggregate — map-side
    * combinable, no window over the cluster key — and the quality
    * column joins in on doc_id before the (tiny) cluster rollup. */
  def nearDupQualitySurvivor(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.stopRatio(col("text")).as("sr"))
    nearDupClusters(spark, dir)
      .join(q, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast(org.apache.spark.sql.types.IntegerType).as("n_members"),
        min(struct(col("sr").as("sr"), col("doc_id").as("doc_id"))).as("best"))
      .select(col("cluster_id"), col("best.doc_id").as("keep_id"),
        col("best.sr").as("keep_stop_ratio"), col("n_members"))
      .orderBy("cluster_id")
  }

  /** Cluster-capped downsampling (SemDeDup-style, Abbas et al. '23): the
    * dedup DECISION applied to the whole corpus — each near-dup cluster
    * keeps only its `keep` lowest-id members; documents outside any
    * cluster are their own singleton and always survive. Output is one
    * row per document with its cluster, in-cluster rank, and keep flag,
    * so the caller filters `kept` for the survivor corpus or inspects
    * the drop set.
    *
    * Scale shape: clusters are a vanishing fraction of the corpus, so the
    * rank window runs on the (tiny) cluster table and the corpus-side
    * join broadcasts it — the full corpus is never shuffled. Fully
    * value-oracled (components via the recursive-CTE oracle, rank via
    * row_number — deterministic by (cluster_id, doc_id)). */
  def clusterCapSample(spark: SparkSession, dir: String, keep: Int = 1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("doc_id"))
    val ranked = nearDupClusters(spark, dir)
      .withColumn("rank_in_cluster",
        row_number().over(w).cast(org.apache.spark.sql.types.IntegerType))
    Tables(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(ranked), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("rank_in_cluster"), lit(1)).as("rank_in_cluster"),
        (coalesce(col("rank_in_cluster"), lit(1)) <= keep).as("kept"))
      .orderBy("doc_id")
  }
}
