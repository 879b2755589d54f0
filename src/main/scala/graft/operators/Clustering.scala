package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph/geometry clustering for training-data curation.
  *
  * q46 — dedup-graph connected components: near-duplicate PAIRS (q40's
  * exact trigram-Jaccard join) only become a dedup DECISION once
  * transitive groups are resolved — A~B and B~C must collapse to one
  * cluster {A,B,C} with one canonical survivor, or chained dups leak
  * through pairwise-only dedup. Components are computed by iterative
  * min-label propagation over the edge list.
  *
  * q47 — distributed spherical k-means over the embedding column: the
  * corpus-clustering step of curation pipelines (topic balancing,
  * diversity sampling, per-cluster quotas). Unlike q30's IVF training
  * (bounded driver-side sample — index building), this is FULL-CORPUS
  * Lloyd's: assignment and centroid sums run as Spark aggregations on
  * executors; the driver only ever sees K*(dim+1) scalars per round.
  */
object Clustering {

  // ---------------------------------------------------------------------
  // q46 — connected components over the q40 near-dup pairs; canonical
  // doc per component = min doc_id (keep-first dedup policy). Output is
  // one row per document (singletons are their own canonical), so the
  // result is corpus-sized, never pair-sized.
  //
  // Scale shape: each round is one equi-join (edges x labels, both sides
  // 2-long rows) + a min-groupBy — label propagation converges in
  // diameter rounds, and near-dup graphs are shallow (dup clusters are
  // tight cliques/chains; measured diameter <= 3 on every SF here, 25
  // round cap as a guard). Lineage is truncated every round with an
  // eager localCheckpoint, or iteration i's plan would embed i joins.
  // (localCheckpoint trades fault tolerance for speed — executor loss
  // drops its blocks; a 100 TB deployment sets a checkpoint dir and
  // swaps in reliable checkpoint() at the same call sites.)
  // The only driver-side value per round is the O(1) convergence count.
  // For adversarial long-chain graphs the classic fix is large-star/
  // small-star contraction (O(log n) rounds, same join shape) — not
  // needed for the dedup workload this models.
  // ---------------------------------------------------------------------
  private val MaxCcRounds = 25

  def q46DedupComponents(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Dedup.q40NgramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .cache()

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < MaxCcRounds) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("lbl").as("dst_lbl")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_lbl")).as("nbr_lbl"))
      val updated = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nbr_lbl"), col("lbl")) < col("lbl")).as("moved"))
        .localCheckpoint(true)
      changed = updated.filter(col("moved")).count()
      labels = updated.select(col("node"), col("lbl"))
      round += 1
    }
    edges.unpersist()

    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("component"),
        (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Transitive closure by recursive CTE over the same exact edge set —
    * tractable at oracle SFs because the near-dup edge list is tiny. */
  val q46Sql: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(toks) >= 3
      |           THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                 for i in range(1, len(toks) - 1)]
      |           ELSE [] END) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
      |        FROM documents)),
      |e0 AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
      |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |r AS (
      |  SELECT u AS node, v AS reach FROM e
      |  UNION
      |  SELECT r.node, e.v FROM r JOIN e ON r.reach = e.u),
      |comp AS (SELECT node, LEAST(node, MIN(reach)) AS component
      |         FROM r GROUP BY node)
      |SELECT d.doc_id,
      |       COALESCE(comp.component, d.doc_id) AS component,
      |       COALESCE(comp.component, d.doc_id) = d.doc_id AS is_canonical
      |FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q47 — distributed spherical k-means (full-corpus Lloyd's).
  //
  // Per round: (1) assignment = argmax cosine against the K current
  // centroids, one fused CentroidScores projection (no shuffle);
  // (2) centroid update = posexplode(unit vector) -> groupBy(cluster,
  // dim) sum — ONE shuffle whose map-side partial aggregation collapses
  // every partition to at most K*dim rows, so shuffle volume is
  // O(partitions * K * dim), independent of corpus size; (3) the driver
  // collects K*dim sums + K counts (O(1) wrt corpus), renormalizes, and
  // broadcasts the next round's centroids inside the expression. Empty
  // clusters keep their previous centroid. Deterministic: init =
  // evenly-id-spaced corpus vectors, fixed round count.
  //
  // No SQL oracle (iterative float training); ClusteringSpec asserts
  // the spherical objective (mean cosine to assigned centroid) is
  // non-decreasing over rounds and the output partitions the corpus.
  // ---------------------------------------------------------------------
  private val KmK      = 8
  private val KmRounds = 5

  import graft.functions.GraftFunctions.centroidScores

  /** Unit-normalized corpus: (vec_id, unit array<double>). The norm is
    * LAMBDA-BOUND once per row (transform over a one-element array —
    * the q48 construct): referencing a derived norm column inside the
    * per-element division lambda would let CollapseProject inline the
    * whole sqrt(dot) tree there, recomputed per element (64x). */
  private def unitCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(
        """transform(array(sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
          |    (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
          |  nrm -> CASE WHEN nrm = 0D THEN NULL
          |              ELSE transform(embedding, x -> CAST(x AS DOUBLE) / nrm)
          |         END)[0]""".stripMargin).as("unit"))
      .filter(col("unit").isNotNull)

  /** Full-corpus Lloyd's over the embeddings table; returns (final
    * centroids, per-round mean-cosine objective trace). Exposed for the
    * spec's monotonicity assertion. */
  private[graft] def kmeansTrain(spark: SparkSession, sfDir: String,
      k: Int = KmK, rounds: Int = KmRounds): (Array[Array[Double]], Seq[Double]) =
    kmeansTrainOn(unitCorpus(spark, sfDir), k, rounds)

  /** Lloyd's over ANY (vec_id long, unit array<double>) corpus — q47
    * trains on the raw embeddings, q50 on the planted-near-dup union. */
  private[graft] def kmeansTrainOn(unitDf: DataFrame,
      k: Int, rounds: Int): (Array[Array[Double]], Seq[Double]) = {
    val corpus = unitDf.cache()
    val n = corpus.count()
    require(n >= k, s"need >= $k vectors")

    // Deterministic init: evenly-id-spaced corpus vectors (ids are
    // independent of geometry in this corpus), located via EXACT
    // distributed quantiles of vec_id — O(k) driver values, never a
    // collect of the id column (error 0.0 = Greenwald-Khanna exact
    // rank query, returns actual data points). The k init VECTORS then
    // come back through one isin-pruned scan.
    val picked0 = corpus.stat
      .approxQuantile("vec_id", Array.tabulate(k)(i => i.toDouble / k), 0.0)
      .map(_.toLong).distinct
    // rank collisions can only happen when n barely exceeds k; top up
    // deterministically from the smallest ids not already picked.
    val picked: Array[Long] =
      if (picked0.length >= k) picked0.take(k)
      else picked0 ++ corpus.select(col("vec_id")).orderBy("vec_id")
        .limit(k + picked0.length).collect().map(_.getLong(0))
        .filterNot(picked0.contains).take(k - picked0.length)
    var cents: Array[Array[Double]] = corpus
      .filter(col("vec_id").isin(picked.toSeq: _*))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)

    val objectives = Seq.newBuilder[Double]
    var r = 0
    while (r < rounds) {
      // Cached per round: the stats pass and the centroid-sum pass both
      // read `assigned`, and without the cache each would recompute the
      // K-centroid scoring scan (2x the round's dominant cost).
      val assigned = corpus.withColumn("best",
          array_max(centroidScores(col("unit"), lit(1.0), cents.map(_.toSeq).toSeq)))
        .select(col("vec_id"), col("unit"),
          col("best.c").as("cluster"), col("best.s").as("cos"))
        .cache()
      // Objective + per-cluster counts in one pass (one tiny driver row
      // per cluster); sums via the posexplode partial-agg shape.
      val stats = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cnt"), sum(col("cos")).as("sumcos"))
        .collect().map(row => row.getInt(0) -> (row.getLong(1), row.getDouble(2)))
        .toMap
      objectives += stats.values.map(_._2).sum / n
      val sums = assigned
        .select(col("cluster"), posexplode(col("unit")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"))
        .collect()
      assigned.unpersist()
      val dim = cents(0).length
      val next = Array.tabulate(k)(c => cents(c).clone())
      val acc = Array.fill(k)(new Array[Double](dim))
      sums.foreach { row =>
        acc(row.getInt(0))(row.getInt(1)) = row.getDouble(2)
      }
      var c = 0
      while (c < k) {
        if (stats.contains(c) && stats(c)._1 > 0) {
          val v = acc(c)
          val nrm = math.sqrt(v.map(x => x * x).sum)
          if (nrm > 0) next(c) = v.map(_ / nrm)
        }
        c += 1
      }
      cents = next
      r += 1
    }
    corpus.unpersist()
    (cents, objectives.result())
  }

  def q47KmeansCluster(spark: SparkSession, sfDir: String): DataFrame = {
    val (cents, _) = kmeansTrain(spark, sfDir)
    unitCorpus(spark, sfDir)
      .withColumn("best",
        array_max(centroidScores(col("unit"), lit(1.0), cents.map(_.toSeq).toSeq)))
      .select(col("best.c").as("cluster"), col("best.s").as("cos"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("cos")), 6).as("avg_cosine"))
      .orderBy("cluster")
  }

  // ---------------------------------------------------------------------
  // q50 — SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
  // k-means-partition the embedding space, then search for near-dup
  // pairs ONLY within each cluster — the clustering replaces LSH banding
  // (q26) as the candidate generator. Drop policy: a vector is dropped
  // iff a same-cluster near-dup with a smaller id exists (greedy
  // keep-first, the q15/q26 convention; transitive resolution across
  // pairs is q46's job).
  //
  // Corpus: q26's planted-near-dup union — the margin argument at
  // Similarity.scala:80-100 applies unchanged (raw isotropic embeddings
  // admit NO subquadratic complete candidate filter, so near-dup
  // detection presupposes a margin corpus).
  //
  // Scale shape: K grows linearly with the corpus
  // (K = n / SemTargetClusterSize), holding EXPECTED cluster size
  // constant, so the within-cluster pairwise verify is O(n * cluster)
  // dots — linear in corpus size, the paper's own scaling argument
  // (vs q26's LSH whose candidate count is corpus-density-driven).
  // Candidates come from an equi-self-join on the cluster id (PlanSpec
  // gates no-cross-product); a skewed cluster at 100 TB gets the same
  // medicine as any skewed join key (salt, or size-cap + re-cluster).
  //
  // Approximate BY DESIGN: a pair split across clusters is missed.
  // ClusteringSpec measures recall vs brute force (floor 0.85) and
  // asserts precision is exactly 1.0 (every emitted drop is
  // exact-cosine-verified). No SQL oracle (k-means is iterative float
  // training) — driver records a rows-only check, like q23/q30/q47.
  // ---------------------------------------------------------------------
  private val SemDupCosine         = 0.8
  private val SemTargetClusterSize = 64
  private val SemRounds            = 5

  def q50SemDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions.dot
    // Unit-normalize the planted corpus (emb is already array<double>);
    // norm lambda-bound once per row — see unitCorpus for why.
    val unit = Similarity.dupCorpus(spark, sfDir)
      .select(col("vec_id"), expr(
        """transform(array(sqrt(aggregate(emb, CAST(0 AS DOUBLE),
          |    (a, x) -> a + x * x))),
          |  nrm -> CASE WHEN nrm = 0D THEN NULL
          |              ELSE transform(emb, x -> x / nrm)
          |         END)[0]""".stripMargin).as("unit"))
      .filter(col("unit").isNotNull)

    val n = unit.count()
    val k = math.max(8, (n / SemTargetClusterSize).toInt)
    val (cents, _) = kmeansTrainOn(unit, k, SemRounds)

    val assigned = unit
      .withColumn("best",
        array_max(centroidScores(col("unit"), lit(1.0), cents.map(_.toSeq).toSeq)))
      .select(col("vec_id"), col("unit"), col("best.c").as("cluster"))
      .cache()

    // Within-cluster candidate pairs; unit vectors make cosine = dot.
    // l.vec_id > r.vec_id orients each pair once, with l the drop side.
    val dropped = assigned.as("l")
      .join(assigned.as("r"),
        col("l.cluster") === col("r.cluster") &&
          col("l.vec_id") > col("r.vec_id"))
      .filter(dot(col("l.unit"), col("r.unit")) >= SemDupCosine)
      .select(col("l.vec_id").as("vec_id")).distinct()
      .withColumn("is_dropped", lit(true))

    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        (!coalesce(col("is_dropped"), lit(false))).as("is_kept"))
      .orderBy("vec_id")
  }
}
