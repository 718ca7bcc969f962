package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables._

/** Similarity search over the embeddings table (`Array[Float]`, dim 64):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Numeric discipline: floats are cast to double BEFORE any arithmetic and
  * every reduction is an explicit left fold (`aggregate(zip_with(...))`), so
  * the result is bit-identical to any engine that folds left in float64 —
  * which is what makes the DuckDB `list_dot_product` oracle exact, not
  * approximate.
  *
  * At 100 TB: brute force is O(Q*N*dim) — correct but only for reranking;
  * the LSH variant buckets vectors once (one narrow shuffle on bucket id)
  * and joins within buckets, trading recall for a ~2^bits candidate
  * reduction. An IVF variant would swap the bucket function for k-means
  * centroid assignment; the join shape is identical.
  */
object Similarity {

  /** Dot product of two double-array columns: the native codegen'd
    * expression (see org.apache.spark.sql.graftbridge.DotProduct). Same
    * strict left-fold float64 semantics as [[dotHof]], which it replaced
    * after measuring ~interpreted-lambda overhead in the ANN hot path. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.dotProduct(a, b)

  /** The equivalent higher-order-function fold — kept as the semantic
    * reference implementation (a test asserts bit-equality with [[dot]]). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def vectors(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Exact cosine top-3 neighbors for the first 50 query vectors. */
  def annBruteforce(s: SparkSession, d: String): DataFrame = {
    val all = vectors(s, d)
    val q = all.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // Broadcast the 50-row QUERY side and stream the corpus past it: at any
    // real corpus size the other orientation ships the whole embedding table
    // to every executor. Same result, opposite scale behavior.
    val pairs = broadcast(q).join(all, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("nn_id"), col("rnk"), col("sim"))
  }

  private val PLANES = 6

  /** Deterministic pseudo-random hyperplanes (no RNG at query time: weights
    * derive from a splitmix-style integer mix of (plane, dim)). */
  private[ops] def planeWeights(dim: Int): Array[Array[Double]] =
    Array.tabulate(PLANES, dim) { (p, j) =>
      var z = p.toLong * 64 + j + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    }

  /** LSH-bucketed approximate top-1 neighbor: 6 sign bits -> bucket id;
    * candidates are same-bucket pairs only. Output is (q_id, nn_id, sim)
    * for queries that found any same-bucket candidate — recall < 1 by
    * design, deterministic by construction. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val planes = planeWeights(64)
    val all = vectors(s, d)
    val bucketBits = planes.zipWithIndex.map { case (w, p) =>
      val wc = typedLit(w.toSeq)
      when(dot(col("v"), wc) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = all.withColumn("bucket", bucketBits)
    val q = bucketed.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val pairs = q.join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  private val IVF_K = 16
  private val IVF_ITERS = 3
  private val IVF_NPROBE = 2

  /** Centroids as ONE 2D array literal. Inlining k separate 64-double
    * literals into the expression tree made every training job pay seconds
    * of codegen for the giant constant-folded source; a single Literal
    * serializes once and the per-element work runs through the (already
    * interpreted-safe) DotProduct eval. */
  private def centsLit(cents: Array[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq).toSeq)

  /** Similarity of `v` to each centroid, as an array aligned with cluster ids. */
  private def centroidSims(v: Column, cents: Array[Array[Double]]): Column =
    transform(centsLit(cents), c => org.apache.spark.sql.graftbridge.dotProduct(v, c))

  /** Nearest-centroid id: argmax similarity, ties to the lowest cluster
    * index (array_position returns the first match, 1-based). */
  private def assignCluster(v: Column, cents: Array[Array[Double]]): Column = {
    val sims = centroidSims(v, cents)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Deterministic k-means-lite: centroids seeded from evenly-strided
    * vec_ids, refined with a few Lloyd iterations. Centroid means use exact
    * DECIMAL sums (a raw-double avg varies with partition order, which would
    * make cluster assignments — and therefore query results — flap between
    * runs). Returns driver-side centroids; k*dim is tiny at any data scale.
    */
  private[ops] def trainIvfCentroids(s: SparkSession, d: String): Array[Array[Double]] = {
    // Training is eager (each Lloyd iteration collects centroid sums), so a
    // persist here genuinely caches across iterations — without it every
    // iteration re-reads the parquet and re-derives the projection.
    val vecs = vectors(s, d).select(col("vec_id"), col("v")).persist()
    val n = vecs.count()
    val stride = math.max(1L, n / IVF_K)
    val seedIds = (0 until IVF_K).map(i => i * stride)
    var cents: Array[Array[Double]] = vecs
      .filter(col("vec_id").isin(seedIds: _*))
      .orderBy(col("vec_id")).limit(IVF_K)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to IVF_ITERS) {
      val assigned = vecs.withColumn("cluster", assignCluster(col("v"), cents))
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(28, 12))).as("sx"), count(lit(1)).as("cn"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = Array.tabulate(IVF_K) { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = (BigDecimal(r.getDecimal(2)) / r.getLong(3)).toDouble)
            arr
          case None => cents(c) // empty cluster keeps its centroid
        }
      }
    }
    vecs.unpersist(blocking = false)
    cents
  }

  /** IVF-bucketed approximate top-1 neighbor: assign every vector to its
    * nearest trained centroid (one narrow shuffle on cluster id), probe the
    * NPROBE nearest clusters per query, exact cosine inside the probed
    * buckets only. The scale path for ANN beyond LSH: candidate count ~
    * nprobe/k of the corpus, and the bucket function adapts to the data
    * distribution (unlike fixed hyperplanes). */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val cents = trainIvfCentroids(s, d)
    val all = vectors(s, d).withColumn("cluster", assignCluster(col("v"), cents))
    // per-query probe list: the NPROBE nearest centroids
    val simStructs = transform(centroidSims(col("qv"), cents),
      (sim, i) => struct(sim.as("sim"), i.as("cl")))
    val q = all.filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("probes", slice(reverse(array_sort(simStructs)), 1, IVF_NPROBE))
      .select(col("q_id"), col("qv"), col("qn"), explode(col("probes.cl")).as("cluster"))
    val pairs = q.join(all, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nn_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("nn_id"), col("sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_ann_bruteforce" -> (annBruteforce _),
    "x_ann_lsh" -> (annLsh _),
    "x_ann_ivf" -> (annIvf _)
  )

  /** The LSH variant's bucket function (xxhash-mixed planes) is not
    * reproducible in DuckDB SQL; rows-only check. Brute force is exactly
    * oracled thanks to the left-fold discipline. */
  val oracleSql: Map[String, String] = Map(
    "x_ann_bruteforce" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM t),
        |p AS (SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
        |             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
        |      FROM n a, n b WHERE a.vec_id < 50 AND b.vec_id <> a.vec_id),
        |r AS (SELECT q_id, nn_id, sim,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS INTEGER) AS rnk
        |      FROM p)
        |SELECT q_id, nn_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin
  )
}
