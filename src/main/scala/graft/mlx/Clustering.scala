package graft.mlx

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.feature.Features

/** ML operators (reference `transform.py:192-216,239-240`):
  * VectorAssembler -> KMeans(k=3, seed=1) -> label join-back renamed
  * `activity_level`, and PCA(k=2) projection. Nondeterministic across
  * Spark versions => no SQL oracle (SURVEY.md §2.8); invariants are
  * asserted in `ClusteringSpec`.
  */
object Clustering {

  /** Assemble the activity features used for clustering. Cached: KMeans
    * fit ITERATES over this frame (one job per iteration) — without the
    * cache every iteration would re-run the feature join, the
    * reference's no-cache anti-pattern (`pre_analysis.py` passim).
    * Memoized per (session, dir) so repeated calls (ml1 + ml2 in one
    * Bench/Verify run, Pipeline) share ONE cached copy instead of
    * leaking a new cache entry per invocation.
    */
  private val memo = graft.Memos.register(
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())

  /** Fit-input partition count. FIXED (not tied to session parallelism):
    * k-means|| init draws per-partition seeded samples, so the model is
    * bit-identical across cluster sizes only if the fit input's layout
    * is identical. A fixed hash-partition count + within-partition sort
    * pins that layout (verified by the two-CPU-count Verify diff). Bump
    * the constant for a bigger customer dim — determinism only requires
    * it not to FLOAT with the session.
    */
  private val FitPartitions = 16

  def assembled(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent(
      s"${System.identityHashCode(spark)}/$dir", _ => {
        val feats = Features.build(spark, dir)
          .select(col("c_custkey"), col("tx_count").cast("double"),
            col("total_spend"), col("days_since_first_order").cast("double"))
          .repartition(FitPartitions, col("c_custkey"))
          .sortWithinPartitions(col("c_custkey"))
        val df = new VectorAssembler()
          .setInputCols(Array("tx_count", "total_spend",
            "days_since_first_order"))
          .setOutputCol("features")
          .transform(feats)
          .cache()
        // force-materialize NOW: .cache() is lazy, and the first thing
        // to touch it otherwise is k-means||'s init inside fit() — the
        // feature join + repartition then executes as part of the fit's
        // first job instead of as a clearly attributed assembly step
        // (round-3 driver bench: ml1 22.5 s with the whole upstream
        // chain cold). One count = one materialization; every init
        // round and fit iteration after it reads memory.
        df.count()
        df
      })

  /** KMeans activity clustering (`transform.py:197-208`): fit, predict,
    * join label back, rename prediction -> activity_level
    * (`transform.py:239-240`).
    */
  def kmeansActivity(spark: SparkSession, dir: String): DataFrame = {
    val df = assembled(spark, dir)
    // maxIter/tol pinned EXPLICITLY at the library defaults (20, 1e-4):
    // the unscaled features don't converge in 20 rounds, so any drift in
    // the default would silently change the model — and lowering it
    // would too (see graft-build-loop notes). Same values, now visible.
    val model = new KMeans().setK(3).setSeed(1L)
      .setMaxIter(20).setTol(1e-4)
      .setFeaturesCol("features").setPredictionCol("prediction")
      .fit(df)
    // canonicalize cluster ids: raw KMeans labels permute with input
    // partitioning (k-means|| init samples per partition), so remap
    // label -> rank of its center sorted by coordinates. Output is then
    // invariant to parallelism (verified in ClusteringSpec /
    // cross-parallelism Verify diff).
    val order = model.clusterCenters.zipWithIndex
      .sortBy { case (v, _) => (v(0), v(1), v(2)) }
      .map(_._2)
    val mapping = order.zipWithIndex.toMap // original label -> canonical
    val remap = mapping.foldLeft(lit(-1)) { case (acc, (orig, canon)) =>
      when(col("prediction") === orig, lit(canon)).otherwise(acc)
    }
    model.transform(df)
      .withColumn("activity_level", remap)
      .select(col("c_custkey"), col("activity_level"))
      .orderBy(col("c_custkey"))
  }

  /** The same assemble→cluster flow composed as an `ml.Pipeline`
    * (`transform.py:10` imports it and never uses it; this is the
    * composed form a library user would actually want). Labels are
    * canonicalized identically to [[kmeansActivity]];
    * `OperatorInvariantsSpec` asserts the two are row-identical. No SQL
    * oracle (same reason as ml1).
    */
  def kmeansPipeline(spark: SparkSession, dir: String): DataFrame = {
    // reuse the memoized cached assembly minus its vector column — the
    // pipeline's own assembler rebuilds it, and the iterative fit then
    // reads the cache instead of re-running the feature join per pass
    val feats = assembled(spark, dir).drop("features")
    val assembler = new VectorAssembler()
      .setInputCols(Array("tx_count", "total_spend",
        "days_since_first_order"))
      .setOutputCol("features")
    val km = new KMeans().setK(3).setSeed(1L)
      .setMaxIter(20).setTol(1e-4)
      .setFeaturesCol("features").setPredictionCol("prediction")
    val model = new org.apache.spark.ml.Pipeline()
      .setStages(Array(assembler, km)).fit(feats)
    val centers = model.stages.last
      .asInstanceOf[org.apache.spark.ml.clustering.KMeansModel].clusterCenters
    val order = centers.zipWithIndex
      .sortBy { case (v, _) => (v(0), v(1), v(2)) }.map(_._2)
    val mapping = order.zipWithIndex.toMap
    val remap = mapping.foldLeft(lit(-1)) { case (acc, (orig, canon)) =>
      when(col("prediction") === orig, lit(canon)).otherwise(acc)
    }
    model.transform(feats)
      .withColumn("activity_level", remap)
      .select(col("c_custkey"), col("activity_level"))
      .orderBy(col("c_custkey"))
  }

  /** PCA(k=2) projection of the same features (`transform.py:210-216`). */
  def pcaProjection(spark: SparkSession, dir: String): DataFrame = {
    val df = assembled(spark, dir)
    val model = new PCA().setK(2)
      .setInputCol("features").setOutputCol("pca")
      .fit(df)
    model.transform(df)
      .withColumn("pc_arr", org.apache.spark.ml.functions.vector_to_array(col("pca")))
      .withColumn("pc", expr("transform(pc_arr, v -> floor(v * 100 + 0.5) / 100)"))
      .select(col("c_custkey"), col("pc")(0).as("pc1"), col("pc")(1).as("pc2"))
      .orderBy(col("c_custkey"))
  }

  val qs: Seq[Q] = Seq(
    Q("ml1_kmeans_activity", kmeansActivity, None, bench = true),
    Q("ml2_pca_projection", pcaProjection, None),
    Q("ml3_pipeline_compose", kmeansPipeline, None))
}
