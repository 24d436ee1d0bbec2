package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data curation main — the production twin of
  * the `x_curation_*` query catalog: where those emit verification
  * rollups, this WRITES the curated corpus a training job would read.
  *
  * Stages (each an already-oracled operator, composed):
  *
  *   1. curate  — exact fingerprint dedup, banded-MinHash near-dup
  *                clustering (canonical survivor per cluster),
  *                benchmark decontamination, quality-score gate
  *                ([[graft.ext.Curation.curatedDocs]], the
  *                x_curation_neardup production stack)
  *   2. split   — deterministic content-hash train/test assignment
  *                (reproducible under reordering and reruns)
  *   3. shard   — token-budgeted packing via the two-phase distributed
  *                prefix sum ([[graft.ext.Curation.assignShards]])
  *   4. write   — corpus parquet partitioned by split (shard_id in
  *                the data, so a reader targets shards by partition
  *                pruning + row-group predicate), plus a per
  *                (split, lang) manifest with doc/token totals
  *
  * Scale notes: stage 1 never shuffles document text (projected
  * fingerprints + size-gated broadcast anti-joins); stage 3 packs a
  * projected (doc_id, n_tokens, h20) frame whose only wide state is a
  * 32-row offsets table; full text moves exactly once — the doc_id
  * join attaching shard ids, whose output flows straight into the
  * partitioned write (partitionBy adds no exchange).
  *
  * Usage: runMain graft.Curate [sfDir] [outDir] [tokenBudget]
  */
object Curate {

  /** Manifest of a curation run — main's summary and `CurateSpec`'s
    * assertion surface.
    */
  final case class Result(inputDocs: Long, curatedDocs: Long,
      trainDocs: Long, testDocs: Long, shards: Long, totalTokens: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String,
      tokenBudget: Long = 2048L): Result = {
    val inputDocs = io.Sources.table(spark, sfDir, "documents").count()

    // 1. the production exact-then-fuzzy curation stack. The survivor
    // set feeds BOTH the shard-packing projection below and the final
    // corpus join — persisted once (Memos-tracked, the shardPack
    // convention) or the entire curation DAG (dedup window, MinHash
    // pair restriction, connected components, decontamination join,
    // quality scoring — document-text scans included) executes twice
    val pairs = ext.Dedup.minhashBanded(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val kept = Memos.track(
      ext.Curation.curatedDocs(spark, sfDir, Some(pairs)).persist())

    // 2-3. split + shard over the curated survivors; one persisted
    // projection feeds offsets, packing, and the final join back
    val packed = ext.Curation.assignShards(
      kept.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        conv(substring(md5(col("text").cast("binary")), 1, 5), 16, 10)
          .cast("long").as("h20")),
      tokenBudget)
    val corpus = kept
      .join(packed.select(col("doc_id"), col("n_tokens"), col("shard_id")),
        Seq("doc_id"))
      .withColumn("split",
        when(substring(md5(col("text").cast("binary")), 1, 1)
          .isin("0", "1"), "test").otherwise("train"))
      .select(col("doc_id"), col("lang"), col("split"), col("shard_id"),
        col("n_tokens"), col("quality"), col("text"))

    // 4. write corpus + manifest
    corpus.write.mode(SaveMode.Overwrite)
      .partitionBy("split")
      .parquet(s"$outDir/corpus")
    val written = spark.read.parquet(s"$outDir/corpus")
    val manifest = written
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("shard_id")).as("n_shards"))
      .orderBy(col("split"), col("lang"))
    manifest.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/manifest")

    val bySplit = written.groupBy(col("split"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = written.agg(count(lit(1)), sum(col("n_tokens")),
      countDistinct(col("shard_id"))).head()
    Result(inputDocs, totals.getLong(0),
      bySplit.getOrElse("train", 0L), bySplit.getOrElse("test", 0L),
      totals.getLong(2), totals.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir =
      args.lift(1).getOrElse("/root/repo/target/tmp/curate_out")
    val budget = args.lift(2).map(_.toLong).getOrElse(2048L)
    val spark = Sessions.local()
    val r = run(spark, sfDir, outDir, budget)
    // one summary line, Bench-style
    println(s"""{"curate":{"input":${r.inputDocs},""" +
      s""""curated":${r.curatedDocs},"train":${r.trainDocs},""" +
      s""""test":${r.testDocs},"shards":${r.shards},""" +
      s""""tokens":${r.totalTokens}}}""")
    spark.stop()
  }
}
