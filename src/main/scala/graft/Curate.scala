package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  *                (split, lang) manifest with doc/token totals, plus
  *                an input-skew advisory (the edit-dedup block-cap
  *                cell census — empty on clean corpora), plus an
  *                estimate companion (per-stage predicted vs actual
  *                cardinalities — [[predict]]) so the scheduled job is
  *                as observable as the reference notebook's printed
  *                per-rule counts
  *
  * Degradation honesty (round-17 ADVICE): this main dedups via exact
  * fingerprints + banded MinHash — the edit-dedup arm and its block-cap
  * reroute never run here, so the advisory's rows CLAIM nothing about
  * this job's behavior. They name the (source, lang, length-bucket)
  * cells past [[graft.ext.Dedup.EditDedupMaxBlockDocs]] — i.e. where a
  * pipeline routing this corpus through `x_edit_dedup` WOULD degrade
  * to SNM recall, and equally the skew hot-spots of any cell-blocked
  * operator — hence `would_reroute_edit_dedup`, not `rerouted`. The
  * dedup this main DOES run degrades silently only via banding recall
  * (8 bands x 2 rows: candidate probability 1-(1-j^2)^8 = 0.90 at the
  * j=0.5 threshold, ~1 for the planted near-dups); that recall is
  * censused by the `x_curation_neardup` verified twin against the
  * exact-Jaccard truth set (measured 1.0 at all three sf), NOT per
  * run — the truth recomputation is the corpus-pair join this main's
  * whole design avoids paying.
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
    * assertion surface. `advisoryCells` counts the rows of the
    * input-skew advisory written alongside the corpus (0 on every
    * clean corpus). No cap override parameter: the advisory censuses
    * against the one red line the standalone report publishes
    * ([[graft.ext.Dedup.EditDedupMaxBlockDocs]]) — a reparameterized
    * census would disagree with `x_edit_dedup_reroute_report` about
    * which cells are hot, and `CurateSpec` fire-drills with a fixture
    * that trips the default cap instead.
    */
  final case class Result(inputDocs: Long, curatedDocs: Long,
      trainDocs: Long, testDocs: Long, shards: Long, totalTokens: Long,
      advisoryCells: Long,
      estimates: Seq[(String, Long, Long)] = Nil)

  /** Pre-run cardinality predictions for the companion's six stages —
    * computed BEFORE the pipeline executes, from a bounded pilot
    * sample plus analytic constants, never from the pipeline's own
    * outputs (a "prediction" read off the actuals would be the
    * estimate lying about its own skill).
    */
  private[graft] final case class Prediction(curated: Long, train: Long,
      test: Long, shards: Long, tokens: Long)

  /** Pilot-sample size target. ~10k docs bounds the estimator's
    * statistical error near 1% while keeping the pilot scan O(1) in
    * corpus size (see [[pilotSample]]).
    */
  private[graft] val PilotTarget = 10000L

  /** A bounded pilot: the heads of at most `target` EVENLY-STRIDED
    * scan partitions, ~`target` rows total no matter the corpus size.
    * At 100 TB a seeded `df.sample(fraction)` is the wrong tool — it
    * deserializes every row to keep one in a million — while a bare
    * `limit(n)` reads only the first file(s) and samples a single
    * source's prefix. Probing a strided subset of partitions reads one
    * leading row-group per probed file (the iterator stops, and
    * parquet IO stops with it), spans the file list end to end (files
    * group by source, so the stride crosses sources), launches only
    * min(partitions, target) tasks — NOT one per partition, which at
    * ~1M-file scale would make the "cheap" pilot scheduler-bound and
    * its row count O(#files) (round-19 review) — and collects a
    * bounded ~target rows to re-parallelize as one slice (the
    * skew-advisory pattern). `sparkContext.runJob` on the chosen
    * partition indices is the rare genuine below-SQL case: no SQL
    * operator reads "k rows from these partitions" without a full
    * scan or a window shuffle.
    */
  private[graft] def pilotSample(docs: DataFrame,
      target: Long = PilotTarget): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.rdd
    val parts = rdd.getNumPartitions
    if (parts == 0) {
      // An empty parquet read has zero partitions; runJob on index 0
      // would throw before stage 1 — forecast from zero rows instead.
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docs.schema)
    } else {
      val probed = math.min(parts.toLong, math.max(1L, target)).toInt
      // Evenly spaced indices computed directly: a floored stride
      // (parts / probed) collapses to 1 whenever
      // target < parts < 2*target, sampling only a PREFIX of the file
      // list — and files group by source, so later sources would never
      // be probed. floor(i*parts/probed) is strictly increasing while
      // probed <= parts (guaranteed by the min above), so the indices
      // are distinct by construction and idx.size == probed.
      val idx = (0 until probed)
        .map(i => ((i.toLong * parts) / probed).toInt)
      val k = math.max(1L, (target + idx.size - 1) / idx.size).toInt
      val rows = spark.sparkContext
        .runJob(rdd, (it: Iterator[org.apache.spark.sql.Row]) =>
          it.take(k).toArray, idx)
        .flatten.toIndexedSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), docs.schema)
    }
  }

  /** Predict the run's stage cardinalities from one aggregate over the
    * pilot (the reference notebook's printed before/after counts,
    * turned into a forecast):
    *
    *  - exact-dedup survivors: `approx_count_distinct` over the SAME
    *    fingerprint expression the dedup window partitions on
    *    ([[graft.ext.Curation.exactFingerprint]]), scaled by the pilot
    *    distinct rate;
    *  - benchmark slice: analytic 36/37 keep rate (`doc_id % 37`);
    *  - quality gate: the pilot pass rate through the SAME scoring
    *    expression the gate applies
    *    ([[graft.ext.Curation.withQuality]]);
    *  - split: analytic 2/16 test rate (md5 first hex digit in
    *    {0,1} — uniform by construction);
    *  - tokens/shards: pilot mean tokens-per-doc x predicted
    *    survivors, budget-divided.
    *
    * DELIBERATELY unmodeled: near-dup clustering and n-gram
    * contamination — both are pairwise/corpus-global effects a bounded
    * pilot cannot see (a 10k pilot of a 100 TB corpus contains ~zero
    * of its near-dup PAIRS), so the estimate predicts them as zero
    * removals and the companion's `rel_error` column SURFACES their
    * true rate instead of hiding a guess inside the prediction. A
    * drifting rel_error on `curated` is the signal a scheduler alarms
    * on — exactly how optimizer cardinality estimates earn their keep.
    */
  private[graft] def predict(spark: SparkSession, sfDir: String,
      inputDocs: Long, tokenBudget: Long): Prediction =
    predictFrom(
      io.Sources.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars")),
      inputDocs, tokenBudget)

  /** [[predict]] over an explicit documents frame — the testable core
    * (`CurateSpec` drives degenerate corpora through it directly).
    */
  private[graft] def predictFrom(docs: DataFrame,
      inputDocs: Long, tokenBudget: Long): Prediction = {
    val row = ext.Curation.withQuality(pilotSample(docs)).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(ext.Curation.exactFingerprint).as("n_fp"),
      avg(size(split(col("text"), " ")).cast("double")).as("avg_tokens"),
      avg(when(col("quality") >= ext.Curation.QualityGateMin, 1.0)
        .otherwise(0.0)).as("pass_rate")).head()
    val n = row.getLong(0)
    if (n == 0L) return Prediction(0L, 0L, 0L, 0L, 0L)
    // avg over all-null token counts (every pilot text null) is null —
    // a degenerate corpus the pipeline itself would reject later at
    // the quality gate / zero-survivor guard; forecast zeros instead
    // of NPE-ing before stage 1 (round-19 review)
    val avgTokens = if (row.isNullAt(2)) 0.0 else row.getDouble(2)
    val distinctRate = math.min(1.0, row.getLong(1).toDouble / n)
    val benchKeep = 36.0 / 37.0
    val curated = math.max(1L,
      math.round(inputDocs * distinctRate * benchKeep * row.getDouble(3)))
    val test = math.round(curated * 2.0 / 16.0)
    val tokens = math.max(1L, math.round(curated * avgTokens))
    Prediction(curated, curated - test, test,
      math.max(1L, (tokens + tokenBudget - 1L) / tokenBudget), tokens)
  }

  def run(spark: SparkSession, sfDir: String, outDir: String,
      tokenBudget: Long = 2048L): Result = {
    // the skew advisory reads only raw inputs and writes its own
    // artifact — fully independent of every stage below, so it runs
    // overlapped on its own thread (optimization guide §2.6) instead
    // of serializing its census between the corpus write and the
    // manifest read-back as it used to; its jobs back-fill the
    // driver-side gaps of the main flow's action barriers
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val advisoryFut = scala.concurrent.Future {
        spark.sparkContext.setJobDescription("curate: skew advisory")
        val advisory = ext.Dedup.editDedupRerouteReport(spark, sfDir)
          .withColumnRenamed("rerouted", "would_reroute_edit_dedup")
        // materialize on the driver: bounded by construction (each
        // over-cap cell holds > EditDedupMaxBlockDocs docs, so there are
        // at most corpus/cap rows — the editDedupCapped hot-cell census
        // argument), and the explicit 1-slice re-parallelize guarantees
        // the write runs ONE task and emits a schema-bearing parquet file
        // even when the census is EMPTY. A plain df.write of the empty
        // aggregate produces zero tasks under AQE empty-relation
        // propagation — only _SUCCESS lands, and a scheduler reading the
        // companion would need the schema out-of-band.
        val advRows = advisory.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(advRows.toIndexedSeq, 1),
          advisory.schema)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/skew_advisory")
        advRows.length.toLong
      }

      // 1. the production exact-then-fuzzy curation stack, launched on
      // the pool so its eager setup (the connected-components loop's
      // edge materialization and label rounds) overlaps the forecast
      // pilot below — the two read only raw inputs, so the forecast
      // still owes nothing to the pipeline's outputs. The survivor set
      // feeds BOTH the shard-packing projection below and the final
      // corpus join — persisted once (Memos-tracked, the shardPack
      // convention) or the entire curation DAG (dedup window, MinHash
      // pair restriction, connected components, decontamination join,
      // quality scoring — document-text scans included) executes twice
      val keptFut = scala.concurrent.Future {
        spark.sparkContext.setJobDescription("curate: stage1-3 curation")
        val pairs = ext.Dedup.minhashBanded(spark, sfDir)
          .select(col("doc_a"), col("doc_b"))
        val kept = Memos.track(
          ext.Curation.curatedDocs(spark, sfDir, Some(pairs)).persist())
        (kept, kept.limit(1).count())
      }

      spark.sparkContext.setJobDescription("curate: forecast pilot")
      val inputDocs = io.Sources.table(spark, sfDir, "documents").count()
      // 0. cardinality forecast — computed from raw inputs and a bounded
      // pilot only (never from the pipeline's own outputs), so the
      // companion's predicted column owes nothing to the actuals
      val pred = predict(spark, sfDir, inputDocs, tokenBudget)

      // fail fast on a fully-filtered corpus: a partitioned write of ZERO
      // rows produces a directory without data files, so every read-back
      // below (manifest, totals, the reader's own load) would fail with
      // an inference error far from the cause. At production scale a
      // curation stack that drops 100% of its input is a gate/threshold
      // misconfiguration — name it instead of writing an unreadable
      // corpus.
      spark.sparkContext.setJobDescription("curate: stage1-3 curation")
      val (kept, keptProbe) = scala.concurrent.Await.result(keptFut,
        scala.concurrent.duration.Duration.Inf)
      require(keptProbe > 0,
        s"curation kept zero documents from $sfDir — every doc was " +
          "deduped, decontaminated, or quality-gated out; refusing to " +
          "write an empty corpus")

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

      // 4. write corpus + manifest. The manifest, split counts, and run
      // totals all derive from the SAME read-back of the written corpus;
      // the previous formulation issued three separately planned
      // read-back actions (manifest write, per-split counts, global
      // totals — three full corpus re-reads). Now the read-back is
      // aggregated ONCE: the manifest rows are collected (a bounded
      // (split, lang) table), the tiny frame is re-written from the
      // driver (same one-task schema-bearing idiom as the advisory
      // below), and the split counts and doc/token totals fold from the
      // collected rows. Only the global distinct-shard count needs a
      // second read-back pass (shards span (split, lang) cells, so it
      // cannot fold from the manifest).
      spark.sparkContext.setJobDescription("curate: corpus write")
      corpus.write.mode(SaveMode.Overwrite)
        .partitionBy("split")
        .parquet(s"$outDir/corpus")
      spark.sparkContext.setJobDescription("curate: manifest + totals")
      val written = spark.read.parquet(s"$outDir/corpus")
      // the global distinct-shard pass and the manifest collect are the
      // two read-backs that cannot fold into one aggregate (shards span
      // (split, lang) cells) — but they are independent of EACH OTHER,
      // both reading only the just-written corpus, so the shard pass
      // runs overlapped on the pool (guide §2.6) instead of serializing
      // after the manifest re-write; harvested below before the
      // estimates that need it
      val nShardsFut = scala.concurrent.Future {
        spark.sparkContext.setJobDescription("curate: manifest + totals")
        written.agg(countDistinct(col("shard_id"))).head().getLong(0)
      }
      val manifest = written
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          countDistinct(col("shard_id")).as("n_shards"))
        .orderBy(col("split"), col("lang"))
      val manifestRows = manifest.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(manifestRows.toIndexedSeq, 1),
        manifest.schema)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/manifest")

      // input-skew advisory (round-16 verdict item 3, reframed per
      // round-17 ADVICE): the reference notebook PRINTS its per-rule
      // violation counts (pre_process.py — every rule logs what it
      // removed); the composed job a user schedules must be at least as
      // observable. This is x_edit_dedup_reroute_report's census with the
      // boolean renamed to say what it actually means HERE: cells a
      // pipeline routing this corpus through the edit-dedup arm WOULD
      // reroute (this main's own dedup is exact + banded MinHash — see
      // the object scaladoc for where ITS degradation is censused).
      // Cost: one map-side-combined (cell, count) census, no text moved;
      // EMPTY on every clean corpus, so the oracled corpus/manifest
      // outputs are untouched and a scheduler can join survivorship
      // decisions against exactly the skew hot-spots. Launched up top on
      // its own thread; harvested here.
      val advisoryCells = scala.concurrent.Await.result(advisoryFut,
        scala.concurrent.duration.Duration.Inf)

      val bySplit = manifestRows.groupBy(_.getString(0))
        .map { case (s, rows) => s -> rows.map(_.getLong(2)).sum }
      val nShards = scala.concurrent.Await.result(nShardsFut,
        scala.concurrent.duration.Duration.Inf)
      val docTotal = manifestRows.map(_.getLong(2)).sum
      val tokenTotal = manifestRows.map(_.getLong(3)).sum
      val trainDocs = bySplit.getOrElse("train", 0L)
      val testDocs = bySplit.getOrElse("test", 0L)

      // estimate companion (round-18 verdict item 6): per-stage
      // (predicted, actual) next to the manifest — the reference
      // notebook's printed before/after counts (pre_process.py:47-59,
      // 138-141), upgraded from a log line to a dataset a scheduler can
      // alarm on. Actuals are the counts this run already computed (zero
      // extra jobs); predictions are [[predict]]'s pre-run forecast.
      // Six fixed rows — a driver-side Seq, written as one task.
      val estimates = Seq(
        ("input", inputDocs, inputDocs),
        ("curated", pred.curated, docTotal),
        ("train", pred.train, trainDocs),
        ("test", pred.test, testDocs),
        ("shards", pred.shards, nShards),
        ("tokens", pred.tokens, tokenTotal))
      import spark.implicits._
      estimates.map { case (stage, p, a) =>
        (stage, p, a,
          if (a == 0L) Option.empty[Double]
          else Some((p - a).toDouble / a))
      }.toDF("stage", "predicted_rows", "actual_rows", "rel_error")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/estimate")

      spark.sparkContext.setJobDescription(null)
      Result(inputDocs, docTotal, trainDocs, testDocs,
        nShards, tokenTotal, advisoryCells, estimates)
      // pool.shutdown() lives in the finally below: pool threads are
      // non-daemon, and an exception escaping mid-run would otherwise
      // leave the JVM unable to exit after a failed standalone main
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir =
      args.lift(1).getOrElse("/root/repo/target/tmp/curate_out")
    val budget = args.lift(2).map(_.toLong).getOrElse(2048L)
    val spark = Sessions.local()
    val r = run(spark, sfDir, outDir, budget)
    // one summary line, Bench-style
    val curatedRelErr = r.estimates.collectFirst {
      case ("curated", p, a) if a > 0 => (p - a).toDouble / a
    }.getOrElse(0.0)
    println(s"""{"curate":{"input":${r.inputDocs},""" +
      s""""curated":${r.curatedDocs},"train":${r.trainDocs},""" +
      s""""test":${r.testDocs},"shards":${r.shards},""" +
      s""""tokens":${r.totalTokens},""" +
      s""""skew_advisory_cells":${r.advisoryCells},""" +
      s""""curated_rel_error":${"%.4f".formatLocal(
        java.util.Locale.ROOT, curatedRelErr)}}}""")
    spark.stop()
  }
}
