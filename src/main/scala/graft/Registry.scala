package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus an optional DuckDB
  * oracle SQL (ANSI, runnable on the same parquet tables). `bench = true`
  * marks headline queries timed by [[graft.Bench]]; `benchDefault = false`
  * excludes a query from Bench's all-queries run (used for superseded
  * API-compatibility demos — they stay registered, verified, and
  * invariant-tested, but don't count against the engine's headline total).
  *
  * `benchFn`, when set, is the formulation [[graft.Bench]] times instead
  * of `fn`. Used where the oracle-checkable formulation deliberately
  * adds verification-only work that the production plan would never run
  * (e.g. a band-oracle that recomputes an exact aggregate next to its
  * sketch): Verify keeps hash-checking `fn`, the bench keeps measuring
  * the scale path. The two formulations must compute the same operator —
  * the invariant specs pin them together.
  *
  * `benchRuns > 1` makes [[graft.Bench]] time the query that many times
  * and report the MEDIAN. The DEFAULT is 3 since round 14 — the
  * conversion history is the reason: round 6 converted streaming
  * (s7-s12 swung ~9.3 s -> ~14.6 s with unchanged code), round 8 the
  * >2 s heavy tail (x_curation_neardup 4.1 -> 16.9 s, x_pagerank
  * 5.0 -> 14.9 s at IDENTICAL stage/task counts), round 13 the
  * >=0.55 s band, round 14 everything that drew >=0.26 s in the worst
  * observed draw — and each band's headroom assumption was then
  * falsified by the next contended draw (a 0.38 s median drew 1.17 s:
  * 3.0x). A committed artifact must never carry a single-draw number
  * a foreign contended draw can push past a red line, so every query
  * is a median now; the marginal cost (2 extra samples x the
  * sub-0.3 s tail) is ~20 s of bench wall, invisible in the
  * median-sum total. Every sample lands in BENCH_FULL.json's `runs`
  * map so a reader can separate plan cost from scheduler noise.
  *
  * This is the registration unit for every operator in SURVEY.md §2: each
  * module exposes a `qs: Seq[Q]` and [[SparkEntry]] concatenates them.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    benchDefault: Boolean = true,
    doc: String = "",
    benchFn: Option[(SparkSession, String) => DataFrame] = None,
    benchRuns: Int = 3,
    confs: Map[String, String] = Map.empty)

object Q {
  /** Session-conf overrides applied (via [[Sessions.withConfs]]) around
    * the execution of queries whose aggregation state is k-BOUNDED.
    *
    * TypedImperativeAggregates (topk_structs, simhash_agg) run under
    * ObjectHashAggregateExec, whose in-memory hash map falls back to
    * SORT-based aggregation after just 128 distinct keys
    * (spark.sql.objectHashAggregate.sortBased.fallbackThreshold default
    * — set that low because object states are opaque to the memory
    * manager). For the tagged queries the states are k-bounded (top-k
    * heaps, fixed-width simhash counters: ~0.2 KB each), so the default
    * turns any >128-group top-k into a full sort of the PRE-aggregation
    * rows — measured on the 500k-vector drill fixture: the knn vote's
    * 10k query groups pushed ~970M joined candidate rows into a
    * per-task sort+spill (20+ min stage) where hash aggregation holds
    * 10k x 0.2 KB = 2 MB and finishes in seconds; it also disables
    * effective map-side partial top-k, so the shuffle carries raw
    * candidates instead of per-task heaps. 256k keys x ~0.2 KB bounded
    * state ~= 50 MB/task — safe at any executor size we'd deploy.
    *
    * Scoped PER-QUERY, not set globally in [[Sessions.local]]: raising
    * the dial session-wide would also remove the sort-based safety
    * valve for aggregates with UNBOUNDED states (collect_list/
    * collect_set) below the threshold — states the memory manager
    * cannot see or spill — so a library user's 200k-group collect_list
    * would OOM where the stock default degrades to disk-backed sort.
    * `OperatorInvariantsSpec` pins the tagged set: every tagged query's
    * plan runs an ObjectHashAggregate of engine k-bounded aggregates
    * and none aggregates collect_list/collect_set.
    */
  val KBoundedAggConfs: Map[String, String] = Map(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
      (1 << 18).toString)

  /** Samples per heavy-tier query (vs the default 3). With 3 samples a
    * box that is slow for 2 of 3 draws contaminates the MEDIAN itself —
    * the round-15 driver artifact did exactly that (`x_curation_neardup`
    * runs [15.6, 3.6, 23.0] s at flat stage counts, median 6.1x the
    * committed cost; the headline moved 1.86x on zero plan change). At
    * 5 samples the median survives two contended draws. Applied only to
    * the [[HeavyTier]]: converting the whole catalog would add ~2x the
    * full medians-sum (~300 s) of wall for queries whose absolute swing
    * is bounded by their sub-second cost anyway.
    */
  val HeavyBenchRuns = 5

  /** The heavy tier: every query whose committed builder-HEAD median
    * is >= ~1.6 s (round-15/16 artifacts) — the entries where a
    * contended median materially moves the headline total, and exactly
    * the set the round-15 driver draw blew up 3-6x at unchanged plans.
    * The ~1.6 s line sits a box-drift margin (~25%, two same-HEAD
    * builder draws this round moved 150.6 -> 162.1 s) under the 2 s
    * artifact red line, so quiet-box drift can't push a tight-spread
    * straddler past the line between rounds. Expected extra wall: 2
    * extra samples x ~66 s of medians ~= +130 s (recorded in BENCH.md).
    * `BenchContractSpec` red-lines membership two ways: every name
    * resolves in the registry at [[HeavyBenchRuns]], and every
    * committed >2 s TIGHT-SPREAD median (genuine cost, not contention)
    * must be in the tier.
    */
  val HeavyTier: Set[String] = Set(
    "pipe1_end_to_end", "pipe2_curate_main",
    "x_pagerank", "x_triangle_count", "x_degree_profile",
    "x_curation_neardup", "x_dedup_threshold_sweep",
    "x_ann_probe_many", "x_ann_index_update",
    "ml3_pipeline_compose", "x_quality_model",
    "scale1_salted_join", "x_bloom_contamination",
    "x_incremental_dedup", "x_media_dedup", "x_ngram_jaccard",
    "x_dup_groups", "x_quality_gate", "x_substring_dedup",
    "x_bpe_merges", "x_bpe_encode",
    "s11_stream_stream_join", "s15_stream_neardup_probe",
    "s18_stream_late_data", "s20_stream_knn_probe",
    // round-16 straddlers: tight-spread medians that crossed ~1.6 s on
    // the second same-HEAD draw (x_semantic_dedup touched 2.04 s)
    "x_semantic_dedup", "ref1_pipeline_parity",
    "x_embed_quantize", "a7_percentiles")
}

/** Registry of per-process memoized DataFrame caches, in two tiers with
  * different lifecycles:
  *
  *  - RAW ([[registerRaw]]): input-table scans ([[graft.io.Sources]]).
  *    Bounded by the dataset on disk (10 tables per sf dir), shared by
  *    every query — kept for the whole Bench/Verify run, exactly what a
  *    warm cluster cache gives a resident engine.
  *  - DERIVED ([[register]] / [[track]]): per-operator intermediates
  *    (similarity corpus, ML assembly, skew counts). Released after
  *    every query via [[clearDerived]] so a 100-query single-session
  *    run never accumulates them — round 2's driver bench showed
  *    unrelated queries regressing up to 7.6x from storage/GC pressure
  *    of derived caches created by earlier queries and never released.
  *
  * Round 3 cleared BOTH tiers (plus the whole session cache) per query;
  * that fixed the accumulation pathology but made every query
  * re-materialize its full upstream chain — 12 driver-measured >2x
  * regressions, all multi-job consumers of expensive shared upstreams.
  * The scoped lifecycle keeps the bounded raw tier warm and releases
  * only what round 2 actually leaked: derived frames.
  */
object Memos {
  import java.util.concurrent.ConcurrentHashMap
  private val derived =
    scala.collection.mutable.ArrayBuffer[ConcurrentHashMap[String, DataFrame]]()
  private val raw =
    scala.collection.mutable.ArrayBuffer[ConcurrentHashMap[String, DataFrame]]()
  private val adhoc = scala.collection.mutable.ArrayBuffer[DataFrame]()
  private val hooks = scala.collection.mutable.ArrayBuffer[() => Unit]()

  /** Register a DERIVED memo map — released by [[clearDerived]]. */
  def register(m: ConcurrentHashMap[String, DataFrame])
      : ConcurrentHashMap[String, DataFrame] =
    synchronized { derived += m; m }

  /** Register a RAW input memo map — kept across queries; released only
    * by [[clear]].
    */
  def registerRaw(m: ConcurrentHashMap[String, DataFrame])
      : ConcurrentHashMap[String, DataFrame] =
    synchronized { raw += m; m }

  /** Track a single ad-hoc cached frame (no memo map — e.g. the skew
    * report's keyed counts) for release on the next [[clearDerived]].
    *
    * Bounded: Bench/Verify call [[clearDerived]] after every query, so
    * the buffer holds at most one query's frames there; a library caller
    * who never clears instead evicts-oldest (with unpersist) past
    * [[adhocCap]] entries, so ad-hoc tracking can never pin an unbounded
    * set of plan trees or storage blocks.
    */
  def track(df: DataFrame): DataFrame = synchronized {
    if (adhoc.length >= adhocCap) {
      adhoc.head.unpersist(blocking = false)
      adhoc.remove(0)
    }
    adhoc += df
    df
  }

  /** Max ad-hoc frames held before [[track]] evicts the oldest. */
  val adhocCap = 32

  /** Register a callback run on every [[clearDerived]] — for derived
    * caches that are not DataFrames (e.g. the similarity corpus
    * fingerprint memo) but share the per-query lifecycle.
    */
  def onClearDerived(f: () => Unit): Unit = synchronized { hooks += f }

  /** Unpersist and forget every DERIVED frame; raw input caches stay. */
  def clearDerived(): Unit = synchronized {
    derived.foreach { m =>
      m.values.forEach(df => df.unpersist(blocking = false))
      m.clear()
    }
    adhoc.foreach(_.unpersist(blocking = false))
    adhoc.clear()
    hooks.foreach(_.apply())
  }

  /** Unpersist and forget every memoized frame, both tiers. */
  def clear(): Unit = synchronized {
    clearDerived()
    raw.foreach { m =>
      m.values.forEach(df => df.unpersist(blocking = false))
      m.clear()
    }
  }
}

/** Session factory with the engine's standard configs.
  *
  * - ANSI off: the reference (PySpark, pre-ANSI defaults) relies on
  *   cast-failure => null semantics (`pre_analysis.py:244-258` uses failed
  *   `to_timestamp`/int casts as its validity probe). Spark 4 defaults
  *   ANSI on, so we opt out explicitly.
  * - UTC session TZ so timestamps hash-match the DuckDB oracle.
  * - AQE on; shuffle partitions sized for local mode, not the 200 default.
  */
object Sessions {
  /** The APP-scoped memo key (round-16 directive 1/2: every memo key
    * in the engine now derives from one of the two named scopes here).
    * `spark.sparkContext.applicationId` is constant for the lifetime of
    * the SparkContext and SHARED by every SparkSession cloned from it,
    * unlike an identity- or UUID-keyed session handle, which changes
    * whenever a harness hands the engine a different session wrapper
    * over the same context — the round-15 driver bench ran extra LBFGS
    * fits inside the timed window with unchanged code, the exact
    * failure mode an identity-keyed memo cannot survive in a foreign
    * harness.
    *
    * App scope is for state whose VALUE is session-free:
    *  - model memos (fitted k-means/PCA/LBFGS/IVF): driver-side
    *    numbers, deterministic given (dir + the pinned fit layout) —
    *    bit-identical whichever session fits them;
    *  - the assembled/signals fit-input frames: cached read-only views
    *    consumed only by those fits — sessions cloned from one context
    *    share its cache manager, and no per-session planning rule
    *    targets their shape, so one copy serves the app.
    * A STOPPED context yields a fresh applicationId, so nothing leaks
    * across contexts.
    */
  def appKey(spark: SparkSession, dir: String): String =
    s"${spark.sparkContext.applicationId}/$dir"

  /** The SESSION-scoped memo key — the documented exception to
    * app-wide sharing (round-17; the directive-2 unification was tried
    * and reverted for these tiers with a failing test to show for it).
    * A cached DataFrame pins PLANNING to its birth session: derived
    * Datasets inherit `df.sparkSession`, so a frame resolved once
    * under session A is analyzed and optimized under A's extensions
    * forever after, whichever session asks for it. The raw-table tier
    * and the similarity corpus feed plans that per-session Catalyst
    * flags must see — `AnnIndexRewrite`/`NgramChainRewrite` build the
    * SAME logical shape inside a flag-enabled `newSession()` child, and
    * an app-keyed corpus frame served from the parent session makes the
    * child's rule silently miss (`AnnIndexRewriteSpec` "the drill's
    * branch assertion" fails exactly this way) — or, worse, a frame
    * born in a flag-enabled child would leak the rewrite INTO parent
    * queries. So frame tiers whose consumers are session-flag-sensitive
    * stay session-scoped; the recompute cost under a wrapping harness
    * is one cached scan per table (bounded by the dataset), not a
    * model refit. Identity of the session object is the scope
    * (SparkSession exposes no public per-session id), but derived HERE
    * so no call site hand-rolls a third keyspace.
    */
  def sessionKey(spark: SparkSession, dir: String): String =
    s"${System.identityHashCode(spark)}/$dir"

  /** Run `body` with session-conf overrides set, restoring each key's
    * prior state (value or unset) afterwards — the scoping primitive
    * for [[Q.confs]]: planning happens at action time, so the override
    * must bracket the whole build-and-execute of one query and may not
    * leak into the next. No-op (no save/restore churn) when empty.
    */
  def withConfs[T](spark: SparkSession, confs: Map[String, String])
      (body: => T): T = {
    if (confs.isEmpty) body
    else {
      val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      // set INSIDE the try: if a set throws (typed-conf parse error,
      // non-modifiable key), the keys already applied must still be
      // restored — a leak here contaminates every later query on the
      // session, the exact cross-query bleed this helper exists to stop
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        body
      }
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive timestamp[us] parquet (the round-8 testdata generation)
      // reads as LTZ TimestampType, not TIMESTAMP_NTZ: watermarks
      // reject NTZ event time, and with the UTC session TZ the values
      // are identical — this pins the engine to one timestamp type
      // across testdata generations
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // allow dynamic-partition-pruning subqueries even when no
      // broadcast exchange is reusable: the ANN serving index is
      // signature-PARTITIONED and its probe joins on the partition key
      // from a small probe-pair frame — with the default
      // reuseBroadcastOnly=true Spark plans the DPP filter then degrades
      // it to literal true (measured: partitionFilters =
      // dynamicpruningexpression(true), every bucket dir opened). The
      // standalone subquery is one dedup over the small probe side and
      // buys opening ONLY the probed signature directories — the 100 TB
      // contract of the index layout (BucketingSpec pins it).
      .config("spark.sql.optimizer.dynamicPartitionPruning" +
        ".reuseBroadcastOnly", "false")
      // NOTE: spark.sql.objectHashAggregate.sortBased.fallbackThreshold
      // is deliberately NOT raised here. The k-bounded top-k/simhash
      // queries that need it carry [[Q.KBoundedAggConfs]] and get it
      // scoped around their own execution — a session-wide raise would
      // remove the sort-based safety valve for UNBOUNDED collect_list/
      // collect_set states below the threshold (see Q.KBoundedAggConfs).
      .config("spark.sql.warehouse.dir", "/root/repo/target/tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
