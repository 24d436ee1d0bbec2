package graft

import org.apache.spark.sql.functions._

/** Recall invariants for the approximate operators at BENCH scale
  * (sf0.1) — the small-sf invariants in `OperatorInvariantsSpec` pin
  * correctness; these pin that approximation QUALITY survives 100×
  * more data (the knobs — nprobe, bands, df-cutoff — are scale-free
  * claims worth asserting where the driver actually benchmarks).
  * Runtime budget: ~20 s for the file.
  */
class BenchScaleRecallSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.1"

  test("ann ivf at sf0.1: recall@5 >= 0.55 vs brute force, self excluded") {
    val exact = ext.Similarity.cosineTopK(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ext.Similarity.annIvf(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.forall { case (q, c) => q != c })
    // measured 0.615 with the pinned fit layout (deterministic across
    // parallelism — the same pinning the two-CPU Verify diff protects)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.55, s"recall=$recall over ${exact.size} exact pairs")
    graft.Memos.clear(); spark.catalog.clearCache()
  }

  test("ann lsh at sf0.1: recall@5 >= 0.55 vs brute force") {
    val exact = ext.Similarity.cosineTopK(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ext.Similarity.annLsh(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // measured 0.635 (deterministic: fixed plane seed)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.55, s"recall=$recall over ${exact.size} exact pairs")
    graft.Memos.clear(); spark.catalog.clearCache()
  }

  test("ann-backed knn at sf0.1: every query labeled, agreement >= 0.9 " +
      "vs the brute-force twin") {
    // the contract that makes x_knn_ann a TWIN of x_knn_classify
    // rather than a different operator: same vote, candidates from the
    // persisted index — label agreement must survive the approximation
    val brute = ext.Similarity.knnClassify(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.get(2)).toMap
    val ann = ext.Similarity.knnAnn(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.get(2)).toMap
    // serving coverage: the Hamming<=KnnProbeHamming probe set answers EVERY
    // query (an unlabeled document is a pipeline hole, not low recall)
    assert(ann.keySet == brute.keySet,
      s"unanswered queries: ${brute.keySet -- ann.keySet}")
    val agree = brute.count { case (q, l) => ann.get(q).contains(l) }
    val rate = agree.toDouble / brute.size
    assert(rate >= 0.9, s"agreement=$rate over ${brute.size} queries")
    graft.Memos.clear(); spark.catalog.clearCache()
  }

  test("lsh auto-bits holds expected bucket size constant across sf") {
    // the scale contract of Similarity.autoBits: expected bucket size
    // n / 2^nBits stays in (target/2, target] at every corpus size —
    // fixed bits would let it grow linearly with the data
    val target = 64L
    val sizes = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").map { d =>
      val n = io.Sources.table(spark, d, "embeddings").count()
      val bits = ext.Similarity.autoBits(n)
      val expected = n.toDouble / (1L << bits)
      assert(expected <= target && expected > target / 2.0,
        s"$d: n=$n bits=$bits expected bucket size $expected")
      (n, bits, expected)
    }
    // and the knob actually moves: sf0.1 (2000 vecs) uses more bits
    // than sf0.001 (500 vecs)
    assert(sizes.last._2 > sizes.head._2, sizes.toString)
    // boundary behavior of the derivation itself
    assert(ext.Similarity.autoBits(1) == 3)
    assert(ext.Similarity.autoBits(512) == 3)
    assert(ext.Similarity.autoBits(513) == 4)
    assert(ext.Similarity.autoBits(Long.MaxValue) == 12)
  }

  test("banded minhash at sf0.1: catches every same-source exact pair, " +
      "and every emitted pair is verified >= 0.5") {
    // ngramJaccard blocks by source, so it is a SUBSET of the banded
    // op's global truth — total recall on it is required; the banded
    // op's own exact-verify step guarantees no sub-threshold pair
    val exact = ext.Dedup.ngramJaccard(spark, sf01)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = ext.Dedup.minhashBanded(spark, sf01).collect()
    assert(exact.nonEmpty, "sf0.1 should contain planted near-dups")
    val bandedPairs = banded.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- bandedPairs
    assert(missed.isEmpty, s"banded minhash missed exact pairs: $missed")
    assert(banded.forall(_.getDouble(2) >= 0.5))
    graft.Memos.clear(); spark.catalog.clearCache()
  }
}
