package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Engine-plane ANN incremental maintenance: [[graft.engine.AnnStore
  * .append]] assigns new vectors to the EXISTING cells (no retrain —
  * q_ann_ivf_incremental's contract) and the served top-k is
  * bit-equal to a fresh build over the union fixture. The fixture
  * split keeps all 8 IVF seed vectors (lowest vec_id % 59 == 0 rows,
  * ids 0..413) in the old half, so the union build derives the SAME
  * quantizer the incremental index already persisted — making exact
  * parity the correct expectation, not an approximation.
  */
class AnnStoreSpec extends AnyFunSuite {

  test("build + append serves the same top-k as a fresh build over " +
    "the union; drift counters track the appended batch") {
    val spark = SparkFixture.spark
    val sfDir = "/root/testdata/sf0.001"
    val oldDir = Files.createTempDirectory("ann-old").toFile
    val newDir = Files.createTempDirectory("ann-new").toFile
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.filter(col("vec_id") < 450).write
      .parquet(new java.io.File(oldDir, "embeddings.parquet").getPath)
    emb.filter(col("vec_id") >= 450).write
      .parquet(new java.io.File(newDir, "embeddings.parquet").getPath)
    val newCount = emb.filter(col("vec_id") >= 450).count()
    assert(newCount > 0, "fixture must have an appendable half")

    val inc = new graft.engine.AnnStore(spark, new graft.tier.ParquetTier(
      Files.createTempDirectory("ann-tier-inc").toFile))
    val full = new graft.engine.AnnStore(spark, new graft.tier.ParquetTier(
      Files.createTempDirectory("ann-tier-full").toFile))
    val nOld = inc.build("inc", oldDir.getPath)
    val nFull = full.build("full", sfDir)
    val (app, out) = inc.append("inc", newDir.getPath).get
    assert(app == newCount, "every new vector must be appended")
    assert(nOld + app == nFull, "incremental index must cover the union")

    val (dApp, dOut, ratio) = inc.drift("inc").get
    assert(dApp == app && dOut == out)
    assert(ratio >= 0.0 && ratio <= 1.0)

    // served parity on the 5 fixture query vectors: appended cells
    // rank identically to fresh-built ones, bit for bit
    val qvecs = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(qvecs.nonEmpty)
    qvecs.foreach { case (qid, v) =>
      val a = inc.query("inc", v, 10, 3).get
      val b = full.query("full", v, 10, 3).get
      assert(a == b, s"q$qid: incremental served $a, fresh build $b")
    }

    // a fresh index has zero drift; unknown index → None
    assert(full.drift("full").contains((0L, 0L, 0.0)))
    assert(inc.append("nosuch", newDir.getPath).isEmpty)
    assert(inc.drift("nosuch").isEmpty)
  }

  test("filtered search ranks WITHIN the label subset (filter-then-" +
    "rank), verified against an independent brute-force oracle") {
    val spark = SparkFixture.spark
    val sfDir = "/root/testdata/sf0.001"
    val store = new graft.engine.AnnStore(spark,
      new graft.tier.ParquetTier(
        Files.createTempDirectory("ann-tier-flt").toFile))
    store.build("flt", sfDir)
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.get(2).toString.toLong))
    val q = rows.find(_._1 == 0L).get._2
    val labels = Seq(1L, 2L)
    // nprobe=8 probes every cell, so filter-then-rank over the whole
    // corpus is the exact expectation, not an approximation
    val served = store.query("flt", q, 5, 8, Some(labels)).get
    // independent oracle: same left-to-right fold as graft_dot
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val qn = math.sqrt(dot(q, q))
    val expect = rows.filter(r => labels.contains(r._3))
      .map { case (id, v, _) =>
        (id, dot(q, v) / (qn * math.sqrt(dot(v, v)))) }
      .sortBy { case (id, cos) => (-cos, id) }.take(5)
    assert(served.map(_._1) == expect.map(_._1).toSeq,
      s"served ${served.map(_._1)} != brute ${expect.map(_._1).toSeq}")
    served.zip(expect).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9) }
    // a filtered top-k is NOT a post-filtered generic top-k: the
    // unfiltered top-5 must differ (else the case proves nothing)
    val unfiltered = store.query("flt", q, 5, 8).get
    assert(unfiltered.map(_._1) != served.map(_._1))
    // bounds: empty label list refused
    intercept[IllegalArgumentException](
      store.query("flt", q, 5, 8, Some(Nil)))
  }
}
