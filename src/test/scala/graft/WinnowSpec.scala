package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Winnowing invariants the oracle cannot check by itself:
  *  - the SQL selection is fold-for-fold identical to an independent
  *    pure-JVM implementation (catches silent drift in either twin);
  *  - the Schleimer–Wilkerson–Aiken detection guarantee: two docs
  *    sharing any run of K+W−1 tokens share ≥1 selected fingerprint
  *    hash — the property q_winnow_overlap's completeness rests on.
  */
class WinnowSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("Spark selection matches the JVM twin on real documents") {
    val spark = SparkFixture.spark
    val got = SparkEntry.queries("q_text_winnow")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val docs = graft.ops.Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(docs.nonEmpty)
    var checked = 0
    docs.foreach { case (id, text) =>
      val jvm = TextOps.jvmWinnow(text)
      val spk = got.getOrElse(id, Nil)
      assert(spk == jvm, s"winnow mismatch for doc $id")
      if (jvm.nonEmpty) checked += 1
    }
    assert(checked > docs.size / 2, "fixture too short to exercise winnow")
  }

  test("detection guarantee: a shared K+W-1 run implies a shared " +
    "fingerprint hash (tie-heavy vocab)") {
    // 2-token vocab maximizes repeated grams, stressing the
    // rightmost-tie rule; seeded for reproducibility
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b")
    def randToks(n: Int) = Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
    val runLen = 5 + 4 - 1 // WinnowK + WinnowW - 1
    for (_ <- 1 to 200) {
      val shared = randToks(runLen)
      val docA = (randToks(rnd.nextInt(20)) ++ shared ++
        randToks(rnd.nextInt(20))).mkString(" ")
      val docB = (randToks(rnd.nextInt(20)) ++ shared ++
        randToks(rnd.nextInt(20))).mkString(" ")
      val fpA = TextOps.jvmWinnow(docA).map(_._2).toSet
      val fpB = TextOps.jvmWinnow(docB).map(_._2).toSet
      assert(fpA.intersect(fpB).nonEmpty,
        s"guarantee violated:\nA=$docA\nB=$docB")
    }
  }

  test("fingerprint density is ~2/(W+1) of grams, never zero on " +
    "long-enough docs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val n = 8 + rnd.nextInt(400)
      val toks = Array.fill(n)("t" + rnd.nextInt(1000))
      val fps = TextOps.jvmWinnow(toks.mkString(" "))
      val grams = n - 4 // n - (WinnowK - 1)
      assert(fps.nonEmpty)
      // selected positions are valid gram indices
      assert(fps.forall { case (p, _) => p >= 1 && p <= grams })
      // expected density 2/(w+1) = 0.4; allow a wide band
      assert(fps.size <= grams && fps.size >= grams / 8)
    }
  }
}
