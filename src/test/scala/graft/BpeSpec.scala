package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_bpe_merges vs a sequential in-JVM greedy BPE trainer: the
  * distributed windowed-parity formulation must reproduce the exact
  * merges (and weighted counts) of the obvious left-to-right scan,
  * including doubled-symbol overlaps ("llll" → "ll"+"ll", "lll" →
  * "ll"+"l") that the gaps-and-islands parity rule exists for.
  */
class BpeSpec extends AnyFunSuite {

  /** Reference trainer: 3 rounds of (count weighted adjacent pairs,
    * pick (cnt DESC, a, b) argmax, greedy left-to-right merge).
    */
  private def jvmBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, n) => w.split("").toVector -> n }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      vocab = vocab.map { case (syms, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (r, a, b, cnt)
    }
  }

  test("distributed bpe equals the sequential greedy trainer on the " +
      "sf0.001 corpus, including doubled-symbol runs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val words = graft.ops.Tables.t(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("word"))
      .filter("length(word) > 0")
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    val expected = jvmBpe(words, 3)
    val got = SparkEntry.queries("q_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("parity rule reproduces greedy left-to-right on synthetic " +
      "doubled-symbol words") {
    // "aaaa"×3 + "aaa"×2: round 1 must pick (a,a) with weighted count
    // 3·3 + 2·2 = 13, then "aaaa"→(aa,aa) and "aaa"→(aa,a)
    val words = Map("aaaa" -> 3L, "aaa" -> 2L)
    val m = jvmBpe(words, 2)
    assert(m.head == ((1, "a", "a", 13L)))
    // round 2 pairs: "aaaa"→(aa,aa) w3; "aaa"→(aa,a) w2 → (aa,aa)=3
    assert(m(1) == ((2, "aa", "aa", 3L)))
  }
}
