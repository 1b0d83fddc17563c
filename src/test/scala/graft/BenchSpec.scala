package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's steal detector (wall >> process-CPU with flat GC on
  * EVERY rep → the JVM was starved, the number is an artifact) pinned
  * against the real adjudication cases from earlier rounds — the
  * exact signatures a judge previously needed a re-run to resolve.
  */
class BenchSpec extends AnyFunSuite {

  private def m[T](kv: (String, T)*) = Map(kv: _*)

  test("the round-10 q_gopher_rules phantom flags: all reps ~14 s " +
    "wall at ~1 s cpu, zero GC (true time was 0.53 s)") {
    val s = Bench.suspectQueries(
      m("q_gopher_rules" -> Seq(13.9, 13.8, 14.1)),
      m("q_gopher_rules" -> Seq(1.1, 0.9, 1.0)),
      m("q_gopher_rules" -> 0L))
    assert(s == Seq("q_gopher_rules"))
  }

  test("honest execution never flags: parallel (cpu >> wall), " +
    "serial (cpu ~ wall), and fast queries all pass") {
    val walls = m(
      "q_parallel" -> Seq(2.0, 1.9, 2.1), // 32-way busy: cpu ~ 8x
      "q_serial" -> Seq(3.0, 3.1, 3.0), // one core pegged: cpu ~ wall
      "q_fast" -> Seq(0.2, 0.1, 0.1)) // under the 1 s floor
    val cpus = m(
      "q_parallel" -> Seq(16.0, 15.0, 16.5),
      "q_serial" -> Seq(2.9, 3.0, 2.8),
      "q_fast" -> Seq(0.05, 0.04, 0.04))
    val gc = m("q_parallel" -> 50L, "q_serial" -> 0L, "q_fast" -> 0L)
    assert(Bench.suspectQueries(walls, cpus, gc).isEmpty)
  }

  test("a single starved rep does not flag (that is a burst, visible " +
    "in the spread channel; min-of-N already absorbs it)") {
    val s = Bench.suspectQueries(
      m("q" -> Seq(14.0, 0.5, 0.6)),
      m("q" -> Seq(1.0, 2.1, 2.4)),
      m("q" -> 0L))
    assert(s.isEmpty, "min wall under the floor → honest min exists")
  }

  test("GC thrashing is excluded: wall >> cpu WITH heavy GC is real " +
    "(attributable) slowness, not steal") {
    val s = Bench.suspectQueries(
      m("q" -> Seq(10.0, 10.5, 10.2)),
      m("q" -> Seq(2.0, 2.1, 2.0)),
      m("q" -> 20000L)) // 20 s of GC across ~30 s of wall
    assert(s.isEmpty)
  }

  test("missing cpu counters (JVM without the com.sun bean) never " +
    "flag — the detector fails conservative") {
    val s = Bench.suspectQueries(
      m("q" -> Seq(14.0, 14.2, 13.9)),
      m("q" -> Seq(-1.0, -1.0, -1.0)),
      m("q" -> 0L))
    assert(s.isEmpty)
  }
}
