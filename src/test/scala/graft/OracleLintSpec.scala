package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Runs tools/oracle_type_lint.py over EVERY SparkEntry.oracleSql in
  * DuckDB (sf0.001) and fails the build if any oracle's result column
  * types HUGEINT/UHUGEINT. DuckDB widens sum() over integers to
  * int128 while Spark stays BIGINT; the driver's hasher treats the
  * widths as distinct types even when every value is bit-identical —
  * this exact class cost driver-red rows in rounds 5 and 7
  * (q_token_budget, q_text_diversity, q_quality_ensemble). The repo
  * rule (ops/core.scala) is CAST(… AS BIGINT) on both sides; this
  * spec makes the rule mechanical instead of conventional.
  *
  * DuckDB is a driver-side python library, not a build dependency —
  * the spec shells out to python3 and CANCELS (not fails) when
  * python3/duckdb or the test fixtures are absent, so `sbt test`
  * stays green on a bare JVM-only machine.
  */
class OracleLintSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private val lint = "tools/oracle_type_lint.py"

  private def duckdbAvailable: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  test("no oracle result column types HUGEINT/UHUGEINT in DuckDB") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir fixtures absent")
    assume(Files.exists(Paths.get(lint)), s"$lint absent")
    assume(duckdbAvailable, "python3+duckdb unavailable")
    val tmp = Files.createTempDirectory("oracle-lint")
    val json = tmp.resolve("oracle_sql.json")
    // same JSON escaping discipline as Verify's dump
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    val body = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}")
    Files.writeString(json, body)
    val out = new StringBuilder
    val code = Process(Seq("python3", lint, sfDir, json.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"oracle type lint failed:\n$out")
  }
}
