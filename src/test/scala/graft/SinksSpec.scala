package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{QueryResult, Sinks}

/** Sink adapters (reference query.rs): Arrow-style pretty table and
  * JSON array with null-field omission.
  */
class SinksSpec extends AnyFunSuite {

  private def ts(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000L))
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private val schema = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("value", StringType),
    StructField("host", StringType)))

  test("timestamp cells format as microsecond ISO without zone") {
    assert(Sinks.formatCell(ts(1)) == "1970-01-01T00:00:00.000001")
    assert(Sinks.formatCell(ts(100)) == "1970-01-01T00:00:00.000100")
    assert(Sinks.formatCell(ts(0)) == "1970-01-01T00:00:00")
    assert(Sinks.formatCell(ts(1500000)) == "1970-01-01T00:00:01.500000")
    assert(Sinks.formatCell(java.time.Instant.ofEpochSecond(0, 1000)) ==
      "1970-01-01T00:00:00.000001")
    assert(Sinks.formatCell(null) == "")
  }

  test("pretty table matches the Arrow grid shape (query.rs:32-34)") {
    val result = QueryResult(schema, Seq(
      Row(ts(1), "search_button", null),
      Row(ts(100), "x", "h1")))
    assert(Sinks.toTable(result) == Seq(
      "+----------------------------+---------------+------+",
      "| timestamp                  | value         | host |",
      "+----------------------------+---------------+------+",
      "| 1970-01-01T00:00:00.000001 | search_button |      |",
      "| 1970-01-01T00:00:00.000100 | x             | h1   |",
      "+----------------------------+---------------+------+").mkString("\n"))
  }

  test("JSON sink omits null fields and escapes strings (query.rs:20-28)") {
    val result = QueryResult(schema, Seq(
      Row(ts(1), "a\"b\n", null),
      Row(ts(2), "plain", "h1")))
    assert(Sinks.toJson(result) ==
      """[{"timestamp":"1970-01-01T00:00:00.000001","value":"a\"b\n"},""" +
      """{"timestamp":"1970-01-01T00:00:00.000002","value":"plain","host":"h1"}]""")
  }

  test("CSV sink is RFC 4180: CRLF rows, minimal quoting, doubled " +
    "embedded quotes, empty null fields") {
    val result = QueryResult(schema, Seq(
      Row(ts(1), "a,b", null),
      Row(ts(2), "say \"hi\"\nok", "h1"),
      Row(ts(0), "plain", "h2")))
    assert(Sinks.toCsv(result) ==
      "timestamp,value,host\r\n" +
      "1970-01-01T00:00:00.000001,\"a,b\",\r\n" +
      "1970-01-01T00:00:00.000002,\"say \"\"hi\"\"\nok\",h1\r\n" +
      "1970-01-01T00:00:00,plain,h2\r\n")
  }

  test("JSON sink renders numerics and booleans bare") {
    val s2 = StructType(Seq(
      StructField("n", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType)))
    val result = QueryResult(s2, Seq(Row(7L, 1.5, true)))
    assert(Sinks.toJson(result) == """[{"n":7,"d":1.5,"b":true}]""")
  }
}
