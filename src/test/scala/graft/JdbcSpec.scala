package graft

import graft.config.ConfigParser
import graft.sources.StreamSource
import org.scalatest.funsuite.AnyFunSuite

/** JDBC pushdown path: option-map construction (no live database in this
  * environment — the reader itself is `spark.read.format("jdbc")`, pure
  * Spark; what's ours is watermark substitution and partitioned-extraction
  * wiring).
  */
class JdbcSpec extends AnyFunSuite {

  private val tap = ConfigParser.parseTap(
    """{"host":"db.example.com","port":5439,"user":"u","password":"p","database":"warehouse",
      |"streams":[{"name":"s","sql":"SELECT id, at FROM t WHERE at > :rep_key_val",
      | "key_properties":["id"],"replication_key":"at",
      | "replication_key_value_start":"2021-01-01 00:00:00",
      | "columns":[{"name":"id","type":"bigint"},{"name":"at","type":"datetime"}]}]}""".stripMargin)

  test("query pushdown options with bound watermark") {
    val opts = StreamSource.jdbcOptions(tap, tap.streams.head)
    assert(opts("url") === "jdbc:postgresql://db.example.com:5439/warehouse")
    assert(opts("driver") === "org.postgresql.Driver")
    assert(opts("query") ===
      "SELECT id, at FROM t WHERE at > TIMESTAMP '2021-01-01 00:00:00'")
  }

  test("partitioned extraction swaps query for dbtable + bounds") {
    val opts = StreamSource.jdbcOptions(tap, tap.streams.head,
      numPartitions = 8, bounds = Some(("2021-01-01", "2022-01-01")))
    assert(!opts.contains("query"))
    assert(opts("dbtable").startsWith("(SELECT id, at FROM t WHERE at > TIMESTAMP"))
    assert(opts("partitionColumn") === "at")
    assert(opts("numPartitions") === "8")
  }
}
