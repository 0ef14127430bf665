package graft

import graft.sources.SqlDialect
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SqlDialectSpec extends AnyFunSuite {

  test("::uuid cast on a string literal (reference test SQL)") {
    val sql = "select '1441c21d-9921-4a1d-b239-9c6ea18af234'::uuid as id"
    assert(SqlDialect.rewrite(sql) ===
      "select CAST('1441c21d-9921-4a1d-b239-9c6ea18af234' AS STRING) as id")
  }

  test("timestamptz literal (reference test SQL)") {
    val sql = "select timestamptz '2021-11-22T11:45:11.062824+00:00' as t"
    assert(SqlDialect.rewrite(sql) ===
      "select TIMESTAMP '2021-11-22T11:45:11.062824+00:00' as t")
  }

  test("identifier and chained casts") {
    assert(SqlDialect.rewrite("select a.b::int from t") ===
      "select CAST(a.b AS INT) from t")
    assert(SqlDialect.rewrite("select x::text::int from t") ===
      "select CAST(CAST(x AS STRING) AS INT) from t")
  }

  test("literal with escaped quote survives") {
    assert(SqlDialect.rewrite("select 'it''s'::text") ===
      "select CAST('it''s' AS STRING)")
  }

  test("posix regex operators rewrite to RLIKE forms") {
    assert(SqlDialect.rewrite("select * from t where name ~ '^ab'") ===
      "select * from t where name  RLIKE  '^ab'")
    assert(SqlDialect.rewrite("select * from t where name ~* '^ab'") ===
      "select * from t where name RLIKE '(?i)^ab'")
    assert(SqlDialect.rewrite("select * from t where name !~ '^ab'") ===
      "select * from t where name  NOT RLIKE  '^ab'")
    assert(SqlDialect.rewrite("select * from t where name !~* '^ab'") ===
      "select * from t where name NOT RLIKE '(?i)^ab'")
    // a ~ inside a string literal is untouched
    assert(SqlDialect.rewrite("select '~tilde~' as s") === "select '~tilde~' as s")
  }

  test("extract(epoch from ts) rewrites to unix_timestamp") {
    assert(SqlDialect.rewrite("select extract(epoch from created_at) from t") ===
      "select UNIX_TIMESTAMP(created_at) from t")
    assert(SqlDialect.rewrite("select EXTRACT(EPOCH FROM ts) > 100 from t") ===
      "select UNIX_TIMESTAMP(ts) > 100 from t")
  }

  test("double-quoted identifiers become backticks (PG identifier semantics)") {
    assert(SqlDialect.rewrite("""select "userId", "from" from "myTable"""") ===
      "select `userId`, `from` from `myTable`")
    // double quotes inside a string literal are untouched
    assert(SqlDialect.rewrite("""select 'he said "hi"' as s""") ===
      """select 'he said "hi"' as s""")
  }

  test("rep_key_val binding renders typed literals") {
    assert(SqlDialect.bindRepKeyVal("a > :rep_key_val", Some("42"), LongType) === "a > 42")
    assert(SqlDialect.bindRepKeyVal("a > :rep_key_val", Some("2021-01-01 00:00:00"), TimestampType) ===
      "a > TIMESTAMP '2021-01-01 00:00:00'")
    assert(SqlDialect.bindRepKeyVal("a > :rep_key_val", Some("o'brien"), StringType) ===
      "a > 'o''brien'")
  }

  test("missing rep_key_val errors iff the SQL references it (client.py:278-281)") {
    assertThrows[IllegalStateException](
      SqlDialect.bindRepKeyVal("a > :rep_key_val", None, LongType))
    assert(SqlDialect.bindRepKeyVal("select 1", None, LongType) === "select 1")
  }
}
