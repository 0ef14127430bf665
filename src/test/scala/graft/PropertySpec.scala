package graft

import graft.config.{ColumnSpec, StreamConfig}
import graft.sources.SqlDialect
import graft.types.TypeMapper
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure layers: type mapping, literal rendering,
  * dialect rewriting, required/nullable schema rules (§2.4.1).
  * Uses raw ScalaCheck generators with a fixed seed (the scalatest-plus
  * bridge is not in the offline artifact cache).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(f.tupled)

  private val supportedTypes = Gen.oneOf(
    "text", "string", "varchar", "uuid", "int", "integer", "bigint",
    "smallint", "datetime", "timestamp", "timestamptz", "date", "bool",
    "boolean", "float", "double", "bytea", "decimal(10,2)")

  test("every supported type maps to a DataType with a JSON-schema name") {
    forAll(supportedTypes) { t =>
      val dt = TypeMapper.toDataType(t)
      assert(dt !== null)
      assert(TypeMapper.jsonSchemaType(t).nonEmpty)
    }
  }

  test("type mapping is case-insensitive and whitespace-tolerant") {
    forAll(supportedTypes) { t =>
      assert(TypeMapper.toDataType(t.toUpperCase) === TypeMapper.toDataType(t))
      assert(TypeMapper.toDataType(s"  $t  ") === TypeMapper.toDataType(t))
    }
  }

  test("required iff not-nullable OR key property OR replication key") {
    val gen = for {
      nullable <- Gen.oneOf(true, false)
      isKey <- Gen.oneOf(true, false)
      isRepKey <- Gen.oneOf(true, false)
    } yield (nullable, isKey, isRepKey)
    forAll(gen) { case (nullable, isKey, isRepKey) =>
      val col = ColumnSpec("c", "int", nullable)
      val s = StreamConfig("s", "SELECT 1",
        keyProperties = if (isKey) Seq("c") else Nil,
        replicationKey = if (isRepKey) Some("c") else None,
        columns = Seq(col))
      val expected = !nullable || isKey || isRepKey
      assert(TypeMapper.isRequired(s, col) === expected)
      assert(TypeMapper.jsonTypeArray(s, col).contains("null") === !expected)
    }
  }

  test("string literal rendering escapes any quotes reversibly") {
    forAll(Gen.asciiPrintableStr) { s =>
      val lit = SqlDialect.renderLiteral(s, StringType)
      assert(lit.head === '\'' && lit.last === '\'')
      val inner = lit.substring(1, lit.length - 1)
      assert(inner.replace("''", "'") === s)
    }
  }

  test("numeric literal rendering round-trips") {
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { n =>
      assert(SqlDialect.renderLiteral(n.toString, LongType).toLong === n)
    }
  }

  test("bindRepKeyVal leaves SQL without the parameter untouched") {
    forAll(Gen.alphaNumStr.suchThat(!_.contains(":rep_key_val"))) { sql =>
      assert(SqlDialect.bindRepKeyVal(sql, Some("1"), LongType) === sql)
    }
  }

  test("rewrite eliminates all identifier/literal ::casts of supported types") {
    val idGen = Gen.identifier.suchThat(_.nonEmpty)
    forAll(idGen, supportedTypes.suchThat(!_.contains("("))) { (ident, t) =>
      val out = SqlDialect.rewrite(s"select $ident::$t from t")
      assert(!out.contains("::"), out)
      assert(out.contains("CAST("))
    }
  }

  // Rewriting is idempotent: a second pass over already-rewritten SQL
  // must be a no-op (no RLIKE RLIKE, no double CAST wrapping, no window
  // re-wrapping) — the property that makes the preprocessing safe to
  // apply defensively at multiple layers.
  test("dialect rewrite is idempotent on representative PG statements") {
    val samples = Seq(
      "select a::int, b::text from t where c ~ '^x' and d !~* 'y'",
      "SELECT DISTINCT ON (g) g, v FROM t ORDER BY g, v DESC LIMIT 3",
      "select string_agg(v, ',' ORDER BY v), extract(epoch from ts) from t group by g",
      """select "userId", 'lit''eral', timestamptz '2021-01-01 00:00:00' from "T"""",
      "select x from t where y ilike 'a%'",
      "select props ->> 'k', props #>> '{a,0,b}', props -> 'a' ->> 'b' from t",
      "select * from t where x = ANY('{a,b}') and n != ALL('{1,2}'::int[])",
      "select '{a,\"b,c\",NULL}'::text[] as arr from t",
      "select * from t where a similar to '(x|y)%' and b not similar to '%z_'")
    samples.foreach { sql =>
      val once = SqlDialect.rewrite(sql)
      assert(SqlDialect.rewrite(once) === once, s"not idempotent for: $sql")
    }
  }

  // ---------------------------------------------------------------------
  // Stride-scheduling discrepancy law (the math behind
  // Curation.interleaveBySource; the Spark implementation is pinned equal
  // to this construction by CurationSpec's naive-sort test): in EVERY
  // prefix of the (vtime, source) order, each source's count differs from
  // its weight share w_s·t by at most one example. Within a source,
  // vtimes (r−0.5)/w are strictly increasing, so at most one element of a
  // source sits in any equal-vtime tie group — the bound is two-sided 1.
  test("stride schedule: every prefix holds each source within 1 of its share") {
    val gen = Gen.zip(
      Gen.choose(2, 5),
      Gen.listOfN(5, Gen.zip(Gen.choose(5, 60), Gen.choose(1, 8))))
    forAll(gen, n = 120) { case (nSrc, params) =>
      val srcs = params.take(nSrc).zipWithIndex.map {
        case ((n, wHalf), i) => (i, n, wHalf * 0.5) // weights 0.5 .. 4.0
      }
      val items = srcs.flatMap { case (s, n, w) =>
        (1 to n).map(r => ((r - 0.5) / w, s))
      }.sortBy { case (vt, s) => (vt, s) }
      val counts = Array.fill(srcs.length)(0)
      items.foreach { case (vt, s) =>
        counts(s) += 1
        srcs.foreach { case (si, n, w) =>
          // a finite source stops at n while its share keeps growing:
          // the law holds against the capped share min(w·t, n)
          val share = math.min(w * vt, n.toDouble)
          assert(math.abs(counts(si) - share) <= 1.0 + 1e-9,
            s"src $si count ${counts(si)} vs share $share at vtime $vt")
        }
      }
    }
  }
}
