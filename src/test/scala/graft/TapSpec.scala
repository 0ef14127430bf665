package graft

import graft.config.ConfigParser
import graft.state.Bookmarks
import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end tap orchestration: multi-stream sync, state advance across
  * runs (resumable incremental — the reference's core behavior), catalog
  * and about output.
  */
class TapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cfgJson =
    """{"database":"db1","streams":[
      |{"name":"s1","sql":"SELECT * FROM (SELECT 1 AS v UNION ALL SELECT 5 UNION ALL SELECT 9) WHERE v > :rep_key_val",
      | "key_properties":["v"],"replication_key":"v","replication_key_value_start":0,
      | "columns":[{"name":"v","type":"int"}]},
      |{"name":"s2","sql":"SELECT 'x' AS a","key_properties":["a"],
      | "columns":[{"name":"a","type":"text"}]}
      |]}""".stripMargin

  test("sync_all emits schema+records per stream and advances state across runs") {
    val tap = ConfigParser.parseTap(cfgJson)
    assert(tap.streams.map(_.streamId) === Seq("db1-public-s1", "db1-public-s2"))
    val statePath = Files.createTempDirectory("tap").resolve("state.json").toString

    val buf1 = new ByteArrayOutputStream()
    val (res1, st1) = Tap.syncAll(spark, tap, Some(statePath), new PrintStream(buf1, true, "UTF-8"))
    assert(res1.map(_.records) === Seq(3, 1))
    assert(st1.bookmark("db1-public-s1") === Some("9"))
    val lines1 = buf1.toString("UTF-8").split("\n")
    assert(lines1.count(_.contains(""""type":"SCHEMA"""")) === 2)
    assert(lines1.count(_.contains(""""type":"RECORD"""")) === 4)
    assert(lines1.last.contains(""""type":"STATE""""))
    // ACTIVATE_VERSION: only the FULL_TABLE stream (s2) emits it, after
    // its last RECORD — the singer_sdk resync handshake
    val av = lines1.filter(_.contains(""""type":"ACTIVATE_VERSION""""))
    assert(av.length === 1 && av.head.contains(""""stream":"s2""""), av.toSeq)
    assert("""("version":)(\d+)""".r.findFirstIn(av.head).isDefined)
    val avIdx = lines1.indexWhere(_.contains(""""type":"ACTIVATE_VERSION""""))
    val lastS2Record = lines1.lastIndexWhere(l =>
      l.contains(""""type":"RECORD"""") && l.contains(""""stream":"s2""""))
    assert(avIdx > lastS2Record)

    // second run resumes from the bookmark: v > 9 → no new records for s1
    val buf2 = new ByteArrayOutputStream()
    val (res2, _) = Tap.syncAll(spark, tap, Some(statePath), new PrintStream(buf2, true, "UTF-8"))
    assert(res2.map(_.records) === Seq(0, 1))
    // bookmark survives an empty sync (no regression to start value)
    assert(Bookmarks.load(statePath).bookmark("db1-public-s1") === Some("9"))
  }

  // Regression for ADVICE r1 (high): with a nondeterministic source the
  // bookmark must be the max of the rows actually EMITTED, not of a
  // second execution. SingerSink tracks max(rep_key) inside the single
  // emit pass (no full-stream persist, no second job), so the
  // rand()-keyed stream's emitted max and the state bookmark agree.
  test("bookmark derives from the same execution that emitted (nondeterministic source)") {
    val tap = ConfigParser.parseTap(
      """{"database":"db1","streams":[
        |{"name":"nd","sql":"SELECT CAST(rand() * 1000000 AS INT) AS r, id FROM range(50)",
        | "key_properties":["id"],"replication_key":"r",
        | "replication_key_value_start":-1,
        | "columns":[{"name":"r","type":"int"},{"name":"id","type":"bigint"}]}
        |]}""".stripMargin)
    for (_ <- 1 to 3) {
      val buf = new ByteArrayOutputStream()
      val (_, st) = Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
      val emittedMax = buf.toString("UTF-8").split("\n")
        .filter(_.contains(""""type":"RECORD""""))
        .map(l => """"r":(-?\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
        .max
      assert(st.bookmark("db1-public-nd") === Some(emittedMax.toString),
        "bookmark must equal the max replication-key value among emitted records")
    }
  }

  // Config-driven STREAM_MAPS + FLATTENING (reference tap.py:256-257,
  // README.md:35-38): flattening expands struct SQL results to
  // parent__child columns before conformance; the stream map filters rows,
  // computes a column (with a config.<key> substitution from
  // stream_map_config), drops a property, and a `"stream": null` entry
  // removes that stream from the sync. The SCHEMA message reflects the
  // transformed shape.
  test("config-driven stream_maps + flattening end-to-end") {
    val tap = ConfigParser.parseTap(
      """{"database":"db1",
        |"flattening_enabled":true,"flattening_max_depth":1,
        |"stream_map_config":{"prefix":"doc-"},
        |"stream_maps":{
        |  "m1":{"__filter__":"v__a > 1",
        |        "tagged":"concat(config.prefix, cast(v__a as string))",
        |        "secret":null},
        |  "gone":null},
        |"streams":[
        |{"name":"m1","sql":"SELECT named_struct('a', id) AS v, 'x' AS secret, id FROM range(4)",
        | "key_properties":["id"],
        | "columns":[{"name":"id","type":"bigint"},{"name":"v__a","type":"bigint"},{"name":"secret","type":"text"}]},
        |{"name":"gone","sql":"SELECT 1 AS z","key_properties":["z"],"columns":[{"name":"z","type":"int"}]}
        |]}""".stripMargin)
    ConfigParser.validate(tap)
    val buf = new ByteArrayOutputStream()
    val (res, _) = Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
    assert(res.map(_.stream.name) === Seq("m1")) // "gone" removed by its null map
    val lines = buf.toString("UTF-8").split("\n")
    val records = lines.filter(_.contains(""""type":"RECORD""""))
    assert(records.length === 2) // filter keeps v__a in {2,3}
    assert(records.forall(r => r.contains(""""tagged":"doc-""") && !r.contains("secret")))
    val schemaLine = lines.find(_.contains(""""type":"SCHEMA"""")).get
    assert(schemaLine.contains(""""tagged"""") && schemaLine.contains(""""v__a""""))
    assert(!schemaLine.contains("secret"))
  }

  // Parser hardening: unrecognized __directive__ keys fail loudly instead
  // of becoming computed columns; config.<key> substitution respects token
  // boundaries (config.p must not eat into config.pre).
  test("stream_maps parsing: unknown directives rejected, prefix-safe config keys") {
    val e = intercept[IllegalArgumentException](ConfigParser.parseTap(
      """{"streams":[],"stream_maps":{"s":{"__source__":"other"}}}"""))
    assert(e.getMessage.contains("unsupported directive '__source__'"))

    val tap = ConfigParser.parseTap(
      """{"stream_map_config":{"p":"x","pre":"doc-"},
        |"stream_maps":{"s":{"tagged":"concat(config.pre, config.p, name)"}},
        |"streams":[{"name":"s","sql":"SELECT 'n' AS name","key_properties":["name"],
        |  "columns":[{"name":"name","type":"text"}]}]}""".stripMargin)
    assert(tap.streamMaps("s").computed ===
      Seq("tagged" -> "concat('doc-', 'x', name)"))
  }

  // A stream map must not drop or rename the replication key — the
  // incremental watermark has to survive into the emitted rows.
  test("stream map dropping the replication key is rejected") {
    val tap = ConfigParser.parseTap(
      """{"database":"db1",
        |"stream_maps":{"s":{"v":null},"nope":{}},
        |"streams":[
        |{"name":"s","sql":"SELECT 1 AS v","key_properties":["v"],
        | "replication_key":"v","replication_key_value_start":0,
        | "columns":[{"name":"v","type":"int"}]}
        |]}""".stripMargin)
    val e = intercept[IllegalArgumentException](ConfigParser.validate(tap))
    assert(e.getMessage.contains("must not drop/rename replication_key 'v'"))
    assert(e.getMessage.contains("stream_maps: unknown stream 'nope'"))
  }

  // -- periodic STATE emission (SDK STATE_MSG_FREQUENCY) -------------------

  /** stdout pipe that dies (like a killed target) after `afterLines`. */
  private class KilledPipe extends RuntimeException("pipe killed")
  private def killingStream(buf: ByteArrayOutputStream, afterLines: Int) =
    new PrintStream(buf, true, "UTF-8") {
      private var lines = 0
      override def println(x: String): Unit = {
        if (lines >= afterLines) throw new KilledPipe
        super.println(x); lines += 1
      }
    }
  private def stateValue(line: String): String =
    line.stripPrefix("""{"type":"STATE","value":""").stripSuffix("}")

  private val sortedCfg =
    """{"database":"db1","state_message_frequency":2,"streams":[
      |{"name":"srt","sql":"SELECT id FROM range(10) WHERE id > :rep_key_val ORDER BY id",
      | "key_properties":["id"],"replication_key":"id","replication_key_value_start":-1,
      | "is_sorted":true,"columns":[{"name":"id","type":"bigint"}]}]}""".stripMargin

  test("sorted stream: mid-sync STATE every N records reflects only emitted rows") {
    val tap = ConfigParser.parseTap(sortedCfg)
    assert(tap.stateMessageFrequency === 2)
    val buf = new ByteArrayOutputStream()
    Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
    val lines = buf.toString("UTF-8").split("\n")
    // SCHEMA, then (RECORD RECORD STATE) x5, then the final STATE
    val states = lines.filter(_.contains(""""type":"STATE""""))
    assert(states.length === 6)
    // each mid STATE's bookmark is the max id among records ALREADY emitted
    val bookmarks = states.map(l =>
      """"replication_key_value":"(\d+)"""".r.findFirstMatchIn(l).get.group(1))
    assert(bookmarks.toSeq === Seq("1", "3", "5", "7", "9", "9"))
    // interleaving: the first STATE appears before the third RECORD
    val recordIdxs = lines.zipWithIndex
      .filter(_._1.contains(""""type":"RECORD"""")).map(_._2).toSeq
    assert(lines.indexWhere(_.contains(""""type":"STATE"""")) < recordIdxs(2))
  }

  // Kill-resume e2e: the pipe dies mid-stream; the orchestrator persists
  // the last STATE line it received and restarts the tap with it — only
  // the tail re-extracts (is_sorted makes the mid-sync bookmark exact).
  test("kill-resume: a sorted sync resumes from the last flushed STATE, tail only") {
    val tap = ConfigParser.parseTap(sortedCfg)
    val buf1 = new ByteArrayOutputStream()
    // SCHEMA + 2 RECORDs + STATE + 2 RECORDs + STATE = 7 lines, then killed
    intercept[KilledPipe](Tap.syncAll(spark, tap, None, killingStream(buf1, 7)))
    val lines1 = buf1.toString("UTF-8").split("\n")
    assert(lines1.count(_.contains(""""type":"RECORD"""")) === 4)
    val lastState = lines1.filter(_.contains(""""type":"STATE"""")).last
    val statePath = Files.createTempDirectory("tap-resume").resolve("state.json")
    Files.writeString(statePath, stateValue(lastState))

    val buf2 = new ByteArrayOutputStream()
    val (res2, st2) = Tap.syncAll(spark, tap, Some(statePath.toString),
      new PrintStream(buf2, true, "UTF-8"))
    assert(res2.head.records === 6) // ids 4..9 — the unemitted tail, nothing more
    val ids2 = buf2.toString("UTF-8").split("\n")
      .filter(_.contains(""""type":"RECORD""""))
      .map(l => """"id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toInt).toSeq
    assert(ids2 === (4 to 9))
    assert(st2.bookmark("db1-public-srt") === Some("9"))
  }

  // An UNSORTED stream's mid-sync STATE carries progress_markers only:
  // the committed bookmark (what a resume filters on) must not advance
  // until the stream completes — rows below the running max may not have
  // been emitted yet.
  test("unsorted stream: mid-sync STATE uses non-resumable progress markers") {
    val tap = ConfigParser.parseTap(
      """{"database":"db1","state_message_frequency":2,"streams":[
        |{"name":"uns","sql":"SELECT id FROM range(5)",
        | "key_properties":["id"],"replication_key":"id","replication_key_value_start":-1,
        | "columns":[{"name":"id","type":"bigint"}]}]}""".stripMargin)
    val buf = new ByteArrayOutputStream()
    Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
    val states = buf.toString("UTF-8").split("\n")
      .filter(_.contains(""""type":"STATE""""))
    val (mids, last) = (states.init, states.last)
    assert(mids.nonEmpty)
    assert(mids.forall(_.contains(""""progress_markers"""")))
    // a resume of a mid STATE must see NO bookmark for the stream
    mids.foreach { m =>
      val p = Files.createTempFile("mid-state", ".json")
      Files.writeString(p, stateValue(m))
      assert(Bookmarks.load(p.toString).bookmark("db1-public-uns") === None,
        "progress markers must not act as a resumable bookmark")
    }
    // the final STATE promotes the completed stream to a real bookmark
    assert(!last.contains("progress_markers"))
    assert(last.contains(""""replication_key_value":"4""""))
  }

  // Batch mode re-reads max(rep_key) from the immutable files the sink
  // just wrote — the stream itself executes exactly once, and temporal rep
  // keys round-trip through the sink's ISO timestampFormat back to the
  // exact Spark string-cast bookmark rendering.
  test("batch mode derives bookmark from the files just written") {
    val tmp = Files.createTempDirectory("graft-batch-state").toString
    val tap = ConfigParser.parseTap(
      s"""{"database":"db1",
         |"batch_config":{"encoding":{"format":"jsonl","compression":"gzip"},
         |  "storage":{"root":"file://$tmp"}},
         |"streams":[
         |{"name":"b1","sql":"SELECT id FROM range(7) WHERE id > :rep_key_val",
         | "key_properties":["id"],"replication_key":"id","replication_key_value_start":-1,
         | "columns":[{"name":"id","type":"bigint"}]},
         |{"name":"b2","sql":"SELECT timestamptz '2021-11-22T11:45:11.062824+00:00' AS ts",
         | "key_properties":["ts"],"replication_key":"ts",
         | "replication_key_value_start":"1970-01-01",
         | "columns":[{"name":"ts","type":"datetime"}]}
         |]}""".stripMargin)
    val buf = new ByteArrayOutputStream()
    val (res, st) = Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
    assert(res.forall(_.manifests.nonEmpty))
    assert(st.bookmark("db1-public-b1") === Some("6"))
    assert(st.bookmark("db1-public-b2") === Some("2021-11-22 11:45:11.062824"))

    // one BATCH message per manifest, each followed by a STATE covering
    // exactly the chunks announced so far (resumable batch extraction)
    val lines = buf.toString("UTF-8").split("\n")
    val nManifests = res.map(_.manifests.size).sum
    assert(lines.count(_.contains(""""type":"BATCH"""")) === nManifests)
    assert(lines.count(_.contains(""""type":"STATE"""")) === nManifests + 1)
    val b1Bookmarks = lines
      .filter(l => l.contains(""""type":"STATE"""") && l.contains("db1-public-b1"))
      .map(l => """db1-public-b1":\{"replication_key_value":"(\d+)"""".r
        .findFirstMatchIn(l).get.group(1).toInt).toSeq
    assert(b1Bookmarks === b1Bookmarks.sorted, "per-manifest bookmarks must be monotone")
    assert(b1Bookmarks.last === 6)
    val firstBatch = lines.indexWhere(_.contains(""""type":"BATCH""""))
    assert(lines(firstBatch + 1).contains(""""type":"STATE""""),
      "each BATCH message is followed by its STATE")
  }

  // sync_parallelism (VERDICT r10 item 7): three streams extract
  // concurrently in batch mode; message emission and state advancement
  // stay sequential in config order, so the output is byte-identical
  // (modulo generated file/sync ids) to a sequential run — bookmarks,
  // manifest counts, message ordering all unchanged.
  test("concurrent batch sync: 3 streams in flight, deterministic output") {
    def cfg(root: String, par: Int) =
      s"""{"database":"db1","sync_parallelism":$par,
         |"batch_config":{"encoding":{"format":"jsonl","compression":"gzip"},
         |  "storage":{"root":"file://$root"}},
         |"streams":[
         |{"name":"p1","sql":"SELECT id FROM range(7) WHERE id > :rep_key_val",
         | "key_properties":["id"],"replication_key":"id","replication_key_value_start":-1,
         | "columns":[{"name":"id","type":"bigint"}]},
         |{"name":"p2","sql":"SELECT id * 10 AS k FROM range(5)",
         | "key_properties":["k"],"replication_key":"k","replication_key_value_start":-1,
         | "columns":[{"name":"k","type":"bigint"}]},
         |{"name":"p3","sql":"SELECT 'z' AS a","key_properties":["a"],
         | "columns":[{"name":"a","type":"text"}]}
         |]}""".stripMargin
    def run(par: Int): (Seq[Tap.StreamResult], graft.state.TapState, Seq[String]) = {
      val tmp = Files.createTempDirectory(s"graft-par$par").toString
      val buf = new ByteArrayOutputStream()
      val (res, st) = Tap.syncAll(spark, ConfigParser.parseTap(cfg(tmp, par)),
        None, new PrintStream(buf, true, "UTF-8"))
      // strip the generated ids (file uuids) so runs compare structurally
      val lines = buf.toString("UTF-8").split("\n").toSeq
        .map(_.replaceAll("graft-par\\d+[^\"]*", "<file>")
          .replaceAll("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "<id>"))
      (res, st, lines)
    }
    val (resSeq, stSeq, linesSeq) = run(par = 1)
    val (resPar, stPar, linesPar) = run(par = 3)
    assert(resPar.map(_.stream.name) === resSeq.map(_.stream.name))
    assert(resPar.map(_.manifests.size) === resSeq.map(_.manifests.size))
    assert(stPar.bookmark("db1-public-p1") === Some("6"))
    assert(stPar.bookmark("db1-public-p2") === Some("40"))
    assert(stPar.bookmark("db1-public-p1") === stSeq.bookmark("db1-public-p1"))
    assert(stPar.bookmark("db1-public-p2") === stSeq.bookmark("db1-public-p2"))
    assert(linesPar === linesSeq,
      "parallel batch sync must emit the identical message sequence")
  }

  // Singer --catalog selection: streams deselect via root-breadcrumb
  // metadata {"selected": false}; everything else stays selected.
  test("catalog selection round-trips and honors selected:false") {
    val tap = ConfigParser.parseTap(cfgJson)
    val cat = Tap.catalogJson(tap)
    assert(Tap.selectedStreams(cat) === Set("db1-public-s1", "db1-public-s2"))
    val edited =
      """{"streams":[
        |{"tap_stream_id":"db1-public-s1","stream":"s1",
        | "metadata":[{"breadcrumb":[],"metadata":{"selected":false}}]},
        |{"tap_stream_id":"db1-public-s2","stream":"s2",
        | "metadata":[{"breadcrumb":["properties","a"],"metadata":{"selected":false}}]}
        |]}""".stripMargin
    // s1 deselected at the root; s2's property-level deselect does NOT
    // deselect the stream
    assert(Tap.selectedStreams(edited) === Set("db1-public-s2"))
  }

  // Property-level selection (VERDICT r8 item 3): a ["properties", name]
  // breadcrumb with selected:false drops that column from the SCHEMA
  // message and every RECORD; key properties / the replication key are
  // automatic and survive any deselection (singer-sdk standard metadata).
  test("property-level catalog selection drops the column end-to-end") {
    val cfg =
      """{"database":"db1","streams":[
        |{"name":"s1","sql":"SELECT 1 AS v, 'keepme' AS a, 'dropme' AS b",
        | "key_properties":["v"],
        | "columns":[{"name":"v","type":"int"},{"name":"a","type":"text"},
        |            {"name":"b","type":"text"}]}
        |]}""".stripMargin
    val tap = ConfigParser.parseTap(cfg)
    val cat =
      """{"streams":[
        |{"tap_stream_id":"db1-public-s1","stream":"s1","metadata":[
        |  {"breadcrumb":[],"metadata":{"selected":true}},
        |  {"breadcrumb":["properties","b"],"metadata":{"selected":false}},
        |  {"breadcrumb":["properties","v"],
        |   "metadata":{"selected":false,"inclusion":"automatic"}}
        |]}]}""".stripMargin
    assert(Tap.deselectedProperties(cat) === Map("db1-public-s1" -> Set("b")))
    val eff = Tap.applyCatalogSelection(tap, cat)
    assert(eff.streams.head.columns.map(_.name) === Seq("v", "a"))
    val buf = new ByteArrayOutputStream()
    Tap.syncAll(spark, eff, None, new PrintStream(buf, true, "UTF-8"))
    val lines = buf.toString("UTF-8").split("\n")
    val schema = lines.find(_.contains(""""type":"SCHEMA"""")).get
    assert(schema.contains("\"a\"") && !schema.contains("\"b\""), schema)
    val rec = lines.find(_.contains(""""type":"RECORD"""")).get
    assert(rec.contains("keepme") && !rec.contains("dropme"), rec)
    assert(rec.contains("\"v\""), rec) // automatic key property survives

    // even without an explicit inclusion marker, a key property cannot be
    // deselected — the bookmark/PK contract wins
    val catKey =
      """{"streams":[{"tap_stream_id":"db1-public-s1","stream":"s1",
        |"metadata":[{"breadcrumb":["properties","v"],
        |  "metadata":{"selected":false}}]}]}""".stripMargin
    assert(Tap.applyCatalogSelection(tap, catKey)
      .streams.head.columns.map(_.name) === Seq("v", "a", "b"))
  }

  // VERDICT r9 item 8: the selection round-trip over the catalog that
  // --discover ITSELF produces (not a hand-built one) — discovery now
  // emits singer-sdk standard metadata (root entry + per-property
  // inclusion automatic/available), a user edit flips selected:false on
  // two properties, and the automatic guard honors the inclusion field
  // the DISCOVERY wrote.
  test("discovery-produced catalog round-trips property deselection") {
    val cfg =
      """{"database":"db1","streams":[
        |{"name":"s1","sql":"SELECT 1 AS v, 'keepme' AS a, 'dropme' AS b",
        | "key_properties":["v"],
        | "columns":[{"name":"v","type":"int"},{"name":"a","type":"text"},
        |            {"name":"b","type":"text"}]}
        |]}""".stripMargin
    val tap = ConfigParser.parseTap(cfg)
    val discovered = Tap.catalogJson(tap)
    // discovery emits the standard-metadata inclusion marks
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(discovered)
    val meta = root.get("streams").get(0).get("metadata")
    import scala.jdk.CollectionConverters._
    def propMd(name: String) = meta.elements().asScala.find { m =>
      val b = m.get("breadcrumb")
      b.size() == 2 && b.get(0).asText == "properties" &&
        b.get(1).asText == name
    }.get.get("metadata").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    assert(propMd("v").get("inclusion").asText === "automatic")
    assert(propMd("a").get("inclusion").asText === "available")
    // the user edit: deselect BOTH the available property b and the
    // automatic key property v, exactly as a catalog editor would —
    // by adding selected:false to the discovery-produced entries
    propMd("b").put("selected", false)
    propMd("v").put("selected", false)
    val edited = mapper.writeValueAsString(root)
    // the guard reads the inclusion the DISCOVERY wrote: v survives
    assert(Tap.deselectedProperties(edited) === Map("db1-public-s1" -> Set("b")))
    val eff = Tap.applyCatalogSelection(tap, edited)
    assert(eff.streams.head.columns.map(_.name) === Seq("v", "a"))
    val buf = new ByteArrayOutputStream()
    Tap.syncAll(spark, eff, None, new PrintStream(buf, true, "UTF-8"))
    val lines = buf.toString("UTF-8").split("\n")
    val schema = lines.find(_.contains(""""type":"SCHEMA"""")).get
    assert(schema.contains("\"a\"") && !schema.contains("\"b\""), schema)
    val rec = lines.find(_.contains(""""type":"RECORD"""")).get
    assert(rec.contains("keepme") && !rec.contains("dropme"), rec)
    assert(rec.contains("\"v\""), rec)
  }

  test("config validation reports every problem with stream context") {
    val bad = ConfigParser.parseTap(
      """{"streams":[
        |{"name":"a","sql":" ","key_properties":["missing"],
        | "replication_key":"also_missing","batch_size":0,
        | "columns":[{"name":"x","type":"wat"}]},
        |{"name":"a","sql":"SELECT 1","columns":[{"name":"y","type":"int"}]}
        |]}""".stripMargin)
    val e = intercept[IllegalArgumentException](ConfigParser.validate(bad))
    val msg = e.getMessage
    assert(msg.contains("duplicate stream name 'a'"))
    assert(msg.contains("empty sql"))
    assert(msg.contains("key_properties column 'missing' not declared"))
    assert(msg.contains("replication_key column 'also_missing' not declared"))
    assert(msg.contains("unsupported column type"))
    assert(msg.contains("batch_size must be positive"))
    // a clean config passes
    ConfigParser.validate(ConfigParser.parseTap(cfgJson))
  }

  // --config=ENV (reference README.md:46-50): settings from
  // TAP_RAWPOSTGRESQL_* env vars; JSON-valued settings parse as JSON.
  test("config from environment variables") {
    val tap = ConfigParser.fromEnv(Map(
      "TAP_RAWPOSTGRESQL_DATABASE" -> "envdb",
      "TAP_RAWPOSTGRESQL_PORT" -> "5433",
      "TAP_RAWPOSTGRESQL_USER" -> "u1",
      "TAP_RAWPOSTGRESQL_STREAMS" ->
        """[{"name":"s","sql":"SELECT 1 AS v","key_properties":["v"],
          |  "columns":[{"name":"v","type":"int"}]}]""".stripMargin,
      "UNRELATED_VAR" -> "ignored"))
    assert(tap.database === "envdb")
    assert(tap.port === 5433)
    assert(tap.user === "u1")
    assert(tap.streams.map(_.streamId) === Seq("envdb-public-s"))
    ConfigParser.validate(tap)
  }

  // SDK error contract: failures become ONE structured CRITICAL line on
  // stderr + non-zero exit, never a bare stack trace (stdout stays
  // reserved for Singer messages).
  test("CLI failures surface as one structured CRITICAL line on stderr") {
    val cfg = Files.createTempDirectory("tap-bad").resolve("cfg.json")
    Files.writeString(cfg,
      """{"streams":[{"name":"x","sql":" ","columns":[{"name":"v","type":"int"}]}]}""")
    val errBuf = new ByteArrayOutputStream()
    val code = Main.run(Array("--config", cfg.toString, "--discover"),
      new PrintStream(errBuf, true, "UTF-8"))
    assert(code === 1)
    val line = errBuf.toString("UTF-8").trim
    assert(line.startsWith("""{"level":"CRITICAL","logger":"graft""""))
    assert(line.contains("empty sql"))
    assert(!line.contains("\n"))
  }

  test("catalog and about output") {
    val tap = ConfigParser.parseTap(cfgJson)
    val cat = Tap.catalogJson(tap)
    assert(cat.contains(""""tap_stream_id":"db1-public-s1""""))
    assert(cat.contains(""""replication_method":"INCREMENTAL""""))
    assert(cat.contains(""""replication_method":"FULL_TABLE""""))
    assert(cat.contains(""""v":{"type":["integer"]}"""))
    assert(Tap.aboutJson.contains("\"capabilities\""))
  }

  // VERDICT r6 item 1: `execution: "auto"` in a full sync — a stream whose
  // SQL Spark can parse runs natively (its table exists ONLY as a Spark
  // view, so success proves the native path), while a deliberately
  // unrewritable PG/SQL:2008 construct (FETCH FIRST … ROWS ONLY) falls
  // back to JDBC pushdown of the ORIGINAL SQL against live Derby —
  // reproducing the reference's execute-anything contract
  // (client.py:300-304) inside syncAll, not just in StreamSource.
  test("auto execution mode: native when parseable, pushdown fallback when not") {
    Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graftfall;create=true")
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE t") catch { case _: java.sql.SQLException => () }
      st.executeUpdate("CREATE TABLE t (id INT, v VARCHAR(16))")
      val ps = conn.prepareStatement("INSERT INTO t VALUES (?, ?)")
      (1 to 10).foreach { i => ps.setInt(1, i); ps.setString(2, s"v$i"); ps.executeUpdate() }
    } finally conn.close()
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"))
      .toDF("id", "v").createOrReplaceTempView("spark_only")

    val tap = ConfigParser.parseTap(
      """{"jdbc_url":"jdbc:derby:memory:graftfall","jdbc_driver":"org.apache.derby.iapi.jdbc.AutoloadedDriver",
        |"execution":"auto","streams":[
        | {"name":"s_native","sql":"SELECT id, v FROM spark_only WHERE id <= 3",
        |  "key_properties":["id"],
        |  "columns":[{"name":"id","type":"int"},{"name":"v","type":"text"}]},
        | {"name":"s_push","sql":"SELECT id, v FROM t ORDER BY id FETCH FIRST 4 ROWS ONLY",
        |  "key_properties":["id"],
        |  "columns":[{"name":"id","type":"int"},{"name":"v","type":"text"}]}]}""".stripMargin)
    assert(tap.streams.map(_.execution) === Seq("auto", "auto"))

    val buf = new ByteArrayOutputStream()
    val (res, _) = Tap.syncAll(spark, tap, None, new PrintStream(buf, true, "UTF-8"))
    assert(res.map(_.records) === Seq(3, 4))
    val out = buf.toString("UTF-8")
    assert(out.contains(""""v1""""), "pushdown rows present in Singer output")

    // explicit "jdbc" mode routes even Spark-parseable SQL to the remote
    val tapJdbc = ConfigParser.parseTap(
      """{"jdbc_url":"jdbc:derby:memory:graftfall","jdbc_driver":"org.apache.derby.iapi.jdbc.AutoloadedDriver",
        |"streams":[{"name":"t","sql":"SELECT id, v FROM t WHERE id > 5","execution":"jdbc",
        | "key_properties":["id"],
        | "columns":[{"name":"id","type":"int"},{"name":"v","type":"text"}]}]}""".stripMargin)
    val (resJ, _) = Tap.syncAll(spark, tapJdbc, None,
      new PrintStream(new ByteArrayOutputStream(), true, "UTF-8"))
    assert(resJ.map(_.records) === Seq(5))

    // a bad mode is rejected by validation with stream context
    val bad = tap.copy(streams = tap.streams.map(_.copy(execution = "psql")))
    val e = intercept[IllegalArgumentException](ConfigParser.validate(bad))
    assert(e.getMessage.contains("execution must be one of"))
  }
}
