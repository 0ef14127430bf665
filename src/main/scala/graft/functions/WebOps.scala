package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the front door of every crawl-derived
  * training-data pipeline (C4, RefinedWeb, FineWeb all open with them):
  * canonicalize URLs so syntactic variants collapse, extract the
  * registered domain for per-site statistics / caps / blocklists, and
  * dedup at the canonical-URL level before any content-level pass runs.
  *
  * The reference tap has no web surface (its URLs are JDBC DSNs); this
  * family belongs to the LLM-pipeline extension set, next to
  * [[Curation.sourceCap]] (which caps by an explicit source column —
  * here the key is DERIVED from the URL itself).
  *
  * Everything is a per-row projection over built-in string/array
  * functions (codegen'd, no UDF, no shuffle), so at 100 TB the
  * canonicalization cost is the scan itself; only the dedup/stats
  * aggregations shuffle, and those are partial-agg friendly
  * (`groupBy(canon).min(id)` / counts).
  *
  * Canonicalization rules (each pinned by WebOpsSpec and the
  * `web_url_canon` oracle):
  *   1. the fragment (`#…`) is dropped;
  *   2. scheme and host are lowercased (path/query case is preserved —
  *      paths are case-sensitive on most origins);
  *   3. a leading `www.` host label is dropped;
  *   4. the scheme's default port is dropped (`:80` for http, `:443`
  *      for https); any other explicit port is kept;
  *   5. tracking query parameters are removed (`utm_*`, `gclid`,
  *      `fbclid`, `msclkid`, `ref`), surviving parameters are sorted
  *      byte-wise and rejoined — parameter order never splits a dup
  *      group; an emptied query drops its `?`;
  *   6. a trailing `/` is stripped from the path (so `http://a.com`
  *      and `http://a.com/` collapse).
  *
  * All rules are expressible identically in DuckDB (split_part /
  * list_filter / list_sort), so the gate hash-checks them end to end.
  */
object WebOps {

  /** Query parameters treated as tracking noise and removed by
    * [[canonicalizeUrl]]. `utm_` is a prefix; the rest match a whole
    * parameter name.
    */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid", "ref")

  /** Two-level public suffixes recognized by [[registeredDomain]] — a
    * documented subset of the Mozilla Public Suffix List (the full list
    * is data, not code: ship it as a broadcast table and join when a
    * deployment needs all ~9k entries; the rule stays the same).
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "blogspot.com", "herokuapp.com")

  /** `scheme` of a URL, lowercased (`''` when no `://` present). */
  def schemeOf(u: Column): Column = {
    val s = split_part(u, lit("://"), lit(1))
    when(s === u, lit("")).otherwise(lower(s))
  }

  /** Lowercased `host[:port]` — everything between `://` and the first
    * `/`, `?` or `#`. The explicit port is PRESERVED here;
    * [[canonicalizeUrl]] decides whether it is the scheme default.
    */
  def hostPortOf(u: Column): Column = {
    // substring after '://' (whole string when absent — schemeless input)
    val schemeLen = length(split_part(u, lit("://"), lit(1)))
    val rest = when(instr(u, "://") > 0,
      substring(u, (schemeLen + lit(4)).cast("int"), lit(1 << 30))
    ).otherwise(u)
    lower(split_part(split_part(split_part(rest, lit("/"), lit(1)),
      lit("?"), lit(1)), lit("#"), lit(1)))
  }

  /** Host without port (strip a trailing `:digits`). */
  def hostOf(u: Column): Column =
    regexp_replace(hostPortOf(u), ":[0-9]+$", "")

  /** Registered domain (eTLD+1) of a host under [[TwoLevelSuffixes]]:
    * the last two labels, or the last three when the last two form a
    * listed public suffix. Hosts with fewer labels pass through whole.
    */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(n <= 2, host)
      .when(last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** The canonical form of `u` under the object-level rules. Pure
    * projection — safe in streaming (stateless) and inside any larger
    * plan.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = split_part(u, lit("#"), lit(1))
    val base = split_part(noFrag, lit("?"), lit(1))
    val query = when(instr(noFrag, "?") > 0,
      substring(noFrag, (length(base) + lit(2)).cast("int"), lit(1 << 30))
    ).otherwise(lit(""))
    val scheme = schemeOf(base)
    val schemeLen = length(split_part(base, lit("://"), lit(1)))
    val rest = when(instr(base, "://") > 0,
      substring(base, (schemeLen + lit(4)).cast("int"), lit(1 << 30))
    ).otherwise(base)
    val hostPort0 = lower(split_part(rest, lit("/"), lit(1)))
    val path0 = substring(rest, (length(hostPort0) + lit(1)).cast("int"),
      lit(1 << 30))
    val host1 = regexp_replace(hostPort0, "^www\\.", "")
    val host2 = when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .otherwise(host1)
    val path1 = regexp_replace(path0, "/$", "")
    val kept = array_sort(filter(split(query, "&"), p =>
      not(p.startsWith("utm_")) &&
        not(split_part(p, lit("="), lit(1))
          .isin(TrackingParams.map(lit(_)): _*)) &&
        (p =!= "")))
    val q1 = array_join(kept, "&")
    concat(scheme, lit("://"), host2, path1,
      when(q1 === "", lit("")).otherwise(concat(lit("?"), q1)))
  }

  /** Canonical-URL dedup verdicts: one row per input row with the
    * canonical form and `keep` = (this row is the minimum `idCol` of
    * its canonical group) — the exact-dedup contract of
    * [[Dedup]] applied to the DERIVED canonical key.
    *
    * 100 TB shape: one `groupBy(canon).min(id)` (partial-agg, the
    * canonical string is the shuffle key) + one hash join back; no
    * row ever carries its group.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val withCanon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val keepers = withCanon.groupBy("canon_url")
      .agg(min(col(idCol)).as("__keep_id"))
    withCanon.join(keepers, Seq("canon_url"))
      .select(col(idCol), col(urlCol), col("canon_url"),
        (col(idCol) === col("__keep_id")).as("keep"))
  }

  /** Per-registered-domain corpus statistics over canonicalized URLs:
    * document count, distinct canonical hosts, and a size sum — the
    * table a domain blocklist / per-site cap decision reads. Counts
    * only; no floating aggregate, so the gate hash is exact.
    */
  def domainStats(df: DataFrame, urlCol: String, sizeCol: String): DataFrame = {
    val host = hostOf(canonicalizeUrl(col(urlCol)))
    df.select(registeredDomain(host).as("domain"), host.as("__host"),
        col(sizeCol).as("__sz"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"),
        sum(col("__sz")).as("sum_size"))
  }

  /** Per-domain keep cap over canonical URLs — [[Curation.sourceCap]]
    * with the source DERIVED from the URL: within each registered
    * domain keep the `maxPerDomain` smallest ids (deterministic, so
    * the oracle replays it). Rank via ONE partial-agg-friendly
    * window substitute: groupBy-join is wrong here (need per-row
    * rank), so this uses `row_number` over the domain — at 100 TB a
    * hot domain bounds the partition, which is exactly the situation
    * the cap exists to bound: the window input is already ≤ the
    * domain's row count, and domains past ~10⁸ rows should be
    * pre-capped by sampling upstream.
    */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
                maxPerDomain: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDom = df.withColumn("domain",
      registeredDomain(hostOf(canonicalizeUrl(col(urlCol)))))
    val w = Window.partitionBy("domain").orderBy(col(idCol))
    withDom
      .withColumn("rnk", row_number().over(w))
      .select(col(idCol), col("domain"),
        (col("rnk") <= maxPerDomain).as("keep"))
  }
}
