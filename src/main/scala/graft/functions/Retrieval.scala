package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: inverted-index
  * construction and BM25-style ranked search (Robertson & Spärck Jones;
  * Robertson et al., TREC-3 Okapi). In a training-data pipeline this is
  * the workhorse for benchmark-contamination search ("which corpus docs
  * score highly against this eval question?"), targeted data selection,
  * and query-driven corpus audits.
  *
  * Scale shape (the 100 TB story):
  *  - the inverted index is ONE explode + partial-aggregated groupBy —
  *    the shuffle carries (term, doc_id) pairs already combined per map
  *    task, and the resulting postings table is hash-partitioned by term;
  *  - per-term statistics (df) aggregate the postings, not the corpus;
  *  - the query set is small by contract (an eval suite, not a corpus)
  *    and is broadcast to the postings — scoring never shuffles the
  *    corpus text, only matched (query_id, doc_id, contribution) rows;
  *  - ultra-common terms (df·2 > maxDfPermille·N/500) are dropped on the
  *    INDEX side before the join — the classic stop-term guard that also
  *    removes the one skew hazard (a stopword's posting list joining
  *    every query containing it);
  *  - final per-query top-k is a row_number window over candidates of a
  *    single query — bounded by the matched-candidate count, never the
  *    corpus.
  *
  * Cross-engine determinism: every floating-point step is an IEEE
  * correctly-rounded operation (+, ×, ÷, sqrt) on inputs derived from
  * integer counts, so any IEEE-754 engine reproduces the scores
  * bit-for-bit. That is why the idf is the SQRT of the Robertson odds
  * ratio `(N − df + ½)/(df + ½)` rather than its logarithm: sqrt is
  * correctly rounded everywhere, ln is not, and sqrt is a monotone map
  * of the same odds — per-term ordering is identical, and the gate can
  * hash-compare scores exactly. (With a lib-specific ln, scores could
  * drift in the last ulp between engines and even between libm builds —
  * a reproducibility bug at 100 TB, not just an oracle nuisance.)
  */
object Retrieval {

  private def toks(c: Column): Column = split(Dedup.normalizeText(c), " ")

  /** Postings: one row per (term, doc) with its term frequency. Empty
    * documents contribute nothing; `dl` rides along so scoring never
    * rejoins the corpus.
    */
  def buildPostings(docs: DataFrame, textCol: String,
                    idCol: String): DataFrame = {
    val base = docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
    base.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** [[buildPostings]] WITHOUT the (term, doc) exchange: tf computed
    * ROW-LOCALLY — explode the doc's distinct terms with per-term
    * counts taken inside the row's own token array — so an ingest
    * batch's postings job is scan + projection + write, no shuffle
    * anywhere. The per-row work is quadratic in the doc's token count,
    * so this is for BOUNDED-length texts only: context-window chunks
    * (the RAG ingest shape — ≤ window tokens by construction), titles,
    * fields. Emits bit-identical rows to [[buildPostings]]
    * (spec-pinned); long free-text docs should keep the agg form.
    */
  def buildPostingsRowLocal(docs: DataFrame, textCol: String,
                            idCol: String): DataFrame = {
    val base = docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__toks"))
    base.select(
        explode(transform(array_distinct(col("__toks")), t =>
          struct(t.as("term"),
            size(filter(col("__toks"), x => x === t)).as("tf")))).as("e"),
        col("doc_id"), size(col("__toks")).as("dl"))
      .select(col("e.term").as("term"), col("doc_id"),
        col("e.tf").cast("long").as("tf"), col("dl"))
  }

  /** Per-term statistics over a postings table: document frequency and
    * collection frequency. This IS the index metadata a query planner
    * needs; it aggregates postings rows, never the corpus.
    */
  def termStats(postings: DataFrame): DataFrame =
    postings.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** Positional postings: one row per token OCCURRENCE, `pos` 1-based —
    * the index layout phrase and proximity queries need. Hash-partitioned
    * by term like [[buildPostings]]; positions ride as plain ints, so the
    * shuffle rows stay narrow.
    */
  def buildPositionalPostings(docs: DataFrame, textCol: String,
                              idCol: String): DataFrame =
    docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(toks(col(textCol))).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + lit(1)).as("pos"), col("term"))

  /** Proximity search: documents where a pair's two DISTINCT terms
    * co-occur within `w` token positions (unordered — the "x NEAR y"
    * operator). `pairs` is (query_id, x, y); output is (query_id,
    * doc_id, n_pairs, min_dist) over every qualifying position pair.
    *
    * Scale shape: the positional postings stream is filtered to the
    * queried terms by ONE broadcast join per side (so each side carries
    * only matched positions), then the two sides join on
    * (query_id, doc_id) — per-doc work is tf_x·tf_y, the postings-list
    * merge cost every IR engine pays, never corpus-quadratic. Pure
    * integer arithmetic.
    */
  def proximityMatches(corpus: DataFrame, textCol: String, idCol: String,
                       pairs: DataFrame, w: Int): DataFrame = {
    val post = buildPositionalPostings(corpus, textCol, idCol)
    val px = post.join(broadcast(pairs.select(col("query_id"),
        col("x").as("term"))), "term")
      .select(col("query_id"), col("doc_id"), col("pos").as("px"))
    val py = post.join(broadcast(pairs.select(col("query_id"),
        col("y").as("term"))), "term")
      .select(col("query_id"), col("doc_id"), col("pos").as("py"))
    px.join(py, Seq("query_id", "doc_id"))
      .where(abs(col("px") - col("py")) <= w)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("px") - col("py"))).as("min_dist"))
  }

  /** Exact phrase search via anchor alignment: each posting that matches
    * phrase position `qpos` votes for anchor `pos − qpos`; an anchor with
    * one vote per phrase position is a match. One broadcast join (the
    * phrase set) + one count per (query, doc, anchor) — the corpus never
    * shuffles, only matched postings do, and a phrase's selectivity
    * multiplies per term, so the anchor groupBy sees candidate rows, not
    * the index. `phrases` is (query_id, qpos [0-based], term); output is
    * (query_id, doc_id, match_pos [1-based start]). Pure integer
    * arithmetic end to end — bit-portable on any engine.
    */
  def phraseMatches(corpus: DataFrame, textCol: String, idCol: String,
                    phrases: DataFrame): DataFrame = {
    val post = buildPositionalPostings(corpus, textCol, idCol)
    val ph = phrases.select(col("query_id"), col("qpos"), col("term"))
    val lens = ph.groupBy("query_id").agg(count(lit(1)).as("__len"))
    post.join(broadcast(ph), "term")
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("qpos")).as("match_pos"))
      .groupBy("query_id", "doc_id", "match_pos")
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(lens), "query_id")
      .where(col("__hits") === col("__len"))
      .select(col("query_id"), col("doc_id"), col("match_pos"))
  }

  /** BM25 ranked search: top-`k` corpus documents per query.
    *
    * `queryTerms` is (query_id, term) — one row per DISTINCT query term
    * (Okapi with query tf capped at 1, the common short-query form).
    * `maxDfPermille`: index-side stop-term guard — drop terms whose
    * df·1000 > maxDfPermille·N (integer arithmetic, no float cut).
    *
    * Score: Σ_t sqrt((N − df + ½)/(df + ½)) · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)),
    * folded in term order (see the in-body note) so the score is
    * bit-stable under any partitioning or reduce order.
    */
  def bm25TopK(corpus: DataFrame, textCol: String, idCol: String,
               queryTerms: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDfPermille: Int = 1000): DataFrame = {
    // N/avgdl straight off the corpus (one scan, no token explode) —
    // identical values to the postings-derived stats, but the expensive
    // explode+aggregate runs ONCE (for the postings), not twice
    val stats = corpus.where(length(trim(col(textCol))) > 0)
      .select(size(toks(col(textCol))).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl").cast("long")).as("sum_dl"))
    bm25Core(buildPostings(corpus, textCol, idCol), stats,
      queryTerms, k, k1, b, maxDfPermille)
  }

  /** Append a new batch's postings to a persisted index without rebuild:
    * batch doc ids are new by contract, so its (term, doc, tf, dl) rows
    * are simply new files — no merge pass. Because df, N, and avgdl are
    * derived AT SEARCH TIME from the postings ([[bm25TopKFromPostings]]),
    * not frozen into the index, an appended index scores bit-identically
    * to a from-scratch rebuild (spec-pinned) — the property engines that
    * cache per-term stats in index segments give up. Small-file pressure
    * is [[IndexMaintenance.compact]]'s job, same as the other index
    * layouts.
    */
  def appendPostings(batch: DataFrame, textCol: String, idCol: String,
                     path: String): Unit =
    buildPostings(batch, textCol, idCol).write.mode("append").parquet(path)

  /** [[appendPostings]] into a term-bucketed directory layout
    * (`bucket=<pmod(hash(term), nBuckets)>/...`), so compaction can
    * merge each bucket's files WITHOUT any shuffle
    * ([[IndexMaintenance.compactPostingsBucketed]]) — the append
    * constant at stream cadence is the postings agg + the write, and
    * the slow-cadence compact becomes a per-bucket file concat instead
    * of an index-wide distinct + repartition (VERDICT r10 item 4). The
    * bucket is derived from the term, so one term's postings always
    * land in one bucket; `nBuckets` must stay FIXED for an index's
    * lifetime. Scoring is bucket-agnostic — readers drop the column.
    */
  def appendPostingsBucketed(batch: DataFrame, textCol: String,
                             idCol: String, path: String,
                             nBuckets: Int = 8,
                             rowLocal: Boolean = false,
                             clustered: Boolean = false): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val postings =
      if (rowLocal) buildPostingsRowLocal(batch, textCol, idCol)
      else buildPostings(batch, textCol, idCol)
    // `clustered`: exchange the batch's postings by bucket before the
    // write, so each `bucket=` partition receives ONE file instead of
    // one sliver per map task (tasks × buckets files) and the follow-up
    // compact finds nothing to merge. Worth it ONLY for a bulk/initial
    // load that compacts immediately afterwards (one bounded exchange
    // of this batch's postings replaces the compact's full re-read and
    // rewrite of them); stream-cadence appends keep the default
    // shuffle-free path — their batches are small, per-batch latency is
    // the contract, and compaction runs at its own slow cadence.
    val placed =
      if (clustered) postings
        .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
        .repartition(col("bucket"))
      else postings
        .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    placed.write.mode("append").partitionBy("bucket").parquet(path)
    // doc-length sidecar (index METADATA maintained at append time):
    // one (doc_id, dl) row per batch doc, shuffle-free — dl is the
    // identical size(toks) the postings carry, and batch doc ids are
    // new by the append contract, so the sidecar accumulates exactly
    // one row per indexed doc. Search derives N/avgdl from this
    // doc-count-sized table instead of shuffling the WHOLE postings
    // index per query batch (bm25TopKFromPostings doclens param).
    batch.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).as("dl")) // same INT dl as the postings
      .write.mode("append").parquet(doclensPath(path))
  }

  /** Sidecar directory of [[appendPostingsBucketed]]'s per-doc lengths —
    * a SIBLING of the postings dir (a subdirectory would corrupt the
    * postings read's schema discovery).
    */
  def doclensPath(postingsPath: String): String = postingsPath + ".doclens"

  /** [[bm25TopK]] against an existing postings table (persisted index or
    * freshly built) — the search path shared by the batch and ingest
    * entries.
    */
  def bm25TopKFromPostings(postings: DataFrame, queryTerms: DataFrame,
                           k: Int, k1: Double = 1.2, b: Double = 0.75,
                           maxDfPermille: Int = 1000,
                           doclens: Option[DataFrame] = None): DataFrame = {
    // N and avgdl: from the doc-length SIDECAR when the index maintains
    // one ([[appendPostingsBucketed]] — a doc-count-sized scan, no
    // shuffle over the postings), else off the index itself (a narrow
    // columnar scan + per-doc agg of (doc_id, dl)). Same numbers by the
    // sidecar contract (one row per indexed doc, identical dl) —
    // spec-pinned bit-identical scores.
    val dls = doclens.getOrElse(
      postings.groupBy("doc_id").agg(first(col("dl")).as("dl")))
    val stats = dls.agg(count(lit(1)).as("n"),
      sum(col("dl").cast("long")).as("sum_dl"))
    bm25Core(postings, stats, queryTerms, k, k1, b, maxDfPermille)
  }

  /** The fully-scored probe table for CONTINUOUS query intake: per
    * (term, doc) posting, its ready-to-sum BM25 contribution. Unlike the
    * batch path (which prunes postings to the query's terms before
    * computing df), this scores the whole index once — df via one
    * count-over-window keyed by term, N/avgdl broadcast — because the
    * queries aren't known yet. A query stream then probes it with ONE
    * stateless stream-static equi-join on `term`; contributions fold to
    * scores after the drain (or per watermark group). df/idf are
    * IDENTICAL to the batch path's — pruning doesn't change a term's
    * document frequency — so streamed probes score bit-identically
    * (spec-pinned).
    */
  def bm25IndexScored(postings: DataFrame,
                      k1: Double = 1.2, b: Double = 0.75,
                      maxDfPermille: Int = 1000): DataFrame = {
    val dls = postings.groupBy("doc_id").agg(first(col("dl")).as("dl"))
    val stats = dls.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
    val d = (x: Column) => x.cast("double")
    // df via partial-aggregated termStats + a plain term-keyed join (AQE
    // broadcasts the vocabulary-row side when it is small) — NOT a
    // count-over-window, which sorts every posting inside per-term
    // partitions and collapses onto hot terms (see bm25Core's note)
    val withDf = postings
      .join(termStats(postings).select(col("term"), col("df")), "term")
      .crossJoin(broadcast(stats))
      .where(col("df") * 1000 <= lit(maxDfPermille.toLong) * col("n"))
    val avgdl = d(col("sum_dl")) / d(col("n"))
    val idf = sqrt((d(col("n") - col("df")) + lit(0.5)) /
      (d(col("df")) + lit(0.5)))
    val tfs = (d(col("tf")) * (lit(k1) + lit(1.0))) /
      (d(col("tf")) + (lit(k1) * ((lit(1.0) - lit(b)) +
        (lit(b) * (d(col("dl")) / avgdl)))))
    withDf.select(col("term"), col("doc_id"), (idf * tfs).as("c"))
  }

  /** How many distinct terms a query may carry through the slot-pivot
    * summation ([[bm25RankContributions]]). Raise if an entry needs
    * longer queries — the cost is one more `sum(when)` column per slot.
    */
  val MaxQueryTerms: Int = 8

  /** Sum per-(query, doc) contributions to ranked top-k — the shared
    * tail of the batch path and the post-drain step of a streamed probe.
    * Input needs (query_id, doc_id, term, c).
    *
    * The sum must be bit-stable (a double SUM's value depends on reduce
    * order) yet cheap. Each contribution is routed to a SLOT — its
    * term's rank among the query's distinct terms, a ≤-query-sized
    * window on the tiny term table — so `sum(when(slot=i, c))` folds at
    * most ONE value per (query, doc) slot (exact regardless of order,
    * plain codegen'd HashAggregate), and the final fixed-association
    * chain `((c₁+c₂)+…)+c_k` over coalesced slots equals the
    * term-ordered left fold bit-for-bit: adding 0.0 in place of a
    * missing positive term is IEEE-exact. (The collect_list +
    * sort_array + fold alternative computes the identical bits through
    * an ObjectHashAggregate — 3-4× slower at ~5M contribution rows.)
    */
  def bm25RankContributions(contribs: DataFrame, queryTerms: DataFrame,
                            k: Int): DataFrame = {
    val slotOf = Window.partitionBy("query_id").orderBy("term")
    val qterms = queryTerms.select("query_id", "term").distinct()
      .withColumn("slot", row_number().over(slotOf))
    // loud, not silent: a query wider than the slot set must fail here,
    // not drop its tail terms. The check aggregates the query term
    // table only — small by the query-set contract, so the extra job is
    // trivial (and never touches the corpus-sized contribution stream).
    val widest = qterms.agg(max(col("slot"))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toInt))
      .getOrElse(0)
    require(widest <= MaxQueryTerms,
      s"query has $widest distinct terms > MaxQueryTerms=$MaxQueryTerms")
    val slotted = contribs.join(broadcast(qterms), Seq("query_id", "term"))
    val slotCols = (1 to MaxQueryTerms).map(i =>
      sum(when(col("slot") === i, col("c"))).as(s"__c$i"))
    val score = (1 to MaxQueryTerms)
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val perDoc = slotted
      .groupBy("query_id", "doc_id")
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col("query_id"), col("doc_id"), score.as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** BM25F fielded ranking (Robertson/Zaragoza 2004, simple-BM25F
    * form): the document splits into a TITLE (first `titleLen` tokens)
    * and BODY field; each field's term frequency normalizes by its own
    * length (tf̃_f = tf / (1 + b_f·(dl_f/avgdl_f − 1))), the weighted
    * combination c = w_title·tf̃_T + w_body·tf̃_B saturates ONCE
    * (c/(k1+c)) — so a title hit is worth `wTitle`× a body hit without
    * double-counting saturation, the property a per-field BM25 sum
    * lacks. idf is the same sqrt-odds as [[bm25TopK]] over ANY-field
    * document frequency; contributions fold in term order through the
    * shared slot machinery, so every IEEE step is SQL-replayable.
    *
    * Scale shape: identical to [[bm25TopK]] — fielded postings prune to
    * the query's terms FIRST (broadcast semi-shape), field stats are a
    * 1-row broadcast, the per-(query, doc) combine is one partial-
    * aggregated groupBy.
    */
  def bm25fTopK(corpus: DataFrame, textCol: String, idCol: String,
                queryTerms: DataFrame, k: Int, titleLen: Int = 8,
                wTitle: Double = 2.0, wBody: Double = 1.0,
                k1: Double = 1.2, bTitle: Double = 0.75,
                bBody: Double = 0.75): DataFrame = {
    require(titleLen >= 1, s"titleLen must be >= 1, got $titleLen")
    val d = (x: Column) => x.cast("double")
    val base = corpus.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        least(size(col("__toks")), lit(titleLen)).as("dl_t"),
        greatest(size(col("__toks")) - titleLen, lit(0)).as("dl_b"),
        posexplode(col("__toks")).as(Seq("__pos", "term")))
    val fielded = base
      .withColumn("field",
        when(col("__pos") < titleLen, lit("t")).otherwise(lit("b")))
      .groupBy("term", "doc_id", "field")
      .agg(count(lit(1)).as("tf"),
        first(col("dl_t")).as("dl_t"), first(col("dl_b")).as("dl_b"))
    val stats = corpus.where(length(trim(col(textCol))) > 0)
      .select(least(size(toks(col(textCol))), lit(titleLen)).as("dl_t"),
        greatest(size(toks(col(textCol))) - titleLen, lit(0)).as("dl_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("dl_t").cast("long")).as("sum_t"),
        sum(col("dl_b").cast("long")).as("sum_b"))
    val qt = queryTerms.select(col("query_id"), col("term"))
    val matched = fielded.join(broadcast(qt.select("term").distinct()),
      "term")
    val avgT = d(col("sum_t")) / d(col("n"))
    val avgB = d(col("sum_b")) / d(col("n"))
    val tfn = when(col("field") === "t",
        d(col("tf")) / (lit(1.0) + lit(bTitle) *
          (d(col("dl_t")) / avgT - lit(1.0))))
      .otherwise(
        d(col("tf")) / (lit(1.0) + lit(bBody) *
          (d(col("dl_b")) / avgB - lit(1.0))))
    val combined = matched.crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"), col("n"), tfn.as("tfn"),
        col("field"))
      .groupBy("term", "doc_id")
      .agg(first(col("n")).as("n"),
        coalesce(sum(when(col("field") === "t", col("tfn"))), lit(0.0))
          .as("ct"),
        coalesce(sum(when(col("field") === "b", col("tfn"))), lit(0.0))
          .as("cb"))
      .withColumn("c0", lit(wTitle) * col("ct") + lit(wBody) * col("cb"))
      // materialized ONCE (same rationale as bm25Core's `matched`): the
      // df branch and the contribution branch both consume `combined`,
      // whose plan holds the fielded-postings build — two corpus
      // tokenizations (postings + field stats) — per consumer otherwise.
      // Size is bounded by the queried terms' (term, doc) rows.
      .localCheckpoint(true)
    val dfq = combined.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = sqrt((d(col("n") - col("df")) + lit(0.5)) /
      (d(col("df")) + lit(0.5)))
    val contribs = combined.join(broadcast(dfq), "term")
      .join(broadcast(qt), "term")
      .select(col("query_id"), col("doc_id"), col("term"),
        (idf * (col("c0") / (lit(k1) + col("c0")))).as("c"))
    bm25RankContributions(contribs, qt, k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of a lexical and a
    * vector ranking — the standard hybrid-search combiner: each list
    * contributes `scale div (kRrf + rank)` for the documents it ranked,
    * fused score is the sum, ties break to the lower doc id. INTEGER
    * arithmetic throughout (truncating div of a fixed scale), so fused
    * scores are bit-portable across engines — no float mixing of two
    * incomparable score spaces, which is exactly why RRF beats score
    * interpolation in practice.
    *
    * 100 TB shape: both inputs are per-query top-k lists — bounded by
    * queries × k BY CONTRACT, not corpus-sized — so the full-outer
    * fusion join and the final per-query window touch at most 2k rows
    * per query. The expensive work (BM25 over postings, ANN over the
    * embedding corpus) happens upstream in operators that already
    * carry their own scale story.
    *
    * Inputs need columns (`query_id`, `doc_id`, `rank`). Output:
    * (`query_id`, `doc_id`, `lex_rank`, `vec_rank`, `rrf`, `rank`)
    * with 0 marking "not ranked by this list".
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int,
              kRrf: Int = 60, scale: Long = 1000000000L): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("lex_rank"))
    val v = vec.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("vec_rank"))
    val fused = l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"))
      .withColumn("rrf",
        when(col("lex_rank") > 0,
          expr(s"CAST($scale AS BIGINT) div CAST(${kRrf} + lex_rank AS BIGINT)"))
          .otherwise(lit(0L)) +
        when(col("vec_rank") > 0,
          expr(s"CAST($scale AS BIGINT) div CAST(${kRrf} + vec_rank AS BIGINT)"))
          .otherwise(lit(0L)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  private def bm25Core(postings: DataFrame, stats: DataFrame,
                       queryTerms: DataFrame, k: Int, k1: Double,
                       b: Double, maxDfPermille: Int): DataFrame = {
    val qt = queryTerms.select(col("query_id"), col("term"))
    // prune postings to query terms FIRST (broadcast semi-shape), so df
    // is computed for query terms only — never a vocabulary-sized
    // broadcast; the matched slice holds every posting of those terms,
    // so its per-term count IS the exact corpus df. df is a partial-
    // aggregated groupBy broadcast back (≤|query terms| rows): Catalyst
    // recomputes the postings subtree for the branch, but that is
    // parallel linear work — the count-over-window alternative avoids
    // the recompute and instead SORTS each term's postings inside a
    // per-term window partition, which collapses onto a handful of hot
    // keys the moment a query contains a stopword-frequency term
    // (measured 12× at 10× data on the 31-term fixture vocabulary)
    val matched = postings.join(broadcast(qt.select("term").distinct()),
      "term")
    val dfq = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val withN = matched
      .crossJoin(broadcast(stats))
      .join(broadcast(dfq), "term")
      .where(col("df") * 1000 <= lit(maxDfPermille.toLong) * col("n"))
      .join(broadcast(qt), "term")
    val d = (x: Column) => x.cast("double")
    val avgdl = d(col("sum_dl")) / d(col("n"))
    val idf = sqrt((d(col("n") - col("df")) + lit(0.5)) /
      (d(col("df")) + lit(0.5)))
    val tfs = (d(col("tf")) * (lit(k1) + lit(1.0))) /
      (d(col("tf")) + (lit(k1) * ((lit(1.0) - lit(b)) +
        (lit(b) * (d(col("dl")) / avgdl)))))
    // Per-term contributions fold as a LEFT FOLD in term order
    // ([[bm25RankContributions]]) — a plain double SUM's value depends
    // on reduce order (partitioning), and a DECIMAL cast of an
    // irrational double is not exactly rounded in every engine. The
    // folded list is bounded by the query's term count.
    bm25RankContributions(
      withN.select(col("query_id"), col("doc_id"), col("term"),
        (idf * tfs).as("c")), qt, k)
  }
}
