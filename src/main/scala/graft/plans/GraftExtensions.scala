package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook: registers the engine's native functions
  * into every session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, making
  * `graft_minhash` / `graft_simhash` available to plain SQL users without
  * any Scala imports.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def inject(e: SparkSessionExtensions, name: String, clazz: Class[_],
                     builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder))

  private def intArg(exprs: Seq[Expression], i: Int, name: String): Int =
    exprs(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be an integer literal, got $other")
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "graft_minhash", classOf[MinHashSig],
      exprs => MinHashSig(exprs.head, 64, 42L))
    inject(e, "graft_simhash", classOf[SimHash64],
      exprs => SimHash64(exprs.head))
    // graft_shingle_hashes(normalized_text, k)
    inject(e, "graft_shingle_hashes", classOf[WordShingleHashes],
      exprs => WordShingleHashes(exprs.head,
        intArg(exprs, 1, "graft_shingle_hashes")))
    // graft_shingle_hashes_all(normalized_text, k) — positional, no dedup
    inject(e, "graft_shingle_hashes_all", classOf[WordShingleHashesAll],
      exprs => WordShingleHashesAll(exprs.head,
        intArg(exprs, 1, "graft_shingle_hashes_all")))
    inject(e, "graft_text_stats", classOf[TextStatsExpr],
      exprs => TextStatsExpr(exprs.head))
    inject(e, "graft_lang_scores", classOf[LangScores],
      exprs => LangScores(exprs.head))
    inject(e, "graft_media_header", classOf[MediaHeaderExpr],
      exprs => MediaHeaderExpr(exprs.head))
    inject(e, "graft_dot", classOf[DotF],
      exprs => DotF(exprs(0), exprs(1)))
    inject(e, "graft_reservoir", classOf[ReservoirSample],
      exprs => ReservoirSample(exprs.head, intArg(exprs, 1, "graft_reservoir"), 42L))
    inject(e, "graft_bottom_k", classOf[BottomKLongs],
      exprs => BottomKLongs(exprs.head, intArg(exprs, 1, "graft_bottom_k")))
    inject(e, "graft_tdigest", classOf[QuantileDigest],
      exprs => QuantileDigest(exprs.head,
        Seq(0.25, 0.5, 0.75, 0.99), intArg(exprs, 1, "graft_tdigest")))
    inject(e, "graft_nfc", classOf[NfcNormalizeF],
      exprs => NfcNormalizeF(exprs.head))
    // graft_shingle_strings(token_array, k)
    inject(e, "graft_shingle_strings", classOf[ShingleStringsF],
      exprs => ShingleStringsF(exprs.head,
        intArg(exprs, 1, "graft_shingle_strings")))
    // graft_adc_sum(codes, qtab)
    inject(e, "graft_adc_sum", classOf[AdcSumF],
      exprs => AdcSumF(exprs(0), exprs(1)))
    // graft_heavy_hitters(item, capacity) — Misra-Gries sketch aggregate
    inject(e, "graft_heavy_hitters", classOf[MisraGries],
      exprs => MisraGries(exprs.head,
        intArg(exprs, 1, "graft_heavy_hitters")))
    // graft_linear_score(text, nBuckets) — hashed linear-classifier margin
    inject(e, "graft_linear_score", classOf[LinearScoreF],
      exprs => LinearScoreF(exprs.head,
        intArg(exprs, 1, "graft_linear_score")))
    // graft_deflate_size(text) — DEFLATE-compressed byte count
    inject(e, "graft_deflate_size", classOf[DeflateSizeF],
      exprs => DeflateSizeF(exprs.head))
    // graft_gram_moments(quantized_vec, dim) — exact Gram/cov moments
    inject(e, "graft_gram_moments", classOf[GramMoments],
      exprs => GramMoments(exprs.head, intArg(exprs, 1, "graft_gram_moments")))
  }
}
