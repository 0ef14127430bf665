package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the persisted-index RAG entry spend its time?
  * Times each lifecycle phase (clean+chunk, bucketed appends, compact,
  * hybrid query) separately against `SPARK_GRAFT_SF_DIR`.
  */
object ProfRag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.Tables.read(spark, dir, "documents")
    val emb = graft.Tables.read(spark, dir, "embeddings")
    val clean = graft.queries.PipelineQueries.ragCleanCorpus(docs)
    val chunks = t("clean+chunk+ckpt") {
      graft.queries.PipelineQueries.ragChunks(clean, "prof")
    }
    val tmp = Scratch.dir("prof_rag")
    val idxPath = s"$tmp/postings"
    t("append x2 bucketed") {
      graft.functions.Retrieval.appendPostingsBucketed(
        chunks.where(col("ckey") % 2 === 0), "chunk_text", "ckey", idxPath)
      graft.functions.Retrieval.appendPostingsBucketed(
        chunks.where(col("ckey") % 2 === 1), "chunk_text", "ckey", idxPath)
    }
    t("compact bucketed") {
      graft.functions.IndexMaintenance.compactPostingsBucketed(spark, idxPath)
    }
    val postings = spark.read.parquet(idxPath).drop("bucket")
    val out = graft.queries.PipelineQueries.ragQueryFromPostings(
      clean, emb, postings)
    t("hybrid query") {
      out.write.format("noop").mode("overwrite").save()
    }
    // second run of the query alone (steady state)
    t("hybrid query (2nd)") {
      out.write.format("noop").mode("overwrite").save()
    }
    // sub-phase timings (steady state, after the full-query warmup)
    val qdocs = clean.where(col("doc_id") % 97 === 0 &&
      col("doc_id") < 1000 && length(trim(col("clean"))) > 0)
    val qt = qdocs.select(col("doc_id").as("query_id"),
      explode(array_distinct(slice(split(
        graft.functions.Dedup.normalizeText(col("clean")), " "), 1, 5)))
        .as("term"))
    t("  qdocs+qt") {
      qt.write.format("noop").mode("overwrite").save()
    }
    t("  bm25FromPostings") {
      graft.functions.Retrieval.bm25TopKFromPostings(postings, qt, k = 50)
        .write.format("noop").mode("overwrite").save()
    }
    val qv = emb.join(broadcast(
        qdocs.select(col("doc_id").as("query_id"))),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("qv"),
        graft.functions.Similarity.norm(col("embedding")).as("qn"))
    t("  dense cosine top10") {
      import org.apache.spark.sql.expressions.Window
      emb.where(col("vec_id") % 97 =!= 0)
        .select(col("vec_id").as("doc_id"), col("embedding").as("cv"),
          graft.functions.Similarity.norm(col("embedding")).as("cn"))
        .crossJoin(broadcast(qv))
        .select(col("query_id"), col("doc_id"),
          round(graft.functions.Similarity.cosinePrenormed(col("qv"),
            col("cv"), col("qn") * col("cn")), 6).as("sim"))
        .withColumn("rank", row_number().over(Window
          .partitionBy("query_id").orderBy(col("sim").desc, col("doc_id"))))
        .where(col("rank") <= 10)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
