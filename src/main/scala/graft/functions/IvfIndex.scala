package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: the coarse-quantizer
  * scale path for similarity search, complementing the sign-projection LSH
  * in [[Similarity]].
  *
  *  - **build**: KMeans (MLlib, seeded) learns `nLists` centroids on a
  *    sample; every corpus vector is assigned to its nearest centroid.
  *    At 100 TB the assignment is one broadcast (centroids are tiny) +
  *    one projection, and the corpus is written partitioned/bucketed by
  *    `list_id` so a probe reads only its lists' files.
  *  - **search**: each query probes its `nProbe` nearest centroids and
  *    exact-scores only those lists: scan fraction ≈ nProbe/nLists, with
  *    recall controlled by nProbe (unlike LSH, clustered data HELPS).
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Learn centroids and assign the corpus. `assigned` = corpus columns +
    * `list_id`.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nLists: Int, seed: Long = 42L): Index = {
    val withVec = corpus.withColumn("__v", array_to_vector(
      col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("__v")
      .fit(withVec)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
    val assigned = model.transform(withVec)
      .withColumnRenamed("prediction", "list_id").drop("__v")
    Index(centroids, assigned)
  }

  /** Squared euclidean distance between a float-array column and a
    * double-array column.
    */
  def sqDist(vecCol: Column, centroidCol: Column): Column =
    aggregate(zip_with(vecCol, centroidCol, (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (s, x) => s + x)

  /** Persist the index: centroids as one small parquet, the assigned
    * corpus PARTITIONED BY list_id — so a later probe of `nProbe` lists
    * reads only those lists' files (partition pruning does the IVF "read
    * only the inverted lists" trick at the storage layer).
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite")
      .partitionBy("list_id").parquet(s"$path/lists")
  }

  /** Reload a saved index. Searches over a loaded index prune to the
    * probed list partitions at the parquet scan.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Index(centroids, spark.read.parquet(s"$path/lists"))
  }

  /** Exact top-k within the probed lists. Queries are broadcast; the
    * corpus side is filtered to probed lists *before* scoring.
    */
  def search(index: Index, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nProbe: Int, excludeSelf: Boolean = true): DataFrame = {
    // rank centroids per query (tiny: |queries| × nLists), explode top nProbe
    val centroidRows = index.centroids.map { case (i, c) =>
      struct(lit(i).as("list_id"), array(c.map(lit(_)): _*).as("centroid"))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__c", explode(array(centroidRows: _*)))
      .select(col("query_id"), col("qv"), col("__c.list_id").as("list_id"),
        sqDist(col("qv"), col("__c.centroid")).as("dist"))
    val probeW = Window.partitionBy("query_id").orderBy(col("dist"), col("list_id"))
    val probed = q.withColumn("pr", row_number().over(probeW))
      .where(col("pr") <= nProbe)
      .select("query_id", "qv", "list_id")

    val c = index.assigned.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("list_id"))
    val candidates = c.join(broadcast(probed), "list_id")
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
