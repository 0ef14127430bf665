package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): find records that refer to the
  * same real-world entity despite textual noise, cluster them, and elect
  * a canonical survivor per cluster — the classic master-data /
  * training-metadata cleanup pipeline: block → verify → cluster →
  * survivorship.
  *
  * The verify metric is exact Levenshtein edit distance (built-in
  * codegen'd `levenshtein`, identical semantics in the SQL oracle);
  * blocking bounds the candidate set the same way LSH bands bound
  * near-dup candidates: only records sharing a block key are compared,
  * so the pair count is Σ|block|², never n².
  */
object EntityResolution {

  /** Candidate pairs within each block, verified at `edit ≤ maxEdits`.
    *
    * `records` must carry (`idCol`, `nameCol`); `blockCol` is any
    * deterministic expression over the record (a phonetic key, a prefix,
    * a sorted-token signature). Emits (id_a, id_b, edit_dist) with
    * id_a < id_b, one row per pair (a record has ONE block key, so no
    * dedup join is needed — multi-key blocking unions several calls).
    *
    * 100 TB shape: one self-join keyed on the block — each block's pairs
    * materialize bucket-locally like an LSH bucket's, and the length
    * prefilter (|len_a − len_b| ≤ maxEdits, a Levenshtein lower bound)
    * drops most candidates before the O(len²) distance loop runs. Blocks
    * larger than `maxBlock` (0 = unlimited) are dropped whole — the
    * stop-shingle analog: an over-common key (empty name, "UNKNOWN")
    * would otherwise square into the pair count; dropping it is the
    * documented, deterministic trade.
    */
  def blockedPairs(records: DataFrame, idCol: String, nameCol: String,
                   blockCol: org.apache.spark.sql.Column, maxEdits: Int,
                   maxBlock: Long = 0L): DataFrame =
    blockedPairsB(records, idCol, nameCol, blockCol, maxEdits, maxBlock)
      .select("id_a", "id_b", "edit_dist")

  /** [[blockedPairs]] retaining the block key — the block-local CC path
    * ([[Components.blockLocalComponents]]) keys its single shuffle on it.
    */
  private def blockedPairsB(records: DataFrame, idCol: String,
                            nameCol: String,
                            blockCol: org.apache.spark.sql.Column,
                            maxEdits: Int, maxBlock: Long): DataFrame = {
    val r = records.select(blockCol.as("__b"), col(idCol).as("__id"),
      col(nameCol).as("__name"))
    val bounded = if (maxBlock > 0L) {
      val small = r.groupBy("__b").agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBlock).select("__b")
      r.join(small, "__b")
    } else r
    val a = bounded.select(col("__b"), col("__id").as("id_a"),
      col("__name").as("name_a"))
    val b = bounded.select(col("__b"), col("__id").as("id_b"),
      col("__name").as("name_b"))
    a.join(b, "__b")
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxEdits)
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("edit_dist") <= maxEdits)
      .select("__b", "id_a", "id_b", "edit_dist")
  }

  /** Labels for a blocked-pair graph: block-local single-shuffle
    * union-find when blocks are bounded (`maxBlock > 0` — buffer is
    * O(block)); the general iterative loop otherwise. Identical output
    * (ComponentsSpec pins the two paths equal on the er graph).
    */
  private def blockLabels(records: DataFrame, idCol: String,
                          nameCol: String,
                          blockCol: org.apache.spark.sql.Column,
                          maxEdits: Int, maxBlock: Long): DataFrame =
    if (maxBlock > 0L)
      Components.blockLocalComponents(
        blockedPairsB(records, idCol, nameCol, blockCol, maxEdits, maxBlock),
        "id_a", "id_b", "__b")
    else
      Components.connectedComponents(
        blockedPairs(records, idCol, nameCol, blockCol, maxEdits, maxBlock),
        "id_a", "id_b")

  /** Candidate pairs TOUCHING a new batch — the incremental sibling of
    * [[blockedPairs]]: (corpus × batch) ∪ (batch × batch) within shared
    * blocks, never corpus × corpus. Emits canonicalized (id_a < id_b)
    * verified pairs; with [[blockedPairs]] over the corpus alone it
    * tiles exactly the full pair set over corpus ∪ batch (spec-pinned),
    * so [[Components.mergeComponents]] over these pairs reproduces the
    * from-scratch labels.
    *
    * 100 TB shape: the join's right side is the BATCH — the corpus-sized
    * side is touched once, keyed by block, and only blocks the batch
    * occupies produce any candidates.
    */
  def blockedPairsAgainst(corpus: DataFrame, batch: DataFrame,
                          idCol: String, nameCol: String,
                          blockCol: org.apache.spark.sql.Column,
                          maxEdits: Int): DataFrame = {
    val all = corpus.unionByName(batch)
      .select(blockCol.as("__b"), col(idCol).as("id_a"),
        col(nameCol).as("name_a"))
    val b = batch.select(blockCol.as("__b"), col(idCol).as("id_b"),
      col(nameCol).as("name_b"))
    all.join(b, "__b")
      .where(col("id_a") =!= col("id_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxEdits)
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("edit_dist") <= maxEdits)
      // batch-internal pairs arrive twice (once per orientation):
      // canonicalize then dedup
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("edit_dist"))
      .distinct()
  }

  /** Full resolution: [[blockedPairs]] → [[Components.connectedComponents]]
    * → survivorship. Every record gets an `entity_id` (component min id;
    * unmatched records are their own entities) and the cluster's canonical
    * record — the member with the highest `rankCol` (ties to the LOWER
    * id), elected with ONE `max(struct)` per entity, no window over hot
    * clusters.
    *
    * Output: (id, entity_id, canonical_id, canonical_name, n_members).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              blockCol: org.apache.spark.sql.Column, maxEdits: Int,
              rankCol: String, maxBlock: Long = 0L): DataFrame = {
    val labels = blockLabels(records, idCol, nameCol, blockCol, maxEdits,
      maxBlock)
    survivorship(records, idCol, nameCol, rankCol, labels)
  }

  /** INCREMENTAL resolution — fold a new batch into an already-resolved
    * corpus without re-running the component loop over corpus pairs:
    * batch-touching pairs ([[blockedPairsAgainst]]) contract into the
    * existing labels via [[Components.mergeComponents]] (loop size ∝
    * batch), then survivorship re-elects over the union. Labels — and
    * therefore the output — are IDENTICAL to [[resolve]] over
    * corpus ∪ batch (mergeComponents' identity + the pair-tiling
    * property, both spec-pinned), so the gate entry shares er_resolve's
    * oracle.
    */
  def resolveIncremental(corpus: DataFrame, batch: DataFrame,
                         idCol: String, nameCol: String,
                         blockCol: org.apache.spark.sql.Column,
                         maxEdits: Int, rankCol: String,
                         maxBlock: Long = 0L): DataFrame = {
    // With a block cap, the block universe is the UNION's counts: both
    // the base pairs and the batch-touching pairs restrict to the same
    // informative blocks, so merge ≡ from-scratch holds EXACTLY under
    // the cap (records in dropped blocks still resolve — as singletons
    // unless matched elsewhere, same as the from-scratch form). The
    // keep-list recomputes per batch; it is block-count metadata, not
    // corpus data.
    val (c2, b2) =
      if (maxBlock > 0L) {
        val keep = corpus.unionByName(batch)
          .select(blockCol.as("__b"))
          .groupBy("__b").agg(count(lit(1)).as("__n"))
          .where(col("__n") <= maxBlock)
          .select("__b")
        (corpus.join(keep, blockCol === col("__b"), "left_semi"),
          batch.join(keep, blockCol === col("__b"), "left_semi"))
      } else (corpus, batch)
    // c2 is already restricted to capped blocks, so the single-shuffle
    // block-local path applies even though no further cap is passed
    val labels0 =
      if (maxBlock > 0L)
        Components.blockLocalComponents(
          blockedPairsB(c2, idCol, nameCol, blockCol, maxEdits, 0L),
          "id_a", "id_b", "__b")
      else Components.connectedComponents(
        blockedPairs(c2, idCol, nameCol, blockCol, maxEdits),
        "id_a", "id_b")
    val newPairs = blockedPairsAgainst(c2, b2, idCol, nameCol,
      blockCol, maxEdits)
    val labels1 = Components.mergeComponents(labels0, newPairs,
      "id_a", "id_b")
    survivorship(corpus.unionByName(batch), idCol, nameCol, rankCol,
      labels1)
  }

  /** Survivor election over labeled records: entity = component label
    * (own id when unlabeled), canonical = highest `rankCol` with ties to
    * the LOWER id — one `max(struct)` per entity, no window.
    */
  private def survivorship(records: DataFrame, idCol: String,
                           nameCol: String, rankCol: String,
                           labels: DataFrame): DataFrame = {
    val base = records.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("name"), col(rankCol).as("__rank"))
    val labeled = base
      .join(labels.withColumnRenamed("node", "id"), Seq("id"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("id")))
    val survivors = labeled.groupBy("entity_id")
      .agg(max(struct(col("__rank").as("r"), (-col("id")).as("nid"),
          col("name").as("nm"))).as("__best"),
        count(lit(1)).as("n_members"))
      .select(col("entity_id"), (-col("__best.nid")).as("canonical_id"),
        col("__best.nm").as("canonical_name"), col("n_members"))
    labeled.select("id", "entity_id")
      .join(survivors, "entity_id")
      .select("id", "entity_id", "canonical_id", "canonical_name",
        "n_members")
  }
}
