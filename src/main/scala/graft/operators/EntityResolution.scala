package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: blocked fuzzy matching of name-like
  * columns — the classic data-integration step (find records that denote
  * the same real-world entity despite textual variation). Beyond the
  * reference's operator set, like the rest of the pipeline family.
  *
  * The scalable shape is the standard two-step:
  *  1. BLOCK — a cheap deterministic key (here: a caller-supplied
  *     expression over the name) partitions candidates so the quadratic
  *     comparison only runs within blocks, never across the corpus;
  *  2. COMPARE — edit distance over candidate pairs inside each block.
  *
  * This implementation adds the name-compression trick on top: records
  * first reduce to DISTINCT (block, name) groups with counts, the
  * quadratic compare runs over distinct-NAME pairs (vocabulary-bounded,
  * orders of magnitude below record pairs), and record-pair counts are
  * recovered arithmetically (n1·n2 across groups, C(n,2) within one).
  * At 100 TB the name vocabulary is what's bounded, not the record
  * count — so the expensive levenshtein never touches the record stream.
  */
object EntityResolution {

  /** Candidate entity pairs: DISTINCT name pairs within a block whose
    * levenshtein distance is ≤ `maxDist`, with the implied record-pair
    * count. Output: (block, name1, name2, dist, n_pairs) with
    * name1 < name2 for cross-group pairs; same-name groups (dist 0)
    * appear when they hold ≥ 2 records.
    */
  def resolvePairs(records: DataFrame, nameCol: String,
      blockExpr: org.apache.spark.sql.Column, maxDist: Int): DataFrame = {
    val groups = records
      .filter(col(nameCol).isNotNull)
      .groupBy(blockExpr.as("block"), col(nameCol).as("__name"))
      .agg(count(lit(1)).as("__n"))
    val a = groups.select(col("block"), col("__name").as("name1"), col("__n").as("__n1"))
    val b = groups.select(col("block"), col("__name").as("name2"), col("__n").as("__n2"))
    val cross = a.join(b,
        Seq("block"))
      .filter(col("name1") < col("name2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
      .filter(col("dist") <= maxDist)
      .select(col("block"), col("name1"), col("name2"), col("dist"),
        (col("__n1") * col("__n2")).cast("long").as("n_pairs"))
    val within = groups
      .filter(col("__n") >= 2)
      .select(col("block"), col("__name").as("name1"), col("__name").as("name2"),
        lit(0).as("dist"),
        (col("__n") * (col("__n") - 1) / 2).cast("long").as("n_pairs"))
    cross.unionByName(within)
  }
}
