package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Submodular coverage-maximizing corpus selection (greedy facility-location
  * over n-gram shingle coverage — Nemhauser et al. 1978's (1-1/e) greedy,
  * the distributed regime of Mirzasoleiman et al.'s GreeDi): pick k
  * documents one at a time, each round choosing the document that covers the
  * most not-yet-covered shingles. The classic "smallest subset that still
  * spans the corpus vocabulary" curation primitive — the complement of
  * dedup: instead of dropping redundant documents, it RANKS the documents a
  * budget-constrained training run should keep first.
  *
  * Reference scope: `/root/reference` has no selection surface at all (the
  * pipeline keeps everything — `bronze_to_silver.py:26-51` only drops
  * malformed rows); this is north-star extension surface per SURVEY §2.5.
  *
  * Scale posture (the reason this is an operator and not a loop over
  * `collect()`):
  *  - The (id, shingle) frame is built ONCE, distinct, and checkpointed —
  *    every round reuses it; text itself never crosses an exchange.
  *  - A round is one narrow LEFT ANTI join on the shingle string (the
  *    covered side is a DISTINCT shingle frame, bounded by the corpus
  *    vocabulary, not by k·docs) followed by a map-side-combinable
  *    count per doc. Nothing proportional to |docs|² ever materializes.
  *  - The driver pulls exactly ONE row per round (the argmax) — bounded
  *    driver state by construction; k is the knob.
  *  - Ties break deterministically (max gain, then min id) so the greedy
  *    trajectory — not just the final set — is oracle-replayable.
  *
  * Early exit: when every remaining document's marginal gain is 0 (all
  * shingles covered), later rounds emit nothing — the output may have fewer
  * than k rows.
  *
  * Output: (`round`, `doc_id`, `gain`, `covered_total`) — round is 1-based
  * greedy order, gain the newly covered shingle count, covered_total the
  * running union size (= cumulative gain, since gains count only new
  * shingles).
  */
object Coverage {

  def greedySelect(docs: DataFrame, id: String, text: String,
      k: Int, shingleN: Int = 3): DataFrame = {
    require(k >= 1, "greedySelect needs k >= 1")
    val spark = docs.sparkSession
    val sh = Dedup.shingles(docs, id, text, shingleN)
      .select(col(id).cast("long").as("id"), col("shingle"))
      .distinct()
      .localCheckpoint() // one build; k rounds of reuse
    val outSchema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("gain", LongType, nullable = false),
      StructField("covered_total", LongType, nullable = false)))
    var covered: Option[DataFrame] = None // distinct shingles selected so far
    var picked = Vector.empty[Row]
    var total = 0L
    var exhausted = false
    for (t <- 1 to k if !exhausted) {
      val uncovered = covered match {
        case None => sh
        case Some(c) => sh.join(c, Seq("shingle"), "left_anti")
      }
      // argmax marginal gain, ties to the smallest id: ONE driver row
      val top = uncovered.groupBy(col("id"))
        .agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (winner, gain) = (top(0).getLong(0), top(0).getLong(1))
        total += gain
        picked :+= Row(t, winner, gain, total)
        val winnerSh = sh.filter(col("id") === winner).select(col("shingle"))
        val nextCovered = covered match {
          case None => winnerSh.localCheckpoint()
          case Some(c) => c.unionByName(winnerSh).distinct().localCheckpoint()
        }
        covered.foreach(org.apache.spark.sql.graftx.CheckpointUtils
          .unpersistLocalCheckpoint)
        covered = Some(nextCovered)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(picked, 1), outSchema)
  }
}
