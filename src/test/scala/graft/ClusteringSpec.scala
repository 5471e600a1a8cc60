package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** Spherical k-means + SemDeDup on planted fixtures: cluster recovery,
  * bit-reproducibility, keep-first prune semantics, and the zero-shuffle
  * assignment plan.
  */
class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Tight planted clusters around three orthogonal axes: id / 100 names
    * the planted group, the jitter keeps members distinct but far closer
    * to their own axis than to any other.
    */
  private def planted(): org.apache.spark.sql.DataFrame =
    (for {
      g <- 0 until 3
      m <- 0 until 8
    } yield {
      val v = Array.fill(6)(0.01f * ((g * 8 + m) % 5))
      v(g * 2) = 1.0f
      v(g * 2 + 1) = 0.05f * m
      (g * 100L + m, v.toSeq)
    }).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  test("kmeans recovers planted clusters, deterministically") {
    val df = planted()
    val c1 = Clustering.fit(df, "vec_id", "embedding", 3)
    val c2 = Clustering.fit(df, "vec_id", "embedding", 3)
    assert(c1 == c2, "same data + seeds must fit bit-identical centroids")
    val cells = Clustering.assign(df, "embedding", c1)
      .select((col("vec_id") / 100).cast("int").as("g"), col("cell"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    // every planted group lands in exactly one cell, and no two groups share
    assert(cells.groupBy(_._1).forall(_._2.length == 1), s"split group: ${cells.toSeq}")
    assert(cells.map(_._2).distinct.length == 3, s"merged groups: ${cells.toSeq}")
  }

  test("kmeans tolerates k larger than the distinct-point count") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cs = Clustering.fit(df, "vec_id", "embedding", 5)
    assert(cs.size == 2) // only 2 rows exist to seed from
    val assigned = Clustering.assign(df, "embedding", cs)
    assert(assigned.select(col("cell")).distinct().count() == 2)
  }

  test("assignment is a narrow projection — no exchange in the plan") {
    val df = planted()
    val cs = Clustering.fit(df, "vec_id", "embedding", 3)
    val plan = Clustering.assign(df, "embedding", cs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("semDeDup prunes exactly the non-first members of duplicate groups") {
    // two exact-duplicate trios (ids 10,11,12 and 20,21,22) + two singletons
    val dup1 = Seq(1.0f, 0.2f, 0.0f, 0.0f)
    val dup2 = Seq(0.0f, 0.0f, 1.0f, 0.3f)
    val df = Seq(
      10L -> dup1, 11L -> dup1, 12L -> dup1,
      20L -> dup2, 21L -> dup2, 22L -> dup2,
      30L -> Seq(1.0f, -0.9f, 0.0f, 0.0f),
      40L -> Seq(0.0f, 0.1f, -1.0f, 0.8f)
    ).toDF("vec_id", "embedding")
    val labels = Clustering
      .semDeDupLabels(df, "vec_id", "embedding", k = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(labels.filter(_._2 == 1).keySet == Set(11L, 12L, 21L, 22L),
      s"pruned set wrong: $labels")
    // keep-first: the smallest id of each clique survives, as do singletons
    assert(labels.filter(_._2 == 0).keySet == Set(10L, 20L, 30L, 40L))
  }

  test("semDeDup labels partition the corpus and are deterministic") {
    val df = planted()
    val l1 = Clustering.semDeDupLabels(df, "vec_id", "embedding", 3, 0.999)
      .orderBy("vec_id").collect().toSeq
    val l2 = Clustering.semDeDupLabels(df, "vec_id", "embedding", 3, 0.999)
      .orderBy("vec_id").collect().toSeq
    assert(l1 == l2)
    assert(l1.length == df.count())
    assert(l1.forall(r => r.getInt(2) == 0 || r.getInt(2) == 1))
  }
}
