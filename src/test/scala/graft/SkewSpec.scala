package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted-join semantics: result identity with the plain join (duplicates,
  * null keys, multi-column keys) and the plan property that pays at scale —
  * the shuffle key carries the salt, so a hot key spreads over `buckets`
  * reducers instead of landing on one.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  test("salted inner join ≡ plain inner join (hot keys, dups, null keys)") {
    // 90% of rows share one hot key; duplicate fact rows and a null key row
    val fact = ((1 to 90).map(i => ("hot", i % 7)) ++ // dup (key,value) pairs
      Seq(("cold", 1), ("cold", 1), ("warm", 2), (null, 9)))
      .toDF("k", "v")
    val dim = Seq(("hot", 100L), ("cold", 200L), ("tepid", 300L))
      .toDF("k", "weight")
    for (buckets <- Seq(1, 3, 8)) {
      val salted = Skew.saltedInnerJoin(fact, dim, Seq("k"), buckets)
      val plain = fact.join(dim, Seq("k"))
      assert(sortedRows(salted) == sortedRows(plain), s"buckets=$buckets")
      assert(salted.columns.toSeq == plain.columns.toSeq)
    }
  }

  test("salted join ≡ plain join on multi-column keys") {
    val fact = Seq((1, "a", 10), (1, "a", 11), (1, "b", 12), (2, "a", 13))
      .toDF("k1", "k2", "v")
    val dim = Seq((1, "a", "x"), (1, "b", "y"), (2, "a", "z"), (3, "c", "w"))
      .toDF("k1", "k2", "tag")
    val salted = Skew.saltedInnerJoin(fact, dim, Seq("k1", "k2"), 4)
    val plain = fact.join(dim, Seq("k1", "k2"))
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("the shuffle join key carries the salt (hot key spreads)") {
    // force a shuffle join so the salt is visible in the join keys
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = (1 to 50).map(i => ("hot", i)).toDF("k", "v")
      val dim = Seq(("hot", 1L), ("cold", 2L)).toDF("k", "w")
      val plan = Skew.saltedInnerJoin(fact, dim, Seq("k"), 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__graft_salt"), s"salt missing from plan:\n$plan")
      // and the salts actually fan out: >1 distinct salt on the hot key
      val salts = fact
        .withColumn("s", pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
        .select(countDistinct(col("s"))).head().getLong(0)
      assert(salts > 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("distinctCountByKey ≡ countDistinct") {
    val df = (Seq.fill(40)(("hot", 1)) ++ Seq(("hot", 2), ("hot", 3),
      ("cold", 1), ("cold", 1))).toDF("k", "u")
    val got = Skew.distinctCountByKey(df, Seq("k"), "u", "n")
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 3L, "cold" -> 1L))
  }

  test("bloom-pruned join ≡ plain inner join (dups, null keys, int keys)") {
    val fact = ((1 to 60).map(i => (i.toLong % 10, i)) ++
      Seq((3L, 1000), (3L, 1000))) // duplicate fact rows on a matching key
      .toDF("fk", "v")
      .union(Seq((null.asInstanceOf[java.lang.Long], 77))
        .toDF("fk", "v").select(col("fk").cast("long"), col("v")))
    val dim = Seq((1L, "a"), (3L, "b"), (7L, "c"), (99L, "zz"))
      .toDF("dk", "tag")
    val pruned = graft.ops.BloomJoin.bloomPrunedJoin(
      fact, dim, "fk", "dk", expectedItems = 100L, fpp = 0.01)
    val plain = fact.join(dim, fact("fk") === dim("dk"))
    assert(sortedRows(pruned) == sortedRows(plain))
    assert(pruned.columns.toSeq == plain.columns.toSeq)
  }

  test("bloom probe has no false negatives and prunes before the join") {
    // spark.range, not a local Seq: ConvertToLocalRelation would eagerly
    // evaluate the probe over a LocalRelation and hide the Filter node
    // this test asserts on (the pruning itself still happens either way).
    val fact = spark.range(1, 1001)
      .select(col("id").as("fk"), (col("id") * 2).as("v"))
    val dim = Seq(5L, 17L, 400L).map(k => (k, s"d$k")).toDF("dk", "tag")
    val bytes = graft.ops.BloomJoin.buildKeyFilter(dim, "dk", 100L, 0.01)
    val survivors = fact.where(
      org.apache.spark.sql.graftx.BloomExpressions
        .bloomMightContain(col("fk"), bytes))
    val kept = survivors.select("fk").as[Long].collect().toSet
    // every dim key survives (no false negatives) ...
    assert(Set(5L, 17L, 400L).subsetOf(kept))
    // ... and the pre-join filter did real work at 0.3% selectivity
    assert(kept.size < 100, s"pruned too little: ${kept.size} of 1000")
    // the probe sits in the plan as a Filter upstream of the join
    val plan = graft.ops.BloomJoin
      .bloomPrunedJoin(fact, dim, "fk", "dk", 100L, 0.01)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"),
      s"bloom probe missing from plan:\n$plan")
  }
}
