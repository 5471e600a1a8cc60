package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Each query gets one untimed warmup execution (JIT + whole-stage-codegen
  * compilation dominate a cold first run by 10-20×) and the second run is
  * measured — steady-state throughput, which is what a long-lived cluster
  * actually sees.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // WALL-CLOCK BUDGET (seconds): the r9 driver bench exited rc=124 — the
    // suite's 4 passes (warmup + 3 rounds) outgrew the harness timeout on a
    // slow host and the round shipped with NO official perf artifact. A
    // bench that sometimes emits nothing is worse than one that emits
    // fewer samples: the budget makes completion unconditional. Warmup and
    // round 1 always cover every query; later rounds run only while the
    // remaining budget fits them (extra samples only sharpen the min).
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(1500.0)
    val t0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - t0) / 1e9
    val spark = SparkSession.builder()
      .withExtensions(new graft.expressions.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Queries that stage intermediates via localCheckpoint (jaccard, tfidf,
    // ivf, simhash, ...) pin MEMORY_AND_DISK RDDs that nothing unpersists
    // once the query returns. Across 4 passes × ~10 such queries the pinned
    // sf0.1 materializations squeeze execution memory under the unified
    // manager and the shuffle-heavy iterative queries start spilling:
    // d_dedup_clusters measured 12.1 s in-bench vs 3.2 s isolated
    // (min-of-5, same idle host) before this purge. Dropping leaked RDDs
    // between queries keeps every sample measured against a clean store.
    // BLOCKING: the purge runs in the untimed gap, and an async unpersist
    // would carry its block-removal churn into the next timed sample
    // (measured: the query after a heavy purge inflates 2-4×).
    def purgeLeakedRdds(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    // Global warmup pass: the C2 compiler needs ~60-90s of JVM life to reach
    // steady state; a single per-query warmup right before its measurement
    // still runs partly interpreted. Warm everything, then measure — but
    // never spend more than 45% of the budget warming: on a pathologically
    // slow host the remaining queries simply measure cold, which is a worse
    // number, not a missing artifact.
    names.foreach { name =>
      if (elapsedSec < budgetSec * 0.45) {
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => () }
        purgeLeakedRdds()
      }
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      purgeLeakedRdds()
      dt
    }
    // min over up to 3 ROUND-ROBIN rounds: the host VM shows multi-second
    // CPU-steal bursts; consecutive repeats of one query all land inside a
    // burst, while interleaved rounds give each query well-separated
    // samples. Round 1 is unconditional (full coverage); rounds 2-3 start
    // only if the previous round's duration fits the remaining budget, and
    // abort between queries once the budget is spent (a partial extra
    // round still sharpens the min for the queries it reached).
    def oneRound(always: Boolean): Map[String, Double] =
      names.flatMap { name =>
        if (!always && elapsedSec > budgetSec) None
        else Some(try name -> timed(name) catch {
          case _: Throwable => name -> -1.0
        })
      }.toMap
    var rounds = List(oneRound(always = true))
    var n = 1
    while (n < 3 &&
        elapsedSec + rounds.head.values.filter(_ >= 0).sum * 1.15 <
          budgetSec) {
      rounds ::= oneRound(always = false)
      n += 1
    }
    val results = names.map { name =>
      val samples = rounds.flatMap(_.get(name))
      name -> (if (samples.isEmpty || samples.forall(_ < 0)) -1.0
               else samples.filter(_ >= 0).min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The metric line must survive log interleaving: executor-teardown noise
    // can land mid-line on stdout (r1's BENCH json failed to parse). Write it
    // to a file too, and print it only after spark.stop() quiesces the logs.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    // Under `sbt runMain`, System.out is sbt's logger — every println gets an
    // "[info] " prefix, which broke the harness's JSON parse in r1 AND r2
    // ("parsed": null both rounds). Writing to the process's real fd 1
    // bypasses the redirected System.out, so one clean unprefixed line
    // reaches the parent regardless of how this main was launched. The line
    // is emitted exactly ONCE (no println fallback — a duplicate line can
    // itself confuse a last-line parser); the file sink above is the backup.
    try {
      val raw = new java.io.PrintStream(new java.io.FileOutputStream(
        java.io.FileDescriptor.out), true, "UTF-8")
      raw.println(json)
      raw.flush()
    } catch { case _: Throwable => () }
  }
}
