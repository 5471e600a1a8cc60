package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Budgeted min-of-samples: round 1 runs every query once (cold — it
  * doubles as the warmup; JIT + whole-stage-codegen dominate a cold run
  * by 10-20×), then re-measure rounds spend whatever wall-clock budget
  * remains taking the min, most-expensive queries first. With budget to
  * spare every published number is a warm steady-state min (what a
  * long-lived cluster sees); under a starved budget cold round-1 samples
  * can stand — fewer good samples beats the empty artifact a fixed
  * four-pass schedule produced when the host was slow (r9: rc=124).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // WALL-CLOCK BUDGET (seconds): the r9 driver bench exited rc=124 — the
    // suite's 4 passes (warmup + 3 rounds) outgrew the harness timeout on a
    // slow host and the round shipped with NO official perf artifact. A
    // bench that sometimes emits nothing is worse than one that emits
    // fewer samples: the budget makes completion unconditional. Round 1
    // always covers every query (doubling as the warmup); re-measure
    // rounds spend whatever budget remains sharpening the min, most
    // expensive queries first.
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
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      purgeLeakedRdds()
      dt
    }
    // Round 1 (unconditional — full coverage) doubles as the warmup: its
    // samples carry cold-JIT/codegen cost and STAND only when the budget
    // never allows a re-measure. A separate untimed warmup pass would
    // spend half the budget producing no numbers at all — on a slow host
    // that was how r9's artifact came back empty.
    val sample = scala.collection.mutable.Map[String, Double]()
    names.foreach { name =>
      sample(name) = try timed(name) catch { case _: Throwable => -1.0 }
    }
    // Re-measure rounds while budget remains, each taking the min (which
    // discards the cold round-1 sample and rejects the host VM's
    // multi-second CPU-steal bursts — a single sample can do neither).
    // Order is DESCENDING current estimate: the expensive queries are
    // where cold/burst distortion is worth the most seconds, so the
    // leftover budget re-measures them first; the loop aborts between
    // queries once the budget is spent, so a partial round still fixes
    // the worst numbers.
    var round = 1
    while (round < 4 && elapsedSec < budgetSec) {
      val order = names.sortBy(n => -math.max(sample.getOrElse(n, 0.0), 0.0))
      for (name <- order if elapsedSec < budgetSec) {
        val t = try timed(name) catch { case _: Throwable => -1.0 }
        if (t >= 0 && (sample(name) < 0 || t < sample(name)))
          sample(name) = t
      }
      round += 1
    }
    val results = names.map(name => name -> sample(name))
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
