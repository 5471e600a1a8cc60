package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed SUFFIX ARRAY over a document corpus by prefix doubling
  * (Manber & Myers 1990, the standard log-round distributed construction),
  * and the longest-repeated-substring statistic built on it — the exact
  * maximal-match machinery behind exact-substring training-data dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022: their dedup unit is a ≥50-token exact repeat found
  * via a suffix array). The repo's `t_dup_spans` finds FIXED-length gram
  * repeats; the suffix array finds MAXIMAL ones.
  *
  * Suffixes are DOC-BOUNDED (suffix (d, o) = text_d[o..end]) and compared
  * as plain strings; a shorter suffix that prefixes a longer one sorts
  * first, and byte-identical suffixes from different places tie-break by
  * (doc, off) — exactly DuckDB's `ORDER BY substr(text, off+1), doc, off`,
  * which is what lets the oracle gate demand the PERMUTATION bit-for-bit.
  *
  * Scale shape: positions are (doc, off, rank) triples — document text
  * never rides the iteration. Each round is two narrow self-joins on
  * (doc, off + Δ) plus ONE range-sort compaction through [[groupRank]]
  * (per-partition group counts + boundary keys collected to the driver,
  * offsets merged across boundaries, one mapPartitions pass — the
  * terasort ranking pattern, no global window anywhere); rounds
  * QUADRUPLE the resolved prefix (two dense ranks pack exactly into one
  * 62-bit long), so maxLen L resolves in ~log₄ L sorts. Rounds
  * localCheckpoint and free their predecessor, like the CC loop;
  * convergence (all ranks unique) rides groupRank's own driver summary,
  * costing no extra job. At true 100 TB corpus scale a suffix array is a
  * research problem (DC3/external memory); prefix doubling is the
  * standard distributed answer and every per-round primitive is
  * shuffle-bounded and skew-free (ranks are near-uniform keys).
  */
object Suffix {

  /** Deterministic global 0-based row number under a TOTAL order: range
    * partition + local sort, per-partition counts collected (≤ partitions
    * rows) and prefix-summed on the driver, then one mapPartitions adds
    * the offset — no single-reducer window. `sortCols` must be a total
    * order for determinism.
    */
  private def globalRowNumber(df: DataFrame, sortCols: Seq[String],
      out: String, parts: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(parts, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint()
    val counts = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      val maxPid = if (counts.isEmpty) -1 else counts.keys.max
      val arr = new Array[Long](maxPid + 2)
      var acc = 0L
      for (p <- 0 to maxPid) { arr(p) = acc; acc += counts.getOrElse(p, 0L) }
      arr
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(out,
          org.apache.spark.sql.types.LongType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    sorted.mapPartitions { it =>
      val base = bc.value(org.apache.spark.TaskContext.getPartitionId())
      var i = 0L
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ (base + { i += 1; i - 1 }))
        r
      }
    }(enc)
  }

  /** DETERMINISTIC dense group rank under the total preorder (k1, k2):
    * rows with equal keys get equal 0-based ranks, distinct keys get
    * consecutive ranks in key order — the per-round compaction of prefix
    * doubling, computed with ONE range-sort shuffle and no global window:
    * per-partition group counts + boundary keys collect to the driver
    * (≤ partitions rows), offsets account for groups spanning a boundary,
    * and one mapPartitions pass assigns offset + local dense rank.
    * Input columns (doc, off, k1, k2) all numeric; output (doc, off, r).
    */
  private def groupRank(df: DataFrame, k1: String, k2: String,
      parts: Int): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    // checkpointed: the summary job and the ranking job MUST see the same
    // partition boundaries — two separate actions would re-plan the range
    // exchange and re-SAMPLE its boundaries independently (RangePartitioner
    // seeds by RDD id), silently misaligning the collected offsets
    val sorted = df
      .select(col("doc"), col("off"), col(k1).cast("long").as("__k1"),
        col(k2).cast("long").as("__k2"))
      .repartitionByRange(parts, col("__k1"), col("__k2"))
      .sortWithinPartitions(col("__k1"), col("__k2"))
      .localCheckpoint()
    val summary = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(countDistinct(col("__k1"), col("__k2")).as("__g"),
        min(struct(col("__k1"), col("__k2"))).as("__first"),
        max(struct(col("__k1"), col("__k2"))).as("__last"),
        count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        (r.getStruct(2).getLong(0), r.getStruct(2).getLong(1)),
        (r.getStruct(3).getLong(0), r.getStruct(3).getLong(1)),
        r.getLong(4))))
      .toMap
    val totalRows = summary.values.map(_._4).sum
    val maxPid = if (summary.isEmpty) -1 else summary.keys.max
    val offsets = new Array[Long](maxPid + 2)
    var acc = 0L
    var prevLast: Option[(Long, Long)] = None
    for (p <- 0 to maxPid) summary.get(p) match {
      case Some((g, first, last, _)) =>
        // a group spanning the boundary keeps its predecessor's rank
        if (prevLast.contains(first)) acc -= 1
        offsets(p) = acc
        acc += g
        prevLast = Some(last)
      case None => offsets(p) = acc
    }
    val totalGroups = acc
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("off",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val out = sorted.mapPartitions { it =>
      val base = bc.value(org.apache.spark.TaskContext.getPartitionId())
      var rank = base - 1
      var pk1 = 0L; var pk2 = 0L; var first = true
      it.map { row =>
        val c1 = row.getLong(2); val c2 = row.getLong(3)
        if (first || c1 != pk1 || c2 != pk2) {
          rank += 1; pk1 = c1; pk2 = c2; first = false
        }
        Row(row.getLong(0), row.getInt(1), rank)
      }
    }(enc).localCheckpoint()
    org.apache.spark.sql.graftx.CheckpointUtils.unpersistLocalCheckpoint(sorted)
    (out, totalRows, totalGroups)
  }

  /** (doc, off, rank): `rank` is the dense 0-based position of suffix
    * (doc, off) in the global lexicographic order described above.
    *
    * Round structure (all of it latency, not volume, at test scales —
    * hence the aggressive round compression): initial ranks pack FOUR
    * characters base-257 (absent = 0 sorts first, i.e. shorter-suffix-
    * first), one compaction makes them dense, and each subsequent round
    * QUADRUPLES the resolved prefix: two narrow self-joins fetch the
    * ranks at +k and +2k/+3k packed into two 62-bit longs (dense ranks
    * are < 2³¹, so r₁·2³¹ + r₂ + 1 is exact and order-preserving; absent
    * positions pack 0 / join to −1, keeping shorter-first), and one
    * [[groupRank]] sort compacts the 4k-order. maxLen 577 resolves in
    * 1 + 4 sorts where plain doubling needs 10.
    */
  def suffixArray(docs: DataFrame, id: String, text: String,
      maxDepth: Int = Int.MaxValue,
      maxPositions: Long = 4000000000L): DataFrame =
    suffixArrayCore(docs, id, text, maxDepth, maxPositions, shards = 1)

  /** Document-SHARDED suffix order — the beyond-memory regime path the
    * [[suffixArray]] guard points at: shard = doc mod `shards`, and the
    * output rank orders by (shard, suffix lexicographic), i.e. EXACTLY
    * the concatenation of independent per-shard suffix arrays
    * (spec-proven). Realized as ONE prefix-doubling run whose round-0
    * rank key is prefixed by the shard id: refinement only ever splits
    * groups, so suffixes of different shards never interact after round
    * 0 and every per-round primitive is unchanged. At corpus scale the
    * same semantics let shards run as SEPARATE jobs (filter the docs,
    * build, offset by cumulative shard sizes) — per-job state drops to
    * 1/shards of the corpus, the honest trade being that adjacency (and
    * any LCP statistic on it) becomes shard-local.
    */
  def suffixArraySharded(docs: DataFrame, id: String, text: String,
      shards: Int, maxDepth: Int = Int.MaxValue,
      maxPositions: Long = 4000000000L): DataFrame = {
    require(shards >= 1, s"bad shards: $shards")
    suffixArrayCore(docs, id, text, maxDepth, maxPositions, shards)
  }

  private def suffixArrayCore(docs: DataFrame, id: String, text: String,
      maxDepth: Int, maxPositions: Long, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    val src = docs.select(col(id).cast("long").as("doc"),
      col(text).as("__t"))
    // resolving order beyond maxDepth chars is pointless when the caller
    // only consumes bounded-depth structure (longestRepeat's capped LCP:
    // suffixes tied at the cap may order arbitrarily among themselves —
    // the (doc, off) tie-break keeps it deterministic)
    val lenStats = src.agg(coalesce(max(length(col("__t"))), lit(0)),
      coalesce(sum(length(col("__t"))), lit(0L))).head()
    // REGIME CONTRACT, enforced: prefix doubling carries one (doc, off,
    // rank) triple per character — ~24 B/char of round state, spillable
    // but reshuffled every round. Past `maxPositions` characters (default
    // 4e9 ≈ 100 GB of triples) that state, not the corpus, is the
    // workload, and the honest answer is chunking the corpus upstream
    // (shard by document set and accept per-shard adjacency, or use the
    // fixed-gram t_dup_spans path) — not a silently week-long job. A
    // corpus-scale EXACT global suffix array is a research problem
    // (DC3 / external-memory SA); raise `maxPositions` only with the
    // cluster memory to back it.
    require(lenStats.getLong(1) <= maxPositions,
      s"suffixArray: corpus has ${lenStats.getLong(1)} positions, over " +
        s"the maxPositions=$maxPositions regime guard. Prefix doubling " +
        s"keeps ~24 B of round state per character; past the guard use " +
        s"longestRepeatSharded (first-char buckets — exact global dup " +
        s"spans at 1/buckets round state), suffixArraySharded (per-" +
        s"doc-set arrays, shard-local adjacency), the fixed-gram " +
        s"t_dup_spans path, or raise maxPositions if the cluster can " +
        s"hold it.")
    val maxLen = math.min(maxDepth, lenStats.getInt(0))
    // partitions sized to the POSITION count, not the cluster: these are
    // narrow triples, and at gate scales per-task scheduling latency
    // dominates (measured ~30% of wall at 32 tasks vs 8); at corpus scale
    // the same rule grows partitions with the data
    val parts = math.max(8, math.min(
      math.max(1, spark.sparkContext.defaultParallelism),
      (lenStats.getLong(1) / 32768L).toInt))
    // one row per character; initial key = 4 chars packed base-257
    // (char + 1; absent = 0). Empty docs must be filtered BEFORE the
    // explode: sequence(0, len-1) at len = 0 is sequence(0, -1), which
    // Spark generates DESCENDING, not empty.
    val pack4 = (0 until 4).map(j =>
      expr(s"CASE WHEN off + $j < length(__t) " +
        s"THEN (ascii(substring(__t, off + ${j + 1}, 1)) + 1) * " +
        s"${math.pow(257, 3 - j).toLong}L ELSE 0L END"))
      .reduce(_ + _)
    val init = src
      .filter(length(col("__t")) > 0)
      .select(col("doc"),
        explode(sequence(lit(0), length(col("__t")) - 1)).as("off"),
        col("__t"))
      .withColumn("__k", pack4)
      .select(col("doc"), col("off"), col("__k"))
    // round 0: rank by (shard, 4-char key) — for shards = 1 the grouping
    // (and therefore every dense rank) is identical to the unsharded key
    var (cur, n0, g0) = groupRank(
      init.withColumn("__s", pmod(col("doc"), lit(shards.toLong))),
      "__s", "__k", parts)
    var k = 4L
    // convergence rides groupRank's own driver summary: all ranks unique
    // ⇔ as many groups as rows — no separate per-round job
    var done = maxLen <= 4 || n0 == g0
    val shift = 1L << 31
    while (!done && k < maxLen) {
      // packed rank over [i, i+2k): r(i)·2³¹ + r(i+k)+1, absent +k → 0;
      // second key = the same packed value 2k later (absent → −1, below
      // all). Positions are DENSE within a doc (one row per offset
      // 0..len−1, by construction of the explode), so the rank at
      // (doc, off + j·k) is exactly lead(r, j·k) over (doc ORDER BY off):
      // the former two narrow self-joins on (doc, off ± k) — four
      // exchanges per round — are ONE per-doc window with three leads
      // (r12, guide §2.4; one hash exchange on doc + one in-partition
      // sort). Per-doc partitions bound the window: a doc's positions =
      // its character count, the same per-unit state the maxPositions
      // regime guard already documents.
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc")).orderBy(col("off"))
      // k < maxLen ≤ Int.MaxValue (a string's length); the 3k lead must
      // also fit an int — past that a doc would need >700M chars, far
      // beyond the maxPositions regime guard, but fail loudly not weirdly
      require(3L * k <= Int.MaxValue,
        s"suffixArray: lead offset 3k = ${3L * k} exceeds Int.MaxValue")
      val ki = k.toInt
      val rk = lead(col("r"), ki).over(wd)
      val r2k = lead(col("r"), 2 * ki).over(wd)
      val r3k = lead(col("r"), 3 * ki).over(wd)
      val quad = cur.select(col("doc"), col("off"),
        (col("r") * shift + coalesce(rk + 1L, lit(0L))).as("__d"),
        when(r2k.isNull, lit(-1L))
          .otherwise(r2k * shift + coalesce(r3k + 1L, lit(0L))).as("__d2"))
      val prev = cur
      val (next, n1, g1) = groupRank(quad, "__d", "__d2", parts)
      cur = next
      org.apache.spark.sql.graftx.CheckpointUtils.unpersistLocalCheckpoint(prev)
      done = n1 == 0 || g1 == n1
      k *= 4
    }
    // dense deterministic ranks; byte-identical suffixes (equal ranks all
    // the way down) tie-break by (doc, off) — the oracle's ORDER BY
    globalRowNumber(cur.select(col("doc"), col("off"), col("r")),
      Seq("r", "doc", "off"), "rank", parts)
      .select(col("doc"), col("off"), col("rank"))
  }

  /** Per-document longest repeated substring (capped at `cap` chars): for
    * every suffix, its longest common prefix with the lexicographically
    * ADJACENT suffixes bounds its longest match with ANY suffix (the
    * classic suffix-array property), so the per-doc max over
    * greatest(lcp(prev), lcp(next)) IS the length of the longest substring
    * of the doc that occurs somewhere else in the corpus (or again in the
    * same doc) — Lee et al.'s repeat statistic. Only `cap`-char windows
    * of text are ever joined to the position stream; the LCP is a
    * monotone sum of `cap` prefix-equality flags (codegen'd, and exactly
    * the oracle's formulation).
    *
    * Output: (doc, max_repeat) for every input document (0 when nothing
    * repeats; empty docs score 0).
    */
  def longestRepeat(docs: DataFrame, id: String, text: String,
      cap: Int = 64): DataFrame = {
    require(cap >= 1, s"bad cap: $cap")
    val src = docs.select(col(id).cast("long").as("doc"), col(text).as("__t"))
      .localCheckpoint() // read by the suffix build and the window fetch
    // order resolved only to `cap` chars — all the adjacency structure a
    // cap-bounded LCP can observe (ties at the cap score exactly cap with
    // ANY same-block neighbor, and block-boundary LCPs depend only on the
    // blocks' shared prefixes)
    val sa = suffixArray(src, "doc", "__t", maxDepth = cap).localCheckpoint()
    // cap-char suffix windows (all an LCP ≤ cap can see), staged: both
    // sides of the adjacency join read them
    val win = sa.join(src, Seq("doc"))
      .select(col("doc"), col("rank"),
        expr(s"substring(__t, off + 1, $cap)").as("__w"))
      .localCheckpoint()
    finishRepeat(src, creditsFromWindows(win, cap))
  }

  /** [[longestRepeat]] with the suffix order built per FIRST-CHARACTER
    * bucket (bucket = ascii(first char) mod `buckets`) — the beyond-
    * [[suffixArray]]-guard regime path whose merged answer is EXACTLY the
    * global one (oracle-gated as `t_repeat_sharded`):
    *
    *  - any repeated substring's occurrences all start with the same
    *    character, so both suffixes of every LCP ≥ 1 pair land in the SAME
    *    bucket — repeats never cross buckets;
    *  - within a bucket, all suffixes sharing a first character form a
    *    contiguous run of the global order (other characters in the bucket
    *    sort wholly before or after them), so their adjacency — the only
    *    adjacency with nonzero LCP — is preserved exactly;
    *  - cross-bucket adjacencies have LCP 0 and contribute nothing to any
    *    per-doc max (absent docs coalesce to 0 regardless).
    *
    * Each bucket sorts its positions DIRECTLY by the cap-char window (one
    * range-sort — prefix doubling cannot run on a filtered position set,
    * because the +k rank fetches land on positions outside the bucket; the
    * cap-window sort needs no other position's state, which is what makes
    * the decomposition legal). Per-bucket state is ~(cap+24) B × 1/buckets
    * of the corpus positions — the budget that trips the [[suffixArray]]
    * `maxPositions` guard shrinks by the bucket count (for skewed
    * alphabets, bucket by the first k characters instead — same argument).
    * Buckets run sequentially here; at corpus scale they are separate
    * jobs.
    */
  def longestRepeatSharded(docs: DataFrame, id: String, text: String,
      buckets: Int, cap: Int = 64,
      maxPositions: Long = 4000000000L): DataFrame = {
    require(cap >= 1, s"bad cap: $cap")
    require(buckets >= 1, s"bad buckets: $buckets")
    val spark = docs.sparkSession
    val src = docs.select(col(id).cast("long").as("doc"), col(text).as("__t"))
      .localCheckpoint()
    val totalPositions = src
      .agg(coalesce(sum(length(col("__t"))), lit(0L))).head().getLong(0)
    // per-bucket state ≈ total/buckets (uniform-alphabet approximation):
    // the budget scales with the bucket count — the sharded path's point
    require(totalPositions <= maxPositions * buckets,
      s"longestRepeatSharded: ~${totalPositions / math.max(buckets, 1)} " +
        s"positions per bucket exceeds maxPositions=$maxPositions; " +
        s"raise `buckets` (state shrinks linearly) or the budget.")
    val parts = math.max(8, math.min(
      math.max(1, spark.sparkContext.defaultParallelism),
      (totalPositions / math.max(buckets, 1) / 32768L).toInt))
    val positions = src
      .filter(length(col("__t")) > 0)
      .select(col("doc"),
        explode(sequence(lit(0), length(col("__t")) - 1)).as("off"),
        col("__t"))
    val credits = (0 until buckets).map { b =>
      val win = globalRowNumber(
        positions
          .filter(pmod(expr("ascii(substring(__t, off + 1, 1))"),
            lit(buckets)) === b)
          .select(col("doc"), col("off"),
            expr(s"substring(__t, off + 1, $cap)").as("__w")),
        Seq("__w", "doc", "off"), "rank", parts)
        .select(col("doc"), col("rank"), col("__w"))
        .localCheckpoint()
      creditsFromWindows(win, cap)
    }.reduce(_ unionByName _)
    finishRepeat(src, credits)
  }

  /** Per-doc LCP credits from suffix-order adjacency: each doc is credited
    * the longest common prefix it shares with its lexicographic neighbors
    * (both sides — a doc may only ever be the successor). `win` carries
    * (doc, rank, __w): dense-ranked cap-char suffix windows.
    */
  private def creditsFromWindows(win: DataFrame, cap: Int): DataFrame = {
    // adjacent pairs in suffix order: one narrow equi-join on the rank.
    // Each prefix-equality flag is ALSO gated on the window still having
    // an i-th char — substring truncates past the end, so two EQUAL short
    // windows would otherwise count matches beyond their actual length
    val lcp = (1 to cap).map(i =>
      when(length(col("__wa")) >= i &&
        substring(col("__wa"), 1, i) === substring(col("__wb"), 1, i), 1)
        .otherwise(0)).reduce(_ + _)
    val pairs = win.select(col("doc").as("__da"), col("rank"),
        col("__w").as("__wa"))
      .join(win.select(col("doc").as("__db"), (col("rank") - 1).as("rank"),
        col("__w").as("__wb")), Seq("rank"))
      .select(col("__da"), col("__db"), lcp.as("__l"))
    pairs.select(col("__da").as("doc"), col("__l"))
      .unionByName(pairs.select(col("__db").as("doc"), col("__l")))
  }

  /** (doc, max_repeat) over every input doc: max credit, absent → 0. */
  private def finishRepeat(src: DataFrame, credits: DataFrame): DataFrame =
    src.select(col("doc"))
      .join(credits.groupBy(col("doc")).agg(max(col("__l")).as("__m")),
        Seq("doc"), "left")
      .select(col("doc"), coalesce(col("__m"), lit(0)).as("max_repeat"))
}
