package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines: exact, shingle-Jaccard
  * (inverted index), MinHash+LSH, and SimHash.
  *
  * Scale posture (100 TB of documents):
  *  - Exact dedup is one hash aggregation on a 16-byte digest — the cheapest
  *    possible shuffle key (never shuffle full text).
  *  - The Jaccard inverted index joins on the shingle STRING for oracle
  *    exactness; `hashShingles=true` joins on xxhash64 instead, shrinking
  *    shuffle width ~10× with negligible collision probability.
  *  - MinHash+LSH bounds candidate generation: only pairs sharing a band
  *    bucket are compared, so cost follows the (small) near-dup population,
  *    not n². Bucket skew (a degenerate shingle shared by millions of docs)
  *    is the classic hazard — `maxBucketSize` drops pathological buckets.
  *  - All sketches derive from xxhash64, a codegen'd built-in: no UDF.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of (optionally normalized) text.
    * Returns one row per distinct content: canonical (min) id, count.
    */
  def exactGroups(df: DataFrame, id: String, text: String,
      normalized: Boolean = false): DataFrame = {
    val key = if (normalized) TextFunctions.fingerprintMd5(col(text))
      else md5(col(text))
    df.select(col(id), key.as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("dup_count"))
  }

  /** Distinct word-`n`-gram shingles per document, as (id, shingle) rows.
    * Exploding (not collecting) keeps every stage streaming — no giant
    * per-doc arrays cross a shuffle.
    */
  /** Distinct word-n-gram shingle array from an ALREADY-MATERIALIZED token
    * array column; fewer than n tokens → empty array. (Guarded with `when`:
    * Spark's `sequence(1, 0)` counts DOWN to [1, 0] rather than returning
    * empty.)
    *
    * The tokens argument must be a plain column reference, not the
    * tokenization expression itself: Column trees are built by value, so an
    * inline `tokens(text)` would re-run the normalize-regex chain once per
    * `element_at` reference — ~3× shingle-count regex evaluations per row.
    */
  def shingleArrayOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** (id, shingle-array) via the native [[org.apache.spark.sql.graftx.ShingleArray]]
    * expression — one per-row evaluation of the whole normalize/tokenize/
    * shingle chain, immune to CollapseProject re-inlining.
    */
  def docShingleArrays(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id),
      org.apache.spark.sql.graftx.VectorExpressions.shingleArr(col(text), n)
        .as("shingles"))

  def shingles(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame =
    docShingleArrays(df, id, text, n)
      .select(col(id), explode(col("shingles")).as("shingle"))

  /** Per-document n-gram NOVELTY against the corpus prefix in id order: a
    * shingle is novel in doc d iff no doc with a smaller id contains it
    * (min-id-wins, so every shingle is novel exactly once corpus-wide).
    * The classic curriculum / crawl-freshness signal: recrawls and
    * boilerplate-heavy documents score near 0, genuinely new content near
    * 10⁶. `novelty_q` = n_novel·10⁶ div n_grams (exact integer division —
    * no cross-engine float risk); shingle-less docs score (0, 0, 0).
    *
    * Scale: one inverted-index aggregation (map-combinable min per
    * shingle) + one narrow join back — the [[jaccardPairs]] index shape,
    * never all-pairs. Joins on the shingle STRING for oracle parity; at
    * petabyte scale key on xxhash64(shingle) exactly as `hashShingles`
    * does for Jaccard.
    */
  def noveltyScores(df: DataFrame, id: String, text: String,
      n: Int = 3): DataFrame = {
    val sh = shingles(df, id, text, n).localCheckpoint() // read twice
    val first = sh.groupBy(col("shingle")).agg(min(col(id)).as("__first"))
    val perDoc = sh.join(first, Seq("shingle"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"),
        sum((col(id) === col("__first")).cast("long")).as("n_novel"))
    df.select(col(id)).join(perDoc, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("n_novel * 1000000 div n_grams"))
          .as("novelty_q"))
  }

  /** Exact Jaccard near-duplicate pairs via an inverted shingle index:
    * explode → self-join on shingle → per-pair intersection count → Jaccard.
    * The standard scalable formulation — cost is Σ over shingles of df²,
    * not |docs|². `hashShingles` narrows the join key to 8 bytes.
    *
    * `maxShingleDf` caps the inverted index's document frequency: a shingle
    * present in more than `maxShingleDf` docs is dropped from candidate
    * generation (one stopword-like shingle with df=10⁶ would otherwise emit
    * 10¹² join rows). Dropped shingles still count in each doc's size, so
    * Jaccard is under- (never over-) estimated for pairs whose overlap
    * includes a hot shingle — the standard trade. The hot set is found with
    * one narrow groupBy and removed via broadcast anti-join (the hot set is
    * bounded by pathology count, so the index rows never reshuffle).
    */
  def jaccardPairs(df: DataFrame, id: String, text: String,
      minJaccard: Double, n: Int = 3, hashShingles: Boolean = false,
      maxShingleDf: Int = Int.MaxValue): DataFrame =
    intersectionCounts(df, id, text, n, hashShingles, maxShingleDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Shared inverted-index core of [[jaccardPairs]] and
    * [[containmentPairs]]: per intersecting doc pair (id_a < id_b) the
    * exact shingle-intersection size plus both docs' shingle counts.
    */
  private def intersectionCounts(df: DataFrame, id: String, text: String,
      n: Int, hashShingles: Boolean, maxShingleDf: Int): DataFrame = {
    // size travels WITH each exploded row, so no extra per-doc sizes join —
    // one scan per join side instead of three. The per-doc arrays are
    // materialized once (executor-local MEMORY_AND_DISK via localCheckpoint)
    // so the normalize/shingle regex chain doesn't re-run for the second
    // join side — only the cheap explode does; at cluster scale this
    // staging would be a persisted table. (A/B at sf0.1 local[32]: staged
    // 1.92 s / 1.64 s hashed vs unstaged 2.90 s / 2.28 s — staging wins at
    // both this scale and larger corpora, where regex recompute dominates.)
    val sh0 = docShingleArrays(df, id, text, n).localCheckpoint()
      .select(col(id), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("shingle"))
    val shKeyed = if (hashShingles)
      sh0.withColumn("shingle", xxhash64(col("shingle"))) else sh0
    val sh = if (maxShingleDf == Int.MaxValue) shKeyed else {
      val hot = shKeyed.groupBy(col("shingle"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxShingleDf)
        .select(col("shingle"))
      shKeyed.join(hot, Seq("shingle"), "left_anti")
    }
    val a = sh.select(col(id).as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = sh.select(col(id).as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** Asymmetric CONTAINMENT near-duplicates (Broder's containment
    * coefficient): C(A→B) = |A∩B| / |A|, the fraction of A's shingles that
    * also occur in B. Catches the subsumption family symmetric Jaccard
    * structurally misses: a short document quoted whole inside a much
    * longer one has J ≈ |A|/|B| ≈ 0 but C(A→B) = 1 — the
    * boilerplate-wrapper / quoted-article case in crawl dedup. Same
    * inverted-index shape and cost model as [[jaccardPairs]]; each
    * intersecting pair is scored in both directions and emitted once per
    * qualifying direction as (contained_id, container_id). Under a
    * `maxShingleDf` cap, dropped hot shingles still count in |A|, so
    * containment only under-estimates — the cap never invents a pair.
    */
  def containmentPairs(df: DataFrame, id: String, text: String,
      minContainment: Double, n: Int = 3, hashShingles: Boolean = false,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val pairs = intersectionCounts(df, id, text, n, hashShingles, maxShingleDf)
    val ab = pairs.select(col("id_a").as("contained_id"),
      col("id_b").as("container_id"), col("n_common"), col("n_a").as("n_self"))
    val ba = pairs.select(col("id_b").as("contained_id"),
      col("id_a").as("container_id"), col("n_common"), col("n_b").as("n_self"))
    ab.unionByName(ba)
      .withColumn("containment",
        col("n_common").cast("double") / col("n_self").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("contained_id"), col("container_id"), col("containment"))
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (the set-similarity-join
    * technique of Chaudhuri/Bayardo et al.): order each document's shingles
    * by ascending global document frequency and index only the first
    * |d| − ⌈τ·|d|⌉ + 1 of them. Any pair with Jaccard ≥ τ must share at
    * least ⌈τ·|x|⌉ shingles (since |y| ≥ τ·|x|), so its globally-smallest
    * common shingle falls inside BOTH prefixes — candidates from a
    * prefix⋈prefix join provably cover every qualifying pair, and the
    * final exact verification keeps the result identical to
    * [[jaccardPairs]].
    *
    * Scale properties: hot (stopword-like) shingles sort to the END of each
    * doc's order and drop out of the index automatically — skew protection
    * without an approximating cap; the size filter |y| ≥ τ·|x| prunes
    * mismatched-length pairs before verification; candidate volume follows
    * Σ over PREFIX shingles of df², which the frequency ordering drives
    * toward the rare tail. Wide stages carry (id, shingle-key, sizes) only;
    * full shingle arrays appear once, at the verify join, where AQE
    * broadcasts the candidate ids.
    */
  def jaccardPairsPrefix(df: DataFrame, id: String, text: String,
      minJaccard: Double, n: Int = 3, hashShingles: Boolean = true): DataFrame = {
    val docShingles = docShingleArrays(df, id, text, n)
      .filter(size(col("shingles")) > 0).localCheckpoint()
    val sh0 = docShingles
      .select(col(id), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("shingle"))
    val sh = if (hashShingles)
      sh0.withColumn("shingle", xxhash64(col("shingle"))) else sh0
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("__df"), col("shingle"))
    val prefix = sh.join(dfreq, Seq("shingle"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <=
        col("n_sh") - ceil(col("n_sh") * lit(minJaccard)).cast("int") + 1)
    val a = prefix.select(col("shingle"), col(id).as("id_a"), col("n_sh").as("n_a"))
    val b = prefix.select(col("shingle"), col(id).as("id_b"), col("n_sh").as("n_b"))
    val candidates = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      // size filter: τ·|x| ≤ |y| (and symmetrically) is necessary for j ≥ τ
      .filter(col("n_b") >= ceil(col("n_a") * lit(minJaccard)) &&
        col("n_a") >= ceil(col("n_b") * lit(minJaccard)))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val shA = docShingles.select(col(id).as("id_a"), col("shingles").as("sh_a"))
    val shB = docShingles.select(col(id).as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature column: `numHashes` independent min-hashes of the
    * document's shingle set (native expression — the HOF formulation costs
    * numHashes × |shingles| interpreted expression walks per row).
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftx.VectorExpressions.minhash(shingleArr, numHashes)

  /** MinHash+LSH near-duplicate pairs: signature → band buckets → bucket
    * join for candidates → exact Jaccard verification on the shingle sets.
    * Output schema matches [[jaccardPairs]]; with enough bands the result
    * converges to the exact answer at a fraction of the join volume.
    *
    * Shuffle discipline (the 100 TB contract): every wide stage moves only
    * (band, bucket, id) longs — the shingle arrays never enter a shuffle.
    *  1. banding emits narrow (id, band, bucket) rows;
    *  2. oversized buckets (degenerate content shared by ~everyone) are found
    *     with a narrow groupBy and removed via broadcast ANTI-join — the hot
    *     set is bounded by pathology count, so it broadcasts for free, while
    *     a window over all banded rows would sort the full index;
    *  3. the band self-join and the pair `.distinct()` operate on bare id
    *     pairs;
    *  4. shingle sets are re-derived from the (already pruned, small)
    *     candidate side only at the final verify join, where AQE broadcasts
    *     the candidate ids — the corpus-side arrays stay put.
    * The banding subtree is evaluated twice (sizes + anti-join stream): two
    * linear scans beat one global sort of the banded index.
    */
  /** (id, band, bucket) LSH index rows from an (id, shingles) frame: one row
    * per band; the bucket key hashes the band's slice of the minhash
    * signature, with the band index folded into the key (posexplode) so
    * buckets from different bands never collide. This row set is the
    * persistable index artifact [[IncrementalDedup]] builds on.
    */
  private[operators] def bandBuckets(docShingles: DataFrame, id: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    docShingles
      .select(col(id), minhashSignature(col("shingles"), numHashes).as("mh"))
      .select(col(id),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, slice(col("mh"), b * rows + 1, lit(rows))))).as(Seq("band", "bucket")))
  }

  def minhashLshPairs(df: DataFrame, id: String, text: String,
      minJaccard: Double, n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Int = 10000): DataFrame = {
    val docShingles = docShingleArrays(df, id, text, n)
      .filter(size(col("shingles")) > 0).localCheckpoint()
    val buckets = bandBuckets(docShingles, id, numHashes, bands)
    // (measured alternative: sharing one repartition(band,bucket) exchange
    // across both consumers via ReuseExchange trades the duplicated linear
    // signature scan for an extra full shuffle — no faster locally and
    // worse at scale, where recompute is embarrassingly parallel and
    // shuffle is I/O-bound)
    val oversized = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucketSize)
      .select(col("band"), col("bucket"))
    val pruned = buckets.join(oversized, Seq("band", "bucket"), "left_anti")
    val candidates = pruned.select(col("band"), col("bucket"), col(id).as("id_a"))
      .join(pruned.select(col("band"), col("bucket"), col(id).as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in several bands — verify once
    val shA = docShingles.select(col(id).as("id_a"), col("shingles").as("sh_a"))
    val shB = docShingles.select(col(id).as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over the document's normalized tokens: bit b is the sign
    * of Σ_tokens (±1 depending on bit b of xxhash64(token)). Native
    * expression — see [[org.apache.spark.sql.graftx.SimHash64]].
    */
  def simhash64(text: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.simhash(text)

  /** HOF formulation of [[simhash64]] — identical bits, kept as the
    * cross-check reference implementation.
    */
  def simhash64Hof(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val bitArr = transform(sequence(lit(0), lit(63)), b =>
      when(
        aggregate(toks, lit(0L), (acc, t) =>
          acc + when(call_function("shiftright", xxhash64(t), b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)) >= 0, lit(1L)).otherwise(lit(0L)))
    // pack with shift/or — the top bit would overflow `acc * 2` under ANSI
    aggregate(bitArr, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
  }

  /** Quadratic reference for [[simhashPairs]]: ALL pairs within Hamming
    * distance `maxHamming`, via a blocked exact all-pairs equi-join (same
    * pattern as `Similarity.cosineNearDupBlocked` — no broadcast nested
    * loop). The banded form must produce exactly this set (pigeonhole:
    * Hamming ≤ 3 forces agreement on ≥1 of 4 bands); the `d_simhash_check`
    * query asserts that equality at the driver gate.
    */
  def simhashPairsBrute(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3, blocks: Int = 8): DataFrame = {
    // (id, 64-bit sketch, block) is 20 bytes/doc — materialize once instead
    // of running the 64×|tokens| sketch for each join side
    val sh = df.select(col(id), simhash64(col(text)).as("sh"),
      pmod(xxhash64(col(id)), lit(blocks)).cast("int").as("__g"))
      .localCheckpoint()
    val a = sh.select(col("__g").as("__i"),
      explode(sequence(col("__g"), lit(blocks - 1))).as("__j"),
      col(id).as("__ida"), col("sh").as("__sa"))
    val b = sh.select(explode(sequence(lit(0), col("__g"))).as("__i"),
      col("__g").as("__j"),
      col(id).as("__idb"), col("sh").as("__sb"))
    a.join(b, Seq("__i", "__j"))
      .filter(col("__i") =!= col("__j") || col("__ida") < col("__idb"))
      .withColumn("hamming", bit_count(col("__sa").bitwiseXOR(col("__sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"), col("hamming"))
  }

  /** SimHash near-duplicate pairs: candidates share one of four 16-bit bands
    * (any pair within Hamming distance 3 must agree on ≥1 band — pigeonhole),
    * verified by exact Hamming distance ≤ `maxHamming`.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    // materialized once (16 bytes/doc) — both band-join sides reuse it
    val sh = df.select(col(id), simhash64(col(text)).as("sh"))
      .localCheckpoint()
    val banded = sh.select(col(id), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sh"), b * 16).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(id).as("id_a"),
      col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col(id).as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo, SIGMOD 1995):
    * order the corpus by a blocking key, slide a window of `w` consecutive
    * rows, and emit every in-window pair — the classic linear-candidate
    * alternative to hash blocking when near-duplicates sort adjacently
    * (common key choices: normalized-text prefixes, name+zip composites).
    *
    * Spark-first global ranking WITHOUT the single-partition window trap
    * (a bare `Window.orderBy` collapses the corpus onto one reducer): rows
    * are range-repartitioned and sorted on (key, id), per-partition
    * row_numbers are offset by the collected per-partition counts (one
    * numPartitions-row action — model-state small), yielding the exact
    * global rank of a deterministic total order. In-window pairs then come
    * from the banded self-equi-join on `rank div w` (each left row probes
    * ≤ 2 buckets — the [[Temporal.bandedRangeJoin]] shape on integer
    * ranks), so every shuffle carries (rank, id) longs and the candidate
    * count is exactly (w−1)·n − w·(w−1)/2, never n².
    *
    * Output: (`id_a`, `id_b`, `gap`) with id_a the earlier row in sort
    * order and 0 < gap < w the rank distance.
    */
  def sortedNeighborhoodPairs(df: DataFrame, id: String, sortKey: Column,
      w: Int): DataFrame = {
    require(w >= 2, "window must cover at least 2 rows")
    import org.apache.spark.sql.expressions.Window
    // __pid MUST be materialized inside the checkpointed frame: the window
    // below forces an exchange, and a bare spark_partition_id() in any
    // projection above it would observe the POST-shuffle partition id, not
    // the pinned range-partition id the offsets were built from (silently
    // duplicated ranks on multi-partition input).
    val parts = df.select(col(id).as("__id"), sortKey.as("__k"))
      .repartitionByRange(col("__k"), col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin the range partitioning for offsets + ranks
    val counts = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.init.map { case (_, off) => off } // offset of partition i = sum of counts < i
    val offsetByPid = counts.map(_._1).zip(offsets).toMap
    val offCol = element_at(typedlit(offsetByPid), col("__pid"))
    val wRank = Window.partitionBy(col("__pid"))
      .orderBy(col("__k"), col("__id"))
    val ranked = parts
      .withColumn("__rk", row_number().over(wRank).cast("long") + offCol)
      .select(col("__id"), col("__rk"))
    // banded self-join on rank div w: matches for a sit in (rk_a, rk_a+w)
    val a = ranked
      .withColumn("__bk", explode(array_distinct(array(
        expr(s"(__rk + 1) div $w"), expr(s"(__rk + ${w - 1}) div $w")))))
      .select(col("__id").as("id_a"), col("__rk").as("__ra"), col("__bk"))
    val b = ranked
      .select(col("__id").as("id_b"), col("__rk").as("__rb"),
        expr(s"__rk div $w").as("__bk2"))
    a.join(b, col("__bk") === col("__bk2") &&
        col("__rb") > col("__ra") && col("__rb") < col("__ra") + w)
      .select(col("id_a"), col("id_b"), (col("__rb") - col("__ra")).as("gap"))
  }

  /** Expression-level let-binding: evaluate `value` ONCE per row and feed
    * it to `body` as a lambda-bound variable. `transform` evaluates its
    * input array a single time, so wrapping the value in a 1-element array
    * and unwrapping the result defeats CollapseProject's re-inlining of an
    * expensive expression into every downstream reference (the same hazard
    * [[shingleArrayOfTokens]] documents) — without materializing an
    * intermediate frame.
    */
  private[graft] def letBind(value: Column,
      body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local document fingerprinting): hash every word `k`-gram
    * (md5 hex, so selection is engine-replayable lexicographic order — no
    * engine-private hash), slide a window of `w` consecutive gram hashes,
    * keep each window's minimum, and dedupe. The paper's guarantee: any
    * shared token run of length ≥ w + k − 1 between two documents yields
    * at least one shared selected fingerprint, while storing only
    * ~2/(w+1) of the gram hashes. Documents shorter than one window keep
    * the minimum of what they have; docs with < k tokens have no grams
    * and drop out.
    *
    * Tie rule: windows select by VALUE minimum only (position-free), so
    * the selected SET is independent of any tie-break — which is what the
    * pair-matching consumer needs, and what makes the DuckDB oracle an
    * exact mirror.
    *
    * Scale posture: the whole selection is ONE fused per-row projection
    * (the gram-hash array is let-bound via [[letBind]], never re-computed
    * per window), so it pipelines inside the scan stage; only the
    * selected fingerprints — ~2/(w+1) of the grams — explode into the
    * inverted-index join, the same narrow-key shape as [[jaccardPairs]].
    *
    * Output: (`id`, `fp`) distinct selected fingerprints per document.
    */
  def winnowFingerprints(df: DataFrame, id: String, text: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "winnowing needs k >= 1 and w >= 1")
    val emptyArr = array().cast("array<string>")
    val grams = letBind(TextFunctions.tokens(col(text)), tk =>
      when(size(tk) >= k,
        transform(sequence(lit(1), size(tk) - (k - 1)), i =>
          md5(concat_ws(" ",
            (0 until k).map(d => element_at(tk, i + d)): _*))))
        .otherwise(emptyArr))
    val fps = letBind(grams, hs =>
      when(size(hs) >= 1,
        array_distinct(transform(
          sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
          j => array_min(slice(hs, j, lit(w))))))
        .otherwise(emptyArr))
    df.select(col(id), explode(fps).as("fp"))
  }

  /** Cross-document winnowing match: pairs sharing selected fingerprints,
    * scored by containment of the smaller fingerprint set in micro-units
    * (id_a < id_b, score_q = ⌊10⁶·|∩| / min(|A|,|B|)⌋ ≥ `minScoreQ`).
    * Same inverted-index economics as [[jaccardPairs]]: the join key is
    * the fingerprint, so work scales with matches, not with pairs.
    */
  def winnowingPairs(df: DataFrame, id: String, text: String,
      minScoreQ: Long, k: Int = 3, w: Int = 4): DataFrame = {
    val f = winnowFingerprints(df, id, text, k, w).localCheckpoint()
    val sizes = f.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val withN = f.join(sizes, Seq(id))
    val pairs = withN.as("x")
      .join(withN.as("y"),
        col("x.fp") === col("y.fp") && col(s"x.$id") < col(s"y.$id"))
      .groupBy(col(s"x.$id").as("id_a"), col(s"y.$id").as("id_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .select(col("id_a"), col("id_b"), col("n_common"),
        expr("(1000000 * n_common) div least(n_a, n_b)").as("score_q"))
      .filter(col("score_q") >= minScoreQ)
  }
}
