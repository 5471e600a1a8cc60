package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Aggregations, Sampling}

/** Deterministic corpus splitting and stratified sampling — the
  * select-what-to-train-on surface of a training-data pipeline.
  *
  * Scale posture: split assignment is a pure per-row projection (md5 of the
  * key), so it fuses into the scan stage with zero shuffle at any corpus
  * size; only the tiny per-split/per-stratum summaries aggregate.
  */
object SamplingQueries extends QueryPack {

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  override def queries: Map[String, Query] = Map(

    // Neyman-allocation stratified sampling: budget split ∝ N_h·S_h from
    // one moment scan, selection = n_h smallest md5(id) per stratum via
    // the bounded k-heap (exchange ≤ partitions·k per stratum — never the
    // stratum). Oracle replays allocation + selection with row_number —
    // value-exact on counts, checksums, and stable value sums.
    "x_neyman_sample" -> ((s, dir) =>
      Sampling.neymanSelect(Tables.load(s, dir, "events"),
          "event_id", "event_type", "value", budget = 500)
        .orderBy(col("event_type"))),

    // Smoothed + leave-one-out target encoding (the standard high-
    // cardinality categorical → numeric feature prep): enc(v) =
    // (Σy_v + m·ȳ)/(n_v + m) with prior weight m=10; the LOO variant
    // excludes each row's own target — per-row values are fingerprinted
    // through Σ⌊loo·10⁶⌋ and Σ⌊loo²·10⁶⌋ micro-unit BIGINTs
    // (byte-sensitive, no cancellation identity; binary floor of an
    // IEEE-exact product is bit-identical cross-engine, unlike the
    // double→DECIMAL cast which rounds shortest-repr in Spark but binary
    // in DuckDB). One tiny per-category frame broadcasts back onto the
    // fact — the encode itself is a zero-shuffle projection.
    "x_target_encode" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_acctbal").cast("double").as("y"))
      val g = c.groupBy(col("seg")).agg(count(lit(1)).as("n"),
        Aggregations.sumStable(col("y")).as("sy"))
      val tot = c.agg(count(lit(1)).as("tn"),
        Aggregations.sumStable(col("y")).as("ty"))
      val gWithGm = g.crossJoin(broadcast(tot)) // 1-row global frame
        .withColumn("gm", col("ty") / col("tn").cast("double"))
        .localCheckpoint() // feeds the encode AND the per-row LOO join
      val enc = gWithGm.withColumn("enc_smooth",
        (col("sy") + lit(10.0) * col("gm"))
          / (col("n").cast("double") + lit(10.0)))
      val loo = c.join(broadcast(gWithGm.select(col("seg"), col("n"),
          col("sy"), col("gm"))), Seq("seg"))
        .withColumn("loo", when(col("n") > 1,
            (col("sy") - col("y")) / (col("n").cast("double") - lit(1.0)))
          .otherwise(col("gm")))
        .groupBy(col("seg"))
        .agg(sum(floor(col("loo") * lit(1e6)).cast("long")).as("loo_sum"),
          sum(floor(col("loo") * col("loo") * lit(1e6)).cast("long"))
            .as("loo_sq"))
      enc.join(loo, Seq("seg"))
        .select(col("seg"), col("n"), col("enc_smooth"),
          col("loo_sum"), col("loo_sq"))
        .orderBy(col("seg"))
    }),

    // k-anonymity / l-diversity screen over the (nation, segment,
    // balance-band) quasi-identifier: the privacy re-identification
    // report a dataset card publishes. Pure integer aggregation —
    // scan-bound at any scale.
    "x_k_anonymity" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("band"),
          col("c_name").substr(length(col("c_name")) - 1, lit(2))
            .as("tail"))
      c.groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .agg(count(lit(1)).as("gn"), countDistinct(col("tail")).as("ld"))
        .agg(count(lit(1)).as("n_groups"),
          min(col("gn")).as("k_anonymity"),
          sum(when(col("gn") < 5, col("gn")).otherwise(0L))
            .as("rows_lt5"),
          sum(when(col("gn") < 5, 1L).otherwise(0L)).as("groups_lt5"),
          min(col("ld")).as("l_diversity_min"))
    }),

    // t-CLOSENESS (Li et al. 2007) over the (nation, segment) quasi-
    // identifier with the ORDERED balance band as the sensitive attribute
    // — the attribute-disclosure screen l-diversity leaves open. Ordered
    // EMD per group computed exactly in integers (cumulative-count cross
    // products, one floor division) — the oracle replays every group's
    // t_q bit-for-bit through its own window formulation.
    "x_t_closeness" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("band"))
      graft.ops.Privacy.tCloseness(c,
          Seq("c_nationkey", "c_mktsegment"), "band")
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    // Feature hashing (Weinberger et al. 2009, the "hashing trick"):
    // tokens land in 64 buckets by a 32-bit md5 slice, with a ±1 sign
    // from the next hash bit — collisions cancel in expectation, the
    // vectorizer needs NO vocabulary pass. Per-doc values aggregate
    // map-side; the gate publishes per-bucket integer totals
    // (value-exact).
    "x_feature_hash" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val h = conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
      val perDoc = toks
        .select(col("doc_id"), pmod(h, lit(64L)).cast("int").as("bucket"),
          when(pmod(shiftright(h, 6), lit(2L)) === 0L, 1L).otherwise(-1L)
            .as("sgn"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(sum(col("sgn")).as("v"))
      perDoc.groupBy(col("bucket"))
        .agg(sum(col("v")).as("total"), sum(abs(col("v"))).as("l1"),
          count(lit(1)).as("nnz_docs"))
        .orderBy(col("bucket"))
    }),

    // UniMax budget allocation (Chung et al. 2023): split a total token
    // budget over sources smallest-first, each source capped at 4 epochs
    // of its own corpus, leftover flowing to larger sources — the
    // multilingual/multi-domain mixing rule that avoids both starving
    // small domains and over-repeating them. Token counts reduce
    // distributed; the greedy itself folds over the BOUNDED per-source
    // list in pure integer arithmetic (remaining div m), replayed
    // bit-exactly by the oracle's recursive CTE.
    "x_unimax_mix" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val counts = Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(TextFunctions.tokens(col("text"))).cast("long"))
          .as("c"))
        .filter(col("c") > 0)
      val g = counts.agg(
        sort_array(collect_list(struct(col("c"), col("source"))))
          .as("seq"),
        expr("sum(c) div 2").as("b"), // budget: half the corpus total
        count(lit(1)).as("nl"))
      val emptyOut = expr(
        "CAST(array() AS array<struct<source:string,c:bigint,alloc:bigint>>)")
      val fold = aggregate(col("seq"),
        struct(col("b").as("r"), col("nl").as("m"), emptyOut.as("out")),
        (acc, x) => {
          val r = acc.getField("r")
          val m = acc.getField("m")
          // exact integer division: operands stay far under 2^53
          val fair = ((r - pmod(r, m)) / m).cast("long")
          val alloc = least(fair, lit(4L) * x.getField("c"))
          struct((r - alloc).as("r"), (m - 1L).as("m"),
            concat(acc.getField("out"), array(struct(
              x.getField("source").as("source"),
              x.getField("c").as("c"), alloc.as("alloc")))).as("out"))
        })
      g.select(explode(fold.getField("out")).as("row"))
        .select(col("row.source").as("source"), col("row.c").as("c"),
          col("row.alloc").as("alloc"),
          expr("(row.alloc * 1000000) div row.c").as("epochs_micro"))
        .orderBy(col("source"))
    }),

    // Reproducible per-epoch loader order (ops.Sampling.epochShardOrder):
    // two epochs × four shards over the documents table — every (epoch,
    // shard, position, doc_id) row is a pure function of md5, so the full
    // order hash-matches the oracle and re-runs are byte-identical.
    "x_epoch_order" -> ((s, dir) =>
      Sampling.epochShardOrder(Tables.load(s, dir, "documents"),
          "doc_id", epochs = 2, shards = 4)
        .orderBy(col("epoch"), col("shard"), col("position"))),

    // Temperature mixture at α = 1/2 (mT5-style source rebalancing,
    // ops.Sampling.temperatureSqrtSample): per-source original vs kept
    // counts — every keep decision is engine-exact (sqrt is correctly
    // rounded, weights quantized to integers, md5-hex bucket compare), so
    // the counts hash-match.
    "x_temperature_mixture" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val kept = Sampling
        .temperatureSqrtSample(docs, "doc_id", "source", targetFraction = 0.5)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_orig"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_orig"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // Z-order layout quality (the OPTIMIZE ZORDER primitive, ops.Locality):
    // bucket orders by 64 equal z-ranges vs 64 equal custkey ranges and
    // compare the summed per-bucket (custkey span + day span) — the direct
    // proxy for parquet min/max pruning effectiveness on BOTH dimensions.
    // All integer bit arithmetic, so the sums are engine-exact (measured:
    // z 25952 vs naive 153941 at sf0.01 — ~6× tighter bounding boxes);
    // the gate demands ≥ 2×.
    "x_zorder_layout" -> ((s, dir) => {
      import graft.ops.Locality
      val base = Tables.load(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("x"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("y"))
      val withZ = base
        .withColumn("z", Locality.zValue2(col("x"), col("y"), zBits))
        .localCheckpoint() // scanned by both layouts + the maxima
      val lims = withZ.agg(max(col("z")).as("zm"), max(col("x")).as("xm"))
      val staged = withZ.crossJoin(broadcast(lims))
      def spanSum(bucket: org.apache.spark.sql.Column, out: String) =
        staged.groupBy(bucket.as("__b"))
          .agg((max(col("x")) - min(col("x")) +
            max(col("y")) - min(col("y"))).as("__s"))
          .agg(sum(col("__s")).as(out))
      val zs = spanSum(expr(s"(z * $zBuckets) div (zm + 1)"), "z_span_sum")
      val ns = spanSum(expr(s"(x * $zBuckets) div (xm + 1)"), "naive_span_sum")
      withZ.agg(count(lit(1)).as("n_rows"))
        .crossJoin(zs).crossJoin(ns) // 1-row frames
        .select(col("n_rows"), col("z_span_sum"), col("naive_span_sum"),
          (col("z_span_sum") * 2 < col("naive_span_sum")).cast("int")
            .as("locality_ok"))
    }),

    // Mutual-information feature ranking: how much does each candidate
    // feature (language; length bucket) tell you about a document's
    // source — the feature-selection screen before training a curation
    // classifier. MI = Σ p(f,s)·ln(p(f,s)/(p(f)p(s))), per-cell terms
    // quantized to nano-nats BEFORE the sum (order-free total). One
    // contingency aggregation per feature, margins broadcast.
    "x_feature_mi" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("source"), col("lang"),
          least(floor(length(col("text")) / 100).cast("long"), lit(5L))
            .as("len_b"))
        .localCheckpoint() // scanned once per feature
      def mi(feat: org.apache.spark.sql.Column, name: String) = {
        val cells = docs.groupBy(feat.as("f"), col("source").as("s"))
          .agg(count(lit(1)).as("n_fs"))
          .localCheckpoint()
        val fm = cells.groupBy(col("f")).agg(sum(col("n_fs")).as("n_f"))
        val sm = cells.groupBy(col("s")).agg(sum(col("n_fs")).as("n_s"))
        val tot = cells.agg(sum(col("n_fs")).as("n"))
        val nd = col("n").cast("double")
        val pfs = col("n_fs").cast("double") / nd
        val ratio = pfs / ((col("n_f").cast("double") / nd) *
          (col("n_s").cast("double") / nd))
        cells
          .join(broadcast(fm), Seq("f")).join(broadcast(sm), Seq("s"))
          .crossJoin(broadcast(tot))
          .select(lit(name).as("feature"),
            round(pfs * log(ratio) * lit(1e9)).cast("long").as("__tq"))
          .groupBy(col("feature"))
          .agg(count(lit(1)).as("n_cells"), sum(col("__tq")).as("mi_q"))
      }
      mi(col("lang"), "lang")
        .unionByName(mi(col("len_b").cast("string"), "len_bucket"))
        .orderBy(col("feature"))
    }),

    // Hilbert-curve layout quality on the same two axes as
    // x_zorder_layout, measured on the shared 2^hBits GRID (both axes
    // normalized — the curve operators' documented [0, 2^bits) domain;
    // raw o_custkey outgrows a fixed bit budget with sf, and raw-unit
    // spans would weight the axes by their arbitrary value ranges):
    // per-bucket bounding-box span sums for the Hilbert clustering, the
    // Morton clustering, and the naive single-axis split, all value-exact
    // (the Hilbert recurrence is pure integer CASE arithmetic the oracle
    // unrolls level by level). locality_ok asserts the ≥2× win over
    // naive; the h-vs-z sums make the Hilbert/Morton comparison
    // inspectable (near-uniform data tiles compactly under BOTH curves —
    // Hilbert's adjacency guarantee is spec-proven, not span-visible
    // here).
    "x_hilbert_layout" -> ((s, dir) => {
      import graft.ops.Locality
      val base0 = Tables.load(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("rx"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("ry"))
        .localCheckpoint() // feeds the grid maxima + the indexed frame
      val lims0 = base0.agg(max(col("rx")).as("xm0"), max(col("ry")).as("ym0"))
      val withH = base0.crossJoin(broadcast(lims0))
        .select(expr(s"(rx * ${1L << hBits}) div (xm0 + 1)").as("x"),
          expr(s"(ry * ${1L << hBits}) div (ym0 + 1)").as("y"))
        .withColumn("h", Locality.hilbertValue2(col("x"), col("y"), hBits))
        .withColumn("z", Locality.zValue2(col("x"), col("y"), hBits))
        .localCheckpoint() // scanned by three layouts + the maxima
      val lims = withH.agg(max(col("h")).as("hm"), max(col("z")).as("zm"),
        max(col("x")).as("xm"))
      val staged = withH.crossJoin(broadcast(lims))
      def spanSum(bucket: org.apache.spark.sql.Column, out: String) =
        staged.groupBy(bucket.as("__b"))
          .agg((max(col("x")) - min(col("x")) +
            max(col("y")) - min(col("y"))).as("__s"))
          .agg(sum(col("__s")).as(out))
      val hs = spanSum(expr(s"(h * $zBuckets) div (hm + 1)"), "h_span_sum")
      val zs = spanSum(expr(s"(z * $zBuckets) div (zm + 1)"), "z_span_sum")
      val ns = spanSum(expr(s"(x * $zBuckets) div (xm + 1)"), "naive_span_sum")
      withH.agg(count(lit(1)).as("n_rows"))
        .crossJoin(hs).crossJoin(zs).crossJoin(ns) // 1-row frames
        .select(col("n_rows"), col("h_span_sum"), col("z_span_sum"),
          col("naive_span_sum"),
          (col("h_span_sum") * 2 < col("naive_span_sum")).cast("int")
            .as("locality_ok"))
    }),

    // Cross-split near-dup leakage: pairs from the shingle-Jaccard near-dup
    // set whose members landed in DIFFERENT train/val/test splits — the
    // leaks a random document-level split lets through whenever near-dups
    // survive dedup (in expectation ≈34% of dup pairs cross a 0.8/0.1/0.1
    // boundary, so the screen fires on any corpus with residual dups).
    // Composition of two oracle-green primitives: Dedup.jaccardPairs
    // (hashed-shingle inverted index — the corpus shuffles only 8-byte
    // keys) and Sampling.splitAssign (pure projection, no shuffle). The
    // pair set is small by construction, so AQE broadcasts it into the two
    // split lookups; the documents table itself never re-shuffles here.
    "x_split_leakage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val splits = Sampling.splitAssign(docs, "doc_id", weights)
        .select(col("doc_id"), col("split"))
      graft.operators.Dedup
        .jaccardPairs(docs, "doc_id", "text",
          minJaccard = DedupQueries.tau, hashShingles = true)
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")),
          Seq("id_a"))
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")),
          Seq("id_b"))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("id_a"), col("id_b"), col("jaccard"),
          col("split_a"), col("split_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Shard output manifest: per-shard row count + order-independent
    // content checksum (sum of a 32-bit slice of md5("id:text")) — the
    // writer-side integrity fingerprint a 1000-executor job publishes next
    // to its data. Any reshuffle/backfill/recovery re-run must reproduce
    // it bit-for-bit, and a mismatch localizes corruption to one shard
    // without re-reading the corpus. The sum is commutative, so the value
    // is partitioning-independent; 2³²-bounded terms keep the int64 total
    // exact up to ~2³¹ rows per shard (size shards accordingly).
    "x_shard_manifest" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(16)).as("shard"),
          conv(substring(
            md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))),
            1, 8), 16, 10).cast("long").as("__h"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("checksum"))
        .orderBy(col("shard"))),

    // Length-bucketed batching: rank documents by exact length (ties by
    // id), cut into 8 equal-depth buckets, and report each bucket's
    // padding overhead (n·max − Σlen — the tokens a fixed-shape batch
    // wastes). Bucketing by length is THE padding-efficiency lever for
    // training loaders; the report quantifies what it saves vs one global
    // bucket. ntile's positional split is engine-identical once the order
    // is total. At 100 TB the same report runs on the sketch-quantile
    // edges (a_approx_quantiles) instead of a global rank — the exact
    // ntile here is the oracle form.
    "x_length_buckets" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), ntile(8).over(w).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_len"),
          max(col("n_chars")).as("max_len"),
          sum(col("n_chars")).as("sum_len"))
        .withColumn("padding_overhead",
          col("n_docs") * col("max_len") - col("sum_len"))
        .orderBy(col("bucket"))
    }),

    // Per-(split × source) document counts and char totals: proves the
    // hash-split is engine-independent (oracle recomputes the same md5
    // buckets) and that every row lands in exactly one split (counts
    // reconcile with the table total by construction of the CASE).
    "x_split_stats" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Sampling.splitAssign(docs, "doc_id", weights)
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("source"))
    }),

    // Stratified sample soundness, all flags must be 1: (1) sampling by
    // lang with per-stratum fractions returns only rows from requested
    // strata; (2) each stratum's sampled count is within a tolerant
    // Chernoff-style band of fraction × stratum size (the draw is
    // seed-deterministic but engine-specific, so the oracle checks BOUNDS,
    // not membership); (3) the sample is a subset (no invented rows).
    "x_stratified_check" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val fractions = Map("en" -> 0.5, "de" -> 0.25)
      val sample = Sampling.stratifiedSample(docs, "lang", fractions, seed = 42L)
        .localCheckpoint() // sampled once; referenced three times below
      val onlyStrata = sample.filter(!col("lang").isin(fractions.keys.toSeq: _*))
        .agg(count(lit(1)).as("__bad"))
        .select(when(col("__bad") === 0, 1).otherwise(0).as("strata_ok"))
      val base = docs.filter(col("lang").isin(fractions.keys.toSeq: _*))
        .groupBy(col("lang")).agg(count(lit(1)).as("__n"))
      val bands = sample.groupBy(col("lang")).agg(count(lit(1)).as("__k"))
        .join(base, Seq("lang"))
        .withColumn("__f", element_at(
          map(fractions.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*),
          col("lang")))
        // ±5σ binomial band — fails only on a real sampling bug
        .withColumn("__sigma", sqrt(col("__n") * col("__f") * (lit(1.0) - col("__f"))))
        .filter(abs(col("__k") - col("__n") * col("__f")) > lit(5.0) * col("__sigma") + lit(1.0))
        .agg(count(lit(1)).as("__out"))
        .select(when(col("__out") === 0, 1).otherwise(0).as("bands_ok"))
      val subset = sample.join(docs, Seq("doc_id", "text", "lang", "source", "n_chars"),
          "left_anti")
        .agg(count(lit(1)).as("__orphans"))
        .select(when(col("__orphans") === 0, 1).otherwise(0).as("subset_ok"))
      onlyStrata.crossJoin(bands).crossJoin(subset) // 1-row × 1-row × 1-row
    }),

    // Weighted per-stratum reservoir (A-ES, single-pass bounded-heap):
    // this gate states the coarse properties — per-source sample sizes
    // (min(k, stratum size)), strict subset, and the weight bias the
    // scheme exists for (sample mean n_chars above corpus mean); the
    // x_weighted_reservoir gate below replays the key law row-exactly.
    "x_weighted_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val samp = Sampling
        .weightedSample(docs, "doc_id", "source", "n_chars", k = 10)
        .localCheckpoint() // sampled once; referenced three times below
      val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val perSource = samp.groupBy(col("source")).agg(count(lit(1)).as("__k"))
      val subset = samp.select(col("doc_id"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .agg((count(lit(1)) === 0).cast("int").as("subset_ok"))
      val bias = samp.agg(avg(col("n_chars")).as("__ms"))
        .crossJoin(docs.agg(avg(col("n_chars")).as("__ma")))
        .select((col("__ms") > col("__ma")).cast("int").as("bias_ok"))
      sizes.join(perSource, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("__k"), lit(0L)).as("n_sampled"))
        .crossJoin(subset).crossJoin(bias) // 1-row gates
        .orderBy(col("source"))
    }),

    // EXACT replay of the A-ES reservoir: the oracle recomputes u from
    // the same salted-md5 hex window, quantizes ln(u) to integer
    // micro-nats, ranks (10^6 * -lq) // w ascending with id ties per
    // stratum, and must reproduce the SAME sampled id set row for row -
    // proving the single-pass heap reduction implements the key law, not
    // an approximation of it.
    "x_weighted_reservoir" -> ((s, dir) =>
      Sampling.weightedSample(Tables.load(s, dir, "documents"),
          "doc_id", "source", "n_chars", k = 10)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("doc_id"))),

    // Per-domain contribution cap (C4/Gopher "max pages per domain"):
    // at most 12 docs per source, drawn by md5 order. The implementation
    // is the skew-proof two-phase bucket-quota scheme (Sampling.domainCap);
    // the oracle is the textbook single-window formulation — independent
    // plans that must agree row-for-row (the per-source fingerprint hashes
    // every kept doc_id, not just the counts).
    "x_domain_cap" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val kept = Sampling.domainCap(docs, "doc_id", "source", cap = 12)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws(",",
            sort_array(collect_list(col("doc_id").cast("string")))))
            .as("kept_fp"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_orig"))
        .join(kept, Seq("source"))
        .select(col("source"), col("n_orig"), col("n_kept"), col("kept_fp"))
        .orderBy(col("source"))
    }))

  private val zBits = 16
  // the Hilbert gate's shared grid: 8 bits per axis, matching the curve
  // writers' 256-cell normalization (a finer grid under-populates and the
  // span metric stops measuring tiling)
  private val hBits = 8
  private val zBuckets = 64

  override def oracleSql: Map[String, String] = Map(

    "x_neyman_sample" -> {
      def stable(e: String) =
        s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
      s"""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS big_n,
         |    ${stable("CAST(value AS DOUBLE)")} AS sv,
         |    ${stable("CAST(value AS DOUBLE) * CAST(value AS DOUBLE)")} AS sv2
         |  FROM events GROUP BY event_type),
         |a0 AS (SELECT event_type, big_n,
         |    CAST(CAST(CAST(
         |    CASE WHEN big_n > 1 THEN CAST(big_n AS DOUBLE)
         |      * sqrt((sv2 - sv * sv / CAST(big_n AS DOUBLE))
         |        / (CAST(big_n AS DOUBLE) - CAST(1.0 AS DOUBLE)))
         |      ELSE CAST(0.0 AS DOUBLE) END
         |    AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE) AS w
         |  FROM m),
         |tw AS (SELECT ${stable("w")} AS tw FROM a0),
         |al AS (SELECT event_type, big_n,
         |    CASE WHEN tw > CAST(0.0 AS DOUBLE)
         |      THEN least(CAST(floor(CAST(500.0 AS DOUBLE) * w / tw)
         |        AS BIGINT), big_n)
         |      ELSE CAST(0 AS BIGINT) END AS n_target
         |  FROM a0, tw),
         |h AS (SELECT event_type, event_id, CAST(value AS DOUBLE) AS v,
         |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) AS hh
         |  FROM events),
         |r AS (SELECT event_type, event_id, v, hh, row_number() OVER (
         |    PARTITION BY event_type ORDER BY hh, event_id) AS rn
         |  FROM h),
         |sel AS (SELECT r.* FROM r JOIN al USING (event_type)
         |  WHERE rn <= n_target),
         |sg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_selected,
         |    CAST(sum(hh) AS BIGINT) AS checksum, ${stable("v")} AS v_sum
         |  FROM sel GROUP BY event_type)
         |SELECT al.event_type, big_n, n_target,
         |  COALESCE(n_selected, 0) AS n_selected,
         |  COALESCE(checksum, 0) AS checksum,
         |  COALESCE(v_sum, CAST(0.0 AS DOUBLE)) AS v_sum
         |FROM al LEFT JOIN sg USING (event_type)
         |ORDER BY al.event_type""".stripMargin
    },

    "x_target_encode" -> {
      def stable(e: String) =
        s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
      s"""WITH c AS (SELECT c_custkey, c_mktsegment AS seg,
         |    CAST(c_acctbal AS DOUBLE) AS y FROM customer),
         |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
         |    ${stable("y")} AS sy FROM c GROUP BY seg),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS tn,
         |    ${stable("y")} AS ty FROM c),
         |gg AS (SELECT seg, n, sy, ty / CAST(tn AS DOUBLE) AS gm
         |  FROM g, tot),
         |enc AS (SELECT seg, n,
         |    (sy + CAST(10.0 AS DOUBLE) * gm)
         |      / (CAST(n AS DOUBLE) + CAST(10.0 AS DOUBLE)) AS enc_smooth
         |  FROM gg),
         |lo AS (SELECT c.seg,
         |    CASE WHEN n > 1 THEN (sy - y)
         |        / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))
         |      ELSE gm END AS loo
         |  FROM c JOIN gg ON c.seg = gg.seg),
         |la AS (SELECT seg,
         |    CAST(sum(CAST(floor(loo * CAST(1000000.0 AS DOUBLE))
         |      AS BIGINT)) AS BIGINT) AS loo_sum,
         |    CAST(sum(CAST(floor(loo * loo * CAST(1000000.0 AS DOUBLE))
         |      AS BIGINT)) AS BIGINT) AS loo_sq FROM lo GROUP BY seg)
         |SELECT enc.seg, n, enc_smooth, loo_sum, loo_sq
         |FROM enc JOIN la ON enc.seg = la.seg
         |ORDER BY enc.seg""".stripMargin
    },

    "x_k_anonymity" ->
      """WITH q AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT)
        |      AS band,
        |    substr(c_name, CAST(length(c_name) AS INTEGER) - 1, 2) AS tail
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, band,
        |    CAST(count(*) AS BIGINT) AS gn,
        |    CAST(count(DISTINCT tail) AS BIGINT) AS ld
        |  FROM q GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  min(gn) AS k_anonymity,
        |  CAST(sum(CASE WHEN gn < 5 THEN gn ELSE 0 END) AS BIGINT)
        |    AS rows_lt5,
        |  CAST(sum(CASE WHEN gn < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt5,
        |  min(ld) AS l_diversity_min
        |FROM g""".stripMargin,

    // ordered EMD, all integer: t_num = Σ_i |A_i·N − B_i·n_g| over the
    // globally-ordered sensitive values; t_q = (1e6·t_num) // (n_g·N·(m−1))
    "x_t_closeness" ->
      """WITH q AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT)
        |      AS band
        |  FROM customer),
        |cnt AS (SELECT c_nationkey, c_mktsegment, band,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM q GROUP BY 1, 2, 3),
        |gv AS (SELECT band, CAST(sum(c) AS BIGINT) AS gc,
        |    CAST(sum(sum(c)) OVER (ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS gcum
        |  FROM cnt GROUP BY band),
        |tot AS (SELECT CAST(sum(gc) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS m FROM gv),
        |grp AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(sum(c) AS BIGINT) AS ng
        |  FROM cnt GROUP BY 1, 2),
        |mat AS (SELECT grp.c_nationkey, grp.c_mktsegment, grp.ng,
        |    gv.band, gv.gcum, coalesce(cnt.c, 0) AS c
        |  FROM grp CROSS JOIN gv
        |  LEFT JOIN cnt ON cnt.c_nationkey = grp.c_nationkey
        |    AND cnt.c_mktsegment = grp.c_mktsegment
        |    AND cnt.band = gv.band),
        |cum AS (SELECT c_nationkey, c_mktsegment, ng, gcum,
        |    SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acum
        |  FROM mat)
        |SELECT c_nationkey, c_mktsegment, ng AS n,
        |  CAST(CASE WHEN m > 1
        |    THEN (1000000 * sum(abs(acum * n2.n - gcum * ng)))
        |      // (ng * n2.n * (m - 1))
        |    ELSE 0 END AS BIGINT) AS t_q
        |FROM cum CROSS JOIN tot n2
        |GROUP BY c_nationkey, c_mktsegment, ng, n2.n, n2.m
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "x_feature_hash" ->
      """WITH norm AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w
        |  FROM norm),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hh
        |  FROM toks WHERE length(w) > 0),
        |pd AS (SELECT doc_id, CAST(hh % 64 AS INTEGER) AS bucket,
        |    CAST(sum(CASE WHEN (hh // 64) % 2 = 0 THEN 1 ELSE -1 END)
        |      AS BIGINT) AS v
        |  FROM h GROUP BY doc_id, bucket)
        |SELECT bucket, CAST(sum(v) AS BIGINT) AS total,
        |  CAST(sum(abs(v)) AS BIGINT) AS l1,
        |  CAST(count(*) AS BIGINT) AS nnz_docs
        |FROM pd GROUP BY bucket ORDER BY bucket""".stripMargin,

    "x_unimax_mix" ->
      s"""WITH RECURSIVE t AS (SELECT source,
         |    CAST(sum(len(${TextQueries.toksSql})) AS BIGINT) AS c
         |  FROM documents GROUP BY source),
         |t2 AS (SELECT * FROM t WHERE c > 0),
         |o AS (SELECT source, c,
         |    row_number() OVER (ORDER BY c, source) AS i FROM t2),
         |tot AS (SELECT CAST(sum(c) // 2 AS BIGINT) AS b,
         |    CAST(count(*) AS BIGINT) AS nl FROM t2),
         |rec AS (
         |  SELECT CAST(0 AS BIGINT) AS i, b AS rem, nl AS m,
         |    CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS c,
         |    CAST(NULL AS BIGINT) AS alloc
         |  FROM tot
         |  UNION ALL
         |  SELECT o.i, rec.rem - least(rec.rem // rec.m, 4 * o.c),
         |    rec.m - 1, o.source, o.c,
         |    least(rec.rem // rec.m, 4 * o.c)
         |  FROM rec JOIN o ON o.i = rec.i + 1)
         |SELECT source, c, alloc,
         |  CAST((alloc * 1000000) // c AS BIGINT) AS epochs_micro
         |FROM rec WHERE i > 0 ORDER BY source""".stripMargin,

    "x_epoch_order" ->
      """WITH eps AS (SELECT unnest(range(0, 2)) AS epoch),
        |k AS (SELECT d.doc_id, CAST(e.epoch AS INTEGER) AS epoch,
        |    md5(CAST(d.doc_id AS VARCHAR) || ':' ||
        |        CAST(e.epoch AS VARCHAR) || ':order') AS kk
        |  FROM documents d CROSS JOIN eps e),
        |s AS (SELECT doc_id, epoch, kk,
        |    CAST((ascii(substr(kk, 1, 1)) * 256 + ascii(substr(kk, 2, 1))) % 4
        |      AS INTEGER) AS shard
        |  FROM k)
        |SELECT epoch, shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard
        |    ORDER BY kk, doc_id) AS INTEGER) AS position,
        |  doc_id
        |FROM s ORDER BY epoch, shard, position""".stripMargin,

    "x_temperature_mixture" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS wq
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(sum(wq) AS BIGINT) AS sw FROM c),
        |r AS (SELECT c.source, c.n,
        |    least(1.0, CAST(t.tot AS DOUBLE) * 0.5 * CAST(c.wq AS DOUBLE)
        |      / (CAST(t.sw AS DOUBLE) * CAST(c.n AS DOUBLE))) AS rate
        |  FROM c CROSS JOIN t),
        |k AS (SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r ON d.source = r.source
        |  WHERE r.rate >= 1.0 OR
        |    substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 4)
        |      < printf('%04x', CAST(floor(r.rate * 65536.0) AS INTEGER))
        |  GROUP BY d.source)
        |SELECT c.source, c.n AS n_orig,
        |  COALESCE(CAST(k.n_kept AS BIGINT), CAST(0 AS BIGINT)) AS n_kept
        |FROM c LEFT JOIN k ON c.source = k.source
        |ORDER BY c.source""".stripMargin,

    "x_feature_mi" -> {
      def miSql(fexpr: String, name: String): String =
        s"""SELECT feature, CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(tq) AS BIGINT) AS mi_q FROM (
           |  SELECT '$name' AS feature,
           |    CAST(round((CAST(n_fs AS DOUBLE) / CAST(n AS DOUBLE))
           |      * ln((CAST(n_fs AS DOUBLE) / CAST(n AS DOUBLE))
           |        / ((CAST(n_f AS DOUBLE) / CAST(n AS DOUBLE))
           |          * (CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))))
           |      * 1e9) AS BIGINT) AS tq
           |  FROM (SELECT $fexpr AS f, source AS s,
           |      CAST(count(*) AS BIGINT) AS n_fs FROM d GROUP BY 1, 2) c
           |  JOIN (SELECT $fexpr AS f, CAST(count(*) AS BIGINT) AS n_f
           |    FROM d GROUP BY 1) fm USING (f)
           |  JOIN (SELECT source AS s, CAST(count(*) AS BIGINT) AS n_s
           |    FROM d GROUP BY 1) sm USING (s)
           |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM d) t)
           |GROUP BY feature""".stripMargin
      s"""WITH d AS (SELECT source, lang,
         |    CAST(least(CAST(floor(length(text) / 100) AS BIGINT), 5)
         |      AS VARCHAR) AS len_b
         |  FROM documents)
         |SELECT * FROM (
         |${miSql("lang", "lang")}
         |UNION ALL
         |${miSql("len_b", "len_bucket")})
         |ORDER BY feature""".stripMargin
    },

    "x_hilbert_layout" -> {
      // the Hilbert xy2d recurrence unrolled level by level — identical
      // integer CASE arithmetic to Locality.hilbertValue2's fold; levels
      // MATERIALIZED so the per-level x/y references don't compound into
      // an exponential inlined expression
      val n1 = (1L << hBits) - 1
      def lev(i: Int, prev: String, name: String): String = {
        val s = 1L << i
        val ss = 1L << (2 * i)
        s"""$name AS MATERIALIZED (SELECT x0, y0,
           |  d + CAST($ss AS BIGINT) * (CASE WHEN (x & $s) = 0
           |    THEN (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)
           |    ELSE 3 - (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) END) AS d,
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0
           |    THEN $n1 - y ELSE y END) ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0
           |    THEN $n1 - x ELSE x END) ELSE y END AS y
           |  FROM $prev)""".stripMargin
      }
      val levels = ((hBits - 1) to 0 by -1).map { i =>
        val prev = if (i == hBits - 1) "lstart" else s"l${i + 1}"
        lev(i, prev, s"l$i")
      }.mkString(",\n")
      val zTerms = (0 until hBits).map(i =>
        s"((x0 >> $i) & 1) * CAST(${1L << (2 * i)} AS BIGINT) " +
          s"+ ((y0 >> $i) & 1) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
        .mkString(" + ")
      s"""WITH base0 AS (SELECT CAST(o_custkey AS BIGINT) AS rx,
         |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS ry
         |  FROM orders),
         |lims0 AS (SELECT max(rx) AS xm0, max(ry) AS ym0 FROM base0),
         |base AS (SELECT
         |    (rx * ${1L << hBits}) // (xm0 + 1) AS x,
         |    (ry * ${1L << hBits}) // (ym0 + 1) AS y
         |  FROM base0 CROSS JOIN lims0),
         |lstart AS (SELECT x AS x0, y AS y0, CAST(0 AS BIGINT) AS d, x, y
         |  FROM base),
         |$levels,
         |wz AS (SELECT x0 AS x, y0 AS y, d AS h, $zTerms AS z FROM l0),
         |m AS (SELECT max(h) AS hm, max(z) AS zm, max(x) AS xm FROM wz),
         |hs AS (SELECT CAST(sum(span) AS BIGINT) AS h_span_sum FROM (
         |  SELECT max(x) - min(x) + max(y) - min(y) AS span
         |  FROM wz CROSS JOIN m GROUP BY (h * $zBuckets) // (hm + 1))),
         |zs AS (SELECT CAST(sum(span) AS BIGINT) AS z_span_sum FROM (
         |  SELECT max(x) - min(x) + max(y) - min(y) AS span
         |  FROM wz CROSS JOIN m GROUP BY (z * $zBuckets) // (zm + 1))),
         |ns AS (SELECT CAST(sum(span) AS BIGINT) AS naive_span_sum FROM (
         |  SELECT max(x) - min(x) + max(y) - min(y) AS span
         |  FROM wz CROSS JOIN m GROUP BY (x * $zBuckets) // (xm + 1)))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_rows,
         |  hs.h_span_sum, zs.z_span_sum, ns.naive_span_sum,
         |  CAST(CASE WHEN hs.h_span_sum * 2 < ns.naive_span_sum
         |    THEN 1 ELSE 0 END AS INTEGER) AS locality_ok
         |FROM hs CROSS JOIN zs CROSS JOIN ns""".stripMargin
    },

    "x_zorder_layout" -> {
      // the Morton interleave as explicit integer bit terms — identical
      // arithmetic to Locality.zValue2
      val zTerms = (0 until zBits).map(i =>
        s"((x >> $i) & 1) * ${1L << (2 * i)} + ((y >> $i) & 1) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |wz AS (SELECT x, y, $zTerms AS z FROM base),
         |zm AS (SELECT max(z) AS zm, max(x) AS xm FROM wz),
         |zs AS (SELECT CAST(sum(span) AS BIGINT) AS z_span_sum FROM (
         |  SELECT max(x) - min(x) + max(y) - min(y) AS span
         |  FROM wz CROSS JOIN zm GROUP BY (z * $zBuckets) // (zm + 1))),
         |ns AS (SELECT CAST(sum(span) AS BIGINT) AS naive_span_sum FROM (
         |  SELECT max(x) - min(x) + max(y) - min(y) AS span
         |  FROM wz CROSS JOIN zm GROUP BY (x * $zBuckets) // (xm + 1)))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_rows,
         |  zs.z_span_sum, ns.naive_span_sum,
         |  CAST(CASE WHEN zs.z_span_sum * 2 < ns.naive_span_sum
         |    THEN 1 ELSE 0 END AS INTEGER) AS locality_ok
         |FROM zs CROSS JOIN ns""".stripMargin
    },

    "x_weighted_sample" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(LEAST(10, COUNT(*)) AS BIGINT) AS n_sampled,
        |  CAST(1 AS INTEGER) AS subset_ok, CAST(1 AS INTEGER) AS bias_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "x_weighted_reservoir" ->
      """WITH kq AS (SELECT doc_id, source, n_chars,
        |    CAST(-round(ln((CAST(('0x' || substr(md5(
        |        CAST(doc_id AS VARCHAR) || ':wsample'), 1, 13)) AS BIGINT)
        |        + 1.0) / power(16.0, 13)) * 1e6) AS BIGINT) AS pk
        |  FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      CASE WHEN n_chars <= 0 THEN 9223372036854775807
        |        ELSE (pk * 1000000) // CAST(n_chars AS BIGINT) END,
        |      doc_id) AS rn
        |  FROM kq)
        |SELECT source, doc_id, CAST(n_chars AS INTEGER) AS n_chars
        |FROM r WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,

    "x_split_leakage" ->
      s"""SELECT p.id_a, p.id_b, p.jaccard,
         |  sa.split AS split_a, sb.split AS split_b
         |FROM (${DedupQueries.jaccardPairsSql}) p
         |JOIN (SELECT doc_id, ${Sampling.splitSql("doc_id", weights)} AS split
         |      FROM documents) sa ON p.id_a = sa.doc_id
         |JOIN (SELECT doc_id, ${Sampling.splitSql("doc_id", weights)} AS split
         |      FROM documents) sb ON p.id_b = sb.doc_id
         |WHERE sa.split <> sb.split
         |ORDER BY id_a, id_b""".stripMargin,

    "x_shard_manifest" ->
      """SELECT doc_id % 16 AS shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(('0x' || substr(
        |    md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8)) AS BIGINT))
        |    AS BIGINT) AS checksum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "x_length_buckets" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |    ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_len,
        |  CAST(max(n_chars) AS BIGINT) AS max_len,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_len,
        |  CAST(count(*) * max(n_chars) - sum(n_chars) AS BIGINT)
        |    AS padding_overhead
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "x_split_stats" ->
      s"""SELECT ${Sampling.splitSql("doc_id", weights)} AS split, source,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x_stratified_check" ->
      """SELECT CAST(1 AS INTEGER) AS strata_ok, CAST(1 AS INTEGER) AS bands_ok,
        |  CAST(1 AS INTEGER) AS subset_ok""".stripMargin,

    // textbook window formulation — structurally independent of the
    // two-phase bucket-quota plan the engine runs
    "x_domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |    md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |      ORDER BY CAST(doc_id AS VARCHAR))) AS kept_fp
        |  FROM r WHERE rn <= 12 GROUP BY source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_orig, n_kept, kept_fp
        |FROM documents JOIN k USING (source)
        |GROUP BY source, n_kept, kept_fp
        |ORDER BY source""".stripMargin)
}
