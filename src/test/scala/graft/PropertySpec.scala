package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageCodec, Multimodal}
import graft.ops.Sampling

/** Randomized-coverage checks (seeded, so failures reproduce) for the pure
  * driver-side kernels the distributed operators are built on: image codec
  * round-trips, resize mapping, split-cutoff construction. No SparkSession,
  * so hundreds of cases run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x5eed5eedL)

  test("PNG and BMP encode→decodePixels round-trips any pixel content") {
    for (_ <- 1 to 120) {
      val (w, h) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(40))
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      for (enc <- Seq(ImageCodec.encodePng(w, h, px(_)),
                      ImageCodec.encodeBmp(w, h, px(_)))) {
        ImageCodec.decodePixels(enc) match {
          case Some((dw, dh, out)) =>
            assert((dw, dh) == ((w, h)), s"dims for ${w}x$h")
            assert(out.toSeq == px.toSeq, s"pixels for ${w}x$h")
          case None => fail(s"decode failed for ${w}x$h")
        }
      }
    }
  }

  test("resizeNearest: every output pixel equals its floor-mapped source") {
    for (_ <- 1 to 120) {
      val (w, h) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(40))
      val (rw, rh) = (1 + rnd.nextInt(50), 1 + rnd.nextInt(50))
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val out = Multimodal.resizeNearest(px, w, h, rw, rh)
      assert(out.length == rw * rh * 3)
      for (y <- 0 until rh; x <- 0 until rw; c <- 0 until 3) {
        val (sx, sy) = (x * w / rw, y * h / rh)
        assert(out((y * rw + x) * 3 + c) == px((sy * w + sx) * 3 + c),
          s"(${w}x$h)->(${rw}x$rh) at ($x,$y,$c)")
      }
      assert(Multimodal.resizeNearest(px, w, h, w, h).toSeq == px.toSeq)
    }
  }

  test("URL canonicalization: random crawl decoration always collapses back " +
      "to the clean form, and the function is idempotent") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.UrlFunctions.canonicalizeUrl
    def seg(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def randCase(s: String) = s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    val track = Seq("utm_source=x", "utm_campaign=y", "gclid=abc", "fbclid=z", "ref=h")
    val pairs = (1 to 300).map { _ =>
      val scheme = if (rnd.nextBoolean()) "http" else "https"
      val host = seg(3 + rnd.nextInt(5)) + "." + (if (rnd.nextBoolean()) "com" else "org")
      val nSeg = rnd.nextInt(3)
      val path = if (nSeg == 0) "/"
        else (1 to nSeg).map(_ => "/" + seg(1 + rnd.nextInt(6))).mkString
      val params = (0 until rnd.nextInt(3)).map(i => s"k${rnd.nextInt(10)}$i=${seg(2)}")
      val clean = scheme + "://" + host + path +
        (if (params.isEmpty) "" else "?" + params.sorted.mkString("&"))
      val port = if (rnd.nextBoolean()) (if (scheme == "http") ":80" else ":443") else ""
      val messyHost = randCase((if (rnd.nextBoolean()) "www." else "") + host) + port
      val messyPath =
        if (nSeg == 0) (if (rnd.nextBoolean()) "" else "/") // bare authority too
        else (if (rnd.nextBoolean()) path.replaceFirst("/", "//") else path) +
          (if (rnd.nextBoolean()) "/" else "")
      val allParams = rnd.shuffle(params ++ track.take(rnd.nextInt(3)))
      val messy = randCase(scheme) + "://" + messyHost + messyPath +
        (if (allParams.isEmpty) "" else "?" + allParams.mkString("&")) +
        (if (rnd.nextBoolean()) "#frag" else "")
      (clean, messy)
    }
    val out = pairs.toDF("clean", "messy")
      .select(col("clean"), canonicalizeUrl(col("messy")).as("c1"))
      .withColumn("c2", canonicalizeUrl(col("c1")))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"decorated form did not canonicalize back: $r")
      assert(r.getString(2) == r.getString(1), s"not idempotent: $r")
    }
  }

  test("hexCutoffs: strictly increasing, total, and no split silently empty") {
    for (it <- 1 to 300) {
      val n = 1 + rnd.nextInt(12)
      // include adversarial skew: tiny and huge weights in one vector
      val weights = (0 until n).map { i =>
        val w = if (rnd.nextBoolean()) math.pow(10, -rnd.nextInt(6).toDouble)
          else 1.0 + rnd.nextDouble() * 99
        (s"s$i", w)
      }
      val cuts = Sampling.hexCutoffs(weights)
      assert(cuts.map(_._1) == weights.map(_._1))
      val numeric = cuts.map { case (_, c) =>
        if (c == "g") 256 else Integer.parseInt(c, 16)
      }
      assert(numeric.last == 256, s"case $it: last cut ${numeric.last}")
      assert(numeric == numeric.sorted && numeric.distinct == numeric,
        s"case $it: cuts not strictly increasing: $numeric for $weights")
      val owned = numeric.zip(0 +: numeric.init).map { case (c, p) => c - p }
      assert(owned.forall(_ >= 1), s"case $it: empty split: $owned for $weights")
    }
  }

  test("TopKBuffer: any split into partial heaps + serialization round-trip " +
      "equals the brute-force top-k, both directions") {
    import org.apache.spark.sql.graftx.{BoundedTopKAgg, TopKBuffer}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = BoundedTopKAgg(Literal(0.0), Literal(0L), k = 1, desc = false)
    def roundTrip(b: TopKBuffer): TopKBuffer =
      BoundedTopKAgg(Literal(0.0), Literal(0L), b.k, b.desc)
        .deserialize(b.serialized)
    identity(agg) // anchor the import
    for (it <- 1 to 80) {
      val n = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(20)
      val desc = rnd.nextBoolean()
      // heavy ties: scores from a small set force the id tie-break
      val rows = Seq.fill(n)((rnd.nextInt(7).toDouble, rnd.nextLong().abs))
        .distinctBy(_._2)
      // random partitioning into 1..6 partial buffers, merged pairwise
      val parts = rows.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(6)))
        .values.toSeq
      val merged = parts.map { chunk =>
        val b = new TopKBuffer(k, desc)
        chunk.foreach { case (s, i) => b.insert(s, i) }
        roundTrip(b) // every partial passes through serialization
      }.reduce { (a, b) => a.mergeFrom(b); a }
      val got = merged.ranked.toSeq
      val want = (if (desc) rows.sortBy { case (s, i) => (-s, i) }
        else rows.sortBy(identity)).take(k)
      assert(got == want, s"case $it: n=$n k=$k desc=$desc")
    }
  }

  test("SpaceSavingBuffer: bounds and guaranteed hitters hold for any " +
      "stream split and merge order") {
    import org.apache.spark.sql.graftx.SpaceSavingBuffer
    for (it <- 1 to 60) {
      val n = 50 + rnd.nextInt(2000)
      val cap = 4 + rnd.nextInt(24)
      // zipf-ish keys so true heavy hitters exist
      val stream = Seq.fill(n)(s"k${(math.sqrt(rnd.nextInt(900)).toInt)}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = stream.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(8)))
        .values.toSeq
      val merged = parts.map { chunk =>
        val b = new SpaceSavingBuffer(cap)
        chunk.foreach(b.add(_, 1L))
        b
      }.reduce { (a, b) => a.mergeFrom(b); a }
      val got = merged.ranked
      assert(got.size <= cap)
      got.foreach { case (key, cnt, err) =>
        assert(cnt >= truth(key), s"case $it: $key underestimated")
        assert(cnt - err <= truth(key), s"case $it: $key lower bound broken")
      }
      val must = truth.filter(_._2 > n.toLong / cap).keySet
      val present = got.map(_._1).toSet
      assert(must.subsetOf(present),
        s"case $it: missing guaranteed hitters ${must -- present} (cap $cap)")
    }
  }
}
