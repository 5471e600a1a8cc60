package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] receive an `sfDir` like
  * `/root/testdata/sf0.01` and read one parquet file per table. At cluster
  * scale these would be partitioned directories; `spark.read.parquet` handles
  * both transparently.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped with two `ts` encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses to read
    * natively — read as long nanos and integer-divide to micros; a double
    * division would lose precision above 2^53 ns) and plain TIMESTAMP(MICROS)
    * (read natively as TIMESTAMP_NTZ). Normalize both to a micros-precision
    * TimestampType column; with the UTC session timezone every builder sets,
    * the NTZ→TZ cast is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
