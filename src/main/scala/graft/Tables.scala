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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS) which Spark 4
    * refuses to read natively; read it as long nanos and convert to a
    * micros-precision TimestampType column (integer division — a double
    * division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
