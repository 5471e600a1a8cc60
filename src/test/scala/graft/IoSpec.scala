package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Aggregations

/** Format interop (CSV/JSON/parquet roundtrips preserve the silver schema)
  * and the approximate-distinct scale path.
  */
class IoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CSV roundtrip preserves values with explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = graft.datagen.TransactionGen.generate(spark, 100)
    df.write.option("header", "true").csv(s"$dir/out")
    val back = spark.read.schema(df.schema).option("header", "true")
      .csv(s"$dir/out")
    assert(back.count() == 100)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("ORC roundtrip preserves values and schema") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = graft.datagen.TransactionGen.generate(spark, 100)
    df.write.orc(s"$dir/out")
    val back = spark.read.orc(s"$dir/out")
    // a format read is always nullable — compare names and types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("approx_count_distinct path: HLL counts within 5% of exact on daily agg") {
    val silver = graft.datagen.TransactionGen.generate(spark, 2000)
      .withColumn("transaction_date", to_timestamp($"transaction_date"))
      .transform(d => graft.ops.Derivations.withDateParts(d))
    val exact = Aggregations.daily(silver)
      .agg(sum("unique_transactions")).as[Long].head()
    val approx = Aggregations.daily(silver, approxDistinct = true)
      .agg(sum("unique_transactions")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
