package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed transaction generator — the reference's Faker
  * script (`scripts/generate_test_data.py`) re-expressed Spark-first: every
  * field derives from xxhash64(record-id, seed), so generation runs on
  * executors (`spark.range` parallelizes), is reproducible, and scales to
  * any record count without a driver loop.
  *
  * Domains mirror the generator: 200 customers, 50 merchants, amounts
  * uniform(10, 5000) 2dp, timestamps in a 30-day window, and the same enum
  * sets (`generate_test_data.py:18-35`).
  */
object TransactionGen {

  private def pick(id: org.apache.spark.sql.Column, salt: Int,
      values: Seq[String]) = {
    val idx = pmod(xxhash64(id, lit(salt)), lit(values.size.toLong)).cast("int")
    element_at(array(values.map(lit): _*), idx + 1)
  }

  def generate(spark: SparkSession, numRecords: Long, seed: Int = 42,
      numCustomers: Int = 200, numMerchants: Int = 50,
      startDate: String = "2024-01-01 00:00:00"): DataFrame = {
    val id = col("id")
    def u(salt: Int, mod: Long) = pmod(xxhash64(id, lit(seed), lit(salt)), lit(mod))
    spark.range(numRecords).select(
      format_string("txn_%08d", id).as("transaction_id"),
      format_string("cust_%06d", u(1, numCustomers)).as("customer_id"),
      // uniform(10, 5000) rounded to 2dp, from a 0..499000 integer grid
      ((u(2, 499001).cast("double") / lit(100.0)) + lit(10.0)).as("amount"),
      date_format(
        timestamp_seconds(unix_timestamp(lit(startDate)) + u(3, 30L * 86400)),
        "yyyy-MM-dd HH:mm:ss").as("transaction_date"),
      pick(id, 4, Seq("purchase", "refund", "adjustment")).as("transaction_type"),
      format_string("merchant_%03d", u(5, numMerchants)).as("merchant_id"),
      pick(id, 6, Seq("credit_card", "debit_card", "paypal", "bank_transfer"))
        .as("payment_method"),
      lit("USD").as("currency"),
      pick(id, 7, Seq("completed", "pending", "failed")).as("status"),
      pick(id, 8, Seq("electronics", "clothing", "food", "books", "home"))
        .as("category"))
  }

  /** Write as JSONL in `batchSize`-record files (reference batches 100 per
    * file, `generate_test_data.py:45`) — repartitioned by record count so
    * file sizes are uniform.
    */
  def writeJsonl(df: DataFrame, path: String, batchSize: Int = 100): Unit = {
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / batchSize).toInt)
    df.repartition(files).write.mode("overwrite").json(path)
  }
}
