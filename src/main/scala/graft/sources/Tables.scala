package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * cluster scale these would be partitioned directories; everything
  * downstream only assumes "a DataFrame with this schema", so swapping in
  * a partitioned/bucketed catalog table changes nothing above this layer.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Redistribute a scan whose parallelism falls short of the session's
    * — the testdata files are single-row-group parquet (unsplittable →
    * one-partition scans), so a CPU-heavy narrow pipeline (parsing,
    * shingling, signatures, vector math) would otherwise run on one
    * core until its first exchange. Apply ONLY at the head of such
    * pipelines: for cheap scan+aggregate queries the extra exchange
    * costs more than the serial map. On a real deployment file/
    * row-group counts exceed core counts and this is a no-op — the
    * condition, not the repartition, is the contract. (Round-robin
    * repartition is deterministic: Spark sorts partition input before
    * redistributing, and every operator downstream is partition-order
    * independent by design.)
    */
  def parallelized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val scanParts = df.rdd.getNumPartitions
    val target = spark.sparkContext.defaultParallelism
    if (scanParts * 2 <= target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy flag) and truncate to
    * micros NTZ — the same ns→µs truncation DuckDB applies, so both
    * engines see identical values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
