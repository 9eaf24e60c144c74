package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Canonical column types per table, as shipped by the generator.
    * Testdata regenerations have changed physical types between rounds
    * (round 7: events.ts TIMESTAMP(NANOS) → micros NTZ broke every
    * events query at ANALYSIS time). [[load]] pins each known column to
    * its canonical type with a PLAN-TIME decision: when the on-disk
    * schema already matches — the normal case — the frame is returned
    * untouched (not even a no-op Project), so scans, pushdown and plan
    * caching are byte-identical to a raw read; under drift the affected
    * columns get a cast and the engine degrades gracefully instead of
    * failing. (ts is excluded — its generation dispatch needs the
    * legacy-flag read in [[events]].)
    */
  private val canonical: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val pins = canonical.getOrElse(name, Nil).filter { case (c, t) =>
      raw.schema.exists(f => f.name == c && f.dataType != t)
    }
    if (pins.isEmpty) raw
    else pins.foldLeft(raw) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t))
    }
  }

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
  /** events.parquet's ts physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long via the legacy flag, truncate to
    * micros) and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (which
    * Spark reads natively as TIMESTAMP_NTZ). Dispatch on the type the
    * reader actually inferred and normalize every generation to the
    * same TIMESTAMP_NTZ micros view — the representation DuckDB's
    * naive-timestamp read produces, so both engines see identical
    * values regardless of which generation is on disk.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long
        raw.withColumn("ts",
          expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case org.apache.spark.sql.types.TimestampNTZType => raw
      case _ => // TZ-adjusted micros: value-preserving under UTC sessions
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
