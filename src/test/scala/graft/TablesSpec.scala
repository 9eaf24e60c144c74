package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]]'s ts-type dispatch. The testdata generator has
  * shipped events.parquet with different ts physical types across rounds
  * (TIMESTAMP(NANOS) in r1–r6, micros NTZ in r7 — the r7 regression broke
  * all 35 events-based operators because the loader assumed one shape).
  * Every generation must read back to the SAME TimestampNTZType micros
  * view with identical values.
  */
class TablesSpec extends GraftSpec {

  private def writeAndLoad(dir: String)(write: String => Unit) = {
    write(dir)
    Tables.events(spark, dir)
  }

  private val wantMicros = Seq(
    1700000000000000L, // 2023-11-14T22:13:20
    1700000000123456L, // sub-second micros survive
    0L)                // epoch

  test("events(): micros-NTZ generation (r7+) reads as-is") {
    val dir = java.nio.file.Files.createTempDirectory("tables-ntz").toString
    val got = writeAndLoad(dir) { d =>
      spark.range(wantMicros.size)
        .select(col("id").as("event_id"),
          expr(s"CAST(timestamp_micros(element_at(array(${wantMicros
            .mkString(",")}), int(id) + 1)) AS TIMESTAMP_NTZ)").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got.schema("ts").dataType == TimestampNTZType)
    val micros = got.select(expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(micros == wantMicros.sorted)
  }

  test("events(): nanos-as-long generation (r1-r6) truncates ns -> us") {
    val dir = java.nio.file.Files.createTempDirectory("tables-ns").toString
    // The legacy nanosAsLong read surfaces TIMESTAMP(NANOS) as a plain
    // int64 column; writing int64 directly exercises the identical
    // LongType branch the legacy read lands in.
    val nanos = wantMicros.map(_ * 1000L + 789L) // sub-us digits to drop
    val got = writeAndLoad(dir) { d =>
      spark.range(nanos.size)
        .select(col("id").as("event_id"),
          expr(s"element_at(array(${nanos.map(_ + "L").mkString(",")}), " +
            "int(id) + 1)").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got.schema("ts").dataType == TimestampNTZType)
    val micros = got.select(expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(micros == wantMicros.sorted, "ns -> us truncation drifted")
  }

  test("events(): TZ-adjusted micros generation casts to NTZ") {
    val dir = java.nio.file.Files.createTempDirectory("tables-tz").toString
    val got = writeAndLoad(dir) { d =>
      // a TimestampType write produces isAdjustedToUTC=true micros,
      // which reads back as TimestampType -> the catch-all branch
      spark.range(wantMicros.size)
        .select(col("id").as("event_id"),
          expr(s"timestamp_micros(element_at(array(${wantMicros
            .mkString(",")}), int(id) + 1))").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got.schema("ts").dataType == TimestampNTZType)
    val micros = got.select(expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .collect().map(_.getLong(0)).sorted.toSeq
    // UTC session (GraftSpec pins it): cast is value-preserving
    assert(micros == wantMicros.sorted)
  }

  test("load(): clean schema returns the raw scan, drifted types pin") {
    // clean: the real testdata must come back cast-free (same analyzed
    // plan as a raw read — the no-op Project would break plan-identity
    // cache sharing and pushdown comparisons)
    val clean = Tables.load(spark, sfDir, "customer")
    val raw = spark.read.parquet(s"$sfDir/customer.parquet")
    assert(clean.queryExecution.analyzed.sameResult(
      raw.queryExecution.analyzed), "clean load must not add a Project")
    // drifted: a regenerated file with narrowed/widened types must load
    // with every known column pinned back to the canonical type
    val dir = java.nio.file.Files.createTempDirectory("tables-drift")
    val sub = new java.io.File(dir.toFile, "sf")
    raw.limit(10)
      .selectExpr("CAST(c_custkey AS INT) AS c_custkey", "c_name",
        "CAST(c_nationkey AS BIGINT) AS c_nationkey",
        "CAST(c_acctbal AS FLOAT) AS c_acctbal", "c_mktsegment")
      .write.parquet(s"$sub/customer.parquet")
    val pinned = Tables.load(spark, sub.toString, "customer")
    assert(pinned.schema("c_custkey").dataType == LongType)
    assert(pinned.schema("c_nationkey").dataType == IntegerType)
    assert(pinned.schema("c_acctbal").dataType == DoubleType)
    assert(pinned.count() == 10)
  }
}
