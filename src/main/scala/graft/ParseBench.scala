package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
    val one = graft.operators.CloudFrontPack.synthLines(ev)
    val lines = (1 to 20).map(_ => one).reduce(_ union _)
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = lines.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val c = graft.cloudfront.CloudFrontLogs.parse(lines)
        .agg(sum(col("sc_bytes")), count(col("c_ip"))).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pbench] run$i n=$n parse+agg ${dt}%.2f s = ${n / dt / 1e6}%.2f M lines/s (32 cores)")
    }
    spark.stop()
  }
}
