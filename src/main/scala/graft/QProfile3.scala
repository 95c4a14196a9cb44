package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tests the AQE-coalesce hypothesis on the clustered catalog write:
  * `repartition(dirCols)` (AQE free to coalesce to 1 task on tiny
  * input) vs `repartition(n, dirCols)` (pinned width). Harness only.
  */
object QProfile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[qp3] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .where($"event_id" % 3 === 1)
      .withColumn("_d", to_date($"ts"))
      .withColumn("_b", pmod(hash($"user_id"), lit(8)))

    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      t("repartition(cols) [AQE may coalesce]") {
        ev.repartition($"_d", $"_b")
          .write.mode("overwrite").partitionBy("_d", "_b")
          .parquet("/tmp/qp3_a")
      }
      t("repartition(32, cols) [pinned]") {
        ev.repartition(32, $"_d", $"_b")
          .write.mode("overwrite").partitionBy("_d", "_b")
          .parquet("/tmp/qp3_b")
      }
      t("repartition(cols), AQE coalesce OFF") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", "false")
        try ev.repartition($"_d", $"_b")
          .write.mode("overwrite").partitionBy("_d", "_b")
          .parquet("/tmp/qp3_c")
        finally spark.conf.unset(
          "spark.sql.adaptive.coalescePartitions.enabled")
      }
      // how many files did each produce?
      def nf(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists) -1
        else {
          def walk(f: java.io.File): Long =
            if (f.isDirectory) f.listFiles.map(walk).sum
            else if (f.getName.endsWith(".parquet")) 1L else 0L
          walk(d)
        }
      }
      println(s"[qp3] files a=${nf("/tmp/qp3_a")} b=${nf("/tmp/qp3_b")} c=${nf("/tmp/qp3_c")}")
    }
    spark.stop()
  }
}
