package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ablation profiler for the catalog append path: times the composite
  * `(days(ts), bucket(8,user_id))` append with commit-time features
  * toggled, to attribute the seconds between the parquet write itself,
  * the FileStats footer pass, and table layout shape. Harness only.
  *
  * Usage: sbt 'runMain graft.QProfile2 [sfDir]'
  */
object QProfile2 {
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
      println(f"[qp2] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    graft.sources.AtomicParquetCatalog.ensureRegistered(spark, "graft_ma")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ma.db")

    def seedComposite(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS graft_ma.db.$name")
      ev.where($"event_id" % 3 === 0)
        .writeTo(s"graft_ma.db.$name").using("parquet")
        .partitionedBy(days($"ts"), bucket(8, $"user_id")).createOrReplace()
    }

    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      // A: everything on (default)
      seedComposite("qa")
      t("append, fileStats ON (default)") {
        ev.where($"event_id" % 3 === 1).writeTo("graft_ma.db.qa").append()
      }
      // B: fileStats off
      spark.conf.set("spark.sql.catalog.graft.write.fileStats", "false")
      seedComposite("qb")
      t("append, fileStats OFF") {
        ev.where($"event_id" % 3 === 1).writeTo("graft_ma.db.qb").append()
      }
      spark.conf.unset("spark.sql.catalog.graft.write.fileStats")
      // C: plain days(ts) only append for comparison
      spark.sql("DROP TABLE IF EXISTS graft_ma.db.qc")
      ev.where($"event_id" % 3 === 0)
        .writeTo("graft_ma.db.qc").using("parquet")
        .partitionedBy(days($"ts")).createOrReplace()
      t("append, days-only spec") {
        ev.where($"event_id" % 3 === 1).writeTo("graft_ma.db.qc").append()
      }
      // D: raw parquet write of the same rows, same layout, no catalog
      t("raw partitionBy(days,bucket) write") {
        ev.where($"event_id" % 3 === 1)
          .withColumn("_d", to_date($"ts"))
          .withColumn("_b", pmod(hash($"user_id"), lit(8)))
          .repartition($"_d", $"_b")
          .write.mode("overwrite").partitionBy("_d", "_b")
          .parquet(s"/tmp/qp2_raw_$rep")
      }
    }
    spark.stop()
  }
}
