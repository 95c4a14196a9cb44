package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure commit-overhead probe: tiny (1-row / 1k-row) catalog writes and
  * appends in a loop, timed individually — the fixed per-commit cost
  * every one of the ~40 catalog gates pays several times. Harness only.
  */
object QProfile6 {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qp6] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()
    graft.sources.AtomicParquetCatalog.ensureRegistered(spark, "graft_ma")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ma.db")

    val one = spark.range(1).select($"id", lit("x").as("s"))
    spark.sql("DROP TABLE IF EXISTS graft_ma.db.tiny")
    t("createOrReplace 1 row (cold)") {
      one.writeTo("graft_ma.db.tiny").using("parquet").createOrReplace()
    }
    (1 to 5).foreach { i =>
      t(s"append 1 row #$i") {
        one.writeTo("graft_ma.db.tiny").append()
      }
    }
    // unpartitioned 100k rows
    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    spark.sql("DROP TABLE IF EXISTS graft_ma.db.evu")
    t("createOrReplace events unpart") {
      ev.writeTo("graft_ma.db.evu").using("parquet").createOrReplace()
    }
    (1 to 3).foreach { i =>
      t(s"append 1-row to events unpart #$i") {
        ev.limit(1).writeTo("graft_ma.db.evu").append()
      }
    }
    // bucket(8) partitioned
    spark.sql("DROP TABLE IF EXISTS graft_ma.db.evb")
    t("createOrReplace events bucket(8)") {
      ev.writeTo("graft_ma.db.evb").using("parquet")
        .partitionedBy(bucket(8, $"user_id")).createOrReplace()
    }
    (1 to 3).foreach { i =>
      t(s"append third to bucket(8) #$i") {
        ev.where($"event_id" % 3 === 1)
          .writeTo("graft_ma.db.evb").append()
      }
    }
    // raw parquet 1-row write as the floor
    (1 to 3).foreach { i =>
      t(s"raw parquet 1-row write #$i") {
        one.write.mode("overwrite").parquet(s"/tmp/qp6_raw")
      }
    }
    spark.stop()
  }
}
