package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Focused sub-step profiler for the catalog-gate family (q91/q105
  * shape): times each phase of the gate body separately so the
  * optimization work knows whether the seconds go to the seeding
  * writes, the CALL procedures, the row-level ops, or the final read.
  * Harness only — not part of the driver contract.
  *
  * Usage: sbt 'runMain graft.QProfile [sfDir]'
  */
object QProfile {
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
      println(f"[qprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warmup (codegen/session costs off the first phase)
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { rep =>
      println(s"== q91 shape, rep $rep ==")
      graft.sources.AtomicParquetCatalog.ensureRegistered(spark, "graft_ma")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ma.db")
      spark.sql("DROP TABLE IF EXISTS graft_ma.db.evolve")
      val ev = Tables.load(spark, dir, "events")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      t("createOrReplace days(ts)") {
        ev.where($"event_id" % 3 === 0)
          .writeTo("graft_ma.db.evolve").using("parquet")
          .partitionedBy(days($"ts")).createOrReplace()
      }
      t("CALL evolve_layout") {
        spark.sql("CALL graft_ma.system.evolve_layout('db.evolve', " +
          "'days(ts), bucket(8,user_id)')").collect()
      }
      t("append third 1") {
        ev.where($"event_id" % 3 === 1).writeTo("graft_ma.db.evolve").append()
      }
      t("append third 2") {
        ev.where($"event_id" % 3 === 2).writeTo("graft_ma.db.evolve").append()
      }
      t("final agg read") {
        spark.table("graft_ma.db.evolve")
          .where($"ts" >= lit("2024-01-08 00:00:00").cast(TimestampType) &&
            $"ts" < lit("2024-01-22 00:00:00").cast(TimestampType))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"event_id").as("n_distinct"))
          .write.format("noop").mode("overwrite").save()
      }
      println(s"== q105 extra phases, rep $rep ==")
      spark.sql("DROP TABLE IF EXISTS graft_ma.db.unify")
      t("u: seed days(ts)") {
        ev.where($"event_id" % 3 === 0)
          .writeTo("graft_ma.db.unify").using("parquet")
          .partitionedBy(days($"ts")).createOrReplace()
      }
      t("u: evolve") {
        spark.sql("CALL graft_ma.system.evolve_layout('db.unify', " +
          "'days(ts), bucket(8,user_id)')").collect()
      }
      t("u: append 2/3") {
        ev.where($"event_id" % 3 =!= 0).writeTo("graft_ma.db.unify").append()
      }
      spark.conf.set("spark.sql.catalog.graft.write.deleteMode", "merge-on-read")
      t("u: MoR DELETE") {
        try spark.sql("DELETE FROM graft_ma.db.unify " +
          "WHERE user_id >= 10 AND user_id <= 40")
        finally spark.conf.unset("spark.sql.catalog.graft.write.deleteMode")
      }
      t("u: CALL unify_layout") {
        spark.sql("CALL graft_ma.system.unify_layout('db.unify')").collect()
      }
      t("u: deletes count") {
        spark.table("graft_ma.db.unify.deletes").count()
      }
      t("u: final agg read") {
        spark.table("graft_ma.db.unify")
          .where($"ts" >= lit("2024-01-08 00:00:00").cast(TimestampType) &&
            $"ts" < lit("2024-01-22 00:00:00").cast(TimestampType))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
