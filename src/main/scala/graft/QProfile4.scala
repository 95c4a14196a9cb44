package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for st16 (native streaming sink) and s05/t11/d13
  * (the non-catalog heavy gates): where do the pinned seconds go.
  * Harness only.
  */
object QProfile4 {
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
      println(f"[qp4] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { rep =>
      println(s"== st16 phases, rep $rep ==")
      graft.sources.AtomicParquetCatalog.ensureRegistered(spark, "graft_st")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_st.db")
      val ev = Tables.load(spark, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value")
      t("seed src bucket(8)") {
        ev.where($"event_id" % 3 === 0)
          .writeTo("graft_st.db.ev_nsrc").using("parquet")
          .partitionedBy(bucket(8, $"user_id")).createOrReplace()
      }
      t("seed sink empty") {
        ev.limit(0).writeTo("graft_st.db.ev_nsink").using("parquet")
          .partitionedBy(bucket(8, $"user_id")).createOrReplace()
      }
      val nFiles = t("count src files") {
        spark.sql("SELECT count(*) FROM graft_st.db.ev_nsrc.files")
          .head().getLong(0)
      }
      println(s"[qp4] src files: $nFiles")
      val mft = math.max(1L, nFiles / 3).toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_qp4_ckpt").toString
      def drainNative(tag: String): Unit = t(s"drain $tag") {
        val q = spark.readStream
          .option("maxFilesPerTrigger", mft)
          .table("graft_st.db.ev_nsrc")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_st.db.ev_nsink")
        q.awaitTermination(120000)
        q.stop()
      }
      drainNative("1 (seed third)")
      t("append third 1") {
        ev.where($"event_id" % 3 === 1).writeTo("graft_st.db.ev_nsrc").append()
      }
      t("append third 2") {
        ev.where($"event_id" % 3 === 2).writeTo("graft_st.db.ev_nsrc").append()
      }
      drainNative("2 (two thirds)")
      t("final agg") {
        spark.table("graft_st.db.ev_nsink")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"event_id").as("n_distinct"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
