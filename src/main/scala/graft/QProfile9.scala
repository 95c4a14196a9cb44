package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Confirms the single-scan-task hypothesis for the explode-heavy text
  * operators that read the one-file documents table directly: times
  * duplicateSpans as-is vs with a pre-repartitioned input. Harness only.
  */
object QProfile9 {
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
      println(f"[qp9] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    val docs = Tables.load(spark, dir, "documents")
    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      t("duplicateSpans(docs) as-is") {
        graft.api.Graft.duplicateSpans(docs, $"doc_id", $"text", window = 20)
          .write.format("noop").mode("overwrite").save()
      }
      t("duplicateSpans(docs.repartition(32))") {
        graft.api.Graft.duplicateSpans(docs.repartition(32), $"doc_id",
            $"text", window = 20)
          .write.format("noop").mode("overwrite").save()
      }
      t("exciseDuplicateSpans as-is") {
        graft.api.Graft.exciseDuplicateSpans(docs, $"doc_id", $"text",
            window = 20)
          .write.format("noop").mode("overwrite").save()
      }
      t("exciseDuplicateSpans repartitioned") {
        graft.api.Graft.exciseDuplicateSpans(docs.repartition(32), $"doc_id",
            $"text", window = 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
