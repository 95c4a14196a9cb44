package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AGGREGATE PUSHDOWN through the catalog scan: with
  * `spark.sql.parquet.aggregatePushdown` on, COUNT(*)/MIN/MAX over a
  * catalog table are answered from parquet FOOTER metadata — the scan
  * reports `PushedAggregation` and materializes one pre-aggregated row
  * per file instead of the rows themselves. At 100 TB that is the
  * difference between a count being a metadata sweep and a full table
  * read. The catalog's [[graft.sources.KeyGroupedParquetScanBuilder]]
  * forwards `SupportsPushDownAggregates` to Spark's parquet builder,
  * so the whole machinery composes with snapshot pinning. */
class AggPushdownSpec extends AnyFunSuite {
  lazy val warehouse: String =
    Files.createTempDirectory("graft_ap_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_ap",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_ap.warehouse", warehouse)
    s
  }

  test("COUNT/MIN/MAX are answered from footers (PushedAggregation)") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ap.db")
    (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartition(4)
      .writeTo("graft_ap.db.t").using("parquet").createOrReplace()
    val prior = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.sql(
        "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi " +
          "FROM graft_ap.db.t")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)") ||
        plan.contains("PushedAggregation: [COUNT(1)"),
        s"aggregate not pushed:\n$plan")
      assert(df.collect().head.toSeq === Seq(1000L, 1L, 1000L))
      // still snapshot-correct: an append is visible to a NEW query,
      // and the pushed result matches the unpushed one
      spark.sql("INSERT INTO graft_ap.db.t VALUES (1001, 2002.0)")
      assert(spark.sql("SELECT count(*) FROM graft_ap.db.t")
        .head().getLong(0) === 1001L)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      assert(spark.sql("SELECT count(*) FROM graft_ap.db.t")
        .head().getLong(0) === 1001L)
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
      case None => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    }
  }
}
