package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-clustered partitioned writes (Iceberg's
  * `write.distribution-mode=hash` posture): with
  * `spark.sql.catalog.graft.write.clusterByPartitions=true` every
  * partition value lands from ONE task, so a P-partition write produces
  * ~P files instead of (tasks x P) — the small-files explosion that
  * dominates write cost and ruins scan/compaction behavior at 100 TB.
  * Off by default (gate-scale writes price the exchange-free path). */
class WriteDistributionSpec extends AnyFunSuite {
  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_wd_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_wd",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_wd.warehouse", warehouse)
    s
  }

  private def dataFiles(table: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(warehouse, "db", table)
    val current = java.nio.file.Files.readAllLines(dir.resolve("_current"))
      .get(0).trim
    val walk = java.nio.file.Files.walk(dir.resolve(current))
    try walk.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet")
    }.toSeq
    finally walk.close()
  }

  test("clustered write lands one file per partition value") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_wd.db")
    spark.conf.set("spark.sql.catalog.graft.write.clusterByPartitions",
      "true")
    try {
      // 4 input tasks x 3 partition values: unclustered this writes up
      // to 12 files; clustered, each value lands from one task = 3
      (1L to 300L).map(i => (i % 3, i)).toDF("k", "v")
        .repartition(4) // force multi-task input
        .writeTo("graft_wd.db.cl1").using("parquet")
        .partitionedBy($"k").createOrReplace()
      val files = dataFiles("cl1")
      assert(files.size == 3,
        s"expected 3 files (one per partition value), got ${files.size}:\n" +
          files.mkString("\n"))
      assert(spark.table("graft_wd.db.cl1").count() == 300)
    } finally spark.conf
      .unset("spark.sql.catalog.graft.write.clusterByPartitions")
    spark.sql("DROP TABLE graft_wd.db.cl1")
  }

  test("default write is unclustered (no extra exchange) and correct") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_wd.db")
    (1L to 300L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(4)
      .writeTo("graft_wd.db.cl2").using("parquet")
      .partitionedBy($"k").createOrReplace()
    assert(dataFiles("cl2").size > 3,
      "default path unexpectedly clustered — the conf gate leaks")
    assert(spark.table("graft_wd.db.cl2").count() == 300)
    spark.sql("DROP TABLE graft_wd.db.cl2")
  }
}
