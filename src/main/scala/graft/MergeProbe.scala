package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: minimal MERGE INTO probes against the atomic catalog
  * (not part of the driver contract). */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.conf.set("spark.sql.catalog.graft_ma",
      "graft.sources.AtomicParquetCatalog")
    spark.conf.set("spark.sql.catalog.graft_ma.warehouse",
      java.nio.file.Files.createTempDirectory("graft_ma_probe").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ma.db")

    // tiny synthetic case first
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (100L, 5.0, "C"))
      .toDF("c_custkey", "balance", "segment")
      .writeTo("graft_ma.db.mini").using("parquet").createOrReplace()
    Seq((1L, 3.0, 2L), (2L, 7.0, 9L), (42L, 1.0, 1L))
      .toDF("o_custkey", "spent", "n_orders")
      .createOrReplaceTempView("mini_src")
    val mergeSql = """MERGE INTO graft_ma.db.mini t
                |USING mini_src s
                |ON t.c_custkey = s.o_custkey
                |WHEN MATCHED AND s.n_orders >= 8 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET balance = t.balance + s.spent
                |WHEN NOT MATCHED THEN
                |  INSERT (c_custkey, balance, segment)
                |  VALUES (s.o_custkey, s.spent, 'NEW')
                |WHEN NOT MATCHED BY SOURCE AND t.c_custkey % 100 = 0 THEN
                |  UPDATE SET balance = CAST(0.0 AS DOUBLE)
                |""".stripMargin
    val analyzed = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(mergeSql)).analyzed
    analyzed.collect {
      case rd: org.apache.spark.sql.catalyst.plans.logical.ReplaceData =>
        println(s"[probe] ReplaceData.query.output = " +
          rd.query.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
        println(s"[probe] rowProjection schema = " +
          rd.projections.rowProjection.schema.map(_.name).mkString(", "))
        println(s"[probe] metadataProjection = ${rd.projections.metadataProjection}")
    }
    spark.sql(mergeSql)
    val got = spark.table("graft_ma.db.mini").orderBy("c_custkey")
      .as[(Long, Double, String)].collect().toSeq
    println(s"[probe] mini result: $got")
    val want = Seq((1L, 13.0, "A"), (42L, 1.0, "NEW"), (100L, 0.0, "C"))
    assert(got == want, s"mini merge wrong: $got vs $want")
    println("[probe] mini MERGE OK")

    // now the real q69 over testdata
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = graft.ops.Extras.q69MergeInto(spark, dir)
    println(s"[probe] q69 rows: ${out.count()}")
    out.show(5)
    spark.stop()
  }
}
