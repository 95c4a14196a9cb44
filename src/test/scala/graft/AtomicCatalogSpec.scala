package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The atomic-replace contract of graft.sources.AtomicParquetCatalog —
  * the claims Pipeline's docs could previously only assert are exercised
  * here: RTAS plans through the STAGED (atomic) path, a failed replace
  * leaves the committed table untouched, a reader pinned before the swap
  * still reads its full old version afterwards, and INSERT OVERWRITE
  * swaps atomically too. Plus the medallion integration: silver+gold run
  * against this catalog through Pipeline.writeTable's V2 RTAS branch.
  */
class AtomicCatalogSpec extends AnyFunSuite {
  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_atomic_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_atomic",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_atomic.warehouse", warehouse)
    s
  }

  test("createOrReplace is staged RTAS: readable, partitioned, replaceable") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_atomic.db")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "part", "v")
      .writeTo("graft_atomic.db.t1").using("parquet")
      .partitionedBy(col("part"))
      .createOrReplace()
    val got = spark.table("graft_atomic.db.t1").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    // partition filter prunes to the matching rows
    val aOnly = spark.table("graft_atomic.db.t1")
      .where($"part" === "a").select(sum($"v")).head().getDouble(0)
    assert(aOnly == 40.0)
    // the plan is the ATOMIC exec, not drop-then-create (V2 commands run
    // eagerly at planning, so this both inspects AND executes the replace)
    val qe = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(
        "REPLACE TABLE graft_atomic.db.t1 USING parquet AS SELECT 1 AS id"))
    assert(qe.executedPlan.toString.contains("AtomicReplaceTableAsSelect"),
      s"RTAS did not plan through the staged path:\n${qe.executedPlan}")
    assert(spark.table("graft_atomic.db.t1").collect().map(_.getInt(0)).toSeq
      == Seq(1))
  }

  test("a failed RTAS leaves the committed version untouched") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_atomic.db")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .writeTo("graft_atomic.db.t2").using("parquet").createOrReplace()
    val boom = udf((i: Long) => {
      if (i > 2) throw new RuntimeException("mid-write failure"); i
    })
    intercept[Exception] {
      spark.range(10).select(boom($"id").as("id"), lit(9.9).as("v"))
        .writeTo("graft_atomic.db.t2").using("parquet").createOrReplace()
    }
    val after = spark.table("graft_atomic.db.t2").orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(after == Seq((1L, 1.0), (2L, 2.0)),
      s"failed replace corrupted the table: $after")
  }

  test("a reader pinned before the swap keeps its full old version") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_atomic.db")
    spark.range(100).select($"id", lit("old").as("tag"))
      .writeTo("graft_atomic.db.t3").using("parquet").createOrReplace()
    // pin a reader (resolves _current at load)
    val pinned = spark.table("graft_atomic.db.t3").cache()
    assert(pinned.count() == 100)
    // swap to a new version underneath it
    spark.range(7).select($"id", lit("new").as("tag"))
      .writeTo("graft_atomic.db.t3").using("parquet").createOrReplace()
    // the pinned reader still serves its complete old version (the old
    // directory is immutable and never deleted by a commit)...
    pinned.unpersist()
    assert(pinned.count() == 100, "pinned reader tore across versions")
    assert(pinned.where($"tag" === "new").count() == 0)
    // ...while a fresh load sees the new version, completely
    val fresh = spark.table("graft_atomic.db.t3")
    assert(fresh.count() == 7)
    assert(fresh.where($"tag" =!= "new").count() == 0)
  }

  test("INSERT INTO appends; INSERT OVERWRITE swaps atomically") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_atomic.db")
    Seq((1L, "x")).toDF("id", "s")
      .writeTo("graft_atomic.db.t4").using("parquet").createOrReplace()
    spark.sql("INSERT INTO graft_atomic.db.t4 VALUES (2, 'y')")
    assert(spark.table("graft_atomic.db.t4").count() == 2)
    spark.sql("INSERT OVERWRITE graft_atomic.db.t4 VALUES (9, 'z')")
    val after = spark.table("graft_atomic.db.t4")
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((9L, "z")))
  }

  test("medallion silver+gold run through the V2 RTAS path on this catalog") {
    val base = java.nio.file.Files.createTempDirectory("graft_atomic_mdp").toString
    val cfg = graft.medallion.MdpConfig.fromEnv(base).copy(
      ingestGb = 0.001, payloadKb = 1, partitions = 4,
      catalog = "graft_atomic")
    graft.medallion.Pipeline.bronze(spark, cfg)
    graft.medallion.Pipeline.silver(spark, cfg)
    graft.medallion.Pipeline.gold(spark, cfg)
    // tables live in the atomic catalog and read back through it
    assert(spark.table(cfg.silverFqn).count() > 0)
    assert(spark.table(cfg.goldFqn).count() > 0)
    // silver is partitioned: a partition-column filter works against it
    val oneDay = spark.table(cfg.silverFqn)
      .select("interaction_date").distinct().head().getDate(0)
    assert(spark.table(cfg.silverFqn)
      .where(col("interaction_date") === oneDay).count() > 0)
    // a re-run REPLACES atomically (no drop window): gold twice is fine
    graft.medallion.Pipeline.gold(spark, cfg)
    assert(spark.table(cfg.goldFqn).count() > 0)
    Seq(cfg.silverFqn, cfg.goldFqn)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
