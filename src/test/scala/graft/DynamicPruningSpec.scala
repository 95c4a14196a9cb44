package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning for NORMAL reads of partitioned catalog
  * tables — the star-schema path: a selective filter on a joined dim
  * prunes the fact table's partitions at runtime, with no manual
  * predicate on the fact side. The proof is the fact scan's OUTPUT ROW
  * COUNT: with pruning it emits only the matching partitions' rows;
  * without, the whole table. */
class DynamicPruningSpec extends AnyFunSuite {
  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_dpp_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_dpp",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_dpp.warehouse", warehouse)
    s
  }

  /** Pin the confs DPP depends on for the duration of a test — the
    * suites share one SparkSession, and e.g. BucketedJoinSpec disables
    * auto-broadcast session-wide (DPP's default onlyInBroadcast mode
    * never fires without a broadcast dim). */
  private def withDppConfs[A](f: => A): A = {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.dynamicPartitionPruning.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "true")
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Output-row metric of every BatchScanExec (recursing through AQE
    * query stages, which hold their plan outside `children`) whose
    * output carries `col`. */
  private def scanRows(df: org.apache.spark.sql.DataFrame,
                       col: String): Seq[Long] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def scans(p: SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec => Seq(b)
        case q: QueryStageExec => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(finalPlan(df.queryExecution.executedPlan))
      .filter(_.output.exists(_.name == col))
      .map(_.metrics("numOutputRows").value)
  }

  test("a selective dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    withDppConfs {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dpp.db")
    (1L to 1000L).map(i => (i % 10, i, i * 1.0)).toDF("k", "f_id", "f_v")
      .writeTo("graft_dpp.db.fact").using("parquet")
      .partitionedBy($"k").createOrReplace()
    (0L to 9L).map(k => (k, if (k == 2 || k == 5) "x" else "y"))
      .toDF("k", "cat")
      .writeTo("graft_dpp.db.dim").using("parquet").createOrReplace()
    val j = spark.table("graft_dpp.db.fact")
      .join(spark.table("graft_dpp.db.dim").where($"cat" === "x"), Seq("k"))
      .agg(count(lit(1)).as("n"), sum($"f_v").as("s"))
    val row = j.collect().head
    // correctness: keys 2 and 5 → 100 fact rows each
    assert(row.getLong(0) == 200)
    assert(row.getDouble(1) ==
      (1L to 1000L).filter(i => i % 10 == 2 || i % 10 == 5).map(_.toDouble).sum)
    // pruning: the fact scan must emit ONLY partitions k=2 and k=5
    // (keyed on f_v — f_id is column-pruned out of the scan)
    val factRows = scanRows(j, "f_v")
    assert(factRows.nonEmpty, "fact BatchScanExec not found in final plan")
    assert(factRows.sum == 200,
      s"fact scan read ${factRows.sum} rows — dynamic partition pruning " +
        "did not fire (expected 200 = the two matching partitions)")
    }
  }

  test("pruned delegate replays pushed data filters and column pruning") {
    import spark.implicits._
    withDppConfs {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dpp.db")
    (1L to 1000L).map(i => (i % 10, i, i * 1.0, s"pad$i"))
      .toDF("k", "f_id", "f_v", "f_pad")
      .writeTo("graft_dpp.db.fact2").using("parquet")
      .partitionedBy($"k").createOrReplace()
    (0L to 9L).map(k => (k, if (k == 3) "x" else "y")).toDF("k", "cat")
      .writeTo("graft_dpp.db.dim2").using("parquet").createOrReplace()
    // a data filter rides along with the runtime partition filter: the
    // DPP-rebuilt delegate must re-apply it (and the column pruning)
    // without changing results
    val j = spark.table("graft_dpp.db.fact2")
      .where($"f_id" % 2 === 0)
      .join(spark.table("graft_dpp.db.dim2").where($"cat" === "x"), Seq("k"))
      .select($"f_id", $"f_v")
    val got = j.orderBy($"f_id").collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 1000L).filter(i => i % 10 == 3 && i % 2 == 0))
    val factRows = scanRows(j, "f_id")
    assert(factRows.nonEmpty && factRows.sum <= 100,
      s"fact2 scan read ${factRows.sum} rows — expected at most one " +
        "partition's 100 rows after runtime pruning")
    }
  }

  test("SPJ and DPP compose: v2 bucketing on, dim filter still prunes") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dpp.db")
    (1L to 1000L).map(i => (i % 10, i, i * 1.0)).toDF("k", "c_id", "c_v")
      .writeTo("graft_dpp.db.cfact").using("parquet")
      .partitionedBy($"k").createOrReplace()
    (0L to 9L).map(k => (k, if (k == 2 || k == 5) "x" else "y"))
      .toDF("k", "cat")
      .writeTo("graft_dpp.db.cdim").using("parquet").createOrReplace()
    withDppConfs {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      try {
        val j = spark.table("graft_dpp.db.cfact")
          .join(spark.table("graft_dpp.db.cdim").where($"cat" === "x"),
            Seq("k"))
          .agg(count(lit(1)).as("n"), sum($"c_v").as("s"))
        assert(j.collect().head.getLong(0) == 200)
        val factRows = scanRows(j, "c_v")
        assert(factRows.nonEmpty && factRows.sum == 200,
          s"key-grouped fact scan read ${factRows.sum} rows — runtime " +
            "pruning did not compose with storage partitioning")
      } finally spark.conf
        .set("spark.sql.sources.v2.bucketing.enabled", "false")
    }
    spark.sql("DROP TABLE graft_dpp.db.cfact")
    spark.sql("DROP TABLE graft_dpp.db.cdim")
  }

  test("composite (days, bucket) spec: a dim filter prunes bucket cells " +
      "at runtime even with the time column pruned from the scan") {
    import spark.implicits._
    withDppConfs {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dpp.db")
      // 4 days x 4 buckets; keys 0..15, one day per 4 keys, 100 rows/key
      (0 until 1600).map { i =>
        val k = i % 16
        (k.toLong, new java.sql.Timestamp(1704067200000L +
          (k / 4) * 86400000L), i.toLong * 2)
      }.toDF("u", "ts", "val")
        .writeTo("graft_dpp.db.comp").using("parquet")
        .partitionedBy(days($"ts"), bucket(4, $"u")).createOrReplace()
      (0L to 15L).map(u => (u, if (u == 3) "x" else "y")).toDF("u", "cat")
        .writeTo("graft_dpp.db.compdim").using("parquet").createOrReplace()
      // the query never touches ts: the scan prunes the time column
      // away, filterAttributes must still resolve (u survives), and
      // the runtime filter keeps only u=3's bucket within each day
      val j = spark.table("graft_dpp.db.comp").select($"u", $"val")
        .join(spark.table("graft_dpp.db.compdim").where($"cat" === "x"),
          Seq("u"))
        .agg(count(lit(1)).as("n"), sum($"val").as("s"))
      val row = j.collect().head
      assert(row.getLong(0) == 100)
      assert(row.getLong(1) ==
        (0 until 1600).filter(_ % 16 == 3).map(_.toLong * 2).sum)
      // exact pin: the filter keeps exactly bucket(3)'s id at the
      // bucket level (the day level cannot prune on u), so the scan
      // reads precisely the keys sharing key 3's bucket — computed
      // with the same codegen'd hash the write router used
      val b3 = spark.range(0, 16)
        .select($"id", pmod(hash($"id"), lit(4)).as("b")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expected = (0L to 15L).count(k => b3(k) == b3(3L)) * 100L
      assert(expected < 1600, "degenerate hash layout — test is vacuous")
      val factRows = scanRows(j, "val")
      assert(factRows.nonEmpty && factRows.sum == expected,
        s"composite fact scan read ${factRows.sum} rows, expected " +
          s"$expected — runtime bucket pruning did not fire on the " +
          "(days, bucket) layout")
      spark.sql("DROP TABLE graft_dpp.db.comp")
      spark.sql("DROP TABLE graft_dpp.db.compdim")
    }
  }

  test("a partitioned catalog table still broadcasts (stats forwarded)") {
    import spark.implicits._
    withDppConfs {
      // the PARTITIONED side is tiny (1000 rows): if the scan wrapper
      // hid the parquet size estimate, the relation would report the
      // default (huge) size and the planner would never broadcast it
      val big = spark.range(0, 100000).select(($"id" % 10).as("k"), $"id")
      val joined = big.join(spark.table("graft_dpp.db.fact"), Seq("k"))
      assert(joined.count() == 100000L / 10 * 1000)
      val plan = finalPlan(joined.queryExecution.executedPlan)
      val hasBhj = plan.toString.contains("BroadcastHashJoin") ||
        plan.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q.plan.toString
        }.exists(_.contains("BroadcastHashJoin"))
      assert(hasBhj,
        s"small partitioned catalog table did not broadcast:\n$plan")
    }
  }

  test("no-dim-filter join is unchanged and correct (no pruning needed)") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dpp.db")
    val j = spark.table("graft_dpp.db.fact")
      .join(spark.table("graft_dpp.db.dim"), Seq("k"))
    assert(j.count() == 1000)
    spark.sql("DROP TABLE graft_dpp.db.fact")
    spark.sql("DROP TABLE graft_dpp.db.dim")
    spark.sql("DROP TABLE graft_dpp.db.fact2")
    spark.sql("DROP TABLE graft_dpp.db.dim2")
  }
}
