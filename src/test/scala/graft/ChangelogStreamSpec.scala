package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `.changes` metadata table (ChangelogRead.scala): the row-level
  * change feed as a batch relation AND a streaming source. Pins:
  * batch `.changes` equals `tableChanges` row-for-row over the same
  * window; the STREAM drains the same typed rows (snapshot-as-inserts
  * first) under per-unit admission control and across a
  * checkpoint-resume; a MoR merge commit serves its delete half from
  * the entry's narrowed scope; a COW rewrite commit fails pointedly;
  * unsupported options refuse pointedly. */
class ChangelogStreamSpec extends AnyFunSuite {
  lazy val warehouse: String =
    Files.createTempDirectory("graft_chg_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_chg",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_chg.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_chg.db")
    s
  }

  private def typedRows(df: DataFrame): Seq[(String, Long, String)] =
    df.select(col("_change_type"), col("k"), col("tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted

  /** Drain a changelog stream (availableNow semantics via
    * processAllAvailable) into an accumulator, optionally rate-limited
    * to force multi-batch admission. */
  private def drain(table: String, ckpt: String,
      maxFiles: Option[Int] = None): Seq[Row] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
    var reader = spark.readStream
    maxFiles.foreach(m => reader =
      reader.option("maxFilesPerTrigger", m.toString))
    val q = reader.table(table)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        acc.synchronized { acc ++= batch.collect() }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    acc.toSeq
  }

  test("batch .changes equals tableChanges over the retained window; " +
      "a MoR merge serves typed inserts AND deletes") {
    val s = spark
    import s.implicits._
    s.range(100).select($"id".as("k"), concat(lit("t"), $"id" % 5).as("tag"))
      .repartition(2).writeTo("graft_chg.db.c1")
      .tableProperty("write.merge.mode", "merge-on-read")
      .create()
    s.sql("ALTER TABLE graft_chg.db.c1 ADD CONSTRAINT c1_pk " +
      "PRIMARY KEY (k) NOT ENFORCED")
    // commit 2: plain append
    s.range(100, 120).select($"id".as("k"), lit("new").as("tag"))
      .repartition(1).writeTo("graft_chg.db.c1").append()
    // commit 3: MoR merge — 5 updates (delete+reinsert) + 3 inserts
    s.range(8).select(($"id" * 10).as("k"), lit("upd").as("tag"))
      .union(s.range(3).select(($"id" + 200).as("k"), lit("ins").as("tag")))
      .distinct().createOrReplaceTempView("c1_src")
    s.sql("""MERGE INTO graft_chg.db.c1 t USING c1_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.table("graft_chg.db.c1.deletes").count() >= 1L,
      "the merge must land as a live equality entry")
    val batchChanges = s.table("graft_chg.db.c1.changes")
    val viaApi = graft.sources.AtomicParquetCatalog
      .tableChanges(s, "graft_chg.db.c1", fromCommitsBack = 2)
    assert(typedRows(batchChanges) == typedRows(viaApi),
      "batch .changes must match tableChanges row-for-row")
    // _commit_timestamp is constant per commit and ordered: the append
    // commit's inserts carry a strictly earlier instant than the
    // merge's rows (commits serialize under the table lock)
    val tsByVersion = batchChanges
      .select(col("_commit_version"), col("_commit_timestamp"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime)).toMap
    assert(tsByVersion.size == 2,
      s"one instant per commit, got $tsByVersion")
    // the merge's delete half: the 8 matched keys re-read as deletes
    val dels = batchChanges.where($"_change_type" === "delete")
      .select($"k").as[Long].collect().sorted.toSeq
    assert(dels == (0L until 8L).map(_ * 10),
      s"merge deletes mismatch: $dels")
  }

  test("the stream drains snapshot-as-inserts, then the typed feed " +
      "commit by commit, rate-limited and across checkpoint resumes") {
    val s = spark
    import s.implicits._
    s.range(100).select($"id".as("k"), concat(lit("t"), $"id" % 5).as("tag"))
      .repartition(2).writeTo("graft_chg.db.c2")
      .tableProperty("write.merge.mode", "merge-on-read")
      .create()
    s.sql("ALTER TABLE graft_chg.db.c2 ADD CONSTRAINT c2_pk " +
      "PRIMARY KEY (k) NOT ENFORCED")
    val ckpt = Files.createTempDirectory("graft_chg_ckpt").toString
    // drain 1: the stream starts BEFORE any change — the current
    // snapshot serves as inserts (Delta CDF's initial-snapshot rule)
    val first = drain("graft_chg.db.c2.changes", ckpt)
    val firstTyped = first.map(r =>
      (r.getString(2), r.getLong(0), r.getString(1))).sorted
    assert(firstTyped == (0L until 100L).map(k =>
      ("insert", k, s"t${k % 5}")).sorted,
      s"snapshot drain mismatch (${firstTyped.size} rows)")
    // two commits while the stream is DOWN: an append + a MoR merge
    s.range(100, 120).select($"id".as("k"), lit("new").as("tag"))
      .repartition(1).writeTo("graft_chg.db.c2").append()
    s.range(8).select(($"id" * 10).as("k"), lit("upd").as("tag"))
      .union(s.range(3).select(($"id" + 200).as("k"), lit("ins").as("tag")))
      .distinct().createOrReplaceTempView("c2_src")
    s.sql("""MERGE INTO graft_chg.db.c2 t USING c2_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.table("graft_chg.db.c2.deletes").count() >= 1L)
    // drain 2, rate-limited to one unit per micro-batch: the resumed
    // stream serves exactly the two commits' TYPED rows — the merge's
    // delete half carries the ORIGINAL rows, its insert half the new
    val before = {
      val ls = Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
      try ls.count() finally ls.close()
    }
    val second = drain("graft_chg.db.c2.changes", ckpt, maxFiles = Some(1))
    val secondTyped = second.map(r =>
      (r.getString(2), r.getLong(0), r.getString(1))).sorted
    val expect = ((100L until 120L).map(k => ("insert", k, "new")) ++
      (0L until 8L).map(k => ("insert", k * 10, "upd")) ++
      (200L until 203L).map(k => ("insert", k, "ins")) ++
      (0L until 8L).map(k => ("delete", k * 10, s"t${(k * 10) % 5}"))).sorted
    assert(secondTyped == expect,
      s"typed feed mismatch (${secondTyped.size} rows): $secondTyped")
    // the rate limit actually split the advance into multiple batches
    val after = {
      val ls = Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
      try ls.count() finally ls.close()
    }
    assert(after - before >= 3,
      s"expected multi-batch admission, got ${after - before} batches")
    // drain 3: a commit while down again — exactly it, nothing replays
    s.range(300, 305).select($"id".as("k"), lit("late").as("tag"))
      .repartition(1).writeTo("graft_chg.db.c2").append()
    val third = drain("graft_chg.db.c2.changes", ckpt)
    val thirdTyped = third.map(r =>
      (r.getString(2), r.getLong(0), r.getString(1))).sorted
    assert(thirdTyped == (300L until 305L).map(k =>
      ("insert", k, "late")).sorted,
      s"resume must serve only the new commit, got $thirdTyped")
  }

  test("batch window options: startingVersion/endingVersion bound the " +
      "served commits (Delta's batch-CDF surface)") {
    val s = spark
    import s.implicits._
    // c2's log, newest first: late-append(0), merge(1), append(2),
    // create(3) — the window [1,1] is exactly the merge commit
    val windowed = s.read
      .option("startingVersion", "1").option("endingVersion", "1")
      .table("graft_chg.db.c2.changes")
    val byType = windowed.groupBy($"_change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType == Map("insert" -> 11L, "delete" -> 8L),
      s"the [merge,merge] window must serve 8 upd-deletes + 8 " +
        s"reinserts + 3 inserts, got $byType")
    // FROM the merge onward (no cap): the late append rides too
    val open = s.read.option("startingVersion", "1")
      .table("graft_chg.db.c2.changes")
    assert(open.count() == 19L + 5L, s"got ${open.count()}")
    // an inverted window fails pointedly, not silently-empty
    val e = intercept[Exception] {
      s.read.option("startingVersion", "0").option("endingVersion", "2")
        .table("graft_chg.db.c2.changes").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("precedes")), msgs(e))
  }

  test("metadata-only spec evolution is TRANSPARENT to the stream: a " +
      "pure relocation is no row-level change") {
    val s = spark
    import s.implicits._
    s.range(10).select($"id".as("k"), lit("a").as("tag"))
      .repartition(2).writeTo("graft_chg.db.c4").create()
    val ckpt = Files.createTempDirectory("graft_chg_ev_ck").toString
    assert(drain("graft_chg.db.c4.changes", ckpt).size == 10)
    // the evolving commit hard-links every root file under _spec-0/
    // (zero rewrite) — the stream must neither die nor re-emit
    s.sql("CALL graft_chg.system.evolve_layout('db.c4', 'bucket(2,k)')")
    s.range(100, 103).select($"id".as("k"), lit("b").as("tag"))
      .repartition(1).writeTo("graft_chg.db.c4").append()
    val resumed = drain("graft_chg.db.c4.changes", ckpt)
    assert(resumed.map(r => (r.getString(2), r.getLong(0))).sorted ==
      (100L until 103L).map(k => ("insert", k)),
      s"evolution must contribute nothing, got $resumed")
    // the batch window agrees: only the 3 appended rows are changes
    assert(s.table("graft_chg.db.c4.changes").count() == 3L)
  }

  test("a branch ref tails the BRANCH's feed (the audit half of WAP, " +
      "streaming form); other metadata tables refuse branch refs") {
    val s = spark
    import s.implicits._
    s.range(10).select($"id".as("k"), lit("m").as("tag"))
      .writeTo("graft_chg.db.c3").create()
    s.sql("CALL graft_chg.system.create_branch('db.c3', 'audit')")
    s.range(100, 103).select($"id".as("k"), lit("b").as("tag"))
      .writeTo("graft_chg.db.`c3@audit`").append()
    val ckpt = Files.createTempDirectory("graft_chg_br_ck").toString
    val first = drain("graft_chg.db.`c3@audit`.changes", ckpt)
    // the branch head's snapshot (10 main-forked + 3 branch-only rows)
    assert(first.size == 13, s"branch snapshot drain got ${first.size}")
    // a branch-only commit while down: only the branch feed serves it
    s.range(200, 202).select($"id".as("k"), lit("b2").as("tag"))
      .writeTo("graft_chg.db.`c3@audit`").append()
    val second = drain("graft_chg.db.`c3@audit`.changes", ckpt)
    assert(second.map(r => (r.getString(2), r.getLong(0))).sorted ==
      Seq(("insert", 200L), ("insert", 201L)),
      s"branch resume mismatch: $second")
    // batch form agrees; MAIN's feed never saw the branch commits
    assert(s.table("graft_chg.db.`c3@audit`.changes").count() == 5L)
    assert(s.table("graft_chg.db.c3.changes").count() == 0L,
      "main's feed must not see branch-only commits")
    // the branch-ref shorthand stays changes-only: t@branch.history
    // must not resolve (silently serving main's data mislabeled)
    val e = intercept[Exception] {
      s.table("graft_chg.db.`c3@audit`.history").collect()
    }
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("not found"), e.getMessage)
  }

  test("schema evolution inside the window: pre-evolution commits " +
      "null-fill the evolved column (latest-schema projection)") {
    val s = spark
    import s.implicits._
    s.range(5).select($"id".as("k"), lit("a").as("tag"))
      .writeTo("graft_chg.db.c5").create()
    val ckpt = Files.createTempDirectory("graft_chg_se_ck").toString
    assert(drain("graft_chg.db.c5.changes", ckpt).size == 5)
    // two commits while down: a pre-evolution append, then ALTER ADD
    // COLUMN + a post-evolution append — one resume spans both shapes
    s.range(10, 12).select($"id".as("k"), lit("b").as("tag"))
      .writeTo("graft_chg.db.c5").append()
    s.sql("ALTER TABLE graft_chg.db.c5 ADD COLUMN note STRING")
    Seq((20L, "c", "noted")).toDF("k", "tag", "note")
      .writeTo("graft_chg.db.c5").append()
    val rows = drain("graft_chg.db.c5.changes", ckpt)
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).getOrElse("NULL"))).sorted
    assert(rows == Seq((10L, "b", "NULL"), (11L, "b", "NULL"),
      (20L, "c", "noted")),
      s"latest-schema projection mismatch: $rows")
  }

  test("an identity-partitioned source serves through the feed: the " +
      "partition column rides from the directory paths") {
    val s = spark
    import s.implicits._
    s.range(40).select($"id".as("k"), ($"id" % 4).cast("int").as("p"),
        concat(lit("u"), $"id").as("tag"))
      .writeTo("graft_chg.db.c7")
      .tableProperty("write.merge.mode", "merge-on-read")
      .partitionedBy($"p").create()
    s.sql("ALTER TABLE graft_chg.db.c7 ADD CONSTRAINT c7_pk " +
      "PRIMARY KEY (k) NOT ENFORCED")
    val ckpt = Files.createTempDirectory("graft_chg_pt_ck").toString
    val snap = drain("graft_chg.db.c7.changes", ckpt)
    assert(snap.size == 40 &&
      snap.forall(r => r.getInt(1) == (r.getLong(0) % 4).toInt),
      "snapshot rows must carry the partition column from the paths")
    // a scattered merge: updates in two partitions + one insert
    Seq((0L, 0, "upd"), (5L, 1, "upd"), (100L, 2, "new"))
      .toDF("k", "p", "tag").createOrReplaceTempView("c7_src")
    s.sql("""MERGE INTO graft_chg.db.c7 t USING c7_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val typed = drain("graft_chg.db.c7.changes", ckpt)
      .map(r => (r.getString(3), r.getLong(0), r.getInt(1),
        r.getString(2))).sorted
    assert(typed == Seq(
      ("delete", 0L, 0, "u0"), ("delete", 5L, 1, "u5"),
      ("insert", 0L, 0, "upd"), ("insert", 5L, 1, "upd"),
      ("insert", 100L, 2, "new")).sorted,
      s"partitioned typed feed mismatch: $typed")
  }

  test("an expired window fails the resume pointedly (retention)") {
    val s = spark
    import s.implicits._
    // a dedicated short-retention catalog (history is read at catalog
    // init, not per query)
    s.conf.set("spark.sql.catalog.graft_chr",
      "graft.sources.AtomicParquetCatalog")
    s.conf.set("spark.sql.catalog.graft_chr.warehouse",
      Files.createTempDirectory("graft_chr_wh").toString)
    s.conf.set("spark.sql.catalog.graft_chr.history", "2")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_chr.db")
    s.range(3).select($"id".as("k")).writeTo("graft_chr.db.c6").create()
    val ckpt = Files.createTempDirectory("graft_chg_rt_ck").toString
    assert(drain("graft_chr.db.c6.changes", ckpt).size == 3)
    // three commits at history=2: the checkpointed base expires
    for (i <- 1 to 3)
      s.range(10L * i, 10L * i + 1).select($"id".as("k"))
        .writeTo("graft_chr.db.c6").append()
    val e = intercept[Exception] { drain("graft_chr.db.c6.changes", ckpt) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("retention") ||
      m.contains("retained")), s"want the pointed expiry error: ${msgs(e)}")
  }

  test("a COW rewrite commit fails the feed pointedly; options refuse") {
    val s = spark
    import s.implicits._
    // COW delete (no MoR delete mode set on the session) rewrites files
    s.sql("DELETE FROM graft_chg.db.c1 WHERE k < 3")
    val e = intercept[Exception] {
      s.table("graft_chg.db.c1.changes").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("table_changes")),
      s"the COW commit must fail pointedly, got: ${msgs(e)}")
    val e2 = intercept[Exception] {
      val q = s.readStream.option("skipChangeCommits", "true")
        .table("graft_chg.db.c1.changes")
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_chg_ck2").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(msgs(e2).exists(_.contains("skipChangeCommits")), msgs(e2))
  }
}
