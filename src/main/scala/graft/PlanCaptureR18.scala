package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** r18 optimization-round plan evidence: dumps (a) the clustered-write
  * exchange plan BEFORE (keyless `repartition(dirCols)`, which AQE
  * coalesces to one task on a small append) and AFTER (pinned-width
  * `repartition(n, dirCols)`), both as the EXECUTED adaptive plan so the
  * AQEShuffleRead coalesce is visible; and (b) the formatted plans of
  * the catalog gates whose build path the fix touches.
  *
  * Usage: sbt 'runMain graft.PlanCaptureR18 [sfDir] [outDir]'
  */
object PlanCaptureR18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = Paths.get(args.lift(1).getOrElse("plans/r18"))
    Files.createDirectories(out)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .where($"event_id" % 3 === 1)
      .withColumn("_d", to_date($"ts"))
      .withColumn("_b", pmod(hash($"user_id"), lit(8)))

    // BEFORE: keyless repartition(dirCols) — run it so AQE's final plan
    // (the coalesced AQEShuffleRead) is what gets captured
    val before = ev.repartition($"_d", $"_b")
    // drive the adaptive plan IN PLACE so its final form (with the
    // coalesced AQEShuffleRead) is what toString renders
    before.queryExecution.executedPlan.execute().count()
    Files.writeString(out.resolve("clustered_write_exchange_before.txt"),
      "== clustered catalog write exchange, BEFORE (repartition(dirCols); " +
        "AQE coalesces the small exchange to one task, serializing the " +
        "per-dir file writes) ==\n\n" +
        before.queryExecution.explainString(
          ExplainMode.fromString("formatted")).trim + "\n\n" +
        "== executed adaptive plan (note the AQEShuffleRead coalesced " +
        "partition count) ==\n\n" +
        before.queryExecution.executedPlan.toString.trim + "\n")

    // AFTER: pinned-width repartition — exempt from AQE coalescing
    val after = ev.repartition(32, $"_d", $"_b")
    after.queryExecution.executedPlan.execute().count()
    Files.writeString(out.resolve("clustered_write_exchange_after.txt"),
      "== clustered catalog write exchange, AFTER (repartition(n, " +
        "dirCols), n = session shuffle parallelism; the pinned width is " +
        "exempt from AQE coalescing, rows still hash on the dir cols so " +
        "the file count is unchanged) ==\n\n" +
        after.queryExecution.explainString(
          ExplainMode.fromString("formatted")).trim + "\n\n" +
        "== executed adaptive plan ==\n\n" +
        after.queryExecution.executedPlan.toString.trim + "\n")

    // final-DataFrame plans of the touched catalog gates (the fix is in
    // their BUILD path; their declared query plans must be unchanged)
    val touched = Seq("q87_hours_transform", "q90_composite_spec",
      "q91_evolve_layout", "q92_composite_dpp",
      "q104_mor_merge_composite", "q105_unify_layout")
    touched.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      Files.writeString(out.resolve(s"${name}_after.txt"),
        df.queryExecution.explainString(
          ExplainMode.fromString("formatted")).trim + "\n")
      println(s"[plans-r18] wrote ${name}_after.txt")
    }
    println("[plans-r18] done")
    spark.stop()
  }
}
