package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Generic gate-plan capture: dumps the formatted physical plan of each
  * named declared gate to `<outDir>/<name>_<suffix>.txt`. Used for the
  * optimization rounds' before/after plan evidence.
  *
  * Usage: sbt 'runMain graft.PlanCaptureGates <sfDir> <outDir> <suffix> <gate> [gate...]'
  */
object PlanCaptureGates {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanCaptureGates <sfDir> <outDir> <suffix> <gate> [gate...]")
    val dir = args(0)
    val out = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(out)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      Files.writeString(out.resolve(s"${name}_$suffix.txt"),
        df.queryExecution.explainString(
          ExplainMode.fromString("formatted")).trim + "\n")
      println(s"[plans] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
