package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Counterbalanced A/B for the explode-heavy span operators (t27/t28) that
  * read the one-file documents table directly: times duplicateSpans /
  * exciseDuplicateSpans as-is vs with a pre-repartitioned input, in
  * ALTERNATING order across reps (odd reps run as-is first, even reps run
  * repartitioned first) with an ambient-control job before each block, so
  * JIT/cold-cache order effects cancel instead of crediting whichever
  * variant runs second. Harness only.
  */
object QProfile9 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def ambient(): Double = time {
      spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
        .count().write.format("noop").mode("overwrite").save()
    }
    ambient() // warm the session

    val docs = Tables.load(spark, dir, "documents")
    val results = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)

    def run(op: String, variant: String): Unit = {
      val in = if (variant == "fan") docs.repartition(32) else docs
      val out =
        if (op == "spans")
          graft.api.Graft.duplicateSpans(in, $"doc_id", $"text", window = 20)
        else
          graft.api.Graft.exciseDuplicateSpans(in, $"doc_id", $"text", window = 20)
      val s = time { out.write.format("noop").mode("overwrite").save() }
      results(s"$op/$variant") = results(s"$op/$variant") :+ s
      println(f"[qp9] rep $op%-6s $variant%-4s $s%7.3f s")
    }

    (1 to reps).foreach { rep =>
      val amb = ambient()
      println(f"== rep $rep (ambient $amb%5.3f s) ==")
      val order = if (rep % 2 == 1) Seq("asis", "fan") else Seq("fan", "asis")
      for (op <- Seq("spans", "excise"); v <- order) run(op, v)
    }

    println("== summary (min / median over " + reps + " reps) ==")
    results.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val sorted = vs.sorted
      val med = sorted(sorted.size / 2)
      println(f"[qp9] $k%-14s min ${sorted.head}%6.3f  med $med%6.3f  all ${vs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
