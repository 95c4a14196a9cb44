package graft

import org.apache.spark.sql.SparkSession

/** Planning-vs-execution split for the dedup/text family: at bench scale
  * (500 docs) Catalyst planning of the big expression pipelines may be a
  * large share of wall time. Times executedPlan materialization (pure
  * planning) separately from the run. Harness only.
  */
object QProfile8 {
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

    spark.read.parquet(s"$dir/region.parquet").groupBy("r_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    val names = Seq("d03_ngram_jaccard", "d13_dedup_keep_longest",
      "t33_leakage_safe_split", "t27_duplicate_spans",
      "t28_excise_duplicates", "d07_dedup_pipeline", "t11_clean_corpus")
    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[qp8] $n%-28s build ${(t1 - t0) / 1e9}%6.3f  " +
          f"plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f s")
      }
    }
    spark.stop()
  }
}
