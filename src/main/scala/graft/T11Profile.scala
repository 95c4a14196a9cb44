package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the corpus-cleaning chain (dev harness). */
object T11Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t11] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(spark.range(1000).agg(sum("id")).collect())
    val docs = Tables.load(spark, dir, "documents")

    val rebuilt0 = graft.api.Graft.dropBoilerplate(docs, $"doc_id", $"text", 10, 1)
      .where($"n_dropped" < $"n_chunks")
    t("dropBoilerplate 1")(rebuilt0.write.format("noop").mode("overwrite").save())
    t("dropBoilerplate 2")(rebuilt0.write.format("noop").mode("overwrite").save())
    val rebuilt = rebuilt0.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("rebuilt cache fill")(rebuilt.count())
    val rep = graft.api.Graft.repetitionStats(rebuilt, $"id", $"clean_text")
      .select($"id", $"dup_ngram_frac")
    t("repetitionStats")(rep.write.format("noop").mode("overwrite").save())
    val kept = rebuilt.join(rep, Seq("id"), "left")
      .where($"dup_ngram_frac".isNull || $"dup_ngram_frac" <= 0.08)
      .drop("dup_ngram_frac")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("kept cache fill")(kept.count())
    val retained = t("dedupCorpus eager")(
      graft.api.Graft.dedupCorpus(kept, $"id", $"clean_text"))
    t("retained -> noop")(retained.write.format("noop").mode("overwrite").save())
    rebuilt.unpersist(); kept.unpersist(); retained.unpersist()

    t("t11 composite 1")(graft.ops.TextAnalysis.t11CleanCorpus(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("t11 composite 2")(graft.ops.TextAnalysis.t11CleanCorpus(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
