package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: stage-level timing of the d15 containment gate (round-10
  * continuation — adjudicating the 1.8 -> 7 s drift). Times each stage of
  * the chain twice (cold, then re-run) so JIT/page-cache effects separate
  * from intrinsic cost, and prints the candidate-pair count the 7x2
  * containment banding produces. */
object D15Profile {
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
      println(f"[d15] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(spark.range(1000).agg(sum("id")).collect())
    val docs = Tables.load(spark, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    t("sigs")(sigs.write.format("noop").mode("overwrite").save())
    t("sigs 2")(sigs.write.format("noop").mode("overwrite").save())
    val pairs = graft.api.Graft.nearDupPairs(sigs, 7, 2, minAgreement = 4)
    val nPairs = t("pairs")(pairs.count())
    println(s"[d15] candidate pairs: $nPairs")
    t("pairs 2")(pairs.write.format("noop").mode("overwrite").save())
    val verified = graft.api.Graft.containmentVerify(
      docs, $"doc_id", $"text", pairs)
    t("verify")(verified.write.format("noop").mode("overwrite").save())
    t("verify 2")(verified.write.format("noop").mode("overwrite").save())
    t("full gate")(graft.ops.Dedup.d15Containment(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("full gate 2")(graft.ops.Dedup.d15Containment(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
