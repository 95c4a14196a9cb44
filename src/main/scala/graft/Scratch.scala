package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // warm up session
    t("warmup")(spark.range(1000).agg(sum("id")).collect())

    val docs = Tables.load(spark, dir, "documents")
    t("docs count")(docs.count())
    t("docs md5 only")(docs.select(md5($"text")).write.format("noop").mode("overwrite").save())

    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text")
    t("sigs (1st)")(sigs.write.format("noop").mode("overwrite").save())
    t("sigs (2nd)")(sigs.write.format("noop").mode("overwrite").save())

    val pairs = graft.api.Graft.nearDupPairs(sigs, minAgreement = 4)
    t("pairs full (1st)")(pairs.write.format("noop").mode("overwrite").save())
    t("pairs full (2nd)")(pairs.write.format("noop").mode("overwrite").save())

    val pairsC = pairs.cache()
    t("pairs cache fill")(pairsC.count())
    val verify = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", pairsC)
      .where($"jaccard" >= 0.5)
    t("jaccard verify (1st)")(verify.write.format("noop").mode("overwrite").save())
    t("jaccard verify (2nd)")(verify.write.format("noop").mode("overwrite").save())

    val d03 = graft.ops.Dedup.d03NgramJaccard(spark, dir)
    t("d03 end-to-end")(d03.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
