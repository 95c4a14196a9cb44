package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: stage-level timing of dedupCorpus internals (round-10
  * banding work). */
object DedupProfile {
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
      println(f"[dp] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(spark.range(1000).agg(sum("id")).collect())
    val docs = Tables.load(spark, dir, "documents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    println(s"[dp] docs: ${docs.count()}")

    val keyed = docs.withColumn("__id", $"doc_id")
    val exactKeepers = keyed.groupBy(md5($"text").as("__h"))
      .agg(min($"__id").as("__id")).select($"__id")
    val uniq = keyed.join(exactKeepers, Seq("__id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("exact+uniq fill")(uniq.count())
    val sigs = graft.api.Graft.minhashSignatures(uniq, $"__id", $"text",
      assumeUniqueIds = true)
    t("sigs 1")(sigs.write.format("noop").mode("overwrite").save())
    t("sigs 2")(sigs.write.format("noop").mode("overwrite").save())
    val pairs = graft.api.Graft.nearDupPairs(sigs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("mine fill")(println(s"[dp] pairs: ${pairs.count()}"))
    val edges = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", pairs)
      .where($"jaccard" >= 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("verify fill")(println(s"[dp] edges: ${edges.count()}"))
    val cc = graft.api.Graft.connectedComponents(edges, $"id_a", $"id_b")
    t("cc")(cc.write.format("noop").mode("overwrite").save())
    t("full dedupCorpus")(
      graft.api.Graft.dedupCorpus(docs, $"doc_id", $"text")
        .write.format("noop").mode("overwrite").save())
    t("full dedupCorpus 2")(
      graft.api.Graft.dedupCorpus(docs, $"doc_id", $"text")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
