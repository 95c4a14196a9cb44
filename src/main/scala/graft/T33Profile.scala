package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the leakage-safe split chain (dev harness,
  * not part of the driver contract). */
object T33Profile {
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
      println(f"[t33] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    t("warmup")(spark.range(1000).agg(sum("id")).collect())

    val docs = Tables.load(spark, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text")
    t("sigs noop")(sigs.write.format("noop").mode("overwrite").save())

    val pairs = graft.api.Graft.nearDupPairs(sigs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("pairs count (mine)")(println("  n_pairs=" + pairs.count()))

    val edges = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", pairs, 5)
      .where($"jaccard" >= 0.5)
    val edgesP = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("verify edges count")(println("  n_edges=" + edgesP.count()))

    val cc = t("cc fixpoint (build+loop)")(
      graft.api.Graft.connectedComponents(edgesP, $"id_a", $"id_b"))
    t("cc count")(println("  n_cc=" + cc.count()))
    pairs.unpersist(blocking = false)
    edgesP.unpersist(blocking = false)

    val fin = graft.api.Graft.splitCorpus(
      docs.withColumn("__id", $"doc_id")
        .join(cc.select($"id".as("__id"), $"component".as("__lbl")), Seq("__id"), "left")
        .withColumn("__lbl", coalesce($"__lbl", $"__id")),
      $"__lbl", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .drop("__id", "__lbl")
      .select($"doc_id", $"lang", $"split").orderBy($"doc_id")
    t("final join+sort noop")(fin.write.format("noop").mode("overwrite").save())

    // now the composite, cold (cache released above) and again warm-session
    t("composite (cold-ish)")(graft.ops.TextAnalysis.t33LeakageSafeSplit(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("composite (2nd)")(graft.ops.TextAnalysis.t33LeakageSafeSplit(spark, dir)
      .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
