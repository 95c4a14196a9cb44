package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: quantify the d15 candidate stream — n_match histogram,
  * doc-length-ratio distribution, and what a length-ratio-aware agreement
  * cut would drop vs what the containment >= 0.8 output actually needs. */
object D15Cut {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    val pairs = graft.api.Graft.nearDupPairs(sigs, 7, 2, minAgreement = 4)
      .persist()
    println("[cut] n_match histogram:")
    pairs.groupBy($"n_match").count().orderBy($"n_match").show(20, false)
    // shingle-set size ~ distinct 5-grams; approximate by length-4
    val lens = docs.select($"doc_id".as("id"),
      (length($"text") - lit(4)).cast("double").as("len"))
    val withLen = pairs
      .join(lens.withColumnRenamed("id", "id_a").withColumnRenamed("len", "la"), "id_a")
      .join(lens.withColumnRenamed("id", "id_b").withColumnRenamed("len", "lb"), "id_b")
      .withColumn("r", least($"la", $"lb") / greatest($"la", $"lb"))
      .withColumn("jmin", lit(0.8) * $"r" / (lit(1.0) + $"r" - lit(0.8) * $"r"))
      .withColumn("cut", greatest(lit(4.0), ceil(lit(14.0) * $"jmin" * 0.5)))
      .persist()
    val total = withLen.count()
    val kept = withLen.where($"n_match" >= $"cut").count()
    println(s"[cut] candidates $total -> kept $kept")
    // what does the true output need? verify all candidates, look at the
    // n_match of pairs that reach containment >= 0.8
    val ver = graft.api.Graft.containmentVerify(docs, $"doc_id", $"text",
        pairs)
      .where($"containment" >= 0.8)
      .join(withLen.select($"id_a", $"id_b", $"n_match", $"cut", $"r"),
        Seq("id_a", "id_b"))
      .persist()
    val nOut = ver.count()
    val nOutSurvive = ver.where($"n_match" >= $"cut").count()
    println(s"[cut] verified output $nOut; surviving the cut $nOutSurvive")
    println("[cut] output n_match vs cut:")
    ver.select($"n_match", $"cut", $"r").orderBy($"n_match").show(30, false)
    spark.stop()
  }
}
