package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc recall tuning grid for the LSH ANN paths (not driver contract). */
object RecallGrid {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = graft.ops.Similarity.s01BruteForceTopK(spark, dir)
      .persist()
    exact.count()
    for (tables <- Seq(2, 4, 8); bits <- Seq(3, 4, 5, 6, 8)) {
      val t0 = System.nanoTime()
      val approx = graft.api.Graft.annTopKLsh(
        emb, $"vec_id", $"embedding",
        emb.where($"vec_id" < 10), $"vec_id", $"embedding",
        dim = 64, k = 5, numTables = tables, bitsPerBucket = bits)
      val r = graft.api.Graft.recallSummary(exact, approx, "q_id", "neighbor_id")
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[grid] tables=$tables bits=$bits recall=${r.getDouble(3)}%.2f min=${r.getDouble(4)}%.2f time=$dt%.1fs")
    }
    // pairs path: d08 vs d05
    val pexact = graft.ops.Dedup.d05EmbeddingPairs(spark, dir).persist()
    pexact.count()
    for (tables <- Seq(4, 8); bits <- Seq(3, 4, 5, 6, 8)) {
      val t0 = System.nanoTime()
      val papprox = graft.api.Graft.embeddingNearDupPairs(
        emb, $"vec_id", $"embedding", dim = 64,
        numTables = tables, bitsPerBucket = bits, topN = 50)
      val r = graft.api.Graft.recallSummary(pexact, papprox, "vec_a", "vec_b")
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[grid] PAIRS tables=$tables bits=$bits recall=${r.getDouble(3)}%.2f time=$dt%.1fs")
    }
    spark.stop()
  }
}
