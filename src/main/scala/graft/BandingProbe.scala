package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev harness: empirical comparison of LSH banding plans on the real
  * corpus (candidates, verify overfetch, recall vs the current-truth edge
  * set, wall time per stage) — the measurement behind the round-10
  * banding redesign ordered by VERDICT r9 #2. */
object BandingProbe {
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
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(spark.range(1000).agg(sum("id")).collect())
    val docs = Tables.load(spark, dir, "documents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    println(s"[probe] docs: ${docs.count()}")

    val sigs16 = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
        numHashes = 16, assumeUniqueIds = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("sigs16 fill")(sigs16.count())

    // generalized pair generator: band keys over the FIRST bands*r hashes,
    // agreement over `agreeHashes` (>= bands*r) of the signature
    def pairsG(bands: Int, r: Int, minAgree: Int, agreeHashes: Int): DataFrame = {
      val bandKeys = array((1 to bands).map { k =>
        val hs = ((k - 1) * r + 1 to k * r).map(i => col(s"h$i"))
        concat_ws(":", (lit(k) +: hs): _*)
      }: _*)
      val sig = struct(col("id") +: (1 to agreeHashes).map(i => col(s"h$i")): _*)
      val collected = sigs16.select(explode(bandKeys).as("bb"), sig.as("s"))
        .groupBy(col("bb"))
        .agg(sort_array(collect_list(col("s"))).as("ss"))
        .where(size(col("ss")) > 1)
      val inBucket = graft.functions.BucketPairSurvivors.bucketPairs(col("ss"), minAgree)
      collected.select(explode(inBucket).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
          col("p.n_match").as("n_match"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(max(col("n_match")).as("n_match"))
    }

    def stats(bands: Int, r: Int): Unit = {
      val row = graft.api.Graft.lshBucketStats(
          sigs16.withColumnRenamed("id", "id"), bands, r)
        .agg(sum("est_pairs"), max("max_bucket")).collect()(0)
      println(s"[probe] b=$bands r=$r: est_raw_pairs=${row.get(0)} max_bucket=${row.get(1)}")
    }
    stats(4, 2); stats(8, 2); stats(4, 3); stats(4, 4); stats(5, 3)

    // ground truth: current chain (b=4,r=2,agree>=4/8) verified J>=0.5
    val truth = t("truth: current mine+verify") {
      val p = pairsG(4, 2, 4, 8)
      val v = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", p)
        .where($"jaccard" >= 0.5).select($"id_a", $"id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"[probe] truth edges: ${v.count()}")
      v
    }
    // J histogram of truth edges (where do the true pairs sit?)
    t("truth J histogram") {
      val p = pairsG(4, 2, 4, 8)
      graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", p)
        .where($"jaccard" >= 0.5)
        .groupBy(floor($"jaccard" * 10).as("j_decile")).count()
        .orderBy($"j_decile").show()
    }

    case class Variant(name: String, b: Int, r: Int, agree: Int, ah: Int)
    val variants = Seq(
      Variant("A current 8h b4r2 >=4/8", 4, 2, 4, 8),
      Variant("D 16h b4r2 >=8/16", 4, 2, 8, 16),
      Variant("C 16h b8r2 >=8/16", 8, 2, 8, 16),
      Variant("E 12h b4r3 >=6/12", 4, 3, 6, 12),
      Variant("B 16h b4r4 >=8/16", 4, 4, 8, 16),
      Variant("F 15h b5r3 >=8/15", 5, 3, 8, 15))

    for (v <- variants) {
      val pairs = pairsG(v.b, v.r, v.agree, v.ah)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nCand = t(s"${v.name} MINE")(pairs.count())
      val verified = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text",
          pairs.select($"id_a", $"id_b", $"n_match"))
        .where($"jaccard" >= 0.5).select($"id_a", $"id_b")
      val nVer = t(s"${v.name} VERIFY")(verified.count())
      val hit = verified.join(truth, Seq("id_a", "id_b"), "left_semi").count()
      println(f"[probe] ${v.name}: cand=$nCand verified=$nVer recall_vs_truth=$hit/${truth.count()}")
      pairs.unpersist()
    }
    spark.stop()
  }
}
