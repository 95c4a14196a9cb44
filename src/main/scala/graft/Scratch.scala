package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (not part of the driver contract).
  *
  * Round-10 mode: LSH banding comparison for the t11/d02 overfetch
  * redesign. For each candidate banding (b x r over the prefix of one
  * 16-hash signature set) measure, at SPARK_GRAFT_SF_DIR scale:
  * raw candidate pairs, pairs surviving the proportional agreement cut,
  * exact-verified J>=0.5 edges, recall vs the current banding's edge set,
  * and wall time of the pairs+verify chain.
  */
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

    t("warmup")(spark.range(1000).agg(sum("id")).collect())

    val docs = Tables.load(spark, dir, "documents").cache()
    println(s"[scratch] docs: ${docs.count()}")

    // one 16-hash signature set; every banding uses a prefix of its columns
    // (minhashParams draws (a_i, b_i) sequentially, so params(8).prefix ==
    // params(16).take(8) — verified below)
    val p8 = graft.api.Graft.minhashParams(8)
    val p16 = graft.api.Graft.minhashParams(16)
    require(p16.take(8).sameElements(p8), "minhashParams prefix property broken")
    val sigs16 = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      numHashes = 16, assumeUniqueIds = true).cache()
    t("sigs16 fill")(sigs16.count())

    // bucket-stats safety check for the 16x1 ground-truth banding
    t("bucketStats 16x1")(
      graft.api.Graft.lshBucketStats(sigs16, bands = 16, rowsPerBand = 1)
        .show(20, truncate = false))

    def sigsPrefix(n: Int) =
      sigs16.select((col("id") +: (1 to n).map(i => col(s"h$i"))): _*)

    def edges(bands: Int, rows: Int, minAgree: Int): (Long, Long, Set[(Long, Long)], Double) = {
      val nh = bands * rows
      val t0 = System.nanoTime()
      val pairs = graft.api.Graft.nearDupPairs(sigsPrefix(nh),
        bands = bands, rowsPerBand = rows, minAgreement = 1).cache()
      val nCand = pairs.count()
      val agreed = pairs.where(col("n_match") >= minAgree)
      val nAgreed = agreed.count()
      val ver = graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", agreed)
        .where($"jaccard" >= 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      pairs.unpersist()
      (nCand, nAgreed, ver, secs)
    }

    // ground truth: 16 bands x 1 row, no agreement cut -> verify exactly.
    // recall at J=0.5 is 1-(0.5)^16 ~ 0.999985.
    val (gtCand, _, eTrue, gtSecs) = t("ground truth 16x1")(edges(16, 1, 1))
    println(f"[scratch] GT: cand=$gtCand%d trueEdges(J>=0.5)=${eTrue.size}%d (${gtSecs}%.1fs)")

    val plans = Seq(
      ("current 4x2 agree>=4/8", 4, 2, 4),
      ("6x2 agree>=6/12", 6, 2, 6),
      ("4x3 agree>=6/12", 4, 3, 6),
      ("8x2 agree>=8/16", 8, 2, 8),
      ("4x4 agree>=8/16", 4, 4, 8),
      ("5x3 agree>=8/15", 5, 3, 8))
    for ((name, b, r, ma) <- plans) {
      val (nc, na, ev, secs) = edges(b, r, ma)
      val hit = ev.intersect(eTrue).size
      val rec = if (eTrue.isEmpty) 1.0 else hit.toDouble / eTrue.size
      val thRec = 1 - math.pow(1 - math.pow(0.5, r), b)
      println(f"[scratch] $name%-24s cand=$nc%8d agreed=$na%6d verified=${ev.size}%5d " +
        f"recallVsGT=$rec%.4f (theory@0.5=$thRec%.3f) ${secs}%.2fs")
    }

    spark.stop()
  }
}
