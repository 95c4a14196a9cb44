package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tolerance specs for the approximate aggregates. Sketch internals are
  * engine-specific by design, so the cross-engine gate can only row-count
  * them (m04's stance); the honest correctness check is intra-engine: the
  * approximation must land inside its own published error bound against
  * the exact aggregate it replaces. MedallionSpec covers the gold-KPI HLL
  * variant; this suite covers the general-purpose aggregates on the
  * testdata tables.
  */
class ApproxAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile honors its rank-error bound on events.value") {
    val events = Tables.load(spark, dir, "events").select(col("value")).cache()
    val n = events.count()
    val accuracy = 1000 // rank error bound: n / accuracy
    val eps = n.toDouble / accuracy
    val qs = Seq(0.25, 0.5, 0.9)
    val approx = events.agg(
      percentile_approx(col("value"), array(qs.map(lit(_)): _*), lit(accuracy)))
      .head().getSeq[Double](0)
    for ((q, a) <- qs.zip(approx)) {
      // the returned value must cover SOME rank within eps of q*n: its
      // occupied rank range is (count(< a), count(<= a)]
      val Array(cntLt, cntLe) = events.agg(
        count_if(col("value") < a), count_if(col("value") <= a))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val target = q * n
      assert(cntLe >= target - eps - 1 && cntLt <= target + eps + 1,
        s"q=$q: value $a occupies ranks (${cntLt + 1}..$cntLe], " +
          s"target $target +- $eps")
    }
    events.unpersist()
  }

  test("approx_count_distinct lands within 3*rsd of exact on events.user_id") {
    val events = Tables.load(spark, dir, "events")
    val rsd = 0.05
    val row = events.agg(
      countDistinct(col("user_id")),
      approx_count_distinct(col("user_id"), rsd)).head()
    val exact = row.getLong(0)
    val approx = row.getLong(1)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 3 * rsd, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("KMV sketch: exact below k, <=2% error above, nulls excluded") {
    import graft.functions.KmvCountDistinct.kmvCountDistinct
    import spark.implicits._
    // below k the sketch holds every hash -> exact
    val small = spark.range(1000).select(($"id" % 700).as("v"))
    assert(small.agg(kmvCountDistinct($"v")).head().getLong(0) == 700L)
    // far above k: xxhash64 is deterministic, so these observed errors are
    // reproducible constants — pinned inside the <=2% contract the sketch
    // is built for (k=8192 -> rse ~1.1%)
    for (card <- Seq(50000L, 500000L, 2000000L)) {
      val df = spark.range(card * 2).select(($"id" % card).as("v"))
      val est = df.agg(kmvCountDistinct($"v")).head().getLong(0)
      val relErr = math.abs(est - card).toDouble / card
      assert(relErr <= 0.02, s"card=$card est=$est relErr=$relErr")
    }
    // null exclusion, the approx_count_distinct contract
    val withNulls = spark.range(100)
      .select(when($"id" % 2 === 0, $"id").as("v"))
    assert(withNulls.agg(kmvCountDistinct($"v")).head().getLong(0) == 50L)
  }

  test("KMV sketch aggregates partially: map-side state before the exchange") {
    import graft.functions.KmvCountDistinct.kmvCountDistinct
    import spark.implicits._
    val df = spark.range(100000).select(($"id" % 7).as("g"), $"id".as("v"))
      .groupBy($"g").agg(kmvCountDistinct($"v").as("nd"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate; a partial and
    // a final node around the exchange prove each map task reduced its
    // rows to one 64KB state BEFORE shuffling (the 100 TB property: the
    // exchange carries sketches, not rows)
    assert(plan.split("ObjectHashAggregate").length - 1 >= 2, plan)
    assert(plan.contains("partial_kmv_count_distinct") ||
      plan.toLowerCase.contains("partial"), plan)
    // and the grouped results agree with exact distinct per group
    val exact = spark.range(100000).select(($"id" % 7).as("g"), $"id".as("v"))
      .groupBy($"g").agg(countDistinct($"v").as("nd"))
      .as[(Long, Long)].collect().toMap
    val est = df.as[(Long, Long)].collect().toMap
    for ((g, e) <- exact)
      assert(math.abs(est(g) - e).toDouble / e <= 0.02, s"group $g: ${est(g)} vs $e")
  }

  test("gold KPIs through the KMV sketch stay within 2% of exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_kmv_mdp").toString
    val cfg = graft.medallion.MdpConfig.fromEnv(base).copy(
      ingestGb = 0.002, payloadKb = 1, partitions = 4)
    graft.medallion.Pipeline.bronze(spark, cfg)
    val silver = graft.medallion.Silver.enrich(
      spark.read.parquet(cfg.bronzeUri)).cache()
    val exact = graft.medallion.Gold.kpis(silver).orderBy("interaction_date").collect()
    val sk = graft.medallion.Gold.kpisSketch(silver).orderBy("interaction_date").collect()
    val cols = Seq("daily_active_customers", "unique_email_addresses",
      "support_tickets_created")
    for ((e, s) <- exact.zip(sk); c <- cols) {
      val ev = e.getAs[Long](c).toDouble
      val sv = s.getAs[Long](c).toDouble
      assert(ev == 0 || math.abs(sv - ev) / ev <= 0.02,
        s"$c on ${e.get(0)}: sketch $sv vs exact $ev")
    }
    silver.unpersist()
  }

  test("ngramRepetitionProfile approxDistinct stays within the KMV bound") {
    // both modes of the t46 surface on the documents table: the exact
    // profile is the gate's contract; the approx mode must agree within
    // ~3/sqrt(k) on distinct_ngrams for every (grp, n) — the k-bounded
    // scale route when the gram space outgrows an exact distinct. k=1024
    // keeps the tolerance meaningful (~9.4%) at sf0.01 gram counts.
    val docs = Tables.load(spark, dir, "documents")
    val k = 1024
    val exact = api.Graft.ngramRepetitionProfile(
        docs, col("lang"), col("text"), maxN = 3)
      .select(col("grp"), col("n"), col("distinct_ngrams"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val approx = api.Graft.ngramRepetitionProfile(
        docs, col("lang"), col("text"), maxN = 3,
        approxDistinct = true, approxK = k)
      .select(col("grp"), col("n"), col("distinct_ngrams"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(exact.keySet == approx.keySet)
    val tol = 3.0 / math.sqrt(k.toDouble)
    for ((key, e) <- exact) {
      val a = approx(key)
      if (e <= k) assert(a == e, s"$key: below k must be exact ($a vs $e)")
      else {
        val relErr = math.abs(a - e).toDouble / e
        assert(relErr <= tol, s"$key: exact=$e approx=$a relErr=$relErr > $tol")
      }
    }
  }

  test("MG sketch: exact below m, superset + undercount bound above") {
    import graft.functions.MgFrequencySketch.mgSketch
    import spark.implicits._
    // vocabulary <= m: no decrement ever fires, so every count is exact
    val small = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i")).toDF("tok")
      .repartition(6)
    val exactRow = small.agg(mgSketch($"tok", 64).as("s"))
      .select($"s.total", $"s.candidates").head()
    assert(exactRow.getLong(0) == (1 to 40).sum.toLong)
    val cands = exactRow.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands == (1 to 40).map(i => s"t$i" -> i.toLong).toMap)

    // adversarial: m=8 counters against 200 distinct two-count noise
    // tokens + three genuinely frequent ones; every estimate must obey
    // est >= true - total/(m+1) and the frequent tokens must all survive
    val m = 8
    val toks = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(120)("c") ++
      (1 to 200).flatMap(i => Seq(s"n$i", s"n$i"))).toDF("tok")
    for (parts <- Seq(1, 7)) {
      val row = toks.repartition(parts).agg(mgSketch($"tok", m).as("s"))
        .select($"s.total", $"s.candidates").head()
      val total = row.getLong(0)
      assert(total == 1320L)
      val est = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= m)
      val err = total / (m + 1) // 146
      val truth = Map("a" -> 500L, "b" -> 300L, "c" -> 120L)
        .withDefaultValue(2L)
      for ((t, e) <- est) {
        assert(e <= truth(t), s"parts=$parts $t overcounted: $e > ${truth(t)}")
        assert(e >= truth(t) - err, s"parts=$parts $t: $e < ${truth(t)} - $err")
      }
      // anything with true count > total/(m+1) is guaranteed present
      for ((t, c) <- truth if c > err)
        assert(est.contains(t), s"parts=$parts lost guaranteed hitter $t")
    }
  }

  test("MG sketch aggregates partially: bounded state before the exchange") {
    import graft.functions.MgFrequencySketch.mgSketch
    import spark.implicits._
    val df = spark.range(100000)
      .select(($"id" % 5).as("g"), concat(lit("w"), $"id" % 1000).as("tok"))
      .groupBy($"g").agg(mgSketch($"tok", 32).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("ObjectHashAggregate").length - 1 >= 2, plan)
    assert(plan.contains("partial_mg_frequency_sketch") ||
      plan.toLowerCase.contains("partial"), plan)
  }
}
