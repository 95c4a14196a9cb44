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
}
