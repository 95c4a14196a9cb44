package graft

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("binary payloads are 96 deterministic bytes with typed metadata") {
    val df = Multimodal.mm01BinaryFeatures(spark, dir)
    val row = df.head()
    assert(row.getAs[Long]("n_bytes") == 96)
    assert(row.getAs[String]("format") == "fake/v1")
    assert(row.getAs[String]("magic").length == 8)
    // re-running produces identical hashes (fully deterministic synthesis)
    val h1 = df.agg(max(col("payload_md5"))).head().getString(0)
    val h2 = Multimodal.mm01BinaryFeatures(spark, dir)
      .agg(max(col("payload_md5"))).head().getString(0)
    assert(h1 == h2)
  }

  test("decode stage produces stable per-source aggregates") {
    val df = Multimodal.mm02DecodeFeatures(spark, dir).cache()
    assert(df.count() > 0)
    // norms are positive and bounded: each of 96 bytes contributes <= 1.0
    // to one of 16 dims, so per-dim sums <= 6 and norm <= sqrt(16*36) = 24
    val bad = df.filter(col("max_norm") <= 0 || col("max_norm") > 24).count()
    assert(bad == 0)
    // stable across runs (tolerance: the per-source double sum is
    // aggregation-order dependent in its last ulps)
    val a = df.agg(sum(col("total_norm"))).head().getDouble(0)
    val b = Multimodal.mm02DecodeFeatures(spark, dir)
      .agg(sum(col("total_norm"))).head().getDouble(0)
    assert(math.abs(a - b) <= math.abs(a) * 1e-9)
  }
}
