package graft

import graft.medallion.{BronzeGen, Silver}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest variant the reference's unused checkpoints bucket
  * implies (SURVEY §1.1): bronze landing files arrive as a stream and flow
  * through the SAME silver expression library as batch — proving the
  * enrichment is a stateless projection usable in both modes.
  */
class StreamingSilverSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("silver enrichment runs identically over a bronze file stream") {
    import spark.implicits._
    val epoch = 1754982000L
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_silver").toString

    // land a seeded bronze batch as the "arriving" file
    val bronze = BronzeGen.generate(spark, 1000, 2, payloadKb = 1,
      seed = 7, baseEpochS = epoch)
    bronze.write.mode("overwrite").parquet(s"$dir/landing")

    def enrich(df: org.apache.spark.sql.DataFrame) =
      Silver.enrich(df,
        clockDate = to_date(timestamp_seconds(lit(epoch))),
        clockTs = timestamp_seconds(lit(epoch)),
        clockEpochS = lit(epoch))

    val stream = spark.readStream.schema(bronze.schema).parquet(s"$dir/landing")
    val q = enrich(stream)
      .groupBy($"customer_value_tier")
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_silver").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_silver")
    val batch = enrich(spark.read.parquet(s"$dir/landing"))
      .groupBy($"customer_value_tier").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
    assert(streamed.as[(String, Long)].collect().map(_._2).sum == bronze
      .filter(col("data_quality_flag") =!= "duplicate_suspected").count())
  }
}
