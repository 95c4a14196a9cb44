package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: micro-batch progress breakdown of the streaming gates
  * (round-10 adjudication of the st02/st04 floor). */
object StProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[st] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(spark.range(1000).agg(sum("id")).collect())
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[st]   batch ${p.batchId}: total=${p.batchDuration}ms " +
          s"durations=${p.durationMs} rows=${p.numInputRows} " +
          s"state=${p.stateOperators.map(s => s"rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms mem=${s.memoryUsedBytes}").mkString("; ")}")
      }
    }
    spark.streams.addListener(listener)
    for (i <- 1 to 3) {
      t(s"st02 run $i")(graft.streaming.Streams.queries("st02_stream_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    for (i <- 1 to 3) {
      t(s"st04 run $i")(graft.streaming.Streams.queries("st04_stream_stream_join")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
