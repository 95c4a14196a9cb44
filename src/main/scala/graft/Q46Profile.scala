package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness: per-expression cost of the q46 try_* gate — which of the
  * five error-safe expressions carries the 2.8 s. */
object Q46Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q46] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val ev = Tables.load(spark, dir, "events").cache()
    println(s"[q46] rows: ${ev.count()}")
    def run(c: org.apache.spark.sql.Column, name: String): Unit =
      t(name)(ev.select($"event_id", c.as("x")).orderBy($"event_id")
        .write.format("noop").mode("overwrite").save())
    run(lit(1), "baseline-sort")
    run(expr("try_divide(value, pmod(event_id, 3))"), "try_divide")
    run(expr("try_cast(event_type AS BIGINT)"), "try_cast")
    run(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), "get_json_object")
    run(expr("try_element_at(split(event_type, 'a'), 2)"), "try_element_at")
    run(expr("try_to_number(cast(value as string), '999999.99')")
      .cast(DoubleType), "try_to_number")
    run(expr("from_json(props, 'k BIGINT').k"), "from_json-alt")
    t("full gate")(graft.ops.Extras.q46TryFuncs(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
