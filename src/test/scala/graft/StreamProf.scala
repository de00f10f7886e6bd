package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q70 = SparkEntry.queries("q70_tumbling")
    for (p <- Seq(32, 8, 2)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      timed(s"q70 warm p=$p")(q70(spark, dir).write.format("noop").mode("overwrite").save())
      timed(s"q70 run2 p=$p")(q70(spark, dir).write.format("noop").mode("overwrite").save())
    }
    val q78 = SparkEntry.queries("q78_stream_stream_join")
    for (p <- Seq(32, 8)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      timed(s"q78 warm p=$p")(q78(spark, dir).write.format("noop").mode("overwrite").save())
      timed(s"q78 run2 p=$p")(q78(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
