package graft
import org.apache.spark.sql.SparkSession
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q70_name_match")(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    println("[p2] input partitions: " + Tables.part(spark, "/root/testdata/sf0.1").rdd.getNumPartitions)
    spark.stop()
  }
}
