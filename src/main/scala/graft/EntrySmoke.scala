package graft
import org.apache.spark.sql.SparkSession
/** Dev check: entry() must work on a pristine (driver-owned) session. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"entry rows=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
