// temporary smoke main mirroring the driver's t1 check
package graft
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // UTC pin (ADVICE r14): the MICROS-era events loader casts
      // TIMESTAMP_NTZ through the session timezone — without the pin,
      // a non-UTC host shifts events.ts here while Bench/Verify/tests
      // (which all pin UTC) do not.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.sentinel(spark, "/root/testdata/sf0.001")
      .foreach(d => System.err.println(s"[sentinel] $d"))
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, false)
    spark.stop()
  }
}
