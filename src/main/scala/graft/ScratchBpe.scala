package graft
import org.apache.spark.sql.SparkSession
object ScratchBpe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val out = graft.queries.DocQueries.bpeMergesBatched(
      graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents"), n)
      .collect()
    println(s"merges=${out.length} secs=${(System.nanoTime()-t0)/1e9}")
    out.take(5).foreach(println)
  }
}
