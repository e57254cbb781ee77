package graft
import org.apache.spark.sql.SparkSession
object ProfilePredict {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p] $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    time("topk (builds)")(graft.operators.CfOps.itemTopkNeighbors(spark, sfDir).count())
    time("predict 1")(graft.operators.CfOps.predictKnn(spark, sfDir).count())
    time("predict 2")(graft.operators.CfOps.predictKnn(spark, sfDir).count())
    spark.stop()
  }
}
