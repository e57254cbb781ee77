package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.ml.recommendation.ALS
object ProfileAls {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val r = graft.operators.CfOps.ratingsDerive(spark, sfDir)
      .select($"user_id".cast("int").as("user"), $"item_id".cast("int").as("item"),
        $"rating".cast("float").as("rating")).cache()
    println(s"[als] n=${r.count()} partitions=${r.rdd.getNumPartitions}")
    def run(tag: String, blocks: Int): Unit = {
      val t0 = System.nanoTime()
      val als = new ALS().setUserCol("user").setItemCol("item").setRatingCol("rating")
        .setRank(8).setMaxIter(4).setRegParam(0.1).setSeed(42L)
        .setColdStartStrategy("drop")
      if (blocks > 0) { als.setNumUserBlocks(blocks); als.setNumItemBlocks(blocks) }
      val m = als.fit(r)
      val t1 = System.nanoTime()
      val n = m.recommendForAllUsers(10).count()
      println(f"[als] $tag%-12s fit=${(t1-t0)/1e9}%6.2f rec=${(System.nanoTime()-t1)/1e9}%6.2f rows=$n")
    }
    run("warmup", 8)
    run("default", -1)
    run("blocks=1", 1)
    run("blocks=2", 2)
    run("blocks=4", 4)
    run("blocks=8", 8)
    run("blocks=16", 16)
    run("blocks=32", 32)
    spark.stop()
  }
}
