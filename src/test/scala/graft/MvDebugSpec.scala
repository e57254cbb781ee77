package graft
import org.apache.spark.sql.functions._
class MvDebugSpec extends SparkSpec {
  test("dump") {
    import spark.implicits._
    import graft.engine.Exact._
    val raw = graft.engine.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), xsum($"l_quantity").as("sum_qty"))
    val an = raw.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].queryExecution.analyzed
    println("==ANALYZED==")
    println(an.treeString)
    an.foreach {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.foreach { ne =>
          println("AGGEXPR: " + ne.getClass.getSimpleName + " :: " + ne)
          ne.foreach(e => println("  node " + e.getClass.getName + " -> " + e.toString.take(100)))
        }
      case _ =>
    }
  }
}
