package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for operator specs: one local[4] SparkSession per
  * suite, UTC, shuffle partitions pinned (determinism rules from
  * SURVEY.md §7.4 are test requirements). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for the next suite (shared JVM) — just clear cache
    spark.catalog.clearCache()
    super.afterAll()
  }
}
