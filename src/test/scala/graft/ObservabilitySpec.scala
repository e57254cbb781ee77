package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** `Dataset.observe` — the audit-metrics hook a 100 TB pipeline needs:
  * row counts, null counts, and value sums collected DURING the main
  * job (piggybacked on the existing scan as accumulator-style
  * aggregates), instead of a second full pass over the data. This
  * spec proves the piggybacked metrics equal a separately-computed
  * aggregate, so a production job can assert data contracts for free. */
class ObservabilitySpec extends SparkSpec {
  import Exact._

  test("observe() collects audit metrics in the same pass as the real query") {
    import spark.implicits._
    val obs = Observation("lineitem_audit")
    val li = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        xsum($"l_quantity").as("sum_qty"),
        sum(when($"l_returnflag".isNull, 1).otherwise(0)).as("null_flags"))

    // the "real" job: an unrelated aggregation downstream of the scan
    val perFlag = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    val jobTotal = perFlag.agg(sum($"n")).as[Long].head()

    val metrics = obs.get
    assert(metrics("n_rows") == jobTotal,
      "observed row count must equal the job's own total")
    assert(metrics("null_flags") == 0L, "fixture has no null returnflags")

    // cross-check the piggybacked sum against a dedicated second pass
    val direct = Tables.lineitem(spark, sf)
      .agg(xsum($"l_quantity")).as[Double].head()
    assert(metrics("sum_qty") == direct,
      "exact decimal sum must match bit-for-bit across passes")
  }
}
