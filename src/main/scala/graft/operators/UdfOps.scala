package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}
import graft.functions.Udfs

/** UDF / UDAF / UDTF surface (SURVEY.md §2.10).
  *
  * Scale notes: the cosine kernel is compute-bound, not filter-bound —
  * a black-box UDF is acceptable here (it can't defeat pushdown on its
  * inputs). The fixed query vector is broadcast (one row), so the scan
  * side streams with no shuffle.
  */
object UdfOps {
  import Exact._

  /** Cosine similarity of every embedding against the vec_id=0 query
    * vector (the similarity-search kernel). */
  def udfCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    e.crossJoin(broadcast(q))
      .select($"vec_id",
        Udfs.rnd6(Udfs.cosineUdf($"embedding", $"qv")).as("cos_sim"))
      .orderBy($"vec_id")
  }

  val udfCosineSql: String = {
    val t = "CAST(e.embedding[CAST(i.range AS INT)] AS DOUBLE)"
    val u = "CAST(q.qv[CAST(i.range AS INT)] AS DOUBLE)"
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |sums AS (
       |  SELECT e.vec_id,
       |    CAST(SUM(CAST($t * $u AS DECIMAL(38,12))) AS DOUBLE) AS dot,
       |    CAST(SUM(CAST($t * $t AS DECIMAL(38,12))) AS DOUBLE) AS na,
       |    CAST(SUM(CAST($u * $u AS DECIMAL(38,12))) AS DOUBLE) AS nb
       |  FROM embeddings e, q, range(1, 65) i GROUP BY e.vec_id
       |)
       |SELECT vec_id,
       |  ${Udfs.sqlRnd6("dot / (sqrt(na) * sqrt(nb))")} AS cos_sim
       |FROM sums ORDER BY vec_id""".stripMargin
  }

  /** RMSE of the user-mean predictor per event_type (MR: evaluation
    * job), via the typed decimal-exact Aggregator. */
  def udafRmse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val means = ev.groupBy($"user_id".as("mu_user"))
      .agg(xavg($"value").as("user_mean"))
    ev.join(broadcast(means), $"user_id" === $"mu_user")
      .groupBy($"event_type")
      .agg(Udfs.rmse(col("user_mean"), col("value")).as("rmse"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val udafRmseSql: String =
    s"""WITH means AS (
       |  SELECT user_id, ${sqlXavg("value")} AS user_mean
       |  FROM events GROUP BY user_id
       |)
       |SELECT e.event_type,
       |  sqrt(CAST(SUM(CAST((m.user_mean - e.value) * (m.user_mean - e.value)
       |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) AS rmse,
       |  COUNT(*) AS n
       |FROM events e JOIN means m ON e.user_id = m.user_id
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Generator/UDTF: text → token rows via explode(split(…)). */
  def udtfTokenize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      .orderBy($"doc_id", $"token")
  }

  val udtfTokenizeSql: String =
    """SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |FROM documents ORDER BY doc_id, token""".stripMargin

  /** Ordinal generator: posexplode keeps each token's position — the
    * generator variant sequence-aware pipelines (n-gram windows,
    * span labeling) need. Same map-side explode cost as
    * [[udtfTokenize]]; the ordinal is free (no window, no shuffle).
    * DuckDB twin: zipped unnest + generate_subscripts (1-based, hence
    * the −1). */
  def udtfPosexplode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", posexplode(split(lower($"text"), " ")))
      .select($"doc_id", $"pos", $"col".as("token"))
      .orderBy($"doc_id", $"pos")
  }

  val udtfPosexplodeSql: String =
    """SELECT doc_id,
      |  generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos,
      |  unnest(string_split(lower(text), ' ')) AS token
      |FROM documents ORDER BY doc_id, pos""".stripMargin
}
