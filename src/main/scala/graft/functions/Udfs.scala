package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF kernels (SURVEY.md §2.10).
  *
  * Float discipline: cross-row / cross-element accumulation is done in
  * exact java.math.BigDecimal with each double term rounded to a fixed
  * decimal scale HALF_UP — bit-for-bit the semantics of Spark's (and
  * DuckDB's) `CAST(double AS DECIMAL(38,s))` + exact decimal SUM. This
  * makes every kernel order-independent: task retries, partition count,
  * and shuffle order cannot change the output bytes (the 100 TB
  * determinism story, SURVEY.md §7.4).
  */
object Udfs {

  /** double → exact decimal at `scale`, same as CAST(x AS DECIMAL(38,scale)). */
  private def dec(x: Double, scale: Int): JBigDecimal =
    new JBigDecimal(x, MathContext.UNLIMITED).setScale(scale, RoundingMode.HALF_UP)

  /** Cosine similarity of two float vectors; decimal-exact partial sums
    * (scale 12) so the result is order-independent and matches a SQL
    * oracle built from DECIMAL(38,12) sums. */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = JBigDecimal.ZERO
    var na = JBigDecimal.ZERO
    var nb = JBigDecimal.ZERO
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot = dot.add(dec(x * y, 12))
      na = na.add(dec(x * x, 12))
      nb = nb.add(dec(y * y, 12))
      i += 1
    }
    val denom = math.sqrt(na.doubleValue) * math.sqrt(nb.doubleValue)
    if (denom == 0.0) 0.0 else dot.doubleValue / denom
  }

  /** Registered-UDF form of [[cosine]]. */
  val cosineUdf = udf(cosine _)

  /** RMSE buffer: exact decimal sum of squared errors + count. */
  case class RmseBuf(sumSe: JBigDecimal, n: Long)

  /** Typed RMSE aggregator (MR evaluation job). Input rows are
    * (prediction, actual); squared error is computed per-row in IEEE
    * double (deterministic), then accumulated as DECIMAL(38,6) — the
    * exact semantics of the SQL oracle
    * `sqrt(CAST(SUM(CAST((p-a)*(p-a) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))`. */
  object RmseAgg extends Aggregator[(Double, Double), RmseBuf, Double] {
    def zero: RmseBuf = RmseBuf(JBigDecimal.ZERO, 0L)
    def reduce(b: RmseBuf, in: (Double, Double)): RmseBuf = {
      val e = in._1 - in._2
      RmseBuf(b.sumSe.add(dec(e * e, 6)), b.n + 1)
    }
    def merge(x: RmseBuf, y: RmseBuf): RmseBuf =
      RmseBuf(x.sumSe.add(y.sumSe), x.n + y.n)
    def finish(b: RmseBuf): Double =
      if (b.n == 0) 0.0 else math.sqrt(b.sumSe.doubleValue / b.n)
    def bufferEncoder: Encoder[RmseBuf] = Encoders.kryo[RmseBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API RMSE, usable in any agg position. */
  val rmse: (Column, Column) => Column = {
    val f = udaf(RmseAgg)
    (p, a) => f(p, a)
  }

  /** Codegen'd decimal-exact cosine as a SQL expression over two
    * array<float> columns — same semantics as [[cosine]] but stays
    * inside whole-stage codegen (no UDF boxing, no per-row
    * java.math.BigDecimal exact-expansion cost): ~20× faster on
    * pairwise joins. DECIMAL(30,12) keeps the fold type-stable (see
    * FnOps.sqSumExpr). */
  def cosSimExpr(a: String, b: String): String = {
    def fold(terms: String) =
      s"""cast(aggregate($terms,
         |  cast(0 as decimal(30,12)),
         |  (acc, t) -> cast(acc + t as decimal(30,12))) as double)""".stripMargin
    val dot = fold(s"zip_with($a, $b, (x, y) -> cast(cast(x as double) * cast(y as double) as decimal(30,12)))")
    val na = fold(s"transform($a, x -> cast(cast(x as double) * cast(x as double) as decimal(30,12)))")
    val nb = fold(s"transform($b, x -> cast(cast(x as double) * cast(x as double) as decimal(30,12)))")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  /** Fast deterministic cosine over two array<float> columns in plain
    * IEEE double: Spark's `aggregate` higher-order fold and DuckDB's
    * `list_reduce` are both strictly sequential over ascending index,
    * so the double summation — normally order-nondeterministic across
    * a shuffle — is bit-identical here BY CONSTRUCTION (same terms,
    * same order, same IEEE ops). Used for pairwise hot paths where
    * the decimal kernel's cost matters; [[sqlCosSimDbl]] is the twin. */
  def cosSimDblExpr(a: String, b: String): String = {
    def fold(terms: String) =
      s"aggregate($terms, cast(0 as double), (acc, t) -> acc + t)"
    val dot = fold(s"zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double))")
    val na = fold(s"transform($a, x -> cast(x as double) * cast(x as double))")
    val nb = fold(s"transform($b, x -> cast(x as double) * cast(x as double))")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  /** DuckDB twin of [[cosSimDblExpr]] — identical term order and IEEE
    * operations (list_reduce folds left-to-right). */
  def sqlCosSimDbl(a: String, b: String): String = {
    def fold(terms: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $terms), (acc, t) -> acc + t)"
    val dot = fold(s"list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))")
    val na = fold(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val nb = fold(s"list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  /** Round to 6 decimals via the decimal-cast path — the ONLY rounding
    * that is bit-identical across Spark and DuckDB (`round()` on
    * doubles disagrees between the two on values like 2.675).
    *
    * The +1e-12 nudge (identical on both sides, so comparisons are
    * unaffected) closes the EXACT-HALF-BOUNDARY class: a ratio of a
    * 6-decimal quantity by a small integer routinely lands exactly on
    * a 5e-7 boundary (e.g. 67.76659/20 = 3.3883295), where Spark's
    * exact-BigDecimal HALF_UP and DuckDB's double-space rounding of
    * the SAME double can disagree on the last digit (observed:
    * q_text_perplexity sf0.1 doc 361). The nudge pushes every exact
    * half decisively above the boundary in BOTH engines; values not
    * within 1e-12 of a boundary are untouched (5e-7 ≫ 1e-12), and
    * magnitudes where 1e-12 is below one ulp absorb it as a no-op. */
  def rnd6(c: Column): Column =
    (c + org.apache.spark.sql.functions.lit(1e-12))
      .cast(org.apache.spark.sql.types.DecimalType(38, 6))
      .cast(org.apache.spark.sql.types.DoubleType)

  /** SQL twin of [[rnd6]]. */
  def sqlRnd6(e: String): String =
    s"CAST(CAST(($e) + 1e-12 AS DECIMAL(38,6)) AS DOUBLE)"
}
