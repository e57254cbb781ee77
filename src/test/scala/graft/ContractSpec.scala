package graft

import org.apache.spark.sql.types._

/** Driver-contract invariants over the whole SparkEntry surface.
  *
  * The external comparator hashes scalar cells only — an array/map/struct
  * output column crashes its sort (observed in CORRECTNESS_r01.json:
  * pandas "unhashable type: numpy.ndarray"). Nested payloads must be
  * serialized (array_join / to_json) before they leave a query.
  */
class ContractSpec extends SparkSpec {

  test("every query's output schema is atomic-only (comparator-hashable)") {
    // Streaming queries execute eagerly even on schema access, so this
    // builds each plan once at sf0.001 (cheap) and checks dtypes only.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch {
            case e: Throwable => fail(
              s"$name failed to build its plan at $sf: ${e.getMessage}", e)
          }
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-atomic output columns (driver comparator crashes on these): " +
        offenders.mkString(", "))
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
