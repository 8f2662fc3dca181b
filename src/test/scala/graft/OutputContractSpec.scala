package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Output-class contract: every registered query must emit only
  * driver-stable column types at its OUTPUT edge. The verification
  * driver hashes Spark's parquet dump against DuckDB's fetch of the
  * oracle SQL, and the hash is sensitive to the Python value CLASS
  * each engine's client library materializes — `Decimal('5')` vs
  * `int 5` mismatch on equal values. Two rounds of forensics (r12/
  * r13) traced the suite's only red row to its only decimal-typed
  * output columns, bit-identical on local replay: decimal at the
  * edge is a cross-driver fetch gamble even when both sides agree.
  *
  * Contract: outputs use only {string, long, double, boolean, date,
  * timestamp, int} — plus arrays of those where an operator pins an
  * array output. int is admitted alongside long because both fetch
  * as Python int from parquet and DuckDB alike; decimal, float32,
  * short, byte and binary are banned at the edge (decimal fetches as
  * Decimal, float32 loses repr congruence, short/byte/binary have no
  * tested fetch path). Internal algebra may use anything — this
  * checks `.schema` of the returned frame only.
  *
  * Schema-only: analysis, no execution — the whole registry checks
  * in seconds.
  */
class OutputContractSpec extends AnyFunSuite with SparkFixture {

  private val allowedLeaf: Set[DataType] = Set(
    StringType, LongType, DoubleType, BooleanType,
    DateType, TimestampType, IntegerType)

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(el, _) => allowedLeaf.contains(el)
    case other            => allowedLeaf.contains(other)
  }

  test("every registered query emits only driver-stable output types") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, Sf).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to ANALYZE against $Sf: ${e.getMessage}")
          }
        schema.fields.collect {
          case f if !ok(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(violations.isEmpty,
      s"non-driver-stable output columns (cast at the edge):\n  " +
        violations.mkString("\n  "))
  }
}
