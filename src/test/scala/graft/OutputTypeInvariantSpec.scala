package graft

import org.apache.spark.sql.types._

import graft.testkit.SparkTestBase

/**
 * Battery-wide output-type invariant (round-16, VERDICT item 2): the
 * driver's DuckDB oracle family only ever emits DOUBLE / BIGINT / strings /
 * dates — never DECIMAL — so a DecimalType column in any
 * [[SparkEntry.queries]] result is a latent hash mismatch even when every
 * value is numerically identical (a Spark SQL literal like `100.0` parses
 * as DECIMAL(3,1) and quietly infects the whole expression; DECIMAL(24,2)
 * serializes `1251869314.00` where DOUBLE prints `1251869314.0`). This
 * spec would have been red on round-15's `grouping_sets_revenue`.
 *
 * Only analysis runs per query (`.schema` — no jobs), so the walk over the
 * full battery is cheap; queries whose CONSTRUCTION runs driver fixpoints
 * (components/hits) execute on the tiny sf0.001 tables.
 */
class OutputTypeInvariantSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType  => true
    case a: ArrayType    => hasDecimal(a.elementType)
    case m: MapType      => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case s: StructType   => s.fields.exists(f => hasDecimal(f.dataType))
    case _               => false
  }

  test("no battery query emits a DecimalType column (oracle family is DOUBLE/BIGINT)") {
    val offenders = Queries.all.flatMap { case (name, fn, _) =>
      val schema =
        try fn(spark, sfDir).schema
        catch { case e: Throwable => fail(s"$name failed to analyze: ${e.getMessage}") }
      schema.fields.collect {
        case f if hasDecimal(f.dataType) => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    withClue("DecimalType outputs diverge from the DOUBLE oracle at hash time:\n" +
             offenders.mkString("\n") + "\n") {
      offenders shouldBe empty
    }
  }
}
