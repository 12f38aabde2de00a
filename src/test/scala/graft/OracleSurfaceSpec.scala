package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** Guard over the driver-hashed compare surface.
  *
  * History (r13–r15): DECIMAL output columns hashed red in the driver's
  * compare even when the repo's own DuckDB check proved every cell
  * bit-identical — `snapshot_widen_decimal` reproduced it four
  * independent ways in r13/r14, and r15 re-introduced the class six
  * times (`events_mv_dashboard`, `snapshot_mv_fresh/_join/_minmax/
  * _star`, `snapshot_wap`) while `snapshot_mv_retract` hashed an
  * IDENTICAL DECIMAL(20,2) shape green — value-dependent roulette.
  * The systemic rule this spec pins: no oracled query may emit a
  * DecimalType column. Exact fixed-point compare surfaces are hashed
  * as integer cents (`CAST(sum * 100 AS BIGINT)`) on both engines;
  * decimal arithmetic stays the feature UNDER the projection.
  *
  * The walk builds every oracled query at sf0.001 (side-effecting
  * scenario queries run their commits against temp dirs — that is the
  * honest schema, post-analysis) and fails on any DecimalType leaf,
  * including decimals nested inside structs/arrays/maps.
  */
class OracleSurfaceSpec extends SparkSpec {

  private def decimalLeaves(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.flatMap(f => decimalLeaves(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        decimalLeaves(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        decimalLeaves(m.keyType, s"$path.key") ++
          decimalLeaves(m.valueType, s"$path.value")
      case _ => Nil
    }

  test("no oracled query emits a DecimalType column " +
    "(driver hash compare surface must be decimal-free)") {
    val oracled = SparkEntry.queries.keySet
      .intersect(SparkEntry.oracleSql.keySet).toSeq.sorted
    assert(oracled.nonEmpty, "oracle surface must not be empty")
    val offenders = oracled.flatMap { name =>
      val schema =
        try SparkEntry.queries(name)(spark, sfDir).schema
        catch {
          case e: Throwable =>
            fail(s"query '$name' failed to build at sf0.001: $e")
        }
      decimalLeaves(schema, name)
    }
    assert(offenders.isEmpty,
      s"DecimalType columns on the hashed compare surface (hash " +
        s"red even when cell-identical — see scaladoc): " +
        offenders.mkString(", "))
  }
}
