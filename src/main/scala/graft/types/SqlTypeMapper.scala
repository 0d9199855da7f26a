package graft.types

import org.apache.spark.sql.types._

/** Declarative SQL-type → Spark-type mapping.
  *
  * Re-expresses the reference's three hand-written coercion tables
  * (reference: commons/utilities.py:201-225 `sql_to_python`,
  * commons/utilities.py:239-265 `convert_type`,
  * jobs/raw/dl_rw_job.py:44-57 pyarrow schema) as one table with two
  * modes:
  *
  *  - `legacy` reproduces the reference's lossy physical layer: temporals
  *    stored as strings, decimal/numeric as double (reference:
  *    jobs/raw/dl_rw_job.py:49-51).
  *  - `strict` maps every declared SQL type to its faithful Spark type
  *    (real DateType/TimestampType/DecimalType) — the mode a new
  *    deployment should use.
  */
object SqlTypeMapper {

  /** Normalizes "DECIMAL(10,2)" → ("decimal", Some(10), Some(2)). */
  private val Parameterized = """([a-zA-Z ]+)\s*\((\d+)\s*(?:,\s*(\d+))?\)""".r

  def parse(declared: String): (String, Option[Int], Option[Int]) =
    declared.trim.toLowerCase match {
      case Parameterized(base, p, s) =>
        (base.trim, Some(p.toInt), Option(s).map(_.toInt))
      case other => (other, None, None)
    }

  def toSpark(declared: String, legacy: Boolean = false): DataType = {
    val (base, precision, scale) = parse(declared)
    base match {
      case "bigint"                                  => LongType
      case "int" | "integer" | "mediumint"           => IntegerType
      case "smallint" | "tinyint" | "year"           => IntegerType
      case "decimal" | "numeric" =>
        if (legacy) DoubleType
        else {
          // SQL: DECIMAL(p) means scale 0; bare DECIMAL gets Spark's
          // default (38,18). A scale default of 18 with declared p<18
          // would throw (scale > precision) and misplace the point.
          val p = precision.getOrElse(38)
          val s = scale.getOrElse(if (precision.isDefined) 0 else 18)
          DecimalType(p, s)
        }
      case "real" | "float"                          => FloatType
      case "double" | "double precision"             => DoubleType
      case "char" | "varchar" | "text" | "string"    => StringType
      case "boolean" | "bool"                        => BooleanType
      case "date"                                    => if (legacy) StringType else DateType
      case "datetime" | "timestamp"                  => if (legacy) StringType else TimestampType
      case "time"                                    => StringType
      case "json" | "jsonb"                          => StringType // pass-through; from_json on demand
      case "blob" | "bytea" | "binary" | "varbinary" => BinaryType
      case "bit"                                     => IntegerType // reference: commons/utilities.py:260 big-endian int
      case _                                         => StringType // unknown → string fallback (utilities.py:262)
    }
  }

  /** Builds a StructType from declared (name, sqlType) pairs — the analog
    * of the reference's metadata-driven schema construction
    * (reference: commons/utilities.py:184-199).
    */
  def toStruct(columns: Seq[(String, String)], legacy: Boolean = false): StructType =
    StructType(columns.map { case (n, t) =>
      StructField(n, toSpark(t, legacy), nullable = true)
    })
}
