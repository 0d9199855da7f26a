package graft.types

import org.apache.spark.sql.types._

/** Schema-evolution compatibility checker — the CONTRACT half of the
  * evolution features the engine already executes (Merge.upsertEvolve,
  * the evolving streaming sink, CowTable's grow-only commit check):
  * given a reader's current schema and a producer's proposed one,
  * classify every change and say whether readers keep working.
  *
  * The contract checked — stated precisely, because "backward" means
  * different things in different ecosystems: the PROPOSED schema
  * becomes the table schema, and it must (a) read every EXISTING file
  * (new-reader/old-data, Avro's BACKWARD) and (b) keep the table
  * grow-only (drops/renames flagged, matching CowTable's commit
  * check) — the lake-table convention, where widenings are safe
  * because old files upcast into the new schema on read. A
  * static-typed consumer pinned to the OLD schema reading NEW files
  * (FORWARD compatibility) is a different gate this checker does not
  * claim to cover.
  *   - adding a nullable column: OK (old rows read NULL through
  *     evolving sinks)
  *   - widening a numeric type along the safe lattice
  *     byte→short→int→long and float→double, plus decimal growing to
  *     a strictly-containing (precision, scale): OK
  *   - dropping a column, renaming (= drop + add), narrowing a type,
  *     nullable→required: BREAKING
  * Nested structs recurse with dotted paths; arrays/maps recurse into
  * element/key/value types.
  *
  * The report is data, not a boolean — pipelines gate on
  * `compatible` and surface `changes` in their audit logs (the
  * reference logs schema drift the same way its exception table logs
  * row errors).
  */
object SchemaCompat {

  final case class Change(
      path: String,
      kind: String, // added | dropped | widened | narrowed | retyped | requiredness
      breaking: Boolean,
      detail: String)

  final case class Report(changes: Seq[Change]) {
    def compatible: Boolean = !changes.exists(_.breaking)
    def breaking: Seq[Change] = changes.filter(_.breaking)
  }

  private val widenOrder: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  private def isWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if widenOrder.contains(f) && widenOrder.contains(t) =>
        widenOrder(f) < widenOrder(t)
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        // every value of (p1,s1) must fit (p2,s2): scale must not
        // shrink and integer digits must not shrink
        t.scale >= f.scale &&
          (t.precision - t.scale) >= (f.precision - f.scale) &&
          (t.precision > f.precision || t.scale > f.scale)
      case _ => false
    }

  /** Compare `proposed` against `current` for backward compatibility. */
  def check(current: StructType, proposed: StructType): Report =
    Report(diff(current, proposed, ""))

  private def diff(
      cur: StructType, prop: StructType, prefix: String): Seq[Change] = {
    val curByName = cur.fields.map(f => f.name -> f).toMap
    val propByName = prop.fields.map(f => f.name -> f).toMap
    val dropped = cur.fields.filterNot(f => propByName.contains(f.name))
      .map(f => Change(s"$prefix${f.name}", "dropped", breaking = true,
        s"column removed (was ${f.dataType.simpleString})"))
    val added = prop.fields.filterNot(f => curByName.contains(f.name)).map {
      f =>
        if (f.nullable)
          Change(s"$prefix${f.name}", "added", breaking = false,
            s"nullable column added (${f.dataType.simpleString})")
        else
          Change(s"$prefix${f.name}", "added", breaking = true,
            "REQUIRED column added — old data has no value for it")
    }
    val changed = cur.fields.flatMap { cf =>
      propByName.get(cf.name).toSeq.flatMap { pf =>
        val path = s"$prefix${cf.name}"
        val requiredness =
          if (cf.nullable && !pf.nullable)
            Seq(Change(path, "requiredness", breaking = true,
              "nullable -> required: existing NULLs become invalid"))
          else Nil
        requiredness ++ typeDiff(cf.dataType, pf.dataType, path)
      }
    }
    dropped.toSeq ++ added.toSeq ++ changed
  }

  private def typeDiff(
      cur: DataType, prop: DataType, path: String): Seq[Change] =
    (cur, prop) match {
      case (c, p) if c == p => Nil
      case (c: StructType, p: StructType) => diff(c, p, s"$path.")
      case (c: ArrayType, p: ArrayType) =>
        // element-nullability narrowing breaks exactly like a struct
        // field's nullable -> required
        (if (c.containsNull && !p.containsNull)
          Seq(Change(s"$path[]", "requiredness", breaking = true,
            "array elements nullable -> required: existing NULL " +
              "elements become invalid"))
        else Nil) ++
          typeDiff(c.elementType, p.elementType, s"$path[]")
      case (c: MapType, p: MapType) =>
        (if (c.valueContainsNull && !p.valueContainsNull)
          Seq(Change(s"$path{value}", "requiredness", breaking = true,
            "map values nullable -> required: existing NULL values " +
              "become invalid"))
        else Nil) ++
          typeDiff(c.keyType, p.keyType, s"$path{key}") ++
          typeDiff(c.valueType, p.valueType, s"$path{value}")
      case (c, p) if isWidening(c, p) =>
        Seq(Change(path, "widened", breaking = false,
          s"${c.simpleString} -> ${p.simpleString}"))
      case (c, p) if isWidening(p, c) =>
        Seq(Change(path, "narrowed", breaking = true,
          s"${c.simpleString} -> ${p.simpleString}: values may not fit"))
      case (c, p) =>
        Seq(Change(path, "retyped", breaking = true,
          s"${c.simpleString} -> ${p.simpleString}"))
    }
}
