package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.SchemaCompat

/** Backward-compatibility classification of schema evolution
  * (types/SchemaCompat.scala). */
class SchemaCompatSpec extends AnyFunSuite {

  private def s(fields: StructField*) = StructType(fields)

  test("safe evolutions: nullable adds and numeric/decimal widenings") {
    val cur = s(
      StructField("id", IntegerType, nullable = false),
      StructField("amount", FloatType),
      StructField("d", DecimalType(10, 2)))
    val prop = s(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType),
      StructField("d", DecimalType(20, 4)),
      StructField("note", StringType, nullable = true))
    val r = SchemaCompat.check(cur, prop)
    assert(r.compatible, r.breaking.mkString("; "))
    assert(r.changes.map(_.kind).sorted ==
      Seq("added", "widened", "widened", "widened"))
  }

  test("breaking evolutions: drop, narrow, retype, required add, " +
      "nullable->required") {
    val cur = s(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("tag", StringType, nullable = true))
    val prop = s(
      StructField("id", IntegerType),          // narrowed
      StructField("v", StringType),            // retyped
      StructField("tag", StringType, nullable = false), // requiredness
      StructField("must", LongType, nullable = false))  // required add
    val r = SchemaCompat.check(cur, prop)
    assert(!r.compatible)
    assert(r.breaking.map(_.kind).sorted ==
      Seq("added", "narrowed", "requiredness", "retyped"))
    // a rename reads as drop + add, both surfaced
    val renamed = SchemaCompat.check(
      s(StructField("a", LongType)), s(StructField("b", LongType)))
    assert(renamed.changes.map(_.kind).sorted == Seq("added", "dropped"))
    assert(!renamed.compatible)
  }

  test("nested paths recurse: struct fields, array elements, map values") {
    val cur = s(StructField("meta", s(
      StructField("tags", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, FloatType)))))
    val prop = s(StructField("meta", s(
      StructField("tags", ArrayType(LongType)),
      StructField("kv", MapType(StringType, DoubleType)))))
    val r = SchemaCompat.check(cur, prop)
    assert(r.compatible)
    assert(r.changes.map(_.path).sorted ==
      Seq("meta.kv{value}", "meta.tags[]"))
    // decimal scale shrink is NOT a widening even when precision grows
    val d = SchemaCompat.check(
      s(StructField("x", DecimalType(10, 4))),
      s(StructField("x", DecimalType(20, 2))))
    assert(!d.compatible && d.breaking.head.kind == "retyped")
    // element/value nullability narrowing breaks like struct fields
    val en = SchemaCompat.check(
      s(StructField("a", ArrayType(LongType, containsNull = true)),
        StructField("m", MapType(StringType, LongType,
          valueContainsNull = true))),
      s(StructField("a", ArrayType(LongType, containsNull = false)),
        StructField("m", MapType(StringType, LongType,
          valueContainsNull = false))))
    assert(!en.compatible)
    assert(en.breaking.map(_.path).sorted == Seq("a[]", "m{value}"))
  }
}
