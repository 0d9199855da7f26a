package graft.functions

import java.util.Arrays

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The positional-deletion-vector membership test as ONE codegen'd
  * Catalyst predicate: `deleted(file, position)` over a BROADCAST map
  * of per-file sorted position arrays — the scan-stage mask that makes
  * `CowTable.deleteWhereDv`'s read side a FILTER instead of an
  * anti-join (Delta/Iceberg deletion-vector economics: the mask rides
  * inside the scan's whole-stage-codegen span; no build side, no probe
  * table, no shuffle).
  *
  * Children are `_metadata.file_path` (string) and
  * `_metadata.row_index` (long). Per row the cost is one UTF8String
  * equality against the last-seen file (file rows arrive in runs, so
  * the path→positions resolution — URI decode + map lookup — runs once
  * per FILE per task thread) plus one binary search over that file's
  * positions. Files without an entry pay the equality check alone.
  *
  * The broadcast ships each executor the whole delete set once —
  * O(deleted positions × ~8 bytes), the same order Delta ships its
  * roaring bitmaps; a task only ever touches its own files' arrays.
  */
case class DvDeletedExpr(
    left: Expression,
    right: Expression,
    bc: Broadcast[Map[String, Array[Long]]])
  extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dv_deleted requires (string, long) children, got $other")
    }

  override def nullSafeEval(path: Any, idx: Any): Any =
    DvDeletedExpr.deleted(bc, path.asInstanceOf[UTF8String],
      idx.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dvBc", bc,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (p, i) =>
      s"${ev.value} = graft.functions.DvDeletedExpr.deleted($bcRef, $p, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeletedExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dv_deleted"
}

object DvDeletedExpr {

  private val Empty = Array.empty[Long]

  /** (broadcast id, last path, its positions) — keyed by the broadcast
    * too, so two DV sets over the SAME file in one query (two
    * time-travel snapshots of one table) can never serve each other's
    * arrays from the cache.
    */
  private val cache = new ThreadLocal[(Long, UTF8String, Array[Long])]

  /** Shared by interpreted eval and generated code. */
  def deleted(bc: Broadcast[_], path: UTF8String, idx: Long): Boolean = {
    val c = cache.get()
    val arr =
      if (c != null && c._1 == bc.id && c._2.equals(path)) c._3
      else {
        val m = bc.value.asInstanceOf[Map[String, Array[Long]]]
        val a = m.getOrElse(normalize(path.toString), Empty)
        cache.set((bc.id, path.clone(), a))
        a
      }
    arr.length > 0 && Arrays.binarySearch(arr, idx) >= 0
  }

  /** Canonical file identity: the DECODED scheme-less absolute path.
    * `_metadata.file_path` arrives URI-encoded (space→%20) and its
    * scheme form varies (`file:/` vs `file:///`); `URI.getPath`
    * collapses both — the SAME normalization the DV writer and the
    * mask builder apply, so the two sides can never drift.
    */
  def normalize(s: String): String =
    try {
      val p = new java.net.URI(s).getPath
      if (p == null) s else p
    } catch { case _: Exception => s }
}
