package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parameterized multi-statement SQL executor (SURVEY §2.1 S13;
  * reference: commons/utilities.py:54-86 — read .sql file, substitute
  * `{project}`/`{env}`/`{batch_id}`, submit per statement).
  *
  * Reproduces the reference's env → dataset-prefix mapping
  * (utilities.py:72-73: "dp" if env=="prod" else "dd") as a derived
  * parameter, and splits on `;` like the reference's per-statement loop.
  */
object SqlRunner {

  def substitute(sql: String, params: Map[String, String]): String = {
    val derived =
      params.get("env") match {
        case Some(env) =>
          params + ("env_prefix" -> (if (env == "prod") "dp" else "dd"))
        case None => params
      }
    derived.foldLeft(sql) { case (s, (k, v)) => s.replace(s"{$k}", v) }
  }

  /** Statement splitter that respects single/double-quoted literals
    * (with '' escaping) and `--` line comments — a naive split(";")
    * breaks any statement containing a semicolon in a string.
    */
  private[graft] def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) {
          // doubled quote = escaped quote inside the literal
          if (i + 1 < sql.length && sql.charAt(i + 1) == quote) {
            cur += quote; i += 1
          } else quote = 0
        }
      } else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
        cur += '\n'
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        // block comment (non-nested): skip to the closing */
        i += 2
        while (i + 1 < sql.length &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i += 1 // lands on '/'; loop increment steps past it
        cur += ' '
      } else if (c == ';') { out += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Runs each non-empty `;`-separated statement; returns the result of
    * the last one (the reference discarded results — ours is usable as a
    * query operator too).
    */
  def run(
      spark: SparkSession,
      sqlText: String,
      params: Map[String, String] = Map.empty): DataFrame = {
    val statements = splitStatements(substitute(sqlText, params))
    require(statements.nonEmpty, "no SQL statements to run")
    statements.map(spark.sql).last
  }

  def runFile(
      spark: SparkSession,
      path: String,
      params: Map[String, String] = Map.empty): DataFrame =
    run(spark, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))), params)
}
