package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-level validation (reference `core/validator.py:12-38`,
  * `validators.py:13-90`): a JSON-Schema-shaped contract checked at
  * update time. `strict` raises on the first invalid doc; non-strict
  * routes invalid docs aside (the reference logs and drops them,
  * `stores/mongolike.py:378-391`).
  *
  * Implemented as a filter stage of pure expressions — the whole batch
  * is validated in one distributed pass, never per-doc driver loops.
  * Supported schema subset (what the reference's JSONSchemaValidator
  * actually exercises): required fields, per-field primitive type,
  * numeric min/max, string regex.
  */
case class FieldRule(
    name: String,
    dataType: Option[DataType] = None,
    required: Boolean = false,
    min: Option[Double] = None,
    max: Option[Double] = None,
    pattern: Option[String] = None)

class DocValidator(val rules: Seq[FieldRule], val strict: Boolean = false) {

  /** One Column of error messages (null = valid). */
  private def errors(df: DataFrame): Column = {
    val checks: Seq[Column] = rules.flatMap { r =>
      val present = df.columns.contains(r.name)
      val c = if (present) col(r.name) else lit(null)
      val reqErr =
        if (r.required)
          Some(when(if (present) c.isNull else lit(true),
            lit(s"${r.name}: required field missing")))
        else None
      val typeErr = r.dataType.flatMap { dt =>
        if (!present) None
        else if (df.schema(r.name).dataType == dt) None
        else Some(when(lit(true), lit(
          s"${r.name}: expected ${dt.simpleString}, got ${df.schema(r.name).dataType.simpleString}")))
      }
      val minErr = r.min.map(m => when(lit(present) && c.isNotNull && c < m,
        lit(s"${r.name}: below minimum $m")))
      val maxErr = r.max.map(m => when(lit(present) && c.isNotNull && c > m,
        lit(s"${r.name}: above maximum $m")))
      val patErr = r.pattern.map(p => when(lit(present) && c.isNotNull && !c.rlike(p),
        lit(s"${r.name}: does not match $p")))
      reqErr.toSeq ++ typeErr.toSeq ++ minErr.toSeq ++ maxErr.toSeq ++ patErr.toSeq
    }
    if (checks.isEmpty) lit(null).cast("array<string>")
    else {
      val arr = filter(array(checks.map(ch => coalesce(ch, lit(null))): _*),
        x => x.isNotNull)
      when(size(arr) > 0, arr)
    }
  }

  /** Annotate: adds `_validation_errors` (null for valid docs). */
  def annotate(df: DataFrame): DataFrame =
    df.withColumn("_validation_errors", errors(df))

  /** Split (valid, invalid). Strict mode throws if any doc is invalid —
    * the job-abort analogue of the reference's raised ValueError. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val annotated = annotate(df)
    val invalid = annotated.filter(col("_validation_errors").isNotNull)
    if (strict) {
      val bad = invalid.limit(1).collect()
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"validation failed (strict): ${bad.head.getAs[Seq[String]]("_validation_errors").mkString("; ")}")
    }
    (annotated.filter(col("_validation_errors").isNull).drop("_validation_errors"),
      invalid)
  }
}
