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
  * Two surfaces:
  *  - [[DocValidator]]: programmatic per-field rules (the subset the
  *    reference's builder tests exercise)
  *  - [[JsonSchemaValidator]]: a real JSON Schema document (the
  *    `JSONSchemaValidator` analogue, `validators.py:13-90`) — nested
  *    `properties`, per-level `required`, `type`, `enum`,
  *    `minimum`/`maximum`/`exclusiveMinimum`/`exclusiveMaximum`,
  *    `minLength`/`maxLength`, `pattern`, array `items` type
  */
trait RowValidator {
  def strict: Boolean

  /** One Column of error messages (null = valid). */
  protected def errors(df: DataFrame): Column

  /** Assemble check columns into the null-when-valid error array. */
  protected final def collectErrors(checks: Seq[Column]): Column =
    if (checks.isEmpty) lit(null).cast("array<string>")
    else {
      val arr = filter(array(checks.map(ch => coalesce(ch, lit(null))): _*),
        x => x.isNotNull)
      when(size(arr) > 0, arr)
    }

  /** Annotate: adds `_validation_errors` (null for valid docs). */
  def annotate(df: DataFrame): DataFrame =
    df.withColumn("_validation_errors", errors(df))

  /** Split (valid, invalid). Strict mode throws if any doc is invalid —
    * the job-abort analogue of the reference's raised ValidationError. */
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

case class FieldRule(
    name: String,
    dataType: Option[DataType] = None,
    required: Boolean = false,
    min: Option[Double] = None,
    max: Option[Double] = None,
    pattern: Option[String] = None)

class DocValidator(val rules: Seq[FieldRule], val strict: Boolean = false)
  extends RowValidator {

  protected def errors(df: DataFrame): Column = {
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
    collectErrors(checks)
  }
}

/** JSON Schema document → distributed validation pass (reference
  * `JSONSchemaValidator`, `validators.py:13-90`; tests
  * `tests/test_validator.py`). The schema is compiled ONCE into pure
  * `Column` checks against the frame's static schema plus per-row value
  * predicates — no per-doc interpretation at runtime.
  *
  * Error strings follow the reference's `"{dot.path}: {message}"` shape
  * (`validators.py:88-90`); a missing required property reports at the
  * PARENT path, like jsonschema's `absolute_path`.
  *
  * Semantics notes (flat-frame adaptation):
  *  - a null value is treated as an absent property (Spark rows cannot
  *    distinguish the two), so `required` fires on null and value checks
  *    skip nulls
  *  - `type` checks are resolved against the frame's static column type
  *    (a column has ONE Spark type; per-doc dynamic typing only exists
  *    before schema inference)
  *  - nested `properties`/`required` apply only when the parent struct
  *    value is present, per JSON Schema
  */
class JsonSchemaValidator(val schemaJson: String, val strict: Boolean = false)
  extends RowValidator {

  import scala.jdk.CollectionConverters._
  private val schema = graft.builder.MapBuilder.mapper.readTree(schemaJson)
  require(schema.isObject, "schema must be a JSON object")

  private def jsonTypeOf(dt: DataType): String = dt match {
    case StringType => "string"
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType => "number"
    case _: StructType | _: MapType => "object"
    case _: ArrayType => "array"
    case NullType => "null"
    case _ => "other"
  }

  private def typeOk(expected: String, dt: DataType): Boolean = expected match {
    case "number" => Set("integer", "number").contains(jsonTypeOf(dt))
    case e => jsonTypeOf(dt) == e
  }

  /** Resolve a dot path against the frame schema (None = absent). */
  private def pathType(df: DataFrame, path: String): Option[DataType] =
    scala.util.Try {
      path.split('.').foldLeft(df.schema: DataType) {
        case (s: StructType, p) => s(p).dataType
        case (other, p) => throw new IllegalArgumentException(s"$other has no $p")
      }
    }.toOption

  protected def errors(df: DataFrame): Column =
    collectErrors(walk(schema, "", None, df))

  /** `guard`: conjunction of parent-struct presence — nested schema
    * levels only apply when the parent object exists. */
  private def walk(node: com.fasterxml.jackson.databind.JsonNode, path: String,
                   guard: Option[Column], df: DataFrame): Seq[Column] = {
    val required = Option(node.get("required"))
      .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty[String])
    val props = Option(node.get("properties")).toSeq
      .flatMap(_.fields().asScala.map(e => e.getKey -> e.getValue).toSeq)

    props.flatMap { case (name, sub) =>
      val childPath = if (path.isEmpty) name else s"$path.$name"
      val dtOpt = pathType(df, childPath)
      def guarded(cond: Column, msg: String): Column =
        when(guard.map(_ && cond).getOrElse(cond), lit(msg))

      val reqErr =
        if (!required.contains(name)) Nil
        else {
          val missing = dtOpt.map(_ => col(childPath).isNull).getOrElse(lit(true))
          Seq(guarded(missing, s"$path: '$name' is a required property"))
        }

      val expType = Option(sub.get("type")).map(_.asText())
      val typeErr = (for (t <- expType; dt <- dtOpt; if !typeOk(t, dt))
        yield guarded(col(childPath).isNotNull,
          s"$childPath: value is not of type '$t'")).toSeq

      // value checks only when the static type matches the declared one
      val typed = expType.forall(t => dtOpt.exists(dt => typeOk(t, dt)))
      val valueErrs: Seq[Column] =
        if (dtOpt.isEmpty || !typed) Nil
        else {
          val c = col(childPath)
          val present = c.isNotNull
          val enumErr = Option(sub.get("enum")).map { en =>
            val vals = en.elements().asScala.toSeq
            val cond =
              if (vals.forall(_.isTextual))
                !c.cast("string").isin(vals.map(_.asText()): _*)
              else !c.cast("double").isin(vals.map(_.asDouble()): _*)
            guarded(present && cond, s"$childPath: value is not one of the enum")
          }
          def numRule(fieldName: String, mk: (Column, Double) => Column, msg: String => String) =
            Option(sub.get(fieldName)).filter(_ => dtOpt.exists(_.isInstanceOf[NumericType]))
              .map(v => guarded(present && mk(c, v.asDouble()), msg(v.asText())))
          val numErrs = Seq(
            numRule("minimum", _ < _, v => s"$childPath: value is less than the minimum of $v"),
            numRule("maximum", _ > _, v => s"$childPath: value is greater than the maximum of $v"),
            numRule("exclusiveMinimum", _ <= _, v => s"$childPath: value is less than or equal to the exclusive minimum of $v"),
            numRule("exclusiveMaximum", _ >= _, v => s"$childPath: value is greater than or equal to the exclusive maximum of $v"))
          val strErrs =
            if (!dtOpt.contains(StringType)) Seq.empty[Option[Column]]
            else Seq(
              Option(sub.get("minLength")).map(v => guarded(
                present && length(c) < v.asInt(),
                s"$childPath: value is shorter than minLength ${v.asInt()}")),
              Option(sub.get("maxLength")).map(v => guarded(
                present && length(c) > v.asInt(),
                s"$childPath: value is longer than maxLength ${v.asInt()}")),
              Option(sub.get("pattern")).map(v => guarded(
                present && !c.rlike(v.asText()),
                s"$childPath: value does not match pattern ${v.asText()}")))
          // array items: element type resolved statically
          val itemErr = for {
            items <- Option(sub.get("items"))
            it <- Option(items.get("type")).map(_.asText())
            ArrayType(elem, _) <- dtOpt
            if !typeOk(it, elem)
          } yield guarded(present && size(c) > 0,
            s"$childPath: array items are not of type '$it'")
          (enumErr.toSeq ++ numErrs.flatten ++ strErrs.flatten ++ itemErr.toSeq)
        }

      // recurse into nested object properties when the struct resolves
      val nestedErrs =
        if (sub.has("properties") && dtOpt.exists(_.isInstanceOf[StructType])) {
          val g2 = Some(guard.map(_ && col(childPath).isNotNull)
            .getOrElse(col(childPath).isNotNull))
          walk(sub, childPath, g2, df)
        } else Nil

      reqErr ++ typeErr ++ valueErrs ++ nestedErrs
    }
  }
}
