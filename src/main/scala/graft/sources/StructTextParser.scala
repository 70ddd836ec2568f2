package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.util.matching.Regex

/** Structured-text (regex-schema) extraction — SURVEY.md §2.1 S9, the
  * reference's one genuinely novel source. Contract specified by
  * `__test_struct_text_parser.py:19-215` (Field / Optional / OneOf /
  * Repeat-until schemas applied to text blocks → records) and
  * `_test_read_parser.py:16-112` (block parsing); production shape:
  * `test/blade_load_extract/plugins/process_blade_load.py:83-108`.
  *
  * Spark integration is a Generator-style table function: one text blob
  * → N rows, run as `flatMap` over a Dataset of blobs (whole files or
  * pre-grouped blocks) — map-side, no shuffle, schema declared up front
  * so Catalyst can prune columns downstream.
  *
  * Line-matching semantics (deterministic, documented):
  *  - a record begins where the first schema item matches a line;
  *  - required Field/OneOf scan forward over non-matching lines;
  *  - Optional tests only the current line and never consumes on miss;
  *  - Repeat stops (without consuming) at its `until` pattern, skipping
  *    lines none of its items match;
  *  - `keyEnd` closes the record wherever it appears.
  */
object StructTextParser {

  sealed trait SchemaItem

  /** One regex field. `labels` names the capture groups (defaults to the
    * field label for a single group; named groups `(?<name>..)` are
    * auto-labeled). A pattern with no capture groups is a presence
    * marker (boolean column).
    */
  final case class FieldDef(label: String, pattern: String,
                            dataType: DataType = StringType,
                            labels: Seq[String] = Nil) extends SchemaItem {
    private[sources] val regex: Regex = pattern.r
    private[sources] val groupNames: Seq[String] = {
      val named = namedGroups(pattern)
      val n = countGroups(pattern)
      if (labels.nonEmpty) labels
      else if (named.nonEmpty) named
      else if (n <= 1) Seq(label)
      else (1 to n).map(i => s"${label}_$i")
    }
    private[sources] def isPresence: Boolean = countGroups(pattern) == 0
  }

  final case class Opt(field: FieldDef) extends SchemaItem
  final case class OneOf(alts: Seq[FieldDef]) extends SchemaItem
  final case class Rep(label: String, items: Seq[SchemaItem],
                       until: String) extends SchemaItem

  private def countGroups(p: String): Int =
    java.util.regex.Pattern.compile(p).matcher("").groupCount()

  private def namedGroups(p: String): Seq[String] =
    "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq

  /** The flat output schema of a record: one column per field label,
    * Repeat → array<struct>.
    */
  def sparkSchema(schema: Seq[SchemaItem]): StructType = {
    def fieldCols(f: FieldDef, nullable: Boolean): Seq[StructField] =
      if (f.isPresence) Seq(StructField(f.label, BooleanType, nullable = true))
      else f.groupNames.map(StructField(_, f.dataType, nullable))
    StructType(schema.flatMap {
      case f: FieldDef => fieldCols(f, nullable = false)
      case Opt(f)      => fieldCols(f, nullable = true)
      case OneOf(alts) => alts.flatMap(fieldCols(_, nullable = true))
      case Rep(label, items, _) =>
        Seq(StructField(label,
          ArrayType(sparkSchema(items), containsNull = false), nullable = true))
    })
  }

  private def convert(s: String, dt: DataType): Any = dt match {
    case LongType    => s.trim.toLong
    case IntegerType => s.trim.toInt
    case DoubleType  => s.trim.toDouble
    case BooleanType => s.trim.toBoolean
    case _           => s
  }

  /** Parse one text blob into records (driver- or executor-side pure
    * function; no Spark objects touched).
    */
  def parseText(text: String, schema: Seq[SchemaItem],
                keyEnd: Option[String] = None,
                nMatchMax: Int = Int.MaxValue): Seq[Map[String, Any]] = {
    val lines = text.split("\n", -1)
    val endRe = keyEnd.map(_.r)
    val firstField: FieldDef = schema.head match {
      case f: FieldDef => f
      case Opt(f)      => f
      case OneOf(alts) => alts.head
      case Rep(_, _, _) =>
        throw new IllegalArgumentException("schema cannot start with Repeat")
    }
    val out = mutable.ListBuffer.empty[Map[String, Any]]
    var i = 0
    while (i < lines.length && out.size < nMatchMax) {
      if (firstField.regex.findFirstIn(lines(i)).isDefined) {
        val (rec, next) = parseRecord(lines, i, schema, endRe, firstField)
        out += rec
        i = math.max(next, i + 1)
      } else i += 1
    }
    out.toList
  }

  private def matchField(f: FieldDef, line: String): Option[Map[String, Any]] =
    f.regex.findFirstMatchIn(line).map { m =>
      if (f.isPresence) Map(f.label -> true)
      else f.groupNames.zipWithIndex.map { case (n, gi) =>
        // a group that did not participate (alternation / optional
        // suffix) returns null — keep the column null, don't convert
        n -> Option(m.group(gi + 1)).map(convert(_, f.dataType)).orNull
      }.toMap
    }

  /** Parse one record starting at `start`; returns (record, next index). */
  private def parseRecord(lines: Array[String], start: Int,
                          schema: Seq[SchemaItem], endRe: Option[Regex],
                          firstField: FieldDef): (Map[String, Any], Int) = {
    val rec = mutable.Map.empty[String, Any]
    var i = start
    def atEnd: Boolean = i >= lines.length ||
      endRe.exists(_.findFirstIn(lines(i)).isDefined)
    def atNextRecord(itemIdx: Int): Boolean =
      itemIdx > 0 && i > start && firstField.regex.findFirstIn(lines(i)).isDefined

    var itemIdx = 0
    var open = true
    for (item <- schema if open) {
      item match {
        case f: FieldDef =>
          // required: scan forward to the next matching line
          var found = false
          while (!found && !atEnd && !atNextRecord(itemIdx)) {
            matchField(f, lines(i)) match {
              case Some(vals) => rec ++= vals; found = true; i += 1
              case None       => i += 1
            }
          }
          if (!found) open = false
        case Opt(f) =>
          if (!atEnd && !atNextRecord(itemIdx))
            matchField(f, lines(i)).foreach { vals => rec ++= vals; i += 1 }
        case OneOf(alts) =>
          var found = false
          while (!found && !atEnd && !atNextRecord(itemIdx)) {
            alts.view.flatMap(a => matchField(a, lines(i))).headOption match {
              case Some(vals) => rec ++= vals; found = true; i += 1
              case None       => i += 1
            }
          }
          if (!found) open = false
        case Rep(label, items, until) =>
          val untilRe = until.r
          val collected = mutable.ListBuffer.empty[Map[String, Any]]
          var repeating = true
          while (repeating && !atEnd && !atNextRecord(itemIdx)) {
            if (untilRe.findFirstIn(lines(i)).isDefined) repeating = false
            else {
              val sub = mutable.Map.empty[String, Any]
              var matchedAny = false
              for (it <- items) it match {
                case f: FieldDef =>
                  matchField(f, lines(i)).foreach { v => sub ++= v; matchedAny = true }
                case Opt(f) =>
                  matchField(f, lines(i)).foreach { v => sub ++= v; matchedAny = true }
                case OneOf(alts) =>
                  alts.view.flatMap(a => matchField(a, lines(i))).headOption
                    .foreach { v => sub ++= v; matchedAny = true }
                case _: Rep => () // nested Repeat unsupported inside Repeat
              }
              if (matchedAny) collected += sub.toMap
              i += 1
            }
          }
          rec(label) = collected.toList
      }
      itemIdx += 1
    }
    // consume the end marker if present
    if (i < lines.length && endRe.exists(_.findFirstIn(lines(i)).isDefined)) i += 1
    (rec.toMap, i)
  }

  private def toRow(rec: Map[String, Any], st: StructType): Row =
    Row.fromSeq(st.fields.map { f =>
      (f.dataType, rec.get(f.name)) match {
        case (ArrayType(sub: StructType, _), Some(items: Seq[_])) =>
          items.map(m => toRow(m.asInstanceOf[Map[String, Any]], sub))
        case (ArrayType(_, _), None) => Seq.empty[Row]
        case (_, v)                  => v.orNull
      }
    }.toSeq)

  /** Generator-style entry: each blob row of `ds` → N record rows with
    * the declared schema. flatMap = map-side, no shuffle.
    */
  def parse(ds: Dataset[String], schema: Seq[SchemaItem],
            keyEnd: Option[String] = None,
            nMatchMax: Int = Int.MaxValue): DataFrame = {
    val st = sparkSchema(schema)
    val spark = ds.sparkSession
    val rdd = ds.rdd.flatMap(t => parseText(t, schema, keyEnd, nMatchMax)
      .map(toRow(_, st)))
    spark.createDataFrame(rdd, st)
  }

  /** `flatten_to_dataframe(records, explode_field=...)` analog: explode
    * one array<struct> column into `<field>_<sub>` columns.
    */
  def explodeField(df: DataFrame, field: String): DataFrame = {
    val sub = df.schema(field).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val keep = df.columns.filterNot(_ == field).map(col).toSeq
    val exploded = df.select((keep :+ explode_outer(col(field)).as("__e")): _*)
    sub.fieldNames.foldLeft(exploded) { (d, n) =>
      d.withColumn(s"${field}_$n", col(s"__e.$n"))
    }.drop("__e")
  }
}
