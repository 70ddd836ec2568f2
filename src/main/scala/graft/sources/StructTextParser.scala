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
    *
    * EVERY column is nullable — including required fields: a truncated
    * blob can emit a partial record (the record opens on its first
    * field but a later required field never appears before EOF/keyEnd).
    * Declaring those non-nullable would let codegen read the stored
    * null as 0/0.0/false silently; nullable keeps the null visible.
    */
  def sparkSchema(schema: Seq[SchemaItem]): StructType = {
    def fieldCols(f: FieldDef): Seq[StructField] =
      if (f.isPresence) Seq(StructField(f.label, BooleanType, nullable = true))
      else f.groupNames.map(StructField(_, f.dataType, nullable = true))
    StructType(schema.flatMap {
      case f: FieldDef => fieldCols(f)
      case Opt(f)      => fieldCols(f)
      case OneOf(alts) => alts.flatMap(fieldCols)
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

    /** Repeat body, nested-Repeat capable. Each iteration runs the
      * items SEQUENTIALLY over successive lines (required items scan
      * forward; a nested Rep loops until its own `until`) and yields
      * one sub-record — the reference's production shape, where one
      * iteration consumes a header line, then MEAN/MAX/MIN/PTP lines,
      * then an inner Repeat of PSI rows
      * (`test/blade_load_extract/plugins/process_blade_load.py:83-108`).
      * `outerBounds` holds the `until` patterns of enclosing Repeats —
      * no scan may consume a line that terminates an enclosing scope.
      */
    def parseRep(rep: Rep, outerBounds: List[Regex],
                 itemIdx: Int): List[Map[String, Any]] = {
      val untilRe = rep.until.r
      val bounds = untilRe :: outerBounds
      def closedByOuter: Boolean = atEnd || atNextRecord(itemIdx) ||
        outerBounds.exists(_.findFirstIn(lines(i)).isDefined)
      def boundHere: Boolean = atEnd || atNextRecord(itemIdx) ||
        bounds.exists(_.findFirstIn(lines(i)).isDefined)
      val collected = mutable.ListBuffer.empty[Map[String, Any]]
      var repeating = true
      while (repeating && !closedByOuter) {
        if (untilRe.findFirstIn(lines(i)).isDefined) repeating = false
        else {
          val startPos = i
          val sub = mutable.Map.empty[String, Any]
          var matchedAny = false
          var open = true
          for (item <- rep.items if open) item match {
            case f: FieldDef =>
              var found = false
              while (!found && !boundHere) {
                matchField(f, lines(i)) match {
                  case Some(v) => sub ++= v; found = true; matchedAny = true; i += 1
                  case None    => i += 1
                }
              }
              if (!found) open = false
            case Opt(f) =>
              if (!boundHere)
                matchField(f, lines(i)).foreach { v =>
                  sub ++= v; matchedAny = true; i += 1
                }
            case OneOf(alts) =>
              var found = false
              while (!found && !boundHere) {
                alts.view.flatMap(a => matchField(a, lines(i))).headOption match {
                  case Some(v) => sub ++= v; found = true; matchedAny = true; i += 1
                  case None    => i += 1
                }
              }
              if (!found) open = false
            case r2: Rep =>
              val nested = parseRep(r2, bounds, itemIdx)
              sub(r2.label) = nested
              if (nested.nonEmpty) matchedAny = true
          }
          if (matchedAny) collected += sub.toMap
          // a line matching nothing is skipped (per-line tolerance)
          if (i == startPos && repeating) i += 1
        }
      }
      collected.toList
    }

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
        case rep: Rep =>
          rec(rep.label) = parseRep(rep, Nil, itemIdx)
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

  /** Map a parsed record to Catalyst's internal representation. */
  private[sources] def internalRow(rec: Map[String, Any], st: StructType):
      org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    new GenericInternalRow(st.fields.map { f =>
      (f.dataType, rec.get(f.name)) match {
        case (ArrayType(sub: StructType, _), Some(items: Seq[_])) =>
          new GenericArrayData(items.map(m =>
            internalRow(m.asInstanceOf[Map[String, Any]], sub)).toArray[Any])
        case (ArrayType(_, _), None) =>
          new GenericArrayData(Array.empty[Any])
        case (StringType, v) =>
          v.map(s => UTF8String.fromString(s.asInstanceOf[String])).orNull
        case (_, v) => v.orNull
      }
    }.toArray[Any])
  }

  /** Generator-style entry: each blob row of `ds` → N record rows with
    * the declared schema, via a true Catalyst [[ParseStructText]]
    * Generator (a `Generate` plan node, like `explode`) — NOT an
    * `ds.rdd` flatMap, so the plan stays a single logical tree:
    * Catalyst prunes unused record columns into the generator's
    * output and the exchange-free map-side shape is visible to AQE.
    */
  def parse(ds: Dataset[String], schema: Seq[SchemaItem],
            keyEnd: Option[String] = None,
            nMatchMax: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val blobs = ds.toDF("__graft_text")
    blobs.select(GraftSql.column(ParseStructText(
      GraftSql.expression(blobs(blobs.columns.head)), schema, keyEnd, nMatchMax)))
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

/** True Catalyst Generator for the struct-text parse: one text blob →
  * N record rows, planned as a `Generate` node exactly like `explode`.
  * Versus the former `ds.rdd.flatMap` boundary this keeps the whole
  * query one logical plan — predicates/projections on parsed fields
  * stay visible to the optimizer, and `Generate.unrequiredChildIndex`
  * drops the (large) text column the moment it's consumed. Per-row
  * work is the interpreted `parseText` (regex-bound, CodegenFallback
  * by nature) — the surrounding plan still codegens.
  */
case class ParseStructText(child: org.apache.spark.sql.catalyst.expressions.Expression,
                           schema: Seq[StructTextParser.SchemaItem],
                           keyEnd: Option[String],
                           nMatchMax: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def elementSchema: StructType = StructTextParser.sparkSchema(schema)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_struct_text needs a string blob, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val blob = child.eval(input)
    if (blob == null) Nil
    else {
      val st = elementSchema
      StructTextParser.parseText(
          blob.asInstanceOf[UTF8String].toString, schema, keyEnd, nMatchMax)
        .map(StructTextParser.internalRow(_, st))
    }
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): ParseStructText =
    copy(child = newChild)
}
