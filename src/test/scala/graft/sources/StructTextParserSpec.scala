package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import StructTextParser._

/** Mirrors the reference's parser spec-by-test
  * (`__test_struct_text_parser.py:19-215`): Repeat/Optional/OneOf
  * parsing, multi-group labels, named groups, key_end handling,
  * nmatchmax, and flatten/explode.
  */
class StructTextParserSpec extends SparkSpec {
  import spark.implicits._

  private val blockText = Seq(
    "HEADER A", "X: 10", "Y: 3.14", "TYPE: ALPHA",
    "ITEM: v1", "ITEM: v2", "FOOTER",
    "HEADER B", "X: 20", "TYPE: BETA", "ITEM: v9", "FOOTER"
  ).mkString("\n")

  private val blockSchema = Seq(
    FieldDef("header", "^HEADER\\s+(\\w+)"),
    Opt(FieldDef("x", "^X:\\s*(\\d+)", LongType)),
    Opt(FieldDef("y", "^Y:\\s*(-?\\d+\\.\\d+)", DoubleType)),
    OneOf(Seq(FieldDef("type_alpha", "^TYPE:\\s*ALPHA"),
              FieldDef("type_beta", "^TYPE:\\s*BETA"))),
    Rep("items", Seq(FieldDef("item", "^ITEM:\\s*(\\w+)")), until = "^FOOTER"))

  test("repeat/optional/oneof parse (reference test_repeat_optional_oneof_parse)") {
    val recs = parseText(blockText, blockSchema, keyEnd = Some("^END$"))
    recs should have size 2
    val r0 = recs(0)
    r0("header") shouldBe "A"
    r0("x") shouldBe 10L
    r0("y").asInstanceOf[Double] shouldBe 3.14 +- 1e-9
    r0.contains("type_alpha") shouldBe true
    r0("items") shouldBe List(Map("item" -> "v1"), Map("item" -> "v2"))
    val r1 = recs(1)
    r1("header") shouldBe "B"
    r1("x") shouldBe 20L
    r1.contains("y") shouldBe false
    r1.contains("type_beta") shouldBe true
    r1("items") shouldBe List(Map("item" -> "v9"))
  }

  test("multi-group labels expand (reference test_field_group_labels_expand)") {
    val schema = Seq(FieldDef("vec",
      "^V:\\s*(-?\\d+\\.\\d+)\\s+(-?\\d+\\.\\d+)\\s+(-?\\d+\\.\\d+)",
      DoubleType, labels = Seq("vx", "vy", "vz")))
    val recs = parseText("V: 1.0 2.5 -3.2", schema)
    recs should have size 1
    recs.head("vx") shouldBe 1.0
    recs.head("vy") shouldBe 2.5
    recs.head("vz") shouldBe -3.2
  }

  test("named groups become keys (reference test_labels_per_group_and_named_groups)") {
    val text = Seq(
      "OUTPUT = HEADER ONE", "COMPONENT = AIRFRAME", "V: 1.0 2.5 -3.2", "END",
      "OUTPUT = HEADER TWO", "COMPONENT = ROTOR", "V: -1.0 0.0 3.5", "END"
    ).mkString("\n")
    val schema = Seq(
      FieldDef("out", "^OUTPUT\\s*=\\s*(?<header>.+)$"),
      FieldDef("comp_line", "^COMPONENT\\s*=\\s*(?<comp>.+)$"),
      FieldDef("vec", "^V:\\s*(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?)",
        DoubleType, labels = Seq("vx", "vy", "vz")))
    val recs = parseText(text, schema, keyEnd = Some("^END$"))
    recs should have size 2
    recs(0)("header") shouldBe "HEADER ONE"
    recs(0)("comp") shouldBe "AIRFRAME"
    recs(0).contains("out") shouldBe false
    recs(1)("header") shouldBe "HEADER TWO"
    recs(1)("vz") shouldBe 3.5
  }

  test("nMatchMax caps records") {
    parseText(blockText, blockSchema, nMatchMax = 1) should have size 1
  }

  test("empty and non-matching text yield no records") {
    parseText("", blockSchema) shouldBe empty
    parseText("no headers here\njust noise", blockSchema) shouldBe empty
  }

  test("record at EOF without end marker still closes") {
    val recs = parseText("HEADER Z\nX: 7\nTYPE: ALPHA\nITEM: only",
      blockSchema, keyEnd = Some("^END$"))
    recs should have size 1
    recs.head("header") shouldBe "Z"
    recs.head("items") shouldBe List(Map("item" -> "only"))
  }

  test("preamble lines before the first record are skipped") {
    val recs = parseText("junk\nmore junk\n" + blockText, blockSchema)
    recs should have size 2
    recs.head("header") shouldBe "A"
  }

  test("Dataset parse + explodeField flattens repeats") {
    val df = parse(Seq(blockText).toDS(), blockSchema, keyEnd = Some("^END$"))
    df.columns should contain allOf ("header", "x", "y", "type_alpha", "type_beta", "items")
    val flat = explodeField(df, "items")
    flat.columns should contain("items_item")
    flat.where($"header" === "A").select("items_item")
      .as[String].collect().sorted shouldBe Array("v1", "v2")
  }

  // The reference's production battery is nested 4-deep: per-rotor
  // blocks, each consuming a header + MEAN/MAX/MIN lines, then an
  // inner Repeat of PSI rows until a blank line
  // (`test/blade_load_extract/plugins/process_blade_load.py:83-108`).
  private val nestedText = Seq(
    "RUN 7",
    "BLADE 1 LOAD 0.25R",
    "  MEAN 1.0 2.0",
    "  MAXIMUM 3.0 4.0",
    "  PSI = 0.0 10.0",
    "  PSI = 90.0 11.0",
    "",
    "BLADE 1 LOAD 0.50R",
    "  MEAN 5.0 6.0",
    "  MAXIMUM 7.0 8.0",
    "  PSI = 0.0 12.0",
    "",
    "=== END OF RUN"
  ).mkString("\n")

  private val nestedSchema = Seq(
    FieldDef("run", "^RUN\\s+(\\d+)", LongType),
    Rep("blades", Seq(
      FieldDef("station", "^BLADE 1 LOAD (\\d+\\.\\d+)R", DoubleType),
      FieldDef("mean", "^\\s+MEAN\\s+(\\S+)\\s+(\\S+)", DoubleType,
        labels = Seq("mean_1", "mean_2")),
      FieldDef("max", "^\\s+MAXIMUM\\s+(\\S+)\\s+(\\S+)", DoubleType,
        labels = Seq("max_1", "max_2")),
      Rep("psi", Seq(
        FieldDef("psi_row", "^\\s+PSI = (\\S+)\\s+(\\S+)", DoubleType,
          labels = Seq("azimuth", "load"))
      ), until = "^$")
    ), until = "^==="))

  test("nested Repeat: sequential items + inner repeat per iteration") {
    val recs = parseText(nestedText, nestedSchema)
    recs should have size 1
    recs.head("run") shouldBe 7L
    val blades = recs.head("blades").asInstanceOf[List[Map[String, Any]]]
    blades should have size 2
    blades(0)("station") shouldBe 0.25
    blades(0)("mean_1") shouldBe 1.0
    blades(0)("max_2") shouldBe 4.0
    val psi0 = blades(0)("psi").asInstanceOf[List[Map[String, Any]]]
    psi0.map(_("azimuth")) shouldBe List(0.0, 90.0)
    psi0.map(_("load")) shouldBe List(10.0, 11.0)
    blades(1)("station") shouldBe 0.5
    blades(1)("psi").asInstanceOf[List[Map[String, Any]]] should have size 1
  }

  test("nested Repeat survives the Dataset parse with nested array schema") {
    val df = parse(Seq(nestedText).toDS(), nestedSchema)
    val bladeType = df.schema("blades").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    bladeType.fieldNames should contain("psi")
    import org.apache.spark.sql.functions._
    df.select(explode(col("blades")).as("b"))
      .select(col("b.station"),
        org.apache.spark.sql.functions.size(col("b.psi")).as("n_psi"))
      .orderBy(col("b.station"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
      .toSeq shouldBe Seq((0.25, 2), (0.5, 1))
  }

  test("parse plans as a Generate node, not an opaque RDD scan") {
    val df = parse(Seq(blockText).toDS(), blockSchema)
    df.queryExecution.optimizedPlan.toString should include("Generate")
    // pruning: selecting one field must not fail and keeps Generate
    df.select("header").queryExecution.optimizedPlan.toString should
      include("Generate")
  }

  test("generator handles null blobs") {
    val ds = spark.createDataset(Seq[String](blockText, null))(
      org.apache.spark.sql.Encoders.STRING)
    val df = parse(ds, blockSchema)
    df.count() shouldBe 2 // the null blob yields zero records, no NPE
  }

  test("partial record at EOF keeps required fields null, not zero") {
    // record opens (header matches) but the required long field 'x'
    // never appears — under a non-nullable schema codegen would read 0
    val truncated = "HEADER A"
    val schema = Seq(
      FieldDef("header", "^HEADER\\s+(\\w+)"),
      FieldDef("x", "^X:\\s*(\\d+)", LongType))
    val row = parse(Seq(truncated).toDS(), schema).collect().head
    row.getString(0) shouldBe "A"
    row.isNullAt(1) shouldBe true
  }
}
