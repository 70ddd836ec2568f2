package graft.ops

import graft.SparkSpec
import graft.sources.TreeScan
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the two glob compilers and the
  * schema-evolution append (SURVEY.md §5 test plan). Raw ScalaCheck
  * `Properties` — sbt's test framework runs these natively.
  */
object SelectorProps extends Properties("Selectors") {

  private val plain = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("plain strings parse as Exact") = Prop.forAll(plain) { a =>
    Selectors.parse(a) == Selectors.Exact(a)
  }

  property("glob * prefix/suffix = startsWith/endsWith") =
    Prop.forAll(plain, plain) { (stem, rest) =>
      val full = stem + rest
      full.matches(Selectors.globToRegex(stem + "*")) &&
      full.matches(Selectors.globToRegex("*" + rest)) &&
      ((rest + "x").matches(Selectors.globToRegex(stem + "*")) ==
        (rest + "x").startsWith(stem))
    }

  property("glob compile never throws; ? matches one char") =
    Prop.forAll(plain) { s =>
      Selectors.globToRegex(s) // must not throw
      s.matches(Selectors.globToRegex("?" * s.length)) &&
      !s.matches(Selectors.globToRegex("?" * (s.length + 1)))
    }

  property("path glob: ** spans depth, * stays in one segment") = {
    val seg = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    Prop.forAll(Gen.resize(6, Gen.nonEmptyListOf(seg))) { segs =>
      val path = segs.mkString("/")
      path.matches(TreeScan.globToRegex("**/*")) &&
      (path.matches(TreeScan.globToRegex("*")) == (segs.size == 1))
    }
  }
}

/** Struct-text parser round-trip property: render arbitrary records in
  * the Field/Opt/OneOf/Repeat block format, parse, recover exactly.
  */
object StructTextProps extends Properties("StructTextParser") {
  import graft.sources.StructTextParser._
  import org.apache.spark.sql.types.LongType

  private case class Rec(id: Long, long: Boolean, nchars: Option[Long],
                         words: List[String])

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val recGen = for {
    id <- Gen.chooseNum(0L, 999999L)
    isLong <- Gen.oneOf(true, false)
    nchars <- Gen.option(Gen.chooseNum(0L, 9999L))
    words <- Gen.resize(6, Gen.listOf(word))
  } yield Rec(id, isLong, nchars, words)

  private val schema = Seq(
    FieldDef("id", "^DOC (\\d+)$", LongType),
    OneOf(Seq(FieldDef("kind_long", "^KIND: LONG$"),
              FieldDef("kind_short", "^KIND: SHORT$"))),
    Opt(FieldDef("nchars", "^NCHARS: (\\d+)$", LongType)),
    Rep("words", Seq(FieldDef("w", "^W: (.+)$")), until = "^END$"))

  private def render(r: Rec): String =
    (Seq(s"DOC ${r.id}", s"KIND: ${if (r.long) "LONG" else "SHORT"}") ++
      r.nchars.map(n => s"NCHARS: $n").toSeq ++
      r.words.map(w => s"W: $w") :+ "END").mkString("\n")

  property("render→parse recovers every record") =
    Prop.forAll(Gen.resize(8, Gen.nonEmptyListOf(recGen))) { recs =>
      val parsed = parseText(recs.map(render).mkString("\n"), schema,
        keyEnd = Some("^END$"))
      parsed.size == recs.size && parsed.zip(recs).forall { case (p, r) =>
        p("id") == r.id &&
        p.contains("kind_long") == r.long &&
        p.get("nchars") == r.nchars &&
        p("words") == r.words.map(w => Map("w" -> w))
      }
    }
}

/** A8 properties: evolve unions columns, keeps all rows, null-fills. */
object AppendProps extends Properties("Append.evolve") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  property("rows survive, columns union, missing side is null") =
    Prop.forAll(Gen.chooseNum(0, 6), Gen.chooseNum(0, 6)) { (n1, n2) =>
      val a = (1 to n1).map(i => (i, s"a$i")).toDF("id", "left_only")
      val b = (1 to n2).map(i => (i, i * 2.0)).toDF("id", "right_only")
      val out = Append.evolve(a, b)
      out.columns.toSet == Set("id", "left_only", "right_only") &&
      out.count() == (n1 + n2).toLong &&
      out.filter(out("left_only").isNull).count() == n2.toLong &&
      out.filter(out("right_only").isNull).count() == n1.toLong
    }
}
