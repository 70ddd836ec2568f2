package graft.catalog

import graft.SparkSpec

/** Mirrors the reference backend test battery
  * (`test/test_pipeline_helpers.py:48-246`): prefix serialization,
  * level-mapped paths with conflict priority, flattened
  * `prefix_data_idx` / `prefix_metadata_key` output, selector
  * variants, multi-record indexing, and no-special-key handling.
  */
class RecordStoreSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int) = Seq(n).toDF("v")

  test("write and read basic: serialized prefix + flattened data key") {
    val rs = new RecordStore
    rs.writeTable("test_ds", Seq("x", "y"), Some(Map("k" -> "v")),
      frame(1), Map("note" -> "ok")) shouldBe Map("note" -> "ok")
    // python: json.dumps({"level0":"x","level1":"y","k":"v"}, sort_keys=True, separators=(",",":"))
    val expected = """{"k":"v","level0":"x","level1":"y"}"""
    val (dm, mm) = rs.getTables("test_ds", Some(Map("k" -> "v")))
    dm.map(_._1) shouldBe Seq(s"${expected}_data_0")
    mm shouldBe Seq(s"${expected}_metadata_note" -> "ok")
    dm.head._2.collect().head.getInt(0) shouldBe 1
  }

  test("no keys at all serializes to the 'default' prefix") {
    val rs = new RecordStore
    rs.writeTable("d", Nil, None, frame(1))
    val (dm, _) = rs.getTables("d", None)
    dm.map(_._1) shouldBe Seq("default_data_0")
  }

  test("an EMPTY key dict is falsy like python's — also 'default'") {
    val rs = new RecordStore
    rs.writeTable("d", Nil, Some(Map.empty), frame(1))
    rs.getTables("d", None)._1.map(_._1) shouldBe Seq("default_data_0")
  }

  test("an EMPTY selector dict is falsy like python's — matches everything") {
    // reference: `if not req_keys` → match-all, INCLUDING keyless
    // 'default' records; Some(empty) must behave like None
    val rs = new RecordStore
    rs.writeTable("d", Nil, None, frame(1))
    rs.writeTable("d", Seq("x"), Some(Map("k" -> "v")), frame(2))
    rs.getTables("d", Some(Map.empty))._1.map(_._1) shouldBe
      rs.getTables("d", None)._1.map(_._1)
    rs.getTables("d", Some(Map.empty))._1.map(_._1) should contain("default_data_0")
  }

  test("a Map-valued selector compares by equality, not as a predicate") {
    // scala Maps are Function1 (key lookup); python dicts are NOT
    // callable, so the reference falls through to value == selector
    val rs = new RecordStore
    rs.writeTable("d_map", Seq("a"),
      Some(Map("cfg" -> Map("x" -> 1))), frame(1))
    rs.getTables("d_map", Some(Map("cfg" -> Map("x" -> 1))))._1.size shouldBe 1
    rs.getTables("d_map", Some(Map("cfg" -> Map("x" -> 2))))._1.size shouldBe 0
  }

  test("non-ASCII key values escape like json.dumps ensure_ascii") {
    val rs = new RecordStore
    rs.writeTable("d", Nil, Some(Map("k" -> "café")), frame(1))
    // python: json.dumps({"k":"café"}, ...) == '{"k":"café"}' with
    // a literal backslash-u sequence (built by concat so the Scala
    // compiler can't pre-process it as a source unicode escape)
    val esc = "caf" + "\\" + "u00e9"
    rs.getTables("d", None)._1.map(_._1) shouldBe
      Seq(s"""{"k":"$esc"}_data_0""")
  }

  test("table_keys None with a path still yields level keys") {
    val rs = new RecordStore
    rs.writeTable("t_none", Seq("p0", "p1"), None, frame(10))
    val (dm, _) = rs.getTables("t_none", None)
    dm.map(_._1) shouldBe Seq("""{"level0":"p0","level1":"p1"}_data_0""")
  }

  test("path-derived levels win over same-named table_keys") {
    val rs = new RecordStore
    rs.writeTable("t_conflict", Seq("Z"),
      Some(Map("level0" -> "OVERRIDE", "k" -> "v")), frame(9))
    val (dm, _) = rs.getTables("t_conflict", Some(Map("k" -> "v")))
    dm.map(_._1) shouldBe Seq("""{"k":"v","level0":"Z"}_data_0""")
  }

  test("selector variants: exact, membership, glob, re:, in:, predicate") {
    val rs = new RecordStore
    Seq("red", "blue", "green").zipWithIndex.foreach { case (c, i) =>
      rs.writeTable("t_sel", Seq("a"), Some(Map("color" -> c)), frame(i))
    }
    def prefixes(sel: Map[String, Any]): Seq[String] =
      rs.getTables("t_sel", Some(sel))._1.map(_._1)
    prefixes(Map("color" -> "blue")) shouldBe
      Seq("""{"color":"blue","level0":"a"}_data_0""")
    prefixes(Map("color" -> Seq("red", "green"))).size shouldBe 2
    prefixes(Map("color" -> "g*")) shouldBe
      Seq("""{"color":"green","level0":"a"}_data_0""")
    prefixes(Map("color" -> "re:^(red|blue)$")).size shouldBe 2
    prefixes(Map("color" -> "in:ree")) shouldBe
      Seq("""{"color":"green","level0":"a"}_data_0""")
    prefixes(Map("color" -> ((v: Any) => String.valueOf(v).length == 3))) shouldBe
      Seq("""{"color":"red","level0":"a"}_data_0""")
    // selector key absent from stored keys → no match at all
    prefixes(Map("shape" -> "round")) shouldBe Nil
  }

  test("multiple records under one prefix index data_0, data_1; metadata first-wins") {
    val rs = new RecordStore
    rs.writeTable("t_multi", Seq("x"), Some(Map("k" -> "v")), frame(1),
      Map("who" -> "first"))
    rs.writeTable("t_multi", Seq("x"), Some(Map("k" -> "v")), frame(2),
      Map("who" -> "second"))
    val (dm, mm) = rs.getTables("t_multi", Some(Map("k" -> "v")))
    val p = """{"k":"v","level0":"x"}"""
    dm.map(_._1) shouldBe Seq(s"${p}_data_0", s"${p}_data_1")
    dm.map(_._2.collect().head.getInt(0)) shouldBe Seq(1, 2)
    mm shouldBe Seq(s"${p}_metadata_who" -> "first")
  }

  test("no special __path__ handling: it is a plain key") {
    val rs = new RecordStore
    rs.writeTable("t_nopath", Nil,
      Some(Map("k" -> "v", "__path__" -> Seq("a", "b"))), frame(7))
    val (dm, _) = rs.getTables("t_nopath",
      Some(Map("__path__" -> Seq("a", "b"))))
    dm.map(_._1) shouldBe Seq("""{"__path__":["a","b"],"k":"v"}_data_0""")
  }

  test("custom separator flows through the flattened keys") {
    val rs = new RecordStore
    rs.writeTable("d", Nil, Some(Map("k" -> "v")), frame(1), Map("m" -> 1))
    val (dm, mm) = rs.getTables("d", None, sep = "#")
    dm.map(_._1) shouldBe Seq("""{"k":"v"}#data#0""")
    mm.map(_._1) shouldBe Seq("""{"k":"v"}#metadata#m""")
  }

  test("float key values render byte-identically to CPython json.dumps") {
    val rs = new RecordStore
    // integral double/float: `1.0` exactly as json.dumps writes it
    rs.writeTable("d", Nil, Some(Map("v" -> 1.0)), frame(1))
    rs.getTables("d", None)._1.map(_._1) shouldBe Seq("""{"v":1.0}_data_0""")
    // negative zero is integral but signed: json.dumps(-0.0) = "-0.0",
    // so the render must keep the sign a toLong round-trip would drop
    rs.writeTable("z", Nil, Some(Map("v" -> -0.0)), frame(1))
    rs.getTables("z", None)._1.map(_._1) shouldBe Seq("""{"v":-0.0}_data_0""")
    // fractional / exponent-range / non-finite floats all render through
    // PyFloatRepr (shortest-round-trip digits, CPython notation — the
    // exhaustive parity set lives in PyFloatReprSpec); the reference's
    // backend json.dumps-accepts any float, so the store does too
    rs.writeTable("f", Nil,
      Some(Map("version" -> 1.5, "cfg" -> Map("scale" -> 2.5e20),
        "eps" -> 1e-05, "thr" -> 0.0001, "x" -> Double.NaN)), frame(2))
    rs.getTables("f", None)._1.map(_._1) shouldBe Seq(
      """{"cfg":{"scale":2.5e+20},"eps":1e-05,"thr":0.0001,"version":1.5,"x":NaN}_data_0""")
  }
}
