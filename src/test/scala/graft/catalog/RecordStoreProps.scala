package graft.catalog

import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the record store's driver-side kernels: canonical
  * key serialization (insertion-order independence — the whole point
  * of a canonical prefix) and the `_match_value` selector dialect.
  */
object RecordStoreProps extends Properties("RecordStore") {

  private val rs = new RecordStore
  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("serializeKeys is insertion-order independent and deterministic") =
    Prop.forAll(Gen.resize(6, Gen.nonEmptyListOf(Gen.zip(word, word)))) { kvs =>
      val m = kvs.toMap
      val a = rs.serializeKeys(Some(m))
      val b = rs.serializeKeys(Some(scala.util.Random.shuffle(m.toList).toMap))
      a == b && a == rs.serializeKeys(Some(m))
    }

  property("exact string selector matches itself and nothing longer") =
    Prop.forAll(word) { v =>
      rs.matchValue(v, v) &&
      !rs.matchValue(v + "x", v) &&
      rs.matchValue(v, null)               // null selector = match-any
    }

  property("glob/in:/membership selectors honor their contracts") =
    Prop.forAll(word, word) { (a, b) =>
      rs.matchValue(a + b, a + "*") &&
      rs.matchValue(a + b, "*" + b) &&
      rs.matchValue(a + b, "in:" + a) &&
      rs.matchValue(a + b, "in:" + b) &&
      rs.matchValue(a, Seq(a, b)) &&
      (rs.matchValue(a, Seq(b)) == (a == b)) &&
      rs.matchValue(Seq(a, b), Seq(a, b))  // stored sequence: equality
    }
}
