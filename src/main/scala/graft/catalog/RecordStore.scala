package graft.catalog

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Prefix-keyed record store — the reference's pluggable table backend
  * (`deprecated/table_backend.py:17-184`) with its pipeline-adapter
  * path semantics (`utils/pipeline.py:274-372`, `test_pipeline_helpers.py`):
  *
  *  - a record is (DataFrame, metadata) stored under
  *    `dataname → prefix`, where the prefix is the CANONICAL JSON of
  *    the combined key dict (sorted keys, compact separators —
  *    `_serialize_keys`, `table_backend.py:25-28`); no keys → the
  *    literal prefix `"default"`;
  *  - path parts map to `level0..levelN` keys and WIN over same-named
  *    `table_keys` entries (`test_table_keys_conflict_priority`);
  *  - `getTables` returns the FLATTENED maps the pipeline consumes:
  *    `{prefix}{sep}data{sep}{idx}` → frame (idx = per-prefix insert
  *    order) and `{prefix}{sep}metadata{sep}{key}` → value with
  *    first-writer-wins per (prefix, key) (`table_backend.py:160-184`);
  *  - selection: every selector key must EXIST in the stored keys and
  *    match under the `_match_value` dialect (`table_backend.py:74-110`):
  *    null = match-any, predicate function, list membership (or
  *    sequence equality when the stored value is itself a sequence),
  *    and string selectors auto-detecting `re:` / `in:` / glob /
  *    exact — the same mini-language `ops/Selectors` compiles for
  *    column data, applied here to driver-side key dicts;
  *  - no key (including `__path__`) is special-cased
  *    (`test_no_special_path_handling`).
  *
  * Driver-side registry machinery by design: values are lazy Spark
  * plans, the store itself holds only human-scale key dicts — the
  * data path never touches it.
  */
final class RecordStore {

  final case class Record(data: DataFrame, metadata: Map[String, Any],
                          tableKeys: Option[Map[String, Any]])

  // dataname -> prefix -> records in insertion order
  private val store =
    mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, mutable.ArrayBuffer[Record]]]

  /** Canonical JSON of a key dict (sorted keys, compact separators,
    * non-ASCII \u-escaped) — renders identically to python's
    * `json.dumps(d, sort_keys=True, separators=(",", ":"))` for every
    * value type the reference exercises (strings, bools, ints, lists,
    * nested dicts) AND for arbitrary floats: doubles render through
    * [[PyFloatRepr]], CPython's shortest-round-trip repr with its
    * notation rules (`0.1`, `0.0001`, `1e-05`, `1e+16`, `-0.0` keeps
    * its sign), so any float key the reference's backend accepts
    * produces the byte-identical prefix here. Non-finite floats render
    * as `NaN`/`Infinity`/`-Infinity` — not standard JSON, but exactly
    * what `json.dumps` emits under its default `allow_nan=True`, and
    * prefix parity beats JSON validity for a store id. An empty dict
    * is FALSY in python (`if not keys`), so it serializes to
    * "default" exactly like None.
    */
  private[catalog] def serializeKeys(keys: Option[Map[String, Any]]): String =
    keys match {
      case None                  => "default"
      case Some(m) if m.isEmpty  => "default"
      case Some(m)               => jsonValue(m)
    }

  private def jsonValue(v: Any): String = v match {
    case null            => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${jsonString(k)}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case s: Seq[_]       => s.map(jsonValue).mkString("[", ",", "]")
    case s: String       => jsonString(s)
    case b: Boolean      => if (b) "true" else "false"
    case i: Int          => i.toString
    case l: Long         => l.toString
    case s: Short        => s.toString
    case b: Byte         => b.toString
    case bd: BigDecimal  => bd.toString
    case bi: BigInt      => bi.toString
    case f: Float        => PyFloatRepr.repr(f.toDouble)
    case d: Double       => PyFloatRepr.repr(d)
    case other           => jsonString(other.toString)
  }

  private def jsonString(s: String): String =
    s.flatMap {
      case '"'               => "\\\""
      case '\\'              => "\\\\"
      // CPython json emits the SHORT escapes for these five, \uXXXX
      // only for other control chars
      case '\n'              => "\\n"
      case '\t'              => "\\t"
      case '\r'              => "\\r"
      case '\b'              => "\\b"
      case '\f'              => "\\f"
      // ensure_ascii like python's default: remaining control chars
      // AND everything past ASCII go out as \uXXXX (surrogate halves
      // escape individually, matching CPython's astral rendering)
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c                 => c.toString
    }.mkString("\"", "", "\"")

  /** Path parts → level0..levelN dict, merged UNDER tableKeys so the
    * path-derived values win on collision (`utils/pipeline.py`
    * adapter contract, pinned by `test_table_keys_conflict_priority`).
    */
  private def combinedKeys(path: Seq[String],
                           tableKeys: Option[Map[String, Any]]): Option[Map[String, Any]] = {
    val levels = path.zipWithIndex.map { case (p, i) => s"level$i" -> (p: Any) }.toMap
    (tableKeys, levels.nonEmpty) match {
      case (None, false)    => None
      case (None, true)     => Some(levels)
      case (Some(tk), _)    => Some(tk ++ levels) // levels overwrite
    }
  }

  /** `write_data_to_dataset` + `write_table`: store the frame under the
    * serialized combined-key prefix; returns the metadata (the
    * pipeline's convenience contract).
    */
  def writeTable(dataname: String, path: Seq[String],
                 tableKeys: Option[Map[String, Any]], data: DataFrame,
                 metadata: Map[String, Any] = Map.empty): Map[String, Any] = {
    val keys = combinedKeys(path, tableKeys)
    val prefix = serializeKeys(keys)
    store.getOrElseUpdate(dataname, mutable.LinkedHashMap.empty)
      .getOrElseUpdate(prefix, mutable.ArrayBuffer.empty) +=
      Record(data, metadata, keys)
    metadata
  }

  /** `_match_value` (`table_backend.py:74-110`), verbatim dialect. */
  private[catalog] def matchValue(value: Any, selector: Any): Boolean =
    selector match {
      case null => true
      // Seq before Function1: scala Seqs ARE Function1s (index lookup),
      // and the reference checks `callable` before list only because
      // python lists aren't callable
      case sel: Seq[_] => value match {
        case v: Seq[_] => v == sel          // sequence equality
        case v         => sel.contains(v)   // membership
      }
      // Map before Function1 for the same reason as Seq: scala Maps ARE
      // Function1s (key lookup), but a python dict selector isn't
      // callable — the reference falls through to equality for it
      case m: Map[_, _] => value == m
      case f: Function1[_, _] =>
        try f.asInstanceOf[Any => Boolean](value) catch { case _: Exception => false }
      case s: String =>
        if (s.startsWith("re:"))
          try s.drop(3).r.findFirstIn(String.valueOf(value)).isDefined
          catch { case _: Exception => false }
        else if (s.startsWith("in:")) String.valueOf(value).contains(s.drop(3))
        else if (s.exists(c => c == '*' || c == '?' || c == '['))
          String.valueOf(value).matches(fnmatchRegex(s))
        else String.valueOf(value) == s
      case other => value == other
    }

  /** python `fnmatch` → anchored regex: unlike the path-glob dialect
    * (`TreeScan.globToRegex`), `*` and `?` cross everything — there
    * are no path segments in a key value.
    */
  private def fnmatchRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb ++= ".*"; i += 1
        case '?' => sb ++= "."; i += 1
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb ++= "\\["; i += 1 }
          else { sb ++= glob.substring(i, close + 1).replace("[!", "[^"); i = close + 1 }
        case c if "\\.^$+{}()|".indexOf(c.toInt) >= 0 => sb += '\\' += c; i += 1
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  /** `get_tables`: flattened (data, metadata) maps over every record
    * whose stored keys satisfy ALL selector entries. Insertion order
    * is preserved (LinkedHashMap store → ordered output maps).
    */
  def getTables(dataname: String,
                selector: Option[Map[String, Any]],
                sep: String = "_"): (Seq[(String, DataFrame)], Seq[(String, Any)]) = {
    val outData = mutable.ArrayBuffer.empty[(String, DataFrame)]
    val outMeta = mutable.LinkedHashMap.empty[String, Any]
    // python `if not req_keys` treats an EMPTY selector dict as falsy →
    // match-all (including keyless 'default' records); Some(empty) must
    // behave like None, not like an unsatisfiable selector
    val normalized = selector.filter(_.nonEmpty)
    store.getOrElse(dataname, mutable.LinkedHashMap.empty).foreach {
      case (prefix, records) =>
        val storedKeys = records.headOption.flatMap(_.tableKeys)
        val selected = normalized match {
          case None => true
          case Some(req) => storedKeys match {
            // a prefix with no keys can never satisfy a selector
            // (`table_backend.py:149-156`: missing key → match_all=False)
            case None => false
            case Some(sk) => req.forall { case (k, sel) =>
              sk.contains(k) && matchValue(sk(k), sel)
            }
          }
        }
        if (selected) records.zipWithIndex.foreach { case (rec, idx) =>
          outData += s"$prefix${sep}data$sep$idx" -> rec.data
          rec.metadata.foreach { case (mk, mv) =>
            val metaKey = s"$prefix${sep}metadata$sep$mk"
            if (!outMeta.contains(metaKey)) outMeta(metaKey) = mv
          }
        }
    }
    (outData.toSeq, outMeta.toSeq)
  }

  /** Test/demo hook mirroring `DEFAULT_BACKEND._store.clear()`. */
  def clear(): Unit = store.clear()
}
