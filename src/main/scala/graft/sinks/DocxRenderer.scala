package graft.sinks

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** OOXML (.docx) backend for [[Report]] — closes K8's last gap (the
  * reference's python-docx adapter, `utils/adapters/docx_helpers.py:4-115`).
  * ECMA-376 WordprocessingML emitted directly over `java.util.zip`;
  * no dependencies.
  *
  * Mirrored contracts:
  *  - `docx_write_text` (`docx_helpers.py:14-35`): paragraph with a
  *    named style and left/center/right/justify alignment;
  *  - `docx_insert_table` (`docx_helpers.py:37-61`): header row first,
  *    then data rows, then a "Table: caption" paragraph;
  *  - `docx_merge_cells` (`docx_helpers.py:85-99`): merge groups of
  *    (row, col) positions over the combined header+data grid, first
  *    cell master; python-docx merges to the group's BOUNDING
  *    RECTANGLE, reproduced here as `gridSpan` (horizontal) +
  *    `vMerge` restart/continue (vertical); invalid/overlapping
  *    groups are ignored, as the reference swallows merge errors;
  *  - `docx_insert_picture` (`docx_helpers.py:63-72`): PNG files are
  *    embedded with intrinsic IHDR dimensions (python-docx reads the
  *    same header), `widthInches` scales preserving aspect; non-PNG
  *    paths degrade to a visible "Figure: <path>" reference
  *    paragraph — no silent drop.
  *
  * Like [[PlotRender]], output is deterministic: stable rIds, no
  * timestamps (zip entries pin epoch), golden-testable.
  */
object DocxRenderer {
  import Report._

  private val EmuPerInch = 914400L
  private val EmuPerPx = 9525L // 96 dpi reference pixel

  private def esc(s: String): String = Escape.xml(s)

  /** One embedded image: relationship id + bytes + EMU extent. */
  private final case class Media(rId: String, name: String,
                                 bytes: Array[Byte], cx: Long, cy: Long)

  /** (width, height) from a PNG IHDR, or None if not a PNG. */
  private[sinks] def pngDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 24 || !bytes.take(8).sameElements(sig)) None
    else {
      def be(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      Some((be(16), be(20)))
    }
  }

  /** document.xml for `blocks` (the golden-testable core). Returns the
    * XML plus the media parts referenced from it.
    */
  private def documentXml(blocks: Seq[Block]): (String, Seq[Media]) = {
    val media = scala.collection.mutable.ArrayBuffer.empty[Media]
    val body = blocks.map {
      case Heading(level, text) =>
        val l = math.max(1, math.min(6, level))
        s"""<w:p><w:pPr><w:pStyle w:val="Heading$l"/></w:pPr><w:r><w:t xml:space="preserve">${esc(text)}</w:t></w:r></w:p>"""
      case Paragraph(text, style, align) => para(text, style, align)
      case Figure(path, caption, widthInches) =>
        val p = java.nio.file.Paths.get(path)
        val embedded =
          if (java.nio.file.Files.isRegularFile(p)) {
            val bytes = java.nio.file.Files.readAllBytes(p)
            pngDims(bytes).map { case (wPx, hPx) =>
              val (cx, cy) = widthInches match {
                case Some(in) =>
                  val cx = (in * EmuPerInch).toLong
                  (cx, cx * hPx / math.max(1, wPx))
                case None => (wPx * EmuPerPx, hPx * EmuPerPx)
              }
              val rId = s"rIdImg${media.size + 1}"
              media += Media(rId, s"image${media.size + 1}.png", bytes, cx, cy)
              drawing(rId, media.size, cx, cy)
            }
          } else None
        embedded.getOrElse(para(s"Figure: $path", "Normal", "left")) +
          caption.map(c => para(s"Figure: $c", "Caption", "left")).getOrElse("")
      case Table(header, rows, caption, style, mergeGroups) =>
        tableXml(header, rows, style, mergeGroups) +
          caption.map(c => para(s"Table: $c", "Caption", "left")).getOrElse("")
    }.mkString
    val xml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:pic="http://schemas.openxmlformats.org/drawingml/2006/picture">""" +
        s"<w:body>$body<w:sectPr/></w:body></w:document>"
    (xml, media.toSeq)
  }

  private def para(text: String, style: String, align: String): String = {
    val jc = align match {
      case "center"  => """<w:jc w:val="center"/>"""
      case "right"   => """<w:jc w:val="right"/>"""
      case "justify" => """<w:jc w:val="both"/>"""
      case _         => ""
    }
    val st = if (style == "Normal") "" else s"""<w:pStyle w:val="${esc(style)}"/>"""
    val pPr = if (st.nonEmpty || jc.nonEmpty) s"<w:pPr>$st$jc</w:pPr>" else ""
    s"""<w:p>$pPr<w:r><w:t xml:space="preserve">${esc(text)}</w:t></w:r></w:p>"""
  }

  /** python-docx merge semantics: a group's cells merge into their
    * bounding rectangle. Returns non-overlapping in-bounds rects
    * (r0, c0, r1, c1); later groups conflicting with earlier ones are
    * dropped (reference: per-cell merge failures are swallowed).
    */
  private[sinks] def mergeRects(groups: Seq[Seq[(Int, Int)]],
                                nRows: Int, nCols: Int): Seq[(Int, Int, Int, Int)] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    groups.filter(_.nonEmpty).foreach { g =>
      val (r0, c0) = (g.map(_._1).min, g.map(_._2).min)
      val (r1, c1) = (g.map(_._1).max, g.map(_._2).max)
      val inBounds = r0 >= 0 && c0 >= 0 && r1 < nRows && c1 < nCols
      val single = r0 == r1 && c0 == c1
      val overlaps = acc.exists { case (ar0, ac0, ar1, ac1) =>
        r0 <= ar1 && ar0 <= r1 && c0 <= ac1 && ac0 <= c1
      }
      if (inBounds && !single && !overlaps) acc += ((r0, c0, r1, c1))
    }
    acc.toSeq
  }

  private def tableXml(header: Seq[String], rows: Seq[Seq[String]],
                       style: Option[String],
                       mergeGroups: Seq[Seq[(Int, Int)]]): String = {
    // merge coordinates index the combined header+data grid, exactly
    // as python-docx's table.cell does (docx_helpers.py:85-99)
    val grid = (if (header.nonEmpty) Seq(header) else Nil) ++ rows
    if (grid.isEmpty) return ""
    val nCols = grid.map(_.size).max
    val rects = mergeRects(mergeGroups, grid.size, nCols)
    val tblPr = s"""<w:tblPr>${style.map(s => s"""<w:tblStyle w:val="${esc(s)}"/>""").getOrElse("")}<w:tblBorders><w:top w:val="single" w:sz="4"/><w:left w:val="single" w:sz="4"/><w:bottom w:val="single" w:sz="4"/><w:right w:val="single" w:sz="4"/><w:insideH w:val="single" w:sz="4"/><w:insideV w:val="single" w:sz="4"/></w:tblBorders></w:tblPr>"""
    val gridXml = (0 until nCols).map(_ => "<w:gridCol/>").mkString(s"<w:tblGrid>", "", "</w:tblGrid>")
    val body = grid.zipWithIndex.map { case (row, r) =>
      val cells = new StringBuilder
      var c = 0
      while (c < nCols) {
        rects.find { case (r0, c0, r1, _) => r >= r0 && r <= r1 && c == c0 } match {
          case Some((r0, c0, r1, c1)) =>
            val span = c1 - c0 + 1
            val spanXml = if (span > 1) s"""<w:gridSpan w:val="$span"/>""" else ""
            val vXml =
              if (r1 > r0)
                if (r == r0) """<w:vMerge w:val="restart"/>""" else "<w:vMerge/>"
              else ""
            // master top-left keeps its text; merged-away cells empty
            val text = if (r == r0) row.lift(c).getOrElse("") else ""
            cells ++= s"""<w:tc><w:tcPr>$spanXml$vXml</w:tcPr>${para(text, "Normal", "left")}</w:tc>"""
            c = c1 + 1
          case None =>
            cells ++= s"""<w:tc>${para(row.lift(c).getOrElse(""), "Normal", "left")}</w:tc>"""
            c += 1
        }
      }
      s"<w:tr>$cells</w:tr>"
    }.mkString
    s"<w:tbl>$tblPr$gridXml$body</w:tbl>"
  }

  private def drawing(rId: String, idx: Int, cx: Long, cy: Long): String =
    s"""<w:p><w:r><w:drawing><wp:inline distT="0" distB="0" distL="0" distR="0"><wp:extent cx="$cx" cy="$cy"/><wp:docPr id="$idx" name="Picture $idx"/><a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/picture"><pic:pic><pic:nvPicPr><pic:cNvPr id="$idx" name="Picture $idx"/><pic:cNvPicPr/></pic:nvPicPr><pic:blipFill><a:blip r:embed="$rId"/><a:stretch><a:fillRect/></a:stretch></pic:blipFill><pic:spPr><a:xfrm><a:off x="0" y="0"/><a:ext cx="$cx" cy="$cy"/></a:xfrm><a:prstGeom prst="rect"><a:avLst/></a:prstGeom></pic:spPr></pic:pic></a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>"""

  private val stylesXml: String = {
    val headings = (1 to 6).map { l =>
      s"""<w:style w:type="paragraph" w:styleId="Heading$l"><w:name w:val="heading $l"/><w:pPr><w:outlineLvl w:val="${l - 1}"/></w:pPr><w:rPr><w:b/><w:sz w:val="${40 - 4 * l}"/></w:rPr></w:style>"""
    }.mkString
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
      """<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:style w:type="paragraph" w:default="1" w:styleId="Normal"><w:name w:val="Normal"/></w:style>""" +
      """<w:style w:type="paragraph" w:styleId="Caption"><w:name w:val="caption"/><w:rPr><w:i/></w:rPr></w:style>""" +
      headings + "</w:styles>"
  }

  /** The zip parts of the package, in emission order. */
  private[sinks] def parts(blocks: Seq[Block]): Seq[(String, Array[Byte])] = {
    val (doc, media) = documentXml(blocks)
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Default Extension="png" ContentType="image/png"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        """<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>""" +
        "</Types>"
    val pkgRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        "</Relationships>"
    val docRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rIdStyles" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        media.map(m =>
          s"""<Relationship Id="${m.rId}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/${m.name}"/>""").mkString +
        "</Relationships>"
    Seq(
      "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
      "_rels/.rels" -> pkgRels.getBytes("UTF-8"),
      "word/_rels/document.xml.rels" -> docRels.getBytes("UTF-8"),
      "word/styles.xml" -> stylesXml.getBytes("UTF-8"),
      "word/document.xml" -> doc.getBytes("UTF-8")) ++
      media.map(m => s"word/media/${m.name}" -> m.bytes)
  }

  /** Serialize the package to bytes (zip timestamps pinned to epoch →
    * byte-deterministic for the same blocks).
    */
  def renderBytes(blocks: Seq[Block]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    parts(blocks).foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(bytes)
      zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }

  /** Write `blocks` as a .docx file (the `save_doc` analog). */
  def write(blocks: Seq[Block], path: String): Unit = {
    val out = new FileOutputStream(path)
    try out.write(renderBytes(blocks)) finally out.close()
  }
}
