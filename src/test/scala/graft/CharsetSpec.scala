package graft

import org.apache.spark.sql.functions._
import graft.functions.expr.{Charsets, NativeFunctions}

/** The charset sniff/decode contract (CharsetExpr scaladoc): BOM >
  * meta-prescan > UTF-8-validity heuristic > windows-1252 fallback;
  * decode repairs (U+FFFD), never throws. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("BOMs win and are stripped by decode") {
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8("héllo")
    assert(Charsets.sniffName(bom8) === "utf-8-bom")
    assert(Charsets.decode(bom8).toString === "héllo")
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ "héllo".getBytes("UTF-16BE")
    assert(Charsets.sniffName(be) === "utf-16be-bom")
    assert(Charsets.decode(be).toString === "héllo")
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ "héllo".getBytes("UTF-16LE")
    assert(Charsets.sniffName(le) === "utf-16le-bom")
    assert(Charsets.decode(le).toString === "héllo")
    // java's "UTF-16" encoder emits the BE BOM itself — same route
    assert(Charsets.decode("héllo".getBytes("UTF-16")).toString === "héllo")
  }

  test("meta charset in the 1024-byte prescan window, labels normalized") {
    def page(meta: String) =
      utf8(s"""<html><head><meta $meta></head><body>plain</body></html>""")
    assert(Charsets.sniffName(page("charset=\"windows-1252\"")) === "windows-1252")
    assert(Charsets.sniffName(page("charset='ISO-8859-1'")) === "windows-1252")
    assert(Charsets.sniffName(page("charset=latin1")) === "windows-1252")
    assert(Charsets.sniffName(
      page("http-equiv=\"Content-Type\" content=\"text/html; charset=UTF8\"")) === "utf-8")
    // utf-16 labels are ignored (an ASCII-visible meta disproves utf-16)
    assert(Charsets.sniffName(page("charset=utf-16")) === "utf-8")
    // unknown labels are ignored → heuristic
    assert(Charsets.sniffName(page("charset=klingon-8")) === "utf-8")
    // JVM-supported exotic labels pass through
    assert(Charsets.sniffName(page("charset=shift_jis")) === "shift_jis")
    // outside the 1024-byte window the meta is invisible
    val far = utf8("<html>" + ("x" * 1100) + "<meta charset=windows-1252>")
    assert(Charsets.sniffName(far) === "utf-8")
  }

  test("UTF-8 validity heuristic: strict RFC 3629") {
    assert(Charsets.validUtf8(utf8("naïve — héllo ✓ 😀")))
    assert(Charsets.validUtf8(Array.empty[Byte]))
    assert(!Charsets.validUtf8(Array(0xE9).map(_.toByte))) // bare latin-1 é
    assert(!Charsets.validUtf8(Array(0xC0, 0xAF).map(_.toByte))) // overlong /
    assert(!Charsets.validUtf8(Array(0xED, 0xA0, 0x80).map(_.toByte))) // surrogate
    assert(!Charsets.validUtf8(Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte))) // >U+10FFFF
    assert(!Charsets.validUtf8(utf8("ok").dropRight(0) :+ 0x80.toByte)) // stray cont.
  }

  test("windows-1252 fallback decodes real latin-1/cp1252 bytes") {
    val latin = "Café à ü".getBytes("ISO-8859-1")
    assert(Charsets.sniffName(latin) === "windows-1252")
    assert(Charsets.decode(latin).toString === "Café à ü")
    // cp1252's 0x80-0x9F block (where it differs from latin-1)
    val smart = Array[Byte]('a', 0x93.toByte, 'b', 0x94.toByte, 0x80.toByte)
    assert(Charsets.decode(smart).toString === "a“b”€")
  }

  test("decode repairs instead of throwing") {
    // declared utf-8 but contains a bare 0xE9: decoder must emit
    // U+FFFD, not die (the crawl-pipeline contract)
    val broken = utf8("<meta charset=utf-8>Caf") ++ Array(0xE9.toByte) ++ utf8("!")
    assert(Charsets.sniffName(broken) === "utf-8")
    assert(Charsets.decode(broken).toString.contains("Caf�!"))
    // the INVARIANT behind the repair: whatever the input bytes, the
    // decoded UTF8String's backing bytes are valid UTF-8 — a meta-
    // or BOM-driven utf-8 verdict must never zero-copy invalid bytes
    // into the engine (they'd poison every downstream comparison)
    val bomBroken = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      utf8("ok") ++ Array(0xC0, 0xAF).map(_.toByte) // BOM + overlong '/'
    for (bytes <- Seq(broken, bomBroken, utf8("fine"), "é".getBytes("ISO-8859-1"))) {
      assert(Charsets.validUtf8(Charsets.decode(bytes).getBytes),
        s"decode emitted invalid UTF-8 for ${bytes.toSeq}")
    }
  }

  test("column API: sniff + decode are codegen'd and null-safe") {
    val nulls = Seq((3L, null.asInstanceOf[Array[Byte]])).toDF("id", "raw")
      .select(col("id"),
        NativeFunctions.charset_sniff(col("raw")).as("cs"),
        NativeFunctions.charset_decode(col("raw")).as("txt"))
      .collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(nulls.toSeq === Seq((3L, None, None)))
    // a range-backed plan (NOT a constant-foldable local relation):
    // the projection must execute inside WholeStageCodegen, proving
    // the expressions never fall back to interpreted row boxing
    val df = spark.range(4)
      .select(col("id"),
        NativeFunctions.charset_sniff(
          when(col("id") % 2 === 0, encode(concat(lit("Café "), col("id").cast("string")), "ISO-8859-1"))
            .otherwise(encode(concat(lit("héllo "), col("id").cast("string")), "UTF-8"))).as("cs"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((0L, "windows-1252"), (1L, "utf-8"),
      (2L, "windows-1252"), (3L, "utf-8")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"charset_sniff projection fell out of WholeStageCodegen:\n$plan")
  }
}
