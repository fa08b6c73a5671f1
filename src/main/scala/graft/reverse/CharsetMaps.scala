package graft.reverse

/** Structure-level charset and collation matrices — the reference's
  * `MigrateTableStructureDatabaseCharsetMap` /
  * `MigrateTableStructureDatabaseCollationMap`
  * (`common/reverse.go:102-200+`): which target charset a source
  * database charset maps to per task direction, and which target
  * collation realizes the source's case/accent sensitivity on that
  * charset.
  *
  * Directional quirks carried over faithfully:
  *  - O2T pins every source charset to UTF8MB4 (TiDB convention);
  *  - CJK charsets have no accent-insensitive collations in MySQL, so
  *    BINARY_CI/AI both fall back to *_CHINESE_CI (the reference's
  *    commented substitution);
  *  - BINARY (pre-12.2 Oracle, no NLS extension) behaves as
  *    case+accent sensitive → *_BIN, same as BINARY_CS.
  */
object CharsetMaps {

  /** O2M: Oracle database charset → MySQL charset. */
  val o2mCharset: Map[String, String] = Map(
    "UTF8" -> "UTF8MB4",
    "AL32UTF8" -> "UTF8MB4",
    "ZHT16BIG5" -> "BIG5",
    "ZHS16GBK" -> "GBK",
    "ZHS32GB18030" -> "GB18030")

  /** O2T: TiDB structures are uniformly UTF8MB4. */
  val o2tCharset: Map[String, String] =
    o2mCharset.keysIterator.map(_ -> "UTF8MB4").toMap

  /** M2O: MySQL charset → Oracle database charset. */
  val m2oCharset: Map[String, String] = Map(
    "UTF8MB4" -> "AL32UTF8",
    "UTF8" -> "AL32UTF8",
    "BIG5" -> "ZHT16BIG5",
    "GBK" -> "ZHS16GBK",
    "GB18030" -> "ZHS32GB18030")

  private val cjkCi = Map(
    "BIG5" -> "BIG5_CHINESE_CI",
    "GBK" -> "GBK_CHINESE_CI",
    "GB18030" -> "GB18030_CHINESE_CI")

  /** Target collation for an Oracle NLS behavior (BINARY_CI /
    * BINARY_AI / BINARY_CS / BINARY) on a MySQL-family charset.
    */
  def collation(nlsSort: String, targetCharset: String): String =
    nlsSort.toUpperCase match {
      case "BINARY_CI" => targetCharset match {
        case "UTF8MB4" => "UTF8MB4_0900_AS_CI"
        case "UTF8" => "UTF8_0900_AS_CI"
        case c => cjkCi(c)
      }
      case "BINARY_AI" => targetCharset match {
        case "UTF8MB4" => "UTF8MB4_GENERAL_CI"
        case "UTF8" => "UTF8_GENERAL_CI"
        case c => cjkCi(c)
      }
      case _ => s"${targetCharset}_BIN"
    }

  /** M2O/T2O: MySQL column collation → Oracle NLS sort behavior
    * (`common/reverse.go:213-360`). Charset-independent in the
    * reference (every Oracle charset row carries the same value).
    * Ambiguous forms keep the reference's dual rendering: a CJK
    * *_CHINESE_CI collation could be accent-sensitive or not
    * ("BINARY_AI/BINARY_CI"), and *_BIN depends on the Oracle
    * version's extension support ("BINARY/BINARY_CS").
    */
  val m2oNls: Map[String, String] = Map(
    "UTF8MB4_0900_AS_CI" -> "BINARY_CI",
    "UTF8MB4_GENERAL_CI" -> "BINARY_AI",
    "UTF8_GENERAL_CI" -> "BINARY_AI",
    "BIG5_CHINESE_CI" -> "BINARY_AI/BINARY_CI",
    "GBK_CHINESE_CI" -> "BINARY_AI/BINARY_CI",
    "GB18030_CHINESE_CI" -> "BINARY_AI/BINARY_CI",
    "UTF8MB4_BIN" -> "BINARY/BINARY_CS",
    "UTF8_BIN" -> "BINARY/BINARY_CS",
    "BIG5_BIN" -> "BINARY/BINARY_CS",
    "GBK_BIN" -> "BINARY/BINARY_CS",
    "GB18030_BIN" -> "BINARY/BINARY_CS")

  /** T2O: TiDB charset → Oracle database charset — the M2O map
    * restricted to the charsets TiDB ships (`common/reverse.go:125-129`;
    * no BIG5/GB18030).
    */
  val t2oCharset: Map[String, String] = Map(
    "UTF8MB4" -> "AL32UTF8",
    "UTF8" -> "AL32UTF8",
    "GBK" -> "ZHS16GBK")

  /** T2O collation matrix (`common/reverse.go:291-344`): the M2O rows
    * minus the BIG5/GB18030 collations TiDB doesn't support.
    */
  val t2oNls: Map[String, String] =
    m2oNls.view.filterKeys(k =>
      !k.startsWith("BIG5") && !k.startsWith("GB18030")).toMap

  /** The CREATE TABLE suffix pieces for a direction + source charset +
    * NLS behavior — what the DDL writers consume instead of pinned
    * constants.
    */
  def tableCharsetCollation(taskType: String, sourceCharset: String,
      nlsSort: String): (String, String) = {
    val cs = taskType match {
      case "O2T" => o2tCharset(sourceCharset.toUpperCase)
      case _ => o2mCharset(sourceCharset.toUpperCase)
    }
    (cs, collation(nlsSort, cs))
  }
}
