package graft.functions

/** Hash formulas expressible identically in Spark SQL and DuckDB, so
  * hash-derived operators (MinHash, SimHash, fingerprints, fake decode)
  * can be oracle-checked bit-for-bit across engines.
  *
  * Primitive: lowercase-hex MD5 of a UTF-8 string — both engines expose
  * it as `md5(x)`. A 48-bit integer hash is the first 12 hex chars
  * parsed base-16 (48 bits keeps sums of ~10^4 terms inside a signed
  * 64-bit integer):
  *   Spark : CAST(conv(substring(md5(x), 1, 12), 16, 10) AS BIGINT)
  *   DuckDB: CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)
  */
object PortableHash {

  /** Spark SQL fragment: 48-bit integer hash of string expression `x`. */
  def hash48(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 12), 16, 10) AS BIGINT)"

  /** DuckDB fragment computing the identical 48-bit hash. */
  def hash48Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 12) AS BIGINT)"
}
