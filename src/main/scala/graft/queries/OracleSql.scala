package graft.queries

/** Shared DuckDB-oracle SQL fragments used across query files. */
object OracleSql {

  /** Derived-table fragment mirroring [[graft.dedup.Dedup.md5Hash64]]:
    * first 16 md5 hex chars assembled through HUGEINT into a signed
    * (two's-complement) BIGINT named `out`, alongside the passthrough
    * `keys` columns.
    */
  def md5Hash64Sql(keys: String, hexExpr: String, from: String,
                   out: String): String =
    s"""(SELECT $keys, CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
       |    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS $out
       |  FROM (SELECT $keys,
       |      CAST(CAST(('0x'||substr(hex,1,8)) AS BIGINT) AS HUGEINT) * 4294967296::HUGEINT
       |        + CAST(CAST(('0x'||substr(hex,9,8)) AS BIGINT) AS HUGEINT) AS hu
       |    FROM (SELECT $keys, $hexExpr AS hex FROM $from)))""".stripMargin
}
