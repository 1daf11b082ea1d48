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

  /** CTE chain replaying the full BPE learn+apply protocol over
    * `documents` (the q116/q147 machinery, shared by q147 and the q148
    * capstone): `w0` (per-word char-split vocab with counts) through `k`
    * merge rounds (`p_i` pair counts, `b_i` deterministic argmax, `w_i`
    * literal replace) to `seg` (per-word subword counts) and `per`
    * (per-doc word + BPE-token totals). Returns the CTE list WITHOUT the
    * `WITH` keyword so callers can prepend `WITH` or `WITH RECURSIVE`
    * and append further CTEs.
    */
  def bpePerDocSql(k: Int): String = {
    val chain = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pair, SUM(cnt) AS c FROM (
        |    SELECT unnest(list_transform(range(len(sp)-1),
        |        j -> sp[j+1] || '  ' || sp[j+2])) AS pair, cnt
        |    FROM (SELECT string_split(trim(seq), '  ') AS sp, cnt FROM w${i - 1}))
        |  GROUP BY pair),
        |b$i AS MATERIALIZED (SELECT pair, c FROM p$i ORDER BY c DESC, pair ASC LIMIT 1),
        |w$i AS MATERIALIZED (SELECT word, replace(seq,
        |    ' ' || (SELECT pair FROM b$i) || ' ',
        |    ' ' || (SELECT replace(pair, '  ', '') FROM b$i) || ' ') AS seq, cnt
        |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
      |  SELECT word, '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS seq, cnt
      |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
      |    WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word)),
      |$chain,
      |seg AS (SELECT word,
      |    CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_toks FROM w$k),
      |occ AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
      |  FROM documents),
      |occf AS (SELECT doc_id, word FROM occ WHERE regexp_matches(word, '^[a-z]+$$')),
      |per AS (SELECT o.doc_id, COUNT(*) AS n_words, SUM(s.n_toks) AS n_bpe_tokens
      |  FROM occf o JOIN seg s USING (word) GROUP BY 1)""".stripMargin
  }
}
