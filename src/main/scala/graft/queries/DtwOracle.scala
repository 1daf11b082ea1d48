package graft.queries

/** Machine-generated DuckDB transcript of the [[graft.ml.Clustering.dtwKMeansExact]]
  * protocol (q109's oracle): prep (daily decimal-exact means → day-spine
  * densify with ffill/bfill → per-day min-max scaling → ordered series
  * lists), md5-seeded farthest-first init (k-1 stages), `maxIter` Lloyd
  * rounds (DTW assignment + DECIMAL(38,9) pointwise-mean update with
  * empty-cluster carry), and the final assignment with each winner's DTW
  * distance.
  *
  * Every DTW evaluation is an unrolled dynamic program: a recursive CTE
  * over DP ROWS (one iteration per series position) whose `len` columns
  * are lateral aliases, so the column-j cell reads column j-1 of the same
  * row and columns j-1/j of the previous row — the exact JVM recurrence
  * `cost + min(prev(j), cur(j-1), prev(j-1))` with the same IEEE double
  * ops in the same order. Shared/chained CTEs are MATERIALIZED: without
  * the hint DuckDB inlines each reference, which re-opens the parquet
  * scan per stage and makes the st/cents dependency chains exponential to
  * plan.
  *
  * `len` is pinned at generation time (the testdata events table spans
  * exactly the 30 days of 2024-01; the Spark side derives the spine
  * dynamically). A span change would fail loudly as a list-index error,
  * not silently pass.
  */
private[queries] object DtwOracle {

  private def dtwStage(tag: String, pairs: String, len: Int): String = {
    val base = (1 to len).map { j =>
      if (j == 1) "(a[1]-b[1])*(a[1]-b[1]) AS v1"
      else s"(a[1]-b[$j])*(a[1]-b[$j]) + v${j - 1} AS v$j"
    }.mkString(",\n    ")
    val rec = (1 to len).map { j =>
      val cost = s"(p.a[w.i+1]-p.b[$j])*(p.a[w.i+1]-p.b[$j])"
      if (j == 1) s"$cost + w.v1 AS n1"
      else s"$cost + LEAST(w.v$j, n${j - 1}, w.v${j - 1}) AS n$j"
    }.mkString(",\n      ")
    val reAlias = (1 to len).map(j => s"n$j AS v$j").mkString(", ")
    s"""dtw_$tag AS (
       |  SELECT sid, c, 1 AS i,
       |    $base
       |  FROM $pairs
       |  UNION ALL
       |  SELECT sid, c, i, $reAlias FROM (
       |    SELECT w.sid, w.c, w.i+1 AS i,
       |      $rec
       |    FROM dtw_$tag w JOIN $pairs p ON w.sid = p.sid AND w.c = p.c
       |    WHERE w.i < $len)
       |),
       |d_$tag AS (SELECT sid, c, SQRT(v$len) AS dist FROM dtw_$tag WHERE i = $len)""".stripMargin
  }

  def sql(k: Int, maxIter: Int, len: Int): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""daily AS MATERIALIZED (SELECT user_id, CAST(ts AS DATE) AS day,
       |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS val
       |  FROM events GROUP BY 1, 2),
       |spine AS (SELECT DISTINCT day FROM daily),
       |ukeys AS (SELECT DISTINCT user_id FROM daily),
       |dense AS (SELECT k.user_id, s.day, d.val
       |  FROM ukeys k CROSS JOIN spine s
       |  LEFT JOIN daily d ON d.user_id = k.user_id AND d.day = s.day),
       |filled AS (SELECT user_id, day, COALESCE(
       |    last_value(val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    first_value(val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS val
       |  FROM dense),
       |pstats AS (SELECT day, MIN(val) AS lo, MAX(val) AS hi FROM filled GROUP BY day),
       |scaled AS (SELECT f.user_id, f.day,
       |    CASE WHEN s.hi - s.lo = 0 THEN 0.0 ELSE (f.val - s.lo) / (s.hi - s.lo) END AS v
       |  FROM filled f JOIN pstats s USING (day)),
       |ser AS MATERIALIZED (SELECT CAST(user_id AS VARCHAR) AS sid, list(v ORDER BY day) AS a
       |  FROM scaled GROUP BY user_id)""".stripMargin
    // farthest-first init: stage m measures each series against cent_m
    ctes += "cent_1 AS (SELECT a AS b FROM ser ORDER BY md5(sid) LIMIT 1)"
    for (m <- 1 until k) {
      ctes += s"p_i$m AS (SELECT sid, 0 AS c, a, b FROM ser CROSS JOIN cent_$m)"
      ctes += dtwStage(s"i$m", s"p_i$m", len)
      ctes +=
        (if (m == 1) s"st_$m AS MATERIALIZED (SELECT sid, dist AS d FROM d_i$m)"
         else s"st_$m AS MATERIALIZED (SELECT t.sid, LEAST(t.d, n.dist) AS d " +
           s"FROM st_${m - 1} t JOIN d_i$m n USING (sid))")
      ctes += s"cent_${m + 1} AS (SELECT s.a AS b FROM st_$m t JOIN ser s USING (sid) " +
        "ORDER BY t.d DESC, t.sid ASC LIMIT 1)"
    }
    ctes += s"cents_0 AS MATERIALIZED (" +
      (0 until k).map(i => s"SELECT $i AS c, b FROM cent_${i + 1}").mkString(" UNION ALL ") + ")"
    // Lloyd rounds: assignment (argmin dist, tie smallest c) then the
    // decimal-exact pointwise mean with empty-cluster carry
    for (t <- 1 to maxIter) {
      ctes += s"p_a$t AS (SELECT s.sid, c.c, s.a, c.b FROM ser s CROSS JOIN cents_${t - 1} c)"
      ctes += dtwStage(s"a$t", s"p_a$t", len)
      ctes += s"asg_$t AS MATERIALIZED (SELECT sid, c FROM (SELECT sid, c, " +
        s"ROW_NUMBER() OVER (PARTITION BY sid ORDER BY dist, c) AS rn " +
        s"FROM d_a$t) WHERE rn = 1)"
      ctes += s"up_$t AS (SELECT g.c, rng.pos, " +
        s"CAST(SUM(CAST(s.a[rng.pos] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m " +
        s"FROM asg_$t g JOIN ser s USING (sid) CROSS JOIN range(1, ${len + 1}) rng(pos) " +
        s"GROUP BY 1, 2)"
      ctes += s"cents_$t AS MATERIALIZED (SELECT pr.c, COALESCE(nu.b, pr.b) AS b " +
        s"FROM cents_${t - 1} pr " +
        s"LEFT JOIN (SELECT c, list(m ORDER BY pos) AS b FROM up_$t GROUP BY c) nu USING (c))"
    }
    ctes += s"p_f AS (SELECT s.sid, c.c, s.a, c.b FROM ser s CROSS JOIN cents_$maxIter c)"
    ctes += dtwStage("f", "p_f", len)
    "WITH RECURSIVE\n" + ctes.mkString(",\n") + "\n" +
      """SELECT CAST(sid AS BIGINT) AS series, CAST(c AS BIGINT) AS cluster,
        |  CAST(CAST(dist AS DECIMAL(18,9)) AS DOUBLE) AS dist FROM (
        |  SELECT sid, c, dist, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY dist, c) AS rn
        |  FROM d_f) WHERE rn = 1 ORDER BY series""".stripMargin
  }
}
