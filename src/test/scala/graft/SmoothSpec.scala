package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Holt smoothing semantics: hand-computed recursion, two-point
  * degenerate case, and the literal identity the oracle parity rests
  * on (1−α must BE the double the SQL twin writes).
  */
class SmoothSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("holt: hand-computed three-point recursion, alpha=0.5 beta=0.5") {
    // y = [10, 12, 11]; l1=10, b1=2.
    // l2 = .5*12 + .5*(10+2) = 12;  b2 = .5*(12-10) + .5*2   = 2
    // l3 = .5*11 + .5*(12+2) = 12.5; b3 = .5*(12.5-12) + .5*2 = 1.25
    val df = Seq(Tuple1(Seq(10.0, 12.0, 11.0))).toDF("vs")
    val r = df.select(graft.ts.Smooth.holt(col("vs"), 0.5, 0.5).as("st"))
      .select(col("st.l"), col("st.b")).collect()(0)
    assert(r.getDouble(0) === 12.5 && r.getDouble(1) === 1.25)
  }

  test("holt: two-point series folds y2 once onto the init state") {
    // l1=3, b1=4.5; step on y2: l2 = .2*7.5 + .8*(3+4.5) = 7.5,
    // b2 = .1*(7.5-3) + .9*4.5 = 4.5 — mirrors the oracle recursion,
    // whose base is i=1 and whose first step consumes rn=2
    val df = Seq(Tuple1(Seq(3.0, 7.5))).toDF("vs")
    val r = df.select(graft.ts.Smooth.holt(col("vs"), 0.2, 0.1).as("st"))
      .select(col("st.l"), col("st.b")).collect()(0)
    assert(r.getDouble(0) === 7.5 && r.getDouble(1) === 4.5)
  }

  test("cusum: planted level shift alarms shortly after the shift, stable series never") {
    // standardized series: 20 in-control points at z ~ 0, then a +2σ
    // shift. hi accumulates (2 - 0.5) = 1.5/step -> crosses h=4 on the
    // 3rd post-shift point (index 23); total alarms = all remaining
    // steps from there (no reset)
    val zs = Seq.fill(20)(0.0) ++ Seq.fill(10)(2.0)
    val df = Seq(Tuple1(zs)).toDF("zs")
    val r = df.select(graft.ts.Smooth.cusum(col("zs"), 0.5, 4.0).as("st"))
      .select(col("st.n_alarms"), col("st.first_alarm"), col("st.max_stat"))
      .collect()(0)
    assert(r.getLong(1) === 23L, "first alarm on the 3rd post-shift point")
    assert(r.getLong(0) === 8L, "every later point alarms too (no reset)")
    assert(r.getDouble(2) === 15.0) // 10 * 1.5 accumulated drift
    // in-control noise never alarms: alternating +-0.4 stays under k
    val calm = Seq(Tuple1((1 to 30).map(i => if (i % 2 == 0) 0.4 else -0.4))).toDF("zs")
    val c = calm.select(graft.ts.Smooth.cusum(col("zs"), 0.5, 4.0).as("st"))
      .select(col("st.n_alarms")).collect()(0)
    assert(c.getLong(0) === 0L)
  }

  test("1-alpha / 1-beta are exactly the doubles the SQL twin writes") {
    // q145's oracle writes CAST(0.8 AS DOUBLE) / CAST(0.9 AS DOUBLE);
    // Smooth computes 1.0 - alpha in Scala. For the registered
    // coefficients the two are the same double bit pattern — this
    // pins that identity so a coefficient change that breaks it
    // (e.g. alpha = 0.3: 1.0 - 0.3 == 0.7 happens to hold; not every
    // pair does) fails here instead of as an opaque hash mismatch.
    assert(1.0 - 0.2 === 0.8)
    assert(1.0 - 0.1 === 0.9)
  }
}
