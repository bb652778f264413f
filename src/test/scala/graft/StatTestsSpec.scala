package graft

import graft.query.StatTests

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  // independent scalar reference for the t statistics (plain Scala,
  // no Spark) — Welch and pooled Student from raw doubles
  private def refT(x: Seq[Double], y: Seq[Double]): (Double, Double) = {
    def meanVar(v: Seq[Double]): (Double, Double, Int) = {
      val n = v.size
      val m = v.sum / n
      (m, v.map(d => (d - m) * (d - m)).sum / (n - 1), n)
    }
    val (m1, v1, n1) = meanVar(x)
    val (m2, v2, n2) = meanVar(y)
    val sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
    val student = (m1 - m2) / (math.sqrt(sp2) * math.sqrt(1.0 / n1 + 1.0 / n2))
    val welch = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    (student, welch)
  }

  test("tTests match an independent scalar computation within 1 micro-unit") {
    val x = Seq(1.2, 2.5, 3.1, 4.7, 2.2, 3.3)
    val y = Seq(2.0, 4.1, 6.9, 5.5, 7.2)
    val df = (x.map(("a", _)) ++ y.map(("b", _))).toDF("g", "v")
    val row = StatTests.tTests(df, "g", "v").collect().head
    // the operator floors v to milli-units first — replay that in the ref
    val xq = x.map(d => math.floor(d * 1000) / 1000)
    val yq = y.map(d => math.floor(d * 1000) / 1000)
    val (st, wt) = refT(xq, yq)
    assert(math.abs(row.getAs[Long]("student_t_e6") - math.floor(st * 1e6)) <= 1)
    assert(math.abs(row.getAs[Long]("welch_t_e6") - math.floor(wt * 1e6)) <= 1)
  }

  test("mannWhitneyU equals the brute-force pairwise count (with ties)") {
    val rnd = new scala.util.Random(11)
    val x = Seq.fill(40)(rnd.nextInt(12).toDouble)
    val y = Seq.fill(55)(rnd.nextInt(12).toDouble)
    val df = (x.map(("a", _)) ++ y.map(("b", _))).toDF("g", "v")
    val row = StatTests.mannWhitneyU(df, "g", "v").collect().head
    // 2·U1 = 2·#{(i,j): x_i > y_j} + #ties — the tie-aware definition
    val u2 = 2L * x.map(a => y.count(a > _)).sum +
      x.map(a => y.count(a == _)).sum
    assert(row.getAs[Long]("u1_x2") === u2)
    assert(row.getAs[Long]("n1") === 40L && row.getAs[Long]("n2") === 55L)
  }

  test("ksTest equals the brute-force ECDF sup-distance") {
    val rnd = new scala.util.Random(7)
    val x = Seq.fill(60)(rnd.nextInt(20).toDouble)
    val y = Seq.fill(45)(rnd.nextInt(20).toDouble)
    val df = (x.map(("a", _)) ++ y.map(("b", _))).toDF("g", "v")
    val row = StatTests.ksTest(df, "g", "v").collect().head
    val values = (x ++ y).distinct.sorted
    val num = values.map { v =>
      math.abs(x.count(_ <= v).toLong * y.size - y.count(_ <= v).toLong * x.size)
    }.max
    assert(row.getAs[Long]("ks_num") === num)
  }

  test("momentStats matches an independent scalar skew/kurt computation") {
    val rnd = new scala.util.Random(3)
    val x = Seq.fill(500)((rnd.nextGaussian() * 40 + 100).floor.max(0))
    val df = x.map(("g", _)).toDF("g", "v")
    val row = StatTests.momentStats(df, "g", "v").collect().head
    val q = x.map(math.floor) // the operator floors to whole units
    val n = q.size.toDouble
    val mu = q.sum / n
    def cm(k: Int) = q.map(v => math.pow(v - mu, k)).sum / n
    val skew = cm(3) / math.pow(cm(2), 1.5)
    val kurt = cm(4) / (cm(2) * cm(2)) - 3.0
    // central-moment reference vs raw-moment operator: tiny fp drift
    assert(math.abs(row.getAs[Long]("skew_e6") - math.floor(skew * 1e6)) <= 2)
    assert(math.abs(row.getAs[Long]("kurt_e6") - math.floor(kurt * 1e6)) <= 2)
  }

  test("cramersV on a hand-computed 2x2 table; zero cells carry mass") {
    // table: a1/b1=30 a1/b2=10, a2/b1=10 a2/b2=30 → chi2 = 80·(20²)/ (40·40·40/80)...
    // hand: n=80, e=20 everywhere, chi2 = 4·(10²/20) = 20, V = sqrt(20/80/1) = 0.5
    val rows = Seq.fill(30)(("a1", 1)) ++ Seq.fill(10)(("a1", 2)) ++
      Seq.fill(10)(("a2", 1)) ++ Seq.fill(30)(("a2", 2))
    val df = rows.toDF("a", "b")
    val row = StatTests.cramersV(df, "a", "b").collect().head
    assert(row.getAs[Long]("n") === 80L)
    assert(row.getAs[Long]("chi2_e6") === 20000000L)
    assert(row.getAs[Long]("cramers_v_e6") === 500000L)
    // absent cell: drop a2/b2 entirely → grid still carries its expected mass
    val df2 = rows.filterNot(r => r._1 == "a2" && r._2 == 2).toDF("a", "b")
    val r2 = StatTests.cramersV(df2, "a", "b").collect().head
    assert(r2.getAs[Long]("n") === 50L)
    assert(r2.getAs[Long]("chi2_e6") > 0L)
  }
}
