package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Golden-value suite for the classical statistics.
  *
  * The DuckDB hash oracles prove Spark and DuckDB COMPUTE THE SAME
  * EXPRESSION — they cannot catch a shared formula error (round 11's
  * Kruskal-Wallis carried a wrong −3(N+1) term hash-green for a full
  * round). Every constant asserted here is derived INDEPENDENTLY from
  * the textbook formula by `tools/golden_stats.py` (pure python — no
  * Spark, no DuckDB, no shared expression tree) over the same tiny
  * fixture each test writes as parquet. A comment on each assertion
  * records the derivation; re-run the script to audit.
  *
  * Also pins the latent branches the sf corpus never exercises:
  * `ab_sprt`'s no-crossing null-decision row and `encoding_advisor`'s
  * NULL-excluded NDV / clamped-savings conventions.
  */
class EdgeBranchSpec extends GoldenFixtures {

  // Hourly count series shared by the count-based tests (python: T1/T2).
  private val T1 = Seq(5, 3, 8, 7, 7, 4, 9, 6, 6, 11)
  private val T2 = Seq(2, 2, 4, 4, 6, 6, 8, 8, 10, 3)

  // ---------------------------------------------------------- ranks

  test("kruskal_wallis pins the textbook small-sample H: {1,2} vs {3,4} -> 2.4") {
    val dir = tmp()
    valueEvents(dir, Map("g1" -> Seq(1.0, 2.0), "g2" -> Seq(3.0, 4.0)))
    // ranks 1,2 | 3,4; H = 12/(4*5) * (2*(1.5-2.5)^2 + 2*(3.5-2.5)^2) = 2.4.
    // The uncentered form needs the -3(N+1) term this value guards:
    // 12/(N(N+1))*sum(S_g^2/n_g) - 3(N+1) = 12/20*(4.5+24.5) - 15 = 2.4.
    val r = one(StatQueries.kruskalWallis(spark, dir))
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("h") == 2.4)
    assert(r.getAs[Double]("h_adj") == 2.4)
  }

  test("kruskal_wallis with a cross-group tie: midranks + tie correction") {
    val dir = tmp()
    valueEvents(dir, Map("g1" -> Seq(1.0, 2.0, 4.0),
      "g2" -> Seq(3.0, 4.0, 6.0), "g3" -> Seq(5.0, 7.0)))
    // golden_stats.py kruskal(KW1): midranks (the 4s share rank 4.5),
    // H = 4.138888..., tie factor 1 - (2^3-2)/(8^3-8) -> h_adj = 4.188755.
    val r = one(StatQueries.kruskalWallis(spark, dir))
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("h") == 4.138889)
    assert(r.getAs[Double]("h_adj") == 4.188755)
  }

  test("events_mannwhitney pins the tie-corrected rank-sum z") {
    val dir = tmp()
    // uids 1,3,5,7,8 hash to arm A; 2,4,6,9,11 to arm B (arithHash seed 13).
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py mann_whitney(AB_A, AB_B): midranks with the tied
    // 14s, U_a = R_a - n_a(n_a+1)/2 = 21.5 - 15 = 6.5,
    // z = (U_a - 12.5)/sigma_tie = -1.257175.
    val r = one(OpsQueries.eventsMannWhitney(spark, dir))
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("u_a") == 6.5)
    assert(r.getAs[Double]("z") == -1.257175)
  }

  test("ab_ttest pins the textbook Welch t on a known hash split") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py welch_t: (18.8-14)/sqrt(10/5 + 42.2/5) = 1.485563.
    val r = one(OpsQueries.abTtest(spark, dir))
    assert(r.getAs[Double]("mean_a") == 14.0)
    assert(r.getAs[Double]("mean_b") == 18.8)
    assert(r.getAs[Double]("t_stat") == 1.485563)
  }

  test("events_spearman matches 1 - 6*sum(d^2)/(n(n^2-1)) when tie-free") {
    val dir = tmp()
    val vals = Seq(3.0, 1.0, 4.0, 10.0, 5.0, 9.0, 2.0, 6.0)
    writeEvents(dir, vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 3 * Day + (i + 1) * Hour, (i + 1).toLong, "s", v)
    })
    // golden_stats.py spearman_noties: rho = 0.380952 (tie-free, so the
    // engine's min-rank convention coincides with textbook midranks).
    val r = one(OpsQueries.eventsSpearman(spark, dir))
    assert(r.getAs[Double]("spearman") == 0.380952)
  }

  test("events_kendall pins tau-b with ties on both series") {
    val dir = tmp()
    val view = Seq(3, 1, 4, 1, 5, 9, 2, 6)
    val click = Seq(2, 7, 1, 8, 2, 8, 1, 8)
    countEvents(dir, 200L, Map("view" -> view, "click" -> click))
    // golden_stats.py kendall_tau_b(KA, KB): nc=13 nd=9, ties 1 and 5
    // pairs -> tau_b = 4/sqrt(27*23) = 0.160514.
    val r = one(StatQueries.eventsKendall(spark, dir))
    assert(r.getAs[Long]("n_conc") == 13L && r.getAs[Long]("n_disc") == 9L)
    assert(r.getAs[Long]("ties_a") == 1L && r.getAs[Long]("ties_b") == 5L)
    assert(r.getAs[Double]("tau_b") == 0.160514)
  }

  // ------------------------------------------------------- k-sample

  test("events_anova pins the textbook one-way F") {
    val dir = tmp()
    valueEvents(dir, Map("a" -> Seq(1.0, 2.0, 3.0, 4.0),
      "b" -> Seq(2.0, 4.0, 6.0, 8.0, 10.0), "c" -> Seq(5.0, 5.0, 6.0, 8.0)))
    // golden_stats.py anova(AOV): SSB = 33.923077, SSW = 51,
    // F = (SSB/2)/(SSW/10) = 3.325792.
    val r = one(StatQueries.eventsAnova(spark, dir))
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 13L)
    assert(r.getAs[Double]("ss_between") == 33.923077)
    assert(r.getAs[Double]("ss_within") == 51.0)
    assert(r.getAs[Double]("f_stat") == 3.325792)
  }

  test("events_bartlett pins M, the C correction, and M/C") {
    val dir = tmp()
    valueEvents(dir, Map("a" -> Seq(1.0, 2.0, 3.0, 4.0),
      "b" -> Seq(2.0, 4.0, 6.0, 8.0, 10.0), "c" -> Seq(5.0, 5.0, 6.0, 8.0)))
    // golden_stats.py bartlett(AOV): s^2 = {5/3, 10, 2}, pooled 5.1,
    // M = 10*ln(5.1) - (3 ln(5/3) + 4 ln10 + 3 ln2) = 3.470147,
    // C = 1 + ((1/3+1/4+1/3) - 1/10)/6 = 1.136111, M/C = 3.054408.
    val r = one(StatQueries.eventsBartlett(spark, dir))
    assert(r.getAs[Double]("pooled_var") == 5.1)
    assert(r.getAs[Double]("m_stat") == 3.470147)
    assert(r.getAs[Double]("c_factor") == 1.136111)
    assert(r.getAs[Double]("bartlett") == 3.054408)
  }

  test("levene_test pins the Brown-Forsythe W over hourly counts") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py levene_bf([T1, T2]): one-way F on |x - median_g|
    // (medians 6.5 and 5.0) = 0.657895.
    val r = one(StatQueries.leveneTest(spark, dir))
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n_total") == 20L)
    assert(r.getAs[Double]("w_stat") == 0.657895)
  }

  test("mood_median pins the grand-median chi-square with median ties dropped") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py mood_median([T1, T2]): grand median 6, the four
    // 6s drop, table [[5,3],[3,5]] -> chi2 = 4*(1^2/4) = 1.0 on 16 cells.
    val r = one(StatQueries.moodMedian(spark, dir))
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n_used") == 16L)
    assert(r.getAs[Double]("chi2") == 1.0)
    assert(r.getAs[Long]("dof") == 1L)
  }

  test("events_friedman pins midrank rank-sums and Q on a 5x3 block grid") {
    val dir = tmp()
    var id = 0L
    val fried = Map("A" -> Seq(1, 2, 3, 4, 5), "B" -> Seq(2, 1, 4, 3, 6),
      "C" -> Seq(2, 3, 1, 5, 4))
    val rows = for {
      (tpe, cs) <- fried.toSeq.sortBy(_._1)
      (c, d) <- cs.zipWithIndex
      j <- 0 until c
    } yield { id += 1; (id, d * Day + Hour + j * 1000L, id, tpe, 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py friedman(FRIED): day-0 tie (A=1, B=C=2) gives
    // midranks 1, 2.5, 2.5; rank sums 9, 10.5, 10.5,
    // Q = 12*sum(R^2)/(5*3*4) - 3*5*4 = 0.3.
    val out = StatQueries.eventsFriedman(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("rank_sum"), r.getAs[Double]("q_stat"))).toMap
    assert(out("A") == (9.0, 0.3))
    assert(out("B") == (10.5, 0.3))
    assert(out("C") == (10.5, 0.3))
  }

  // ------------------------------------------------- series screens

  private def seriesOut(df: DataFrame): Map[String, Row] =
    df.collect().map(r => r.getAs[String]("event_type") -> r).toMap

  test("grubbs_test pins max |x - mean|/s per type") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py grubbs: t1 mean 6.6, outlier 11 @h109, G=1.859339;
    // t2 mean 5.3, outlier 10 @h108, G=1.70862.
    val out = seriesOut(StatQueries.grubbsTest(spark, dir))
    assert(out("t1").getAs[Long]("outlier_h") == 109L)
    assert(out("t1").getAs[Long]("x_out") == 11L)
    assert(out("t1").getAs[Double]("g_stat") == 1.859339)
    assert(out("t2").getAs[Long]("outlier_h") == 108L)
    assert(out("t2").getAs[Long]("x_out") == 10L)
    assert(out("t2").getAs[Double]("g_stat") == 1.70862)
  }

  test("events_jarque_bera pins population skew/kurtosis and JB") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py jarque_bera: population moments m2/m3/m4,
    // t1: skew 0.292715, excess kurtosis -0.510582, JB 0.251426;
    // t2: 0.311963, -1.133485, 0.697529.
    val out = seriesOut(StatQueries.eventsJarqueBera(spark, dir))
    assert(out("t1").getAs[Double]("skewness") == 0.292715)
    assert(out("t1").getAs[Double]("ex_kurtosis") == -0.510582)
    assert(out("t1").getAs[Double]("jb") == 0.251426)
    assert(out("t2").getAs[Double]("skewness") == 0.311963)
    assert(out("t2").getAs[Double]("ex_kurtosis") == -1.133485)
    assert(out("t2").getAs[Double]("jb") == 0.697529)
  }

  test("events_ljungbox pins full-mean ACF r_1 and the lag-6 Q") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py ljung_box: r_k = sum((x_t-xbar)(x_{t-k}-xbar))
    // / sum((x-xbar)^2), Q = n(n+2) sum r_k^2/(n-k).
    // t1: r1 = -0.189683, Q6 = 1.158511; t2: r1 = 0.403965, Q6 = 9.029843.
    val rows = StatQueries.eventsLjungBox(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) -> r)
      .toMap
    assert(rows(("t1", 1L)).getAs[Double]("r") == -0.189683)
    assert(rows(("t1", 6L)).getAs[Double]("q_stat") == 1.158511)
    assert(rows(("t2", 1L)).getAs[Double]("r") == 0.403965)
    assert(rows(("t2", 6L)).getAs[Double]("q_stat") == 9.029843)
  }

  test("events_mannkendall pins S, tie-corrected var, continuity-corrected z") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py mann_kendall: t1 (ties at 7 and 6): S=13,
    // var = (10*9*25 - (2*1*9)*2)/18 = 123, z = 12/sqrt(123) = 1.082004;
    // t2 (ties at 2,4,6,8): S=27, var=121, z = 26/11 = 2.363636.
    val out = seriesOut(StatQueries.eventsMannKendall(spark, dir))
    assert(out("t1").getAs[Long]("s_stat") == 13L)
    assert(out("t1").getAs[Double]("var_s") == 123.0)
    assert(out("t1").getAs[Double]("z") == 1.082004)
    assert(out("t2").getAs[Long]("s_stat") == 27L)
    assert(out("t2").getAs[Double]("var_s") == 121.0)
    assert(out("t2").getAs[Double]("z") == 2.363636)
  }

  test("events_cvm pins the uniformity W2, tie-free and tied") {
    val dir = tmp()
    var id = 0L
    val rows =
      Seq(8640000000L, 17280000000L, 34560000000L, 60480000000L,
        77760000000L).map { m => id += 1; (id, 2 * Day + m, id, "c", 1.0)
      } ++ Seq(21600000000L, 21600000000L, 43200000000L, 64800000000L)
        .map { m => id += 1; (id, 2 * Day + m, id, "d", 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py cvm_uniform: W2 = 1/(12n) + sum(u_(i) - (2i-1)/2n)^2.
    // c (no ties): 0.036667; d (tie at 0.25): 0.083333.
    val out = seriesOut(StatQueries.eventsCvm(spark, dir))
    assert(out("c").getAs[Double]("w2") == 0.036667)
    assert(out("d").getAs[Double]("w2") == 0.083333)
  }

  // ----------------------------------------- proportions and trends

  test("returns_ztest pins the pooled two-proportion z") {
    import spark.implicits._
    val dir = tmp()
    // First shipdate half (days 0..5): 2 R of 6; second (9..14): 4 of 6.
    val rows = (0 to 5).map(d =>
      (d.toLong * Day, if (d < 2) "R" else "N")) ++
      (9 to 14).map(d => (d.toLong * Day, if (d < 13) "R" else "N"))
    rows.toDF("us", "l_returnflag")
      .select(timestamp_micros(col("us")).as("l_shipdate"), col("l_returnflag"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py two_prop_z(6,2,6,4): pooled p=0.5,
    // z = (1/3 - 2/3)/sqrt(0.25*(1/3)) = -1.154701.
    val r = one(StatQueries.returnsZtest(spark, dir))
    assert(r.getAs[Double]("p1") == 0.333333)
    assert(r.getAs[Double]("p2") == 0.666667)
    assert(r.getAs[Double]("z") == -1.154701)
  }

  test("cochran_armitage pins the score-trend z") {
    val dir = tmp()
    var id = 0L
    // scores = hour-of-day 0..3, 10 events each, successes 1/2/4/6.
    val rows = for {
      (x, h) <- Seq(1, 2, 4, 6).zipWithIndex
      j <- 0 until 10
    } yield {
      id += 1
      (id, h * Hour + j * 1000L, id, if (j < x) "purchase" else "view", 1.0)
    }
    writeEvents(dir, rows)
    // golden_stats.py cochran_armitage(CA): z = (n*sr - r*sn)*sqrt(n)
    // / sqrt(r(n-r)(n*s2n - sn^2)) = 2.566495 over n=40, r=13.
    val r = one(StatQueries.cochranArmitage(spark, dir))
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("n_success") == 13L)
    assert(r.getAs[Double]("z") == 2.566495)
  }

  test("events_cmh pins the Mantel-Haenszel pooled odds ratio") {
    val dir = tmp()
    var id = 0L
    // uid 1 hashes exposed, uid 2 unexposed; strata = days 0..2 with
    // 2x2 cells (a,b,c,d) = (3,5,2,6), (2,6,3,5), (4,4,1,7).
    val cells = Seq((3, 5, 2, 6), (2, 6, 3, 5), (4, 4, 1, 7))
    val rows = for {
      ((a, b, c, d), day) <- cells.zipWithIndex
      (n, uid, tpe) <- Seq((a, 1L, "purchase"), (b, 1L, "view"),
        (c, 2L, "purchase"), (d, 2L, "view"))
      j <- 0 until n
    } yield { id += 1; (id, day * Day + id, uid, tpe, 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py cmh(CMH): OR_MH = sum(ad/n)/sum(bc/n) = 1.75,
    // crude OR = (9*18)/(15*6) = 1.8.
    val r = one(StatQueries.eventsCmh(spark, dir))
    assert(r.getAs[Long]("n_strata") == 3L)
    assert(r.getAs[Double]("or_mh") == 1.75)
    assert(r.getAs[Double]("or_crude") == 1.8)
  }

  test("logrank_test pins the two-arm hypergeometric O/E/V and z") {
    val dir = tmp()
    // (uid, first_day, last_day); uids 103/105/107/110 hash to arm B.
    val users = Seq((101L, 0, 2), (102L, 0, 1), (103L, 0, 3), (104L, 1, 3),
      (105L, 0, 9), (106L, 2, 9), (107L, 1, 2), (108L, 3, 5),
      (109L, 0, 0), (110L, 4, 9))
    var id = 0L
    val rows = for {
      (u, f, l) <- users
      d <- Seq(f, l).distinct
    } yield { id += 1; (id, d * Day + 1000L * u, u, "view", 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py logrank(LR_USERS): deaths at k = 0,1,2,3 (the
    // day-9 users censor), O1 = 5, E1 = 3.675397, V = 1.349395,
    // z = 1.140293.
    val r = one(StatQueries.logrankTest(spark, dir))
    assert(r.getAs[Long]("n_death_days") == 4L)
    assert(r.getAs[Long]("o1") == 5L)
    assert(r.getAs[Double]("e1") == 3.675397)
    assert(r.getAs[Double]("v") == 1.349395)
    assert(r.getAs[Double]("z") == 1.140293)
  }

  // --------------------------------------------- agreement readouts

  /** Docs with controlled rater bits: ra = n_chars >= 300,
    * rb = mean word length >= 5.5 (word length 6 passes, 4 fails),
    * rc = word count >= 60. */
  private def writeRaterDocs(dir: String, pats: Seq[(Int, Int, Int)]): Unit = {
    import spark.implicits._
    val rows = pats.zipWithIndex.map { case ((ra, rb, rc), i) =>
      val w = if (rc == 1) 60 else 10
      val l = if (rb == 1) 6 else 4
      val text = (("a" * l + " ") * w).trim
      ((i + 1).toLong, text, "en", "web", if (ra == 1) 400L else 100L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private val RaterPats = Seq((1, 1, 1), (1, 1, 0), (1, 0, 1), (1, 0, 0),
    (0, 1, 1), (0, 1, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1))

  test("fleiss_kappa pins the m-rater kappa on a controlled 0/1 grid") {
    val dir = tmp()
    writeRaterDocs(dir, RaterPats)
    // golden_stats.py fleiss(RATERS): P_bar = 5/9, P_e = (15^2+12^2)/27^2
    // = 0.506173, kappa = 0.1 exactly.
    val r = one(StatQueries.fleissKappa(spark, dir))
    assert(r.getAs[Long]("n_docs") == 9L && r.getAs[Long]("t_pos") == 15L)
    assert(r.getAs[Double]("p_bar") == 0.555556)
    assert(r.getAs[Double]("p_e") == 0.506173)
    assert(r.getAs[Double]("kappa") == 0.1)
  }

  test("gwet_ac1 pins the paradox-resistant chance term") {
    val dir = tmp()
    writeRaterDocs(dir, RaterPats)
    // golden_stats.py gwet_ac1(RATERS): pi = 15/27, Pe = 2*pi*(1-pi)
    // = 0.493827, AC1 = 0.121951 (= 5/41).
    val r = one(StatQueries.gwetAc1(spark, dir))
    assert(r.getAs[Double]("p_a") == 0.555556)
    assert(r.getAs[Double]("p_e_gamma") == 0.493827)
    assert(r.getAs[Double]("ac1") == 0.121951)
  }

  test("annotator_alpha pins Cronbach's alpha population-variance form") {
    val dir = tmp()
    writeRaterDocs(dir, RaterPats)
    // golden_stats.py cronbach(RATERS): sum item var = 0.740741,
    // total-score var = 0.888889, alpha = (3/2)(1 - vs/vt) = 0.25.
    val r = one(StatQueries.annotatorAlpha(spark, dir))
    assert(r.getAs[Double]("var_items") == 0.740741)
    assert(r.getAs[Double]("var_total") == 0.888889)
    assert(r.getAs[Double]("alpha") == 0.25)
  }

  // ------------------------------------------- tranche 3: new operators

  test("kw_dunn pins the tie-corrected pairwise Dunn z, p, and Bonferroni gate") {
    val dir = tmp()
    valueEvents(dir, Map("g1" -> Seq(1.0, 2.0, 4.0),
      "g2" -> Seq(3.0, 4.0, 6.0), "g3" -> Seq(5.0, 7.0)))
    // golden_stats.py tranche3: sigma2 = N(N+1)/12 - tie3/(12(N-1)),
    // z = (rbar_i - rbar_j)/sqrt(sigma2 (1/ni + 1/nj)); m = 3 pairs.
    val out = StatQueries.kwDunn(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
    assert(out.size == 3)
    assert(out(("g1", "g2")).getAs[Double]("z") == -1.173674)
    assert(out(("g1", "g2")).getAs[Double]("p") == 0.243030412)
    assert(!out(("g1", "g2")).getAs[Boolean]("significant"))
    assert(out(("g1", "g3")).getAs[Double]("z") == -2.024548)
    assert(out(("g1", "g3")).getAs[Double]("p") == 0.042566)
    assert(!out(("g1", "g3")).getAs[Boolean]("significant"))
    assert(out(("g2", "g3")).getAs[Double]("z") == -0.974782)
    // Significant branch: two fully separated groups, m = 1.
    val dir2 = tmp()
    valueEvents(dir2, Map("g1" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0),
      "g2" -> Seq(11.0, 12.0, 13.0, 14.0, 15.0)))
    val r2 = one(StatQueries.kwDunn(spark, dir2))
    assert(r2.getAs[Double]("z") == -2.611165)
    assert(r2.getAs[Double]("p") == 0.00901767)
    assert(r2.getAs[Boolean]("significant"))
  }

  test("events_page_hinkley pins the running-mean deviation walk") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2,
      "t3" -> Seq(5, 5, 5, 5)))
    // golden_stats.py tranche3: PH_t = m_t - min m with
    // m_t = sum(x_i - runmean_i): t1 max 10.271032 @h109,
    // t2 17.606349 @h108 (both > lambda = 5); flat t3 stays 0.
    val out = seriesOut(StatQueries.eventsPageHinkley(spark, dir))
    assert(out("t1").getAs[Double]("ph_max") == 10.271032)
    assert(out("t1").getAs[Long]("ph_argmax_h") == 109L)
    assert(out("t1").getAs[Boolean]("alarm"))
    assert(out("t2").getAs[Double]("ph_max") == 17.606349)
    assert(out("t2").getAs[Long]("ph_argmax_h") == 108L)
    assert(out("t3").getAs[Double]("ph_max") == 0.0)
    assert(!out("t3").getAs[Boolean]("alarm"))
  }

  test("events_wilcoxon pins the paired signed-rank z with zeros dropped") {
    val dir = tmp()
    // day 0 hod counts [3,1,4,1,5], day 1 [2,6,4,3,5]: nonzero
    // d = -1, +5, +2 -> W+ = 2 + 3 = 5 over n = 3.
    var id = 0L
    val rows = for {
      (cs, d) <- Seq(Seq(3, 1, 4, 1, 5), Seq(2, 6, 4, 3, 5)).zipWithIndex
      (c, h) <- cs.zipWithIndex
      j <- 0 until c
    } yield { id += 1; (id, d * Day + h * Hour + j * 1000L, id, "e", 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py tranche3: z = (5 - 3)/sqrt(3*4*7/24) = 1.069045.
    val r = one(StatQueries.eventsWilcoxon(spark, dir))
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Double]("w_plus") == 5.0)
    assert(r.getAs[Double]("z") == 1.069045)
  }

  test("corpus_distinct_n pins distinct-1/distinct-2 and the no-bigram branch") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a b a b", "s1"), (2L, "a c", "s1"), (3L, "z", "s2"))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche3: s1 = 6 tokens / 3 types -> 0.5;
    // bigrams {a b, b a, a c} of 4 -> 0.75. s2 has no bigrams.
    val out = OpsQueries.corpusDistinctN(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_tokens") == 6L)
    assert(out("s1").getAs[Double]("distinct_1") == 0.5)
    assert(out("s1").getAs[Long]("n_bigrams") == 4L)
    assert(out("s1").getAs[Double]("distinct_2") == 0.75)
    assert(out("s2").getAs[Double]("distinct_1") == 1.0)
    assert(out("s2").getAs[Long]("n_bigrams") == 0L)
    assert(out("s2").isNullAt(out("s2").fieldIndex("distinct_2")))
  }

  // -------------------------------------------------- tranche 4

  test("events_runs_test pins the Wald-Wolfowitz z around the median") {
    val dir = tmp()
    // Values alternate around median 5: signs B,A,A,B,B,A,B,A,A,B -> 7 runs.
    writeEvents(dir, Seq(1.0, 9.0, 9.0, 1.0, 1.0, 9.0, 1.0, 9.0, 9.0, 1.0)
      .zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, i * Hour, (i + 1).toLong, "r", v)
      })
    // golden_stats.py tranche4: mu = 2*25/10 + 1 = 6,
    // sigma = sqrt(2000/900), z = 1/sigma = 0.67082.
    val r = one(OpsQueries.eventsRunsTest(spark, dir))
    assert(r.getAs[Long]("n_runs") == 7L)
    assert(r.getAs[Long]("n_above") == 5L && r.getAs[Long]("n_below") == 5L)
    assert(r.getAs[Double]("z") == 0.67082)
  }

  test("events_theilsen pins the median pairwise slope") {
    val dir = tmp()
    countEvents(dir, 100L, Map("th" -> Seq(1, 2, 4, 8)))
    // golden_stats.py tranche4: slopes {1, 1.5, 2, 7/3, 3, 4},
    // interpolated median = 2.166667.
    val r = one(OpsQueries.eventsTheilsen(spark, dir))
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("median_slope") == 2.166667)
  }

  test("supplier_hhi pins the Herfindahl index on known shares") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 100.0, 0.5), (2L, 30.0, 0.0), (3L, 20.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0L, "NATION_A")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // Revenue cents 5000/3000/2000 -> shares .5/.3/.2 -> HHI 0.38.
    val r = one(OpsQueries.supplierHhi(spark, dir))
    assert(r.getAs[Long]("n_suppliers") == 3L)
    assert(r.getAs[Double]("revenue") == 100.0)
    assert(r.getAs[Double]("hhi") == 0.38)
    assert(r.getAs[Double]("top_share") == 0.5)
  }

  test("palma_ratio pins the top10/bottom40 shares on cents 100..1000") {
    import spark.implicits._
    val dir = tmp()
    (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche4: bottom40 = 100+..+400 = 1000 cents,
    // top10 = 1000 cents -> palma 1.0, both shares 1000/5500.
    val r = one(OpsQueries.palmaRatio(spark, dir))
    assert(r.getAs[Long]("bottom40_cents") == 1000L)
    assert(r.getAs[Long]("top10_cents") == 1000L)
    assert(r.getAs[Double]("palma") == 1.0)
    assert(r.getAs[Double]("top10_share") == 0.181818)
    assert(r.getAs[Double]("bottom40_share") == 0.181818)
  }

  test("vocab_chao1 pins the bias-corrected richness estimator") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a b c d d e e f f f")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche4: V=6, f1=3, f2=2:
    // chao1 = 6 + 3*2/(2*3) = 7.0; p_unseen = 3/10.
    val r = one(OpsQueries.vocabChao1(spark, dir))
    assert(r.getAs[Long]("v_obs") == 6L)
    assert(r.getAs[Long]("f1") == 3L && r.getAs[Long]("f2") == 2L)
    assert(r.getAs[Double]("chao1") == 7.0)
    assert(r.getAs[Double]("p_unseen") == 0.3)
  }

  test("lm_goodturing pins adjusted counts r* and the unseen mass") {
    import spark.implicits._
    val dir = tmp()
    // Bigram counts: "x y" 3x, "y x" 2x (from one doc), "p q" 1x.
    Seq((1L, "x y x y x y"), (2L, "p q")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche4: r* = (r+1)N_{r+1}/N_r with N1=N2=N3=1:
    // r*(1) = 2, r*(2) = 3, r*(3) null (no N4); p0 = 1/6.
    val rows = OpsQueries.lmGoodTuring(spark, dir).collect()
      .map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows(1L).getAs[Double]("r_star") == 2.0)
    assert(rows(2L).getAs[Double]("r_star") == 3.0)
    assert(rows(3L).isNullAt(rows(3L).fieldIndex("r_star")))
    assert(rows(1L).getAs[Double]("p_unseen") == 0.166667)
  }

  test("spc_pchart pins the 3-sigma binomial limits and the OOC flag") {
    val dir = tmp()
    // Days (n, errors): (20,2) (20,5) (20,1) (50,25); pooled p = 0.3.
    var id = 0L
    val rows = for {
      ((n, x), d) <- Seq((20, 2), (20, 5), (20, 1), (50, 25)).zipWithIndex
      j <- 0 until n
    } yield {
      id += 1
      (id, d * Day + j * 1000L, id, if (j < x) "error" else "view", 1.0)
    }
    writeEvents(dir, rows)
    // golden_stats.py tranche4: day3 (n=50): UCL = 0.494422 < 0.5 ->
    // out of control; days 0-2 (n=20): UCL = 0.607409 -> in control.
    val out = StatQueries.spcPchart(spark, dir).collect()
      .map(r => r.getAs[Long]("day_idx") -> r).toMap
    assert(out(0L).getAs[Double]("p_bar") == 0.3)
    assert(out(0L).getAs[Double]("ucl") == 0.607409)
    assert(!out(0L).getAs[Boolean]("out_of_control"))
    assert(out(3L).getAs[Double]("ucl") == 0.494422)
    assert(out(3L).getAs[Double]("lcl") == 0.105578)
    assert(out(3L).getAs[Boolean]("out_of_control"))
  }

  test("jackknife_days pins the leave-one-day-out SE") {
    val dir = tmp()
    // Days (n_events, sum_value): (2,10) (3,30) (1,5) (2,15).
    var id = 0L
    val rows = for {
      ((n, sv), d) <- Seq((2, 10.0), (3, 30.0), (1, 5.0), (2, 15.0)).zipWithIndex
      j <- 0 until n
    } yield { id += 1; (id, d * Day + j * 1000L, id, "e", sv / n) }
    writeEvents(dir, rows)
    // golden_stats.py tranche4: LOO means {50/6, 6, 55/7, 7.5},
    // SE = sqrt(3/4 * sum((t - tbar)^2)) = 1.511963.
    val r = one(StatQueries.jackknifeDays(spark, dir))
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("mean_value") == 7.5)
    assert(r.getAs[Double]("se_jack") == 1.511963)
  }

  test("shapley_attribution pins exact 4-channel Shapley values") {
    val dir = tmp()
    // Users (channels, converted): u1 {click} yes, u2 {view} no,
    // u3 {click,view} yes, u4 {signup} no.
    var id = 0L
    val rows = Seq(
      (1L, Seq("click", "purchase")), (2L, Seq("view")),
      (3L, Seq("click", "view", "purchase")), (4L, Seq("signup"))
    ).flatMap { case (u, ts) =>
      ts.map { t => id += 1; (id, id * Hour, u, t, 1.0) }
    }
    writeEvents(dir, rows)
    // golden_stats.py tranche4: v(S) = conv rate of users with
    // mask within S; phi = {click: 0.694444, error: 0, signup: -0.138889,
    // view: -0.055556}; efficiency check: sum = v(full) = 0.5.
    val out = StatQueries.shapleyAttribution(spark, dir).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("phi")).toMap
    assert(out("click") == 0.694444)
    assert(out("error") == 0.0)
    assert(out("signup") == -0.138889)
    assert(out("view") == -0.055556)
  }

  // -------------------------------------------------- tranche 5

  test("population_estimate pins the Chapman capture-recapture estimator") {
    val dir = tmp()
    // u1 seen in both epoch halves, u2/u3 first only, u4 second only:
    // n1 = 3, n2 = 2, m = 1 -> Chapman = 4*3/2 - 1 = 5, unseen = 1.
    writeEvents(dir, Seq((1L, 0L, 1L), (2L, 100L * Hour, 1L),
      (3L, 10L * Hour, 2L), (4L, 20L * Hour, 3L), (5L, 90L * Hour, 4L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0) })
    val r = one(StatQueries.populationEstimate(spark, dir))
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("m") == 1L && r.getAs[Long]("observed") == 4L)
    assert(r.getAs[Double]("chapman_estimate") == 5.0)
    assert(r.getAs[Double]("implied_unseen") == 1.0)
  }

  test("price_index pins Laspeyres, Paasche, and Fisher") {
    import spark.implicits._
    val dir = tmp()
    // part 1: 1995 (10.00, q10) -> 1996 (10.00, q5) — unit price x2;
    // part 2: 1995 (20.00, q10) -> 1996 (30.00, q10) — x1.5.
    Seq((1L, 1L, 10.0, 10.0), (2L, 1L, 10.0, 5.0),
      (3L, 2L, 20.0, 10.0), (4L, 2L, 30.0, 10.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "1995-06-01"), (3L, "1995-06-02"), (2L, "1996-06-01"),
      (4L, "1996-06-02")).toDF("o_orderkey", "d")
      .select(col("o_orderkey"), to_timestamp(col("d")).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche5: v00=3000, v11=4000, v10=5000, v01=2500:
    // L = 5/3, P = 1.6, Fisher = sqrt(8/3) = 1.632993.
    val r = one(OpsQueries.priceIndex(spark, dir))
    assert(r.getAs[Long]("n_parts") == 2L)
    assert(r.getAs[Double]("laspeyres") == 1.666667)
    assert(r.getAs[Double]("paasche") == 1.6)
    assert(r.getAs[Double]("fisher") == 1.632993)
  }

  test("corpus_powerlaw pins the CSN continuous MLE alpha") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 50L), (2L, 100L), (3L, 200L), (4L, 400L))
      .toDF("doc_id", "n_chars")
      .withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche5: tail {100,200,400}, xmin=100:
    // alpha = 1 + 3/(ln2 + ln4) = 2.442695.
    val r = one(OpsQueries.corpusPowerlaw(spark, dir))
    assert(r.getAs[Long]("n_used") == 3L)
    assert(r.getAs[Double]("alpha_hat") == 2.442695)
  }

  test("ols_normal recovers exact coefficients on a perfect-fit design") {
    import spark.implicits._
    val dir = tmp()
    // cents = 1000 + 500*qty - 2*disc_bp exactly.
    Seq((1.0, 0.0, 15.0), (2.0, 0.01, 18.0), (3.0, 0.0, 25.0),
      (4.0, 0.02, 26.0))
      .toDF("l_quantity", "l_discount", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = one(StatQueries.olsNormal(spark, dir))
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("b0") == 1000.0)
    assert(r.getAs[Double]("b1") == 500.0)
    assert(r.getAs[Double]("b2") == -2.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("logistic_newton pins 3 Newton steps on a 4-row design") {
    val dir = tmp()
    // (y, x): (0, 0.1) (1, 0.2) (0, 0.3) (1, 0.4); x = value/100.
    writeEvents(dir, Seq((10.0, "view"), (20.0, "purchase"),
      (30.0, "view"), (40.0, "purchase")).zipWithIndex.map {
      case ((v, t), i) => ((i + 1).toLong, i * Hour, (i + 1).toLong, t, v)
    })
    // golden_stats.py tranche5: w = (-2.270444, 9.081774), mean_p = 0.5
    // (logistic mean matches base rate at the MLE direction).
    val r = one(StatQueries.logisticNewton(spark, dir))
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Double]("w0") == -2.270444)
    assert(r.getAs[Double]("w1") == 9.081774)
    assert(r.getAs[Double]("mean_p") == 0.5)
  }

  test("forecast_baseline pins the MASE backtest on a 58-hour series") {
    val dir = tmp()
    val counts = (0 until 24).map(h => h % 24 + 1) ++
      (24 until 46).map(h => h % 24 + 3) ++
      Seq(30, 28, 2, 3, 9, 4, 11, 6, 13, 8, 15, 10)
    countEvents(dir, 0L, Map("e" -> counts))
    // golden_stats.py tranche5: hcut=46, 12 test hours, all lag-24
    // available: mae_naive = 3.083333, mae_profile = 2.916667,
    // MASE = 0.945946 (profile beats naive).
    val r = one(StatQueries.forecastBaseline(spark, dir))
    assert(r.getAs[Long]("n_test") == 12L)
    assert(r.getAs[Double]("mae_naive") == 3.083333)
    assert(r.getAs[Double]("mae_profile") == 2.916667)
    assert(r.getAs[Double]("mase") == 0.945946)
  }

  // -------------------------------------------------- tranche 6

  test("anova_tukey pins the Tukey-Kramer q and its significance gate") {
    val dir = tmp()
    valueEvents(dir, Map("a" -> Seq(1.0, 2.0, 3.0, 4.0),
      "b" -> Seq(2.0, 4.0, 6.0, 8.0, 10.0), "c" -> Seq(5.0, 5.0, 6.0, 8.0)))
    // golden_stats.py tranche6: MSW = 51/10; q(a,b) = -3.5/sqrt(
    // 2.55*(1/4+1/5)) = -3.26732, q(a,c) = -3.099652, q(b,c) = 0.
    val out = StatQueries.anovaTukey(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
    assert(out(("a", "b")).getAs[Double]("mean_diff") == -3.5)
    assert(out(("a", "b")).getAs[Double]("q") == -3.26732)
    assert(!out(("a", "b")).getAs[Boolean]("significant"))
    assert(out(("a", "c")).getAs[Double]("q") == -3.099652)
    assert(out(("b", "c")).getAs[Double]("q") == 0.0)
    // Separated groups trip the 3.858 gate: q = -10/sqrt(1/3).
    val dir2 = tmp()
    valueEvents(dir2, Map("a" -> Seq(1.0, 2.0, 3.0),
      "b" -> Seq(11.0, 12.0, 13.0)))
    val r2 = one(StatQueries.anovaTukey(spark, dir2))
    assert(r2.getAs[Double]("q") == -17.320508)
    assert(r2.getAs[Boolean]("significant"))
  }

  test("ab_cliffs_delta pins the rank-biserial effect size with ties") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py tranche6: U_b = 18.5 (the 14-tie counts half),
    // delta = (37 - 25)/25 = 0.48 (large), CLES = 0.74.
    val r = one(StatQueries.abCliffsDelta(spark, dir))
    assert(r.getAs[Double]("delta") == 0.48)
    assert(r.getAs[Double]("cles") == 0.74)
    assert(r.getAs[String]("magnitude") == "large")
  }

  // -------------------------------------------------- tranche 7

  test("events_durbin_watson pins d on the hourly series") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py tranche7: d = sum(diff^2)/sum((x-mean)^2):
    // t1 = 1.944444 (near-white), t2 = 0.954479 (positive autocorr).
    val out = seriesOut(StatQueries.eventsDurbinWatson(spark, dir))
    assert(out("t1").getAs[Double]("dw") == 1.944444)
    assert(out("t2").getAs[Double]("dw") == 0.954479)
  }

  test("events_hurst pins the R/S slope on a 64-hour series") {
    val dir = tmp()
    val series = (0 until 64).map(h => ((h * 7) % 13) + ((h * 3) % 5) + 1)
    countEvents(dir, 0L, Map("hu" -> series))
    // golden_stats.py tranche7: mean R/S over complete blocks of
    // 8/16/32 hours, ln-ln least-squares slope = 0.546042.
    val r = one(StatQueries.eventsHurst(spark, dir))
    assert(r.getAs[Double]("hurst") == 0.546042)
  }

  test("markov_attribution pins the removal effects of a hand-solved chain") {
    val dir = tmp()
    // One user, two sessions: [view, click, purchase] and [view]
    // (9880 s gap > 30 min). Chain: start->view (p=1),
    // view->{click .5, null .5}, click->conv (p=1) => P(conv) = 0.5;
    // removing either channel zeroes it.
    writeEvents(dir, Seq((1L, 0L, "view"), (2L, 60000000L, "click"),
      (3L, 120000000L, "purchase"), (4L, 10000000000L, "view"))
      .map { case (id, ts, t) => (id, ts, 1L, t, 1.0) })
    val out = StatQueries.markovAttribution(spark, dir).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(out.size == 2)
    for (ch <- Seq("view", "click")) {
      assert(out(ch).getAs[Double]("p_conv_base") == 0.5)
      assert(out(ch).getAs[Double]("p_conv_removed") == 0.0)
      assert(out(ch).getAs[Double]("removal_effect") == 0.5)
      assert(out(ch).getAs[Double]("share") == 0.5)
    }
  }

  // ------------------------------------- tranche 8: eval metrics

  /** Interactions (cust, part, spend, qty); relevant = qty > 25. */
  private def writeEvalFixture(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 100.0, 30.0), (1L, 2L, 100.0, 10.0), (1L, 3L, 150.0, 40.0),
      (1L, 4L, 80.0, 5.0), (2L, 1L, 200.0, 30.0), (2L, 4L, 300.0, 5.0),
      (3L, 5L, 10.0, 30.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("eval_auc pins the midrank Mann-Whitney mean per-user AUC") {
    val dir = tmp()
    writeEvalFixture(dir)
    // golden_stats.py tranche8: cust1 (pos ranks {2.5, 4} of 4) AUC
    // 0.875, cust2 AUC 0, cust3 excluded (no negatives) -> 0.4375.
    val r = one(EvalQueries.evalAuc(spark, dir))
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Double]("mean_auc") == 0.4375)
  }

  test("eval_ranking pins P/R/F1/NDCG/MAP at 5 and 10") {
    val dir = tmp()
    writeEvalFixture(dir)
    // golden_stats.py tranche8 (hand-checkable: cust1 ranks its two
    // relevant parts 1st and 2nd -> NDCG 1, AP 1; cust2 ranks its one
    // relevant part 2nd -> NDCG 1/log2(3), AP 0.5; cust3 trivially 1).
    val out = EvalQueries.evalRanking(spark, dir).collect()
      .map(r => r.getAs[Int]("k") -> r).toMap
    assert(out(5).getAs[Double]("precision_at") == 0.266667)
    assert(out(5).getAs[Double]("recall_at") == 1.0)
    assert(out(5).getAs[Double]("f1_at") == 0.412698)
    assert(out(5).getAs[Double]("ndcg_at") == 0.876977)
    assert(out(5).getAs[Double]("map_at") == 0.833333)
    assert(out(10).getAs[Double]("precision_at") == 0.133333)
    assert(out(10).getAs[Double]("f1_at") == 0.232323)
    assert(out(10).getAs[Double]("ndcg_at") == 0.876977)
    assert(out(10).getAs[Double]("map_at") == 0.833333)
  }

  // ------------------------------------- tranche 9: corpus stats

  test("source_simpson pins the diversity index on known token counts") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a a a b b c", "en", "s1"), (2L, "x x", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche9: s1 counts {3,2,1}: 1 - 8/30 = 0.733333;
    // s2 single type: 0 (no diversity).
    val out = StatQueries.sourceSimpson(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_types") == 3L)
    assert(out("s1").getAs[Double]("simpson") == 0.733333)
    assert(out("s2").getAs[Double]("simpson") == 0.0)
  }

  test("lang_entropy pins Shannon H and KL(lang || corpus)") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a a a b b c", "en", "s1"), (2L, "x x", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche9: en H = 1.011404, KL vs the pooled
    // corpus = 0.287682; de is single-token: H = 0, KL = ln 4.
    val out = OpsQueries.langEntropy(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("en").getAs[Double]("entropy") == 1.011404)
    assert(out("en").getAs[Double]("kl") == 0.287682)
    assert(out("de").getAs[Double]("entropy") == 0.0)
    assert(out("de").getAs[Double]("kl") == 1.386294)
  }

  test("corpus_zipf pins the ln-ln least-squares fit on exact powers") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, ("z " * 8 + "y " * 4 + "x " * 2 + "w").trim, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche9: freqs 8/4/2/1 at ranks 1..4:
    // slope = -1.459022, intercept = 2.198933, r2 = 0.96076.
    val r = one(OpsQueries.corpusZipf(spark, dir))
    assert(r.getAs[Long]("n_types") == 4L)
    assert(r.getAs[Double]("slope") == -1.459022)
    assert(r.getAs[Double]("intercept") == 2.198933)
    assert(r.getAs[Double]("r2") == 0.96076)
  }

  test("croston_forecast pins the intermittent-demand smoother and SBA") {
    import spark.implicits._
    val dir = tmp()
    // One part, demand at weeks 0, 2, 3: sizes 4/6/10, intervals 1/2/1.
    Seq((0L, 4.0), (2L, 6.0), (3L, 10.0)).map { case (wk, q) =>
      (1L, wk * 604800000000L, q)
    }.toDF("l_partkey", "us", "l_quantity")
      .select(col("l_partkey"), timestamp_micros(col("us")).as("l_shipdate"),
        col("l_quantity"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche10: weights (0.49, 0.21, 0.3) sum to 1:
    // z_hat = 6.22, v_hat = 1.21, Croston = 5.140496, SBA = 4.369421.
    val r = one(OpsQueries.crostonForecast(spark, dir))
    assert(r.getAs[Long]("n_points") == 3L)
    assert(r.getAs[Double]("z_hat") == 6.22)
    assert(r.getAs[Double]("v_hat") == 1.21)
    assert(r.getAs[Double]("croston") == 5.140496)
    assert(r.getAs[Double]("sba") == 4.369421)
  }

  test("price_elasticity recovers the exact log-log slope") {
    import spark.implicits._
    val dir = tmp()
    // q = 5 (1-d)^-2 exactly: elasticity -2, intercept ln 5.
    Seq((0.0, 5.0), (0.5, 20.0), (0.2, 7.8125))
      .toDF("l_discount", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = one(OpsQueries.priceElasticity(spark, dir))
    assert(r.getAs[Double]("elasticity") == -2.0)
    assert(r.getAs[Double]("intercept_ln_q") == 1.609438)
  }

  test("price_volume_mix pins the volume/price effect decomposition") {
    import spark.implicits._
    val dir = tmp()
    // One part: first half (q 10 @ unit 100c), second (q 20 @ 150c):
    // volume effect = 10 units * 1.00 = 10.00; price = 20 * 0.50 = 10.00.
    Seq((1L, "1995-01-01"), (2L, "1995-01-21")).toDF("o_orderkey", "d")
      .select(col("o_orderkey"), to_timestamp(col("d")).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 7L, 10.0, 10.0, 0.0), (2L, 7L, 30.0, 20.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity",
        "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = one(OpsQueries.priceVolumeMix(spark, dir))
    assert(r.getAs[Long]("n_parts") == 1L)
    assert(r.getAs[Long]("delta_cents") == 2000L)
    assert(r.getAs[Double]("volume_effect") == 10.0)
    assert(r.getAs[Double]("price_effect") == 10.0)
  }

  // -------------------------------- tranche 12: A/B closers + audits

  test("ab_srm pins the sample-ratio chi-square and trips the flag when skewed") {
    val dir = tmp()
    writeEvents(dir, Seq(1L, 3L, 5L, 7L, 8L, 2L, 4L, 6L, 9L, 11L).zipWithIndex
      .map { case (u, i) => ((i + 1).toLong, i * Hour, u, "view", 1.0) })
    val r = one(StatQueries.abSrm(spark, dir))
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("chi2") == 0.0 && !r.getAs[Boolean]("srm_flag"))
    // 7 A-users vs 1 B-user: chi2 = 36/8 = 4.5 > 3.841459 -> flagged.
    val dir2 = tmp()
    writeEvents(dir2, Seq(1L, 3L, 5L, 7L, 8L, 10L, 12L, 2L).zipWithIndex
      .map { case (u, i) => ((i + 1).toLong, i * Hour, u, "view", 1.0) })
    val r2 = one(StatQueries.abSrm(spark, dir2))
    assert(r2.getAs[Double]("chi2") == 4.5)
    assert(r2.getAs[Double]("z") == 2.12132)
    assert(r2.getAs[Boolean]("srm_flag"))
  }

  test("ab_qte pins the exact lower-median quantile treatment effect") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // Lower medians 14 and 19 -> QTE 5.0.
    val r = one(StatQueries.abQte(spark, dir))
    assert(r.getAs[Double]("median_a") == 14.0)
    assert(r.getAs[Double]("median_b") == 19.0)
    assert(r.getAs[Double]("qte_median") == 5.0)
  }

  test("ab_permutation pins the 64-replicate sign-flip p-value") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py tranche12: the hash flips are replicated exactly
    // in python (integer cross-multiplied compares): 9 of 64
    // replicates reach |d_obs| -> p = 10/65 = 0.153846.
    val r = one(StatQueries.abPermutation(spark, dir))
    assert(r.getAs[Double]("diff_obs") == -4.8)
    assert(r.getAs[Long]("n_ge") == 9L)
    assert(r.getAs[Double]("p_value") == 0.153846)
  }

  test("benford_revenue pins log10(1 + 1/d) expectations and chi2 terms") {
    import spark.implicits._
    val dir = tmp()
    // cents 100, 250, 3000, 111 -> first digits 1, 2, 3, 1.
    Seq(1.0, 2.5, 30.0, 1.11).map(Tuple1(_)).toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = OpsQueries.benfordRevenue(spark, dir).collect()
      .map(r => r.getAs[Long]("digit") -> r).toMap
    assert(out(1L).getAs[Long]("n") == 2L)
    assert(out(1L).getAs[Double]("benford_p") == 0.30103)
    assert(out(1L).getAs[Double]("chi2_term") == 0.526048)
    assert(out(2L).getAs[Double]("benford_p") == 0.176091)
    assert(out(2L).getAs[Double]("chi2_term") == 0.124083)
    assert(out(3L).getAs[Double]("chi2_term") == 0.500736)
  }

  test("hash_collision_audit pins the birthday expectation on 50 keys") {
    import spark.implicits._
    val dir = tmp()
    (1 to 50).map(i => Tuple1(i.toLong)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche12 (hashlib md5 replication): 48 occupied
    // buckets, 2 colliding pairs vs E = 50*49/2048 = 1.196289.
    val r = one(StatQueries.hashCollisionAudit(spark, dir))
    assert(r.getAs[Long]("occupied") == 48L)
    assert(r.getAs[Long]("obs_collisions") == 2L)
    assert(r.getAs[Double]("exp_collisions") == 1.196289)
    assert(r.getAs[Double]("collision_ratio") == 1.671837)
  }

  test("bm25_search pins the Robertson-Sparck-Jones scoring on a tiny corpus") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "vector key dup"), (2L, "vector vector other words here"),
      (3L, "nothing relevant at all stuff")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche13: N=3, avgdl=13/3, df(vector)=2,
    // df(key)=df(dup)=1, k1=1.2, b=0.75: doc1 = 2.781822 (3 hits),
    // doc2 = 0.619452 (1 hit), doc3 unscored (no hits).
    val rows = OpsQueries.bm25Search(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("doc_id") == 1L)
    assert(rows(0).getAs[Double]("score") == 2.781822)
    assert(rows(0).getAs[Long]("n_terms_hit") == 3L)
    assert(rows(1).getAs[Long]("doc_id") == 2L)
    assert(rows(1).getAs[Double]("score") == 0.619452)
  }

  test("dp_counts pins the deterministic inverse-CDF Laplace release") {
    val dir = tmp()
    writeEvents(dir, Seq((1L, 0L, 1L, "view", 1.0), (2L, 1L, 1L, "view", 1.0),
      (3L, 2L, 2L, "click", 1.0)))
    // golden_stats.py tranche13 (hashlib md5 replication of the
    // 'dp:<type>' coin): view noise +7.591866 on n=2, click +0.35837.
    val out = OpsQueries.dpCounts(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("view").getAs[Double]("n_dp") == 9.591866)
    assert(out("click").getAs[Double]("n_dp") == 1.35837)
  }

  test("ql_search pins the Dirichlet-smoothed query likelihood incl. no-hit docs") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "vector key dup"), (2L, "vector vector other words here"),
      (3L, "nothing relevant at all stuff")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche14: mu = 2000, |C| = 13, cf(vector) = 3:
    // unlike BM25 every doc scores — the no-hit doc ranks on pure
    // background mass (-6.603726) below the partial (-6.599402) and
    // full (-6.58561) matches.
    val rows = OpsQueries.qlSearch(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("doc_id") == 1L)
    assert(rows(0).getAs[Double]("score") == -6.58561)
    assert(rows(0).getAs[Long]("n_terms_hit") == 3L)
    assert(rows(1).getAs[Double]("score") == -6.599402)
    assert(rows(2).getAs[Double]("score") == -6.603726)
    assert(rows(2).getAs[Long]("n_terms_hit") == 0L)
  }

  // ------------------------------------------------ latent branches

  test("ab_sprt emits the null-decision row when the LLR never crosses") {
    val dir = tmp()
    // uid 2 hashes to arm B (walked); uid 1 to arm A (filtered out).
    // Alternating conversions keep |LLR| <= 0.0953 << ln(19) = 2.944.
    var id = 0L
    val rows = (0 until 6).map { i =>
      id += 1; (id, i * Hour, 2L, "m", if (i % 2 == 0) 100.0 else 10.0)
    } ++ (0 until 3).map { i => id += 1; (id, i * Hour + 1, 1L, "m", 100.0) }
    writeEvents(dir, rows)
    val r = one(StatQueries.abSprt(spark, dir))
    assert(r.isNullAt(r.fieldIndex("decision_n")))
    assert(r.isNullAt(r.fieldIndex("decision")))
    assert(r.getAs[Long]("n_total") == 6L)
    // final LLR = round(3*ln(1.1) + 3*ln(0.9), 9) = -0.030151008.
    assert(r.getAs[Double]("final_llr") == -0.030151008)
  }

  test("ab_sprt reports the first H1 crossing, not the final state") {
    val dir = tmp()
    // 35 straight conversions: t*ln(1.1) first clears ln(19) at t=31
    // (30 -> 2.859305394 < 2.944438979 <= 31 -> 2.954615574).
    writeEvents(dir, (0 until 35).map { i =>
      ((i + 1).toLong, i * Hour, 2L, "m", 100.0)
    })
    val r = one(StatQueries.abSprt(spark, dir))
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Long]("decision_n") == 31L)
    assert(r.getAs[Double]("llr_at_decision") == 2.954615574)
    assert(r.getAs[Long]("n_total") == 35L)
    assert(r.getAs[Double]("final_llr") == 3.335856293)
  }

  // -------------------------------------------------- tranche 2

  test("drift_ks pins the inclusive two-sample sup-CDF gap") {
    val dir = tmp()
    // early half values 1..5 (hours 0..4), late 3..7 (hours 10..14);
    // the epoch midpoint (7h) splits them 5/5.
    var id = 0L
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex.map { case (v, i) =>
      id += 1; (id, i * Hour, id, "k", v)
    } ++ Seq(3.0, 4.0, 5.0, 6.0, 7.0).zipWithIndex.map { case (v, i) =>
      id += 1; (id, (10 + i) * Hour, id, "k", v)
    }
    writeEvents(dir, rows)
    // golden_stats.py tranche2: sup|F_a - F_b| = 0.4 (at v = 2).
    val r = one(OpsQueries.driftKs(spark, dir))
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("ks") == 0.4)
  }

  test("drift_psi pins the Laplace-smoothed 10-bin PSI") {
    val dir = tmp()
    var id = 0L
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex.map { case (v, i) =>
      id += 1; (id, i * Hour, id, "k", v)
    } ++ Seq(3.0, 4.0, 5.0, 6.0, 7.0).zipWithIndex.map { case (v, i) =>
      id += 1; (id, (10 + i) * Hour, id, "k", v)
    }
    writeEvents(dir, rows)
    // golden_stats.py tranche2: equal-width bins over [1,7], +0.5
    // smoothing -> PSI = 0.439445.
    val r = one(OpsQueries.driftPsi(spark, dir))
    assert(r.getAs[Double]("psi") == 0.439445)
  }

  /** Hourly counts 1x9 then a 6-spike: z = (6-1.5)/1.5 = 3, all other
    * cells z = -1/3; Lin-approximation p = 0.002753176 / 0.751847408. */
  private def writeAnomaly(dir: String): Unit =
    countEvents(dir, 50L, Map("t1" -> Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 6)))

  test("anomaly_fdr keeps exactly the BH step-up rows") {
    val dir = tmp()
    writeAnomaly(dir)
    // golden_stats.py tranche2: only rank 1 clears p <= i*0.1/10
    // (0.002753176 <= 0.01; the flat cells are 0.75 >> 0.02).
    val rows = StatQueries.anomalyFdr(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("event_type") == "t1")
    assert(rows.head.getAs[Long]("hour_us") == 59L * Hour)
    assert(rows.head.getAs[Double]("z") == 3.0)
    assert(rows.head.getAs[Double]("p") == 0.002753176)
    assert(rows.head.getAs[Long]("i") == 1L)
  }

  test("anomaly_holm stops at the first step-down failure") {
    val dir = tmp()
    writeAnomaly(dir)
    // Holm: p_(1)*(m-1+1) = 0.0275 <= 0.1 rejects; p_(2)*9 = 6.77 stops.
    val rows = StatQueries.anomalyHolm(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("hour_us") == 59L * Hour)
    assert(rows.head.getAs[Double]("z") == 3.0)
  }

  test("ab_effect_size pins pooled-SD Cohen's d and Hedges' g") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py tranche2: sp = sqrt((40+168.8)/8), d = 4.8/sp =
    // 0.939552, g = d*(1 - 3/31) = 0.848628.
    val r = one(StatQueries.abEffectSize(spark, dir))
    assert(r.getAs[Double]("mean_diff") == 4.8)
    assert(r.getAs[Double]("cohens_d") == 0.939552)
    assert(r.getAs[Double]("hedges_g") == 0.848628)
  }

  test("ab_power pins the z-sum minimum detectable effect") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py tranche2: se = sqrt(10/5 + 42.2/5),
    // MDE_abs = 2.8015852*se = 9.052199, MDE_rel = MDE/14 = 0.646586.
    val r = one(StatQueries.abPower(spark, dir))
    assert(r.getAs[Double]("mean_a") == 14.0)
    assert(r.getAs[Double]("mde_abs") == 9.052199)
    assert(r.getAs[Double]("mde_rel") == 0.646586)
  }

  /** The logrank lifetime fixture (shared by the survival tests). */
  private def writeLifetimes(dir: String): Unit = {
    val users = Seq((101L, 0, 2), (102L, 0, 1), (103L, 0, 3), (104L, 1, 3),
      (105L, 0, 9), (106L, 2, 9), (107L, 1, 2), (108L, 3, 5),
      (109L, 0, 0), (110L, 4, 9))
    var id = 0L
    val rows = for {
      (u, f, l) <- users
      d <- Seq(f, l).distinct
    } yield { id += 1; (id, d * Day + 1000L * u, u, "view", 1.0) }
    writeEvents(dir, rows)
  }

  test("survival_km pins the product-limit curve on the life table") {
    val dir = tmp()
    writeLifetimes(dir)
    // golden_stats.py tranche2: deaths (1,2,3,1) over at-risk
    // (10,9,7,4) -> S = 0.9, 0.7, 0.4, 0.3.
    val rows = StatQueries.survivalKm(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("survival")).toMap
    assert(rows == Map(0L -> 0.9, 1L -> 0.7, 2L -> 0.4, 3L -> 0.3))
  }

  test("survival_na pins the Nelson-Aalen cumulative hazard") {
    val dir = tmp()
    writeLifetimes(dir)
    // golden_stats.py tranche2: H = 0.1, 0.322222, 0.750794, 1.000794.
    val rows = StatQueries.survivalNa(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("cum_hazard")).toMap
    assert(rows == Map(0L -> 0.1, 1L -> 0.322222, 2L -> 0.750794,
      3L -> 1.000794))
  }

  test("events_dispersion pins the index of dispersion and its chi2 form") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t1" -> T1, "t2" -> T2))
    // golden_stats.py tranche2: t1 var_pop/mean = 5.04/6.6 = 0.763636,
    // chi2 = 9*D = 6.872727; t2 D = 6.81/5.3 = 1.284906, chi2 = 11.564151.
    val out = seriesOut(StatQueries.eventsDispersion(spark, dir))
    assert(out("t1").getAs[Double]("dispersion") == 0.763636)
    assert(out("t1").getAs[Double]("chi2") == 6.872727)
    assert(out("t2").getAs[Double]("dispersion") == 1.284906)
    assert(out("t2").getAs[Double]("chi2") == 11.564151)
  }

  test("events_entropy_rate pins the Markov chain entropy") {
    val dir = tmp()
    // One user, chain A,A,B,A,B,B: from-A counts {AA:1, AB:2},
    // from-B {BA:1, BB:1}.
    writeEvents(dir, Seq("A", "A", "B", "A", "B", "B").zipWithIndex.map {
      case (t, i) => ((i + 1).toLong, i * Hour, 1L, t, 1.0)
    })
    // golden_stats.py tranche2: H = -(1/5)(ln(1/3) + 2 ln(2/3)
    // + 2 ln(1/2)) = 0.659167; ceiling ln 2 = 0.693147. (efficiency
    // sits 4e-10 from a 6dp boundary - not asserted.)
    val r = one(StatQueries.eventsEntropyRate(spark, dir))
    assert(r.getAs[Long]("n_transitions") == 5L)
    assert(r.getAs[Long]("n_states") == 2L)
    assert(r.getAs[Double]("entropy_rate") == 0.659167)
    assert(r.getAs[Double]("max_entropy") == 0.693147)
  }

  test("revenue_gini pins the exact rank-weighted Gini") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche2: x = 100,200,300,400 cents:
    // G = (2*3000 - 5*1000)/(4*1000) = 0.25.
    val r = one(StatQueries.revenueGini(spark, dir))
    assert(r.getAs[Long]("n_customers") == 4L)
    assert(r.getAs[Long]("total_cents") == 1000L)
    assert(r.getAs[Double]("gini") == 0.25)
  }

  test("events_burstiness pins the Goh-Barabasi B over known gaps") {
    val dir = tmp()
    // Gaps 10s, 20s, 30s: mean 2e7, sd_pop = sqrt(2/3)*1e7.
    writeEvents(dir, Seq(0L, 10000000L, 30000000L, 60000000L).zipWithIndex
      .map { case (us, i) => ((i + 1).toLong, us, 1L, "g", 1.0) })
    // golden_stats.py tranche2: B = (sd - mean)/(sd + mean) = -0.420204.
    val r = one(StatQueries.eventsBurstiness(spark, dir))
    assert(r.getAs[Long]("n_gaps") == 3L)
    assert(r.getAs[Double]("mean_gap_us") == 2.0e7)
    assert(r.getAs[Double]("sd_gap_us") == 8164965.809277)
    assert(r.getAs[Double]("burstiness") == -0.420204)
  }

  test("corpus_gtest pins the likelihood-ratio G on a 2x2 grid") {
    import spark.implicits._
    val dir = tmp()
    val rows = Seq.fill(4)(("en", "s1")) ++ Seq(("en", "s2")) ++
      Seq(("de", "s1")) ++ Seq.fill(4)(("de", "s2"))
    rows.zipWithIndex.map { case ((l, s), i) => ((i + 1).toLong, l, s) }
      .toDF("doc_id", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche2: G = 2(8 ln 1.6 + 2 ln 0.4) = 3.854895.
    val r = one(StatQueries.corpusGtest(spark, dir))
    assert(r.getAs[Double]("g_stat") == 3.854895)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n_docs") == 10L)
  }

  test("mcnemar_gates pins the Edwards-corrected discordant chi2 and its null") {
    import spark.implicits._
    val dir = tmp()
    // ga = n_chars >= 250; gb = >= 40 [a-z]+ tokens (w words of "aaaa").
    def doc(i: Int, nc: Long, w: Int) = (i.toLong, ("aaaa " * w).trim, nc)
    val rows = Seq(doc(1, 400L, 50), doc(2, 400L, 50),   // both
      doc(3, 400L, 10), doc(4, 400L, 10), doc(5, 400L, 10), // only_len
      doc(6, 100L, 50),                                   // only_tok
      doc(7, 100L, 10))                                   // neither
    rows.toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche2: chi2 = (|3-1|-1)^2/(3+1) = 0.25.
    val r = one(StatQueries.mcnemarGates(spark, dir))
    assert(r.getAs[Long]("only_len") == 3L && r.getAs[Long]("only_tok") == 1L)
    assert(r.getAs[Double]("chi2") == 0.25)
    // Null branch: gates never disagree -> chi2 IS NULL.
    val dir2 = tmp()
    Seq(doc(1, 400L, 50), doc(2, 100L, 10)).toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r2 = one(StatQueries.mcnemarGates(spark, dir2))
    assert(r2.isNullAt(r2.fieldIndex("chi2")))
  }

  test("cramers_v pins chi-square and V on a 2x2 type-by-dow grid") {
    val dir = tmp()
    var id = 0L
    // day 0 = dow 4, day 1 = dow 5; X: 8/2, Y: 2/8.
    val rows = for {
      (tpe, d, n) <- Seq(("X", 0, 8), ("X", 1, 2), ("Y", 0, 2), ("Y", 1, 8))
      j <- 0 until n
    } yield { id += 1; (id, d * Day + id, id, tpe, 1.0) }
    writeEvents(dir, rows)
    // golden_stats.py tranche2: uniform margins e = 5, chi2 = 4*(9/5)
    // = 7.2, V = sqrt(7.2/20) = 0.6.
    val r = one(StatQueries.cramersV(spark, dir))
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Double]("chi2") == 7.2)
    assert(r.getAs[Double]("v") == 0.6)
  }

  test("ab_cuped pins theta, rho2, and the adjusted means") {
    val dir = tmp()
    // Per-user (pre, post): uid1 A (10,20), uid3 A (20,30),
    // uid2 B (10,25), uid4 B (30,45); midpoint cut splits the periods.
    var id = 0L
    val rows = for {
      (u, x, y) <- Seq((1L, 10.0, 20.0), (3L, 20.0, 30.0),
        (2L, 10.0, 25.0), (4L, 30.0, 45.0))
      (ts, v) <- Seq((id * 2 + 1, x), (10 * Hour + id * 2 + 1, y))
    } yield { id += 1; (id, ts, u, "m", v) }
    writeEvents(dir, rows)
    // golden_stats.py tranche2: theta = 1200/1100 = 1.090909,
    // rho2 = 0.935065; adj_a = 25 + theta*2.5 = 27.727273,
    // adj_b = 35 - theta*2.5 = 32.272727.
    val out = StatQueries.abCuped(spark, dir).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(out("a").getAs[Double]("theta") == 1.090909)
    assert(out("a").getAs[Double]("rho2") == 0.935065)
    assert(out("a").getAs[Double]("mean_post") == 25.0)
    assert(out("a").getAs[Double]("mean_post_adj") == 27.727273)
    assert(out("b").getAs[Double]("mean_post") == 35.0)
    assert(out("b").getAs[Double]("mean_post_adj") == 32.272727)
  }

  test("encoding_advisor excludes NULLs from the dictionary and clamps losses") {
    import spark.implicits._
    val dir = tmp()
    Seq.fill(10)(Tuple1("SEGMENT1")).toDF("c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, null))
      .toDF("doc_id", "lang").withColumn("source", lit("s1"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("R", "N", "N").toDF("l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq("1-URGENT", "2-HIGH").toDF("o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = StatQueries.encodingAdvisor(spark, dir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")) -> r)
      .toMap
    // NULL lang is not a dictionary slot: ndv = 2, raw_bytes skips the
    // null (6), dict loses (4 entries + 4 codes = 8 > 6) -> clamped 0 bp.
    val lang = rows(("documents", "lang"))
    assert(lang.getAs[Long]("n") == 4L)
    assert(lang.getAs[Long]("ndv") == 2L)
    assert(lang.getAs[Long]("raw_bytes") == 6L)
    assert(lang.getAs[Long]("dict_bytes") == 8L)
    assert(lang.getAs[Long]("savings_bp") == 0L)
    // A winning dictionary: 10x "SEGMENT1" = 80 raw vs 8 + 10 codes,
    // savings = 62*10000 div 80 = 7750 bp.
    val seg = rows(("customer", "c_mktsegment"))
    assert(seg.getAs[Long]("ndv") == 1L)
    assert(seg.getAs[Long]("dict_bytes") == 18L)
    assert(seg.getAs[Long]("savings_bp") == 7750L)
  }
}
