package graft.queries

import org.apache.spark.sql.functions._

import graft.stats.StatTests

/** SURVEY §2.10 statistical kernel (X2-X9) as oracle-backed queries.
  *
  * Oracle policy (VERDICT r1 #3): the aggregate/arithmetic parts —
  * means, sems, CIs (via the mirrored Cornish-Fisher quantile), t/F/χ²
  * statistics, Welch dfs, effect sizes, residuals — are DuckDB-checked.
  * p-values need iterative special functions; where their output is
  * discriminating (x16's 25 per-district values span (0, 0.7)) the
  * oracle replays the incomplete-beta continued fraction as a recursive
  * CTE ([[tPvalueCfSql]]) — where a single-row p truncates to 0.0
  * anyway (x3/x5/x7: |t|, F, χ² are huge on 10k rows), the engine
  * computes it ([[graft.stats.Distributions]]), the query drops the
  * column from the oracled output, and StatTestsSpec pins it against
  * mpmath-derived fixture constants instead.
  */
object StatsQueries extends Q.Registry {
  import RelationalQueries.{clean, enrSql}

  /** SQL expression for q_{0.05}(k, `dfw`): a CASE over the SAME
    * exact-integration grid [[graft.stats.Distributions.tukeyQ05Grid]]
    * that the Spark side interpolates, with the slope prefolded in
    * Scala and every constant emitted as CAST(… AS DOUBLE) so DuckDB
    * can't run any step in exact DECIMAL arithmetic — the interpolated
    * q_crit is bit-identical across engines, keeping x6's boolean
    * `reject` hash-stable however close a q statistic sits to the
    * threshold. No ELSE: below the grid floor (dfw < 5) the CASE
    * yields NULL — on that input the Spark side throws its
    * dfWithin >= 5 require first, so the oracle never gets compared;
    * NULL is the honest "no defined value" for a standalone reader of
    * the SQL. */
  private def tukeyQcritSql(k: Int, dfw: String): String = {
    def dl(v: Double) = s"CAST($v AS DOUBLE)"
    val whens = graft.stats.Distributions.tukeySegments(k).map {
      case ((dfU, qU), (dfL, qL)) =>
        val xU = if (dfU.isInfinity) 0.0 else 1.0 / dfU
        val slope = (qL - qU) / (1.0 / dfL - xU)
        s"WHEN $dfw >= ${dl(dfL)} THEN ${dl(qU)} + ${dl(slope)} * (1.0 / $dfw - ${dl(xU)})"
    }
    s"(CASE ${whens.mkString(" ")} END)"
  }

  /** Two-sided t p-value in PURE SQL: replays the same Lentz continued
    * fraction for the regularized incomplete beta that
    * [[graft.stats.Distributions.regBeta]] runs, as a DuckDB recursive
    * CTE over a `tst(district, n, t_stat, df)` input. Every iteration
    * is plain IEEE double arithmetic in the Scala loop's exact
    * operation order (two half-steps per level, fpmin clamps, freeze
    * once |del−1| ≤ 1e-16 — the loop's stop condition becomes a
    * carried `done` flag so converged rows stop updating while the
    * recursion pads to the Scala loop's m < 500 cap). Only `front` (exp/ln/
    * lgamma — DuckDB's libm vs the JVM's, ~1e-13 rel) differs, far
    * inside the 1e-6 output truncation. Reads `tst(<key>, t_stat, df)`
    * and produces `pv(<key>, p)` — `key` names the row-identity column
    * (x16 keys per district, x17 per model|term coefficient).
    * Prototype validation: 6 (t, df) shapes vs the Scala math at rel
    * ≤ 2.3e-13. */
  private[queries] def tPvalueCfSql(key: String): String =
    s"""args AS (
      |  SELECT $key, df/(df + t_stat*t_stat) AS x0, df/2.0 AS a0,
      |         CAST(0.5 AS DOUBLE) AS b0
      |  FROM tst),
      |sel AS (
      |  SELECT $key, x0, a0, b0,
      |         x0 < (a0 + 1.0)/(a0 + b0 + 2.0) AS direct,
      |         CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN x0 ELSE 1.0 - x0 END AS x,
      |         CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN a0 ELSE b0 END AS a,
      |         CASE WHEN x0 < (a0 + 1.0)/(a0 + b0 + 2.0) THEN b0 ELSE a0 END AS b
      |  FROM args WHERE x0 > 0.0 AND x0 < 1.0),
      |cf AS (
      |  SELECT $key, x, a, b, 1 AS m, CAST(1.0 AS DOUBLE) AS c,
      |         1.0 / (CASE WHEN abs(1.0 - (a+b)*x/(a+1.0)) < 1e-300 THEN 1e-300
      |                     ELSE 1.0 - (a+b)*x/(a+1.0) END) AS d,
      |         1.0 / (CASE WHEN abs(1.0 - (a+b)*x/(a+1.0)) < 1e-300 THEN 1e-300
      |                     ELSE 1.0 - (a+b)*x/(a+1.0) END) AS h,
      |         FALSE AS done
      |  FROM sel
      |  UNION ALL
      |  SELECT $key, x, a, b, m + 1,
      |         CASE WHEN done THEN c ELSE cB END,
      |         CASE WHEN done THEN d ELSE dBi END,
      |         CASE WHEN done THEN h ELSE hB END,
      |         done OR abs(delB - 1.0) <= 1e-16
      |  FROM (
      |    SELECT *,
      |      m*(b-m)*x/((a-1.0+2*m)*(a+2*m)) AS aa1,
      |      CASE WHEN abs(1.0 + aa1*d) < 1e-300 THEN 1e-300 ELSE 1.0 + aa1*d END AS dA0,
      |      CASE WHEN abs(1.0 + aa1/c) < 1e-300 THEN 1e-300 ELSE 1.0 + aa1/c END AS cA,
      |      1.0/dA0 AS dAi,
      |      h * (dAi*cA) AS hA,
      |      -(a+m)*(a+b+m)*x/((a+2*m)*(a+1.0+2*m)) AS aa2,
      |      CASE WHEN abs(1.0 + aa2*dAi) < 1e-300 THEN 1e-300 ELSE 1.0 + aa2*dAi END AS dB0,
      |      CASE WHEN abs(1.0 + aa2/cA) < 1e-300 THEN 1e-300 ELSE 1.0 + aa2/cA END AS cB,
      |      1.0/dB0 AS dBi,
      |      dBi*cB AS delB,
      |      hA * delB AS hB
      |    FROM cf WHERE m < 500)),
      |cffinal AS (SELECT $key, h FROM cf WHERE m = 500),
      |pv AS (
      |  SELECT t.$key,
      |         COALESCE(
      |           CASE WHEN s.direct
      |                THEN exp(s.a0*ln(s.x0) + s.b0*ln(1.0 - s.x0)
      |                         - (lgamma(s.a0) + lgamma(s.b0) - lgamma(s.a0 + s.b0)))
      |                     * f.h / s.a0
      |                ELSE 1.0 - exp(s.a0*ln(s.x0) + s.b0*ln(1.0 - s.x0)
      |                               - (lgamma(s.a0) + lgamma(s.b0) - lgamma(s.a0 + s.b0)))
      |                           * f.h / s.b0 END,
      |           CASE WHEN t.df/(t.df + t.t_stat*t.t_stat) >= 1.0 THEN 1.0
      |                WHEN t.df/(t.df + t.t_stat*t.t_stat) <= 0.0 THEN 0.0 END) AS p
      |  FROM tst t
      |  LEFT JOIN sel s ON t.$key = s.$key
      |  LEFT JOIN cffinal f ON t.$key = f.$key)
      |""".stripMargin

  val all: Seq[Q] = Seq(

    Q("x2_t_ci",
      "Per-district 95% t-CI on filling_rate + KPI 0.30 classification " +
        "(X2, 01:408-430). CI uses the Cornish-Fisher t-quantile " +
        "expansion (mirrored in SQL; exact tInv is unit-tested).",
      (s, d) =>
        StatTests.tCIByGroup(clean(s, d), "filling_rate", "district")
          .select(
            col("district"), col("n"),
            Fmt.trunc(col("mean"), 6).as("mean_rate"),
            Fmt.trunc(col("sem"), 6).as("sem"),
            Fmt.trunc(col("ci_lower"), 6).as("ci_lower"),
            Fmt.trunc(col("ci_upper"), 6).as("ci_upper"),
            col("status"))
          .orderBy("district"),
      Some(enrSql +
        s"""SELECT district, n,
           |       floor((mean) * 1e6 + 1e-6) / 1e6 AS mean_rate,
           |       floor((sem) * 1e6 + 1e-6) / 1e6 AS sem,
           |       floor((mean - t_crit * sem) * 1e6 + 1e-6) / 1e6 AS ci_lower,
           |       floor((mean + t_crit * sem) * 1e6 + 1e-6) / 1e6 AS ci_upper,
           |       CASE WHEN mean - t_crit * sem > 0.3 THEN 'Pass (Green)'
           |            WHEN mean + t_crit * sem < 0.3 THEN 'Fail (Red)'
           |            ELSE 'Warning (Orange)' END AS status
           |FROM (
           |  SELECT *, ${StatTests.tQuantile975Sql("n - 1.0")} AS t_crit
           |  FROM (
           |    SELECT district, count(*) AS n, avg(filling_rate) AS mean,
           |           stddev_samp(filling_rate) / sqrt(count(*)) AS sem
           |    FROM clean GROUP BY district))
           |ORDER BY district""".stripMargin)),

    Q("x3_welch_cohen",
      "Welch two-sample t (equal_var=False) + Cohen's d between peak " +
        "and off-peak weekday rates (X3+X4+F4, 01:563-581). p-value is " +
        "engine-side (StatTests.welchCohen) and pinned in StatTestsSpec.",
      (s, d) =>
        StatTests.welchCohen(clean(s, d), "filling_rate", col("is_peak"))
          .select(
            col("n_a").cast("long").as("n_peak"),
            col("n_b").cast("long").as("n_offpeak"),
            Fmt.trunc(col("mean_a"), 6).as("mean_peak"),
            Fmt.trunc(col("mean_b"), 6).as("mean_offpeak"),
            Fmt.trunc(col("t_stat"), 6).as("t_stat"),
            Fmt.trunc(col("df_welch"), 4).as("df_welch"),
            Fmt.trunc(col("cohens_d"), 6).as("cohens_d")),
      Some(enrSql +
        """SELECT CAST(n_a AS BIGINT) AS n_peak, CAST(n_b AS BIGINT) AS n_offpeak,
          |       floor((mean_a) * 1e6 + 1e-6) / 1e6 AS mean_peak,
          |       floor((mean_b) * 1e6 + 1e-6) / 1e6 AS mean_offpeak,
          |       floor(((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)) * 1e6 + 1e-6) / 1e6 AS t_stat,
          |       floor(((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
          |              ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
          |               (var_b / n_b) * (var_b / n_b) / (n_b - 1))) * 1e4 + 1e-6) / 1e4 AS df_welch,
          |       floor(((mean_a - mean_b) /
          |              sqrt(((n_a - 1) * var_a + (n_b - 1) * var_b) / (n_a + n_b - 2))) * 1e6 + 1e-6) / 1e6 AS cohens_d
          |FROM (
          |  SELECT CAST(count(CASE WHEN is_peak THEN 1 END) AS DOUBLE) AS n_a,
          |         CAST(count(CASE WHEN NOT is_peak THEN 1 END) AS DOUBLE) AS n_b,
          |         avg(CASE WHEN is_peak THEN filling_rate END) AS mean_a,
          |         avg(CASE WHEN NOT is_peak THEN filling_rate END) AS mean_b,
          |         var_samp(CASE WHEN is_peak THEN filling_rate END) AS var_a,
          |         var_samp(CASE WHEN NOT is_peak THEN filling_rate END) AS var_b
          |  FROM clean)""".stripMargin)),

    Q("x5_anova_eta",
      "One-way ANOVA of filling_rate across districts: SSB/SSW/F/η² " +
        "(X5, 01:842-845). p-value engine-side, pinned in StatTestsSpec.",
      (s, d) =>
        StatTests.anova(clean(s, d), "filling_rate", "district")
          .select(
            col("k").cast("long").as("k_groups"),
            col("n_total").cast("long").as("n_total"),
            Fmt.trunc(col("ss_between"), 4).as("ss_between"),
            Fmt.trunc(col("ss_within"), 4).as("ss_within"),
            Fmt.trunc(col("f_stat"), 6).as("f_stat"),
            Fmt.trunc(col("eta_sq"), 6).as("eta_sq")),
      Some(enrSql +
        """, ganova AS (
          |  SELECT district, CAST(count(*) AS DOUBLE) AS n,
          |         avg(filling_rate) AS mean, var_samp(filling_rate) AS variance
          |  FROM clean GROUP BY district)
          |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n_total AS BIGINT) AS n_total,
          |       floor((ss_between) * 1e4 + 1e-6) / 1e4 AS ss_between,
          |       floor((ss_within) * 1e4 + 1e-6) / 1e4 AS ss_within,
          |       floor(((ss_between / (k - 1)) / (ss_within / (n_total - k))) * 1e6 + 1e-6) / 1e6 AS f_stat,
          |       floor((ss_between / (ss_between + ss_within)) * 1e6 + 1e-6) / 1e6 AS eta_sq
          |FROM (
          |  SELECT count(*) AS k, sum(n) AS n_total,
          |         sum(n * (mean - gm) * (mean - gm)) AS ss_between,
          |         sum(variance * (n - 1)) AS ss_within
          |  FROM ganova
          |  CROSS JOIN (SELECT sum(mean * n) / sum(n) AS gm FROM ganova))""".stripMargin)),

    Q("x6_tukey",
      "Tukey-Kramer HSD pairwise tests on the 3-district slice (X6+F5, " +
        "01:851-853): q statistic vs the df-aware critical value " +
        "q_crit(3, df_within), interpolated over a grid computed by " +
        "EXACT Gauss-Legendre integration of the studentized-range CDF " +
        "(Distributions) and mirrored bit-identically into the SQL CASE.",
      (s, d) =>
        StatTests.tukeyHSD(
          clean(s, d).filter(col("district").isin("NATION_1", "NATION_2", "NATION_3")),
          "filling_rate", "district")
          .select(
            col("group_a"), col("group_b"),
            Fmt.trunc(col("mean_diff"), 6).as("mean_diff"),
            Fmt.trunc(col("se_pair"), 6).as("se_pair"),
            Fmt.trunc(col("q_stat"), 6).as("q_stat"),
            col("reject"))
          .orderBy("group_a", "group_b"),
      Some(enrSql +
        """, gtukey AS (
          |  SELECT district, CAST(count(*) AS DOUBLE) AS n, avg(filling_rate) AS mean,
          |         var_samp(filling_rate) AS variance
          |  FROM clean WHERE district IN ('NATION_1','NATION_2','NATION_3')
          |  GROUP BY district)
          |SELECT a.district AS group_a, b.district AS group_b,
          |       floor((b.mean - a.mean) * 1e6 + 1e-6) / 1e6 AS mean_diff,
          |       floor((sqrt(s.msw / 2.0 * (1.0 / a.n + 1.0 / b.n))) * 1e6 + 1e-6) / 1e6 AS se_pair,
          |       floor((abs(b.mean - a.mean) / sqrt(s.msw / 2.0 * (1.0 / a.n + 1.0 / b.n))) * 1e6 + 1e-6) / 1e6 AS q_stat,
          |       abs(b.mean - a.mean) / sqrt(s.msw / 2.0 * (1.0 / a.n + 1.0 / b.n))
          |         > """.stripMargin + tukeyQcritSql(3, "s.dfw") + " AS reject" +
        """
          |FROM gtukey a
          |JOIN gtukey b ON a.district < b.district
          |CROSS JOIN (
          |  SELECT sum(variance * (n - 1)) / (sum(n) - count(*)) AS msw,
          |         sum(n) - count(*) AS dfw FROM gtukey) s
          |ORDER BY group_a, group_b""".stripMargin)),

    Q("x16_per_group_ttest",
      "Per-district one-sample t-test vs the 0.30 KPI with DISTRIBUTED " +
        "exact p-values via the native codegen'd t_pvalue expression " +
        "(functions.NativeExpressions) — the custom-Expression scale " +
        "path for million-group testing. Fully oracled: the DuckDB SQL " +
        "replays the regularized-incomplete-beta continued fraction as " +
        "a recursive CTE (see tPvalueCfSql).",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        StatTests.tCIByGroup(clean(s, d), "filling_rate", "district")
          .withColumn("t_stat", (col("mean") - 0.3) / col("sem"))
          .selectExpr(
            "district", "n",
            "floor(t_stat * 1e6 + 1e-6) / 1e6 AS t_stat",
            "floor(t_pvalue(t_stat, n - 1.0) * 1e6 + 1e-6) / 1e6 AS p_value")
          .orderBy("district")
      },
      Some(enrSql.replaceFirst("^WITH ", "WITH RECURSIVE ") +
        """, gstats AS (
          |  SELECT district, count(*) AS n, avg(filling_rate) AS mean,
          |         stddev_samp(filling_rate) / sqrt(count(*)) AS sem
          |  FROM clean GROUP BY district),
          |tst AS (
          |  SELECT district, n, (mean - 0.3) / sem AS t_stat,
          |         CAST(n AS DOUBLE) - 1.0 AS df
          |  FROM gstats),
          |""".stripMargin + tPvalueCfSql("district") +
        """SELECT t.district, t.n,
          |       floor(t.t_stat * 1e6 + 1e-6) / 1e6 AS t_stat,
          |       floor(pv.p * 1e6 + 1e-6) / 1e6 AS p_value
          |FROM tst t JOIN pv ON t.district = pv.district
          |ORDER BY t.district""".stripMargin)),

    Q("x18_mannwhitney",
      "Mann-Whitney U / Wilcoxon rank-sum per district (X18 — the " +
        "NONPARAMETRIC companion to x3's Welch t, the scipy.stats." +
        "mannwhitneyu member of the reference's stack): peak vs " +
        "off-peak bikes_available. Midranks come from the DISTINCT-" +
        "VALUE histogram (state bounded by the value universe, not " +
        "the row count — the MedianHistogram move), ties get the " +
        "standard corrected normal approximation, and the two-sided " +
        "p is the A&S 7.1.26 closed form — branch-free straight-line " +
        "arithmetic, so the ORACLE replays the IDENTICAL Horner " +
        "chain instead of an iterative special function. Integer " +
        "values make every midrank a half-integer, so the rank-sum " +
        "aggregation is order-independent EXACT double math: u and z " +
        "hash-match bit-for-bit; p differs only by exp()'s last ulp, " +
        "absorbed by trunc-6.",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .filter(col("filling_rate").between(0.0, 1.0) &&
            col("district").isNotNull)
        StatTests.mannWhitney(base, "bikes_available", col("is_peak"),
            "district")
          .select(col("district"), col("n1"), col("n2"),
            Fmt.t6(col("u1")).as("u1"), Fmt.t6(col("u2")).as("u2"),
            Fmt.t6(col("z")).as("z"),
            Fmt.t6(col("p_value")).as("p_value"))
          .orderBy("district")
      },
      Some(enrSql +
        s""", src AS (
           |  SELECT district, bikes_available AS v, is_peak AS flag
           |  FROM enr
           |  WHERE filling_rate BETWEEN 0 AND 1 AND district IS NOT NULL),
           |${StatTests.mannWhitneySql("district")}
           |SELECT district, n1, n2,
           |  ${Fmt.sql6("u1")} AS u1, ${Fmt.sql6("u2")} AS u2,
           |  ${Fmt.sql6("z")} AS z,
           |  ${Fmt.sql6(StatTests.normalSfTwoSidedSql("z"))} AS p_value
           |FROM mwz ORDER BY district""".stripMargin)),

    Q("x19_kruskal_wallis",
      "Kruskal-Wallis H per district (X19 — the k-group extension of " +
        "x18, scipy.stats.kruskal): does the bikes_available " +
        "distribution differ across the four day segments " +
        "(night/morning/afternoon/evening)? Pooled midranks from the " +
        "same distinct-value histogram as x18, per-segment rank sums, " +
        "tie-corrected H. Rank sums are exact half-integer " +
        "arithmetic; the sum of R_j^2/n_j terms carries the usual " +
        "last-ulp aggregation-order wobble, absorbed by trunc-6. The " +
        "chi2 p-value runs engine-side (PValues.chi2, spec-pinned " +
        "against the dof=2 closed form exp(-H/2)) and stays out of " +
        "the oracled columns — the x7 precedent for iterative " +
        "special functions.",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .filter(col("filling_rate").between(0.0, 1.0) &&
            col("district").isNotNull)
          .withColumn("segment",
            when(col("hour") < 6, "night")
              .when(col("hour") < 12, "morning")
              .when(col("hour") < 18, "afternoon")
              .otherwise("evening"))
        StatTests.kruskalWallis(base, "bikes_available", "segment",
            "district")
          .select(col("district"), col("n"), col("k"), col("dof"),
            Fmt.t6(col("h")).as("h"))
          .orderBy("district")
      },
      Some(enrSql +
        s""", src AS (
           |  SELECT district, bikes_available AS v,
           |    CASE WHEN hour < 6 THEN 'night' WHEN hour < 12 THEN 'morning'
           |         WHEN hour < 18 THEN 'afternoon' ELSE 'evening' END AS grp
           |  FROM enr
           |  WHERE filling_rate BETWEEN 0 AND 1 AND district IS NOT NULL),
           |${StatTests.kruskalWallisSql("district")}
           |SELECT district, n, k, dof, ${Fmt.sql6("h")} AS h
           |FROM kws ORDER BY district""".stripMargin)),

    Q("x20_mannwhitney_quantized",
      "Mann-Whitney on a CONTINUOUS column via quantization — the " +
        "x18 operator's documented scale contract exercised as a " +
        "registered query: filling_rate (a ratio, distinct values ~ " +
        "row count) would degrade the midrank histogram into a " +
        "full sort at 100 TB, so it is quantized to a fixed 1e-3 grid " +
        "FIRST (floor(v·1000)/1000 — identical IEEE ops on both " +
        "engines, unlike round()'s engine-specific half-up-on-binary " +
        "edge cases) and the histogram state is bounded by the ≤1001-" +
        "value universe from then on. Binning only introduces ties, " +
        "which the midrank + tie-correction machinery prices by " +
        "construction — the test stays a valid rank test on the " +
        "coarsened data (Mann-Whitney with ties), it does not " +
        "approximate the unquantized statistic. Peak vs off-peak per " +
        "district, same A&S p arithmetic as x18.",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .filter(col("filling_rate").between(0.0, 1.0) &&
            col("district").isNotNull)
          .withColumn("vq", floor(col("filling_rate") * 1000.0) / 1000.0)
        StatTests.mannWhitney(base, "vq", col("is_peak"), "district")
          .select(col("district"), col("n1"), col("n2"),
            Fmt.t6(col("u1")).as("u1"), Fmt.t6(col("u2")).as("u2"),
            Fmt.t6(col("z")).as("z"),
            Fmt.t6(col("p_value")).as("p_value"))
          .orderBy("district")
      },
      Some(enrSql +
        s""", src AS (
           |  SELECT district, floor(filling_rate * 1000) / 1000 AS v,
           |         is_peak AS flag
           |  FROM enr
           |  WHERE filling_rate BETWEEN 0 AND 1 AND district IS NOT NULL),
           |${StatTests.mannWhitneySql("district")}
           |SELECT district, n1, n2,
           |  ${Fmt.sql6("u1")} AS u1, ${Fmt.sql6("u2")} AS u2,
           |  ${Fmt.sql6("z")} AS z,
           |  ${Fmt.sql6(StatTests.normalSfTwoSidedSql("z"))} AS p_value
           |FROM mwz ORDER BY district""".stripMargin)),

    Q("x7_chi2_cramer",
      "Chi-square independence district × Risk_Label + Cramér's V and " +
        "strength bucket (X7+X8, 01:972-992). p-value engine-side.",
      (s, d) => {
        val base = clean(s, d)
          .withColumn("risk", graft.ops.Derive.riskLabel(col("filling_rate")))
        val cells = StatTests.chi2Cells(base, "district", "risk")
        StatTests.chi2Summary(cells, "district", "risk")
          .select(
            Fmt.trunc(col("chi2"), 4).as("chi2"),
            col("dof").cast("long").as("dof"),
            col("n").cast("long").as("n_total"),
            Fmt.trunc(col("cramers_v"), 6).as("cramers_v"),
            col("strength"))
      },
      Some(enrSql + chi2CellsSql +
        """SELECT floor((chi2) * 1e4 + 1e-6) / 1e4 AS chi2,
          |       CAST(dof AS BIGINT) AS dof, CAST(n AS BIGINT) AS n_total,
          |       floor((sqrt(chi2 / (n * least(r, c) - n))) * 1e6 + 1e-6) / 1e6 AS cramers_v,
          |       CASE WHEN sqrt(chi2 / (n * least(r, c) - n)) < 0.1 THEN 'weak'
          |            WHEN sqrt(chi2 / (n * least(r, c) - n)) < 0.3 THEN 'moderate'
          |            ELSE 'strong' END AS strength
          |FROM (
          |  SELECT sum((observed - expected) * (observed - expected) / expected) AS chi2,
          |         CAST(count(DISTINCT district) AS DOUBLE) AS r,
          |         CAST(count(DISTINCT risk) AS DOUBLE) AS c,
          |         (CAST(count(DISTINCT district) AS DOUBLE) - 1) *
          |         (CAST(count(DISTINCT risk) AS DOUBLE) - 1) AS dof,
          |         max(n_total) AS n
          |  FROM expcells)""".stripMargin)),

    Q("x9_residuals",
      "Standardized residuals (obs-exp)/sqrt(exp) per contingency cell " +
        "(X9, 01:998) — the 'who drives the significance' heat-map frame.",
      (s, d) => {
        val base = clean(s, d)
          .withColumn("risk", graft.ops.Derive.riskLabel(col("filling_rate")))
        StatTests.chi2Cells(base, "district", "risk")
          .select(
            col("district"), col("risk"),
            col("observed").cast("long").as("observed"),
            Fmt.trunc(col("expected"), 4).as("expected"),
            Fmt.trunc(col("std_residual"), 6).as("std_residual"))
          .orderBy("district", "risk")
      },
      Some(enrSql + chi2CellsSql +
        """SELECT district, risk, CAST(observed AS BIGINT) AS observed,
          |       floor((expected) * 1e4 + 1e-6) / 1e4 AS expected,
          |       floor(((observed - expected) / sqrt(expected)) * 1e6 + 1e-6) / 1e6 AS std_residual
          |FROM expcells ORDER BY district, risk""".stripMargin))
  )

  /** Shared contingency-grid SQL (zero-filled like pd.crosstab),
    * mirroring [[StatTests.chi2Cells]]. */
  private lazy val chi2CellsSql: String =
    """, counts AS (
      |  SELECT district,
      |         CASE WHEN filling_rate < 0.1 THEN 'Shortage' ELSE 'Normal' END AS risk,
      |         CAST(count(*) AS DOUBLE) AS observed
      |  FROM clean GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.district, r.risk
      |  FROM (SELECT DISTINCT district FROM counts) d
      |  CROSS JOIN (SELECT DISTINCT risk FROM counts) r),
      |cells AS (
      |  SELECT g.district, g.risk, coalesce(c.observed, 0.0) AS observed
      |  FROM grid g LEFT JOIN counts c ON g.district = c.district AND g.risk = c.risk),
      |expcells AS (
      |  SELECT district, risk, observed,
      |         sum(observed) OVER (PARTITION BY district) *
      |         sum(observed) OVER (PARTITION BY risk) /
      |         sum(observed) OVER () AS expected,
      |         sum(observed) OVER () AS n_total
      |  FROM cells)
      |""".stripMargin
}
