package graft.queries
import graft.core.Ckpt._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.ops.Partitioning

/** Distributed ML TRAINING via sufficient statistics (SURVEY.md §2 tier C
  * extension — the model-fitting counterpart of the FeatureEng encoders):
  *
  *   - OLS multiple regression: one aggregate pass collects the normal-
  *     equation moments (X'X, X'y) as EXACT integers (cents / scaled
  *     units, decimal(38) on Spark ≡ HUGEINT on DuckDB), then a closed-
  *     form Cramer solve. The 100 TB shape: model fitting is ONE
  *     map-side-combinable aggregation, the solve is O(k³) on a k×k
  *     matrix — never a row-wise iteration;
  *   - PCA (2-feature): covariance eigen-decomposition in closed form
  *     from the same exact moment sums;
  *   - gradient-descent classifier: 3 full-batch iterations, each ONE
  *     aggregate whose per-row gradient contributions are rounded to an
  *     integer 1e-12 grid — gradients are exact bigints, so the weight
  *     trajectory is bit-identical on both engines with no summation-
  *     order drift (the activation is the rational sigmoid
  *     σ(z) = ½(1 + z/(1+|z|)) — elementary ops only, same closed form
  *     both engines; same precedent as the A&S normal tail in
  *     [[Hypothesis]]);
  *   - multinomial Naive Bayes: token-likelihood training IS a group-by
  *     (word, class) count; scoring is a broadcast join + log-sum —
  *     classifier training/inference as pure relational algebra;
  *   - Apriori association rules: frequent-item pruning BEFORE pair
  *     generation (the Apriori property — at 100 TB the pair lattice is
  *     only ever built over the frequent-item subset), thresholds
  *     compared in exact integer arithmetic.
  */
object MlTrain {
  type Q = (SparkSession, String) => DataFrame

  // ---- shared closed-form texts (used verbatim by selectExpr AND the
  // DuckDB oracle, so both engines evaluate the identical IEEE tree) ----

  /** 3×3 Cramer cofactor terms over the normal-equation moments. */
  private val linregL1 = Seq(
    "n", "sy", "s1y", "s2y", "syy",
    "s11*s22 - s12*s12 AS m0",
    "s1*s22 - s12*s2 AS m1",
    "s1*s12 - s11*s2 AS m2",
    "s1y*s22 - s12*s2y AS m3",
    "s1y*s12 - s11*s2y AS m4",
    "s1*s2y - s1y*s2 AS m5",
    "s11*s2y - s1y*s12 AS m6",
    "s1", "s2")
  private val linregL2 = Seq(
    "n", "sy", "s1y", "s2y", "syy",
    "(sy*m0 - s1*m3 + s2*m4) / (n*m0 - s1*m1 + s2*m2) AS b0",
    "(n*m3 - sy*m1 + s2*m5) / (n*m0 - s1*m1 + s2*m2) AS b1",
    "(n*m6 - s1*m5 + sy*m2) / (n*m0 - s1*m1 + s2*m2) AS b2")
  private val linregL3 = Seq(
    "round(b0, 6) AS b0", "round(b1, 6) AS b1", "round(b2, 6) AS b2",
    "round(1 - (syy - b0*sy - b1*s1y - b2*s2y) / (syy - sy*sy/n), 6) AS r2")

  // Huber IRLS shared layers (ml_huber_irls): weighted 1-feature normal
  // equations from the ppm-integer weighted sums; k and nd thread through
  private val huberC1 = Seq(
    "k", "nd", "sw", "swx", "swy",
    "(sw*swxy - swx*swy) / (sw*swxx - swx*swx) AS b")
  private val huberC2 = Seq(
    "k", "nd", "b", "(swy - b*swx) / sw AS a")

  private val pcaL1 = Seq(
    "(sxx - sx*sx/n) / (n - 1) AS cxx",
    "(sxy - sx*sy/n) / (n - 1) AS cxy",
    "(syy - sy*sy/n) / (n - 1) AS cyy")
  private val pcaL2 = Seq(
    "cxx", "cxy",
    "(cxx + cyy)/2 + sqrt(((cxx - cyy)/2)*((cxx - cyy)/2) + cxy*cxy) AS l1",
    "(cxx + cyy)/2 - sqrt(((cxx - cyy)/2)*((cxx - cyy)/2) + cxy*cxy) AS l2")
  // the trailing + 0.0 normalizes IEEE negative zero: Spark's BigDecimal
  // round drops the sign of -1e-9 -> "0.0" while DuckDB's FP round keeps
  // it -> "-0.0"; adding +0.0 maps both to +0.0 (and is a no-op otherwise)
  private val pcaL3 = Seq(
    "round(l1, 6) + 0.0 AS var1", "round(l2, 6) + 0.0 AS var2",
    "round(l1/(l1 + l2), 6) + 0.0 AS evr",
    "round(cxy/sqrt(cxy*cxy + (l1 - cxx)*(l1 - cxx)), 6) + 0.0 AS pc1_x",
    "round((l1 - cxx)/sqrt(cxy*cxy + (l1 - cxx)*(l1 - cxx)), 6) + 0.0 AS pc1_y")

  /** Shared per-class ratio text (ml_confusion): F1 uses the exact
    * identity 2PR/(P+R) = 2·tp/(n_pred + n_act). Ratios are emitted as
    * parts-per-million BIGINTs via floor(1e6·x + 0.5): every step (exact
    * long→double promote, one IEEE division, +0.5, floor) is bit-
    * deterministic across engines — unlike round(double, 6), where Spark
    * rounds the exact BigDecimal expansion while DuckDB rounds via FP
    * x*1e6, flipping ratios that land on a 6th-decimal boundary. floor
    * MUST precede the cast: DuckDB's double→BIGINT cast rounds to
    * nearest while Spark's truncates. */
  private val confusionSel = Seq(
    "cls", "tp", "n_pred - tp AS fp", "n_act - tp AS fn",
    "CASE WHEN n_pred > 0 THEN CAST(floor(1e6*tp/n_pred + 0.5) AS BIGINT) ELSE 0 END AS prec_ppm",
    "CASE WHEN n_act > 0 THEN CAST(floor(1e6*tp/n_act + 0.5) AS BIGINT) ELSE 0 END AS rec_ppm",
    "CASE WHEN tp > 0 THEN CAST(floor(2e6*tp/(n_pred + n_act) + 0.5) AS BIGINT) ELSE 0 END AS f1_ppm")

  /** Shared weighted-Gini text (ml_decision_stump): inputs nl/pl/n/p are
    * exact integers, every ratio an IEEE division of identical operands,
    * and the output a floor-ppm integer — evaluated identically by both
    * engines. */
  private val stumpGini =
    "CAST(floor(1e6 * ((nl * (1.0" +
    " - (CAST(pl AS DOUBLE)/nl)*(CAST(pl AS DOUBLE)/nl)" +
    " - (CAST(nl - pl AS DOUBLE)/nl)*(CAST(nl - pl AS DOUBLE)/nl))" +
    " + (n - nl) * (1.0" +
    " - (CAST(p - pl AS DOUBLE)/(n - nl))*(CAST(p - pl AS DOUBLE)/(n - nl))" +
    " - (CAST(n - p - nl + pl AS DOUBLE)/(n - nl))" +
    "*(CAST(n - p - nl + pl AS DOUBLE)/(n - nl)))) / n)" +
    " + 0.5) AS BIGINT) AS gini_ppm"

  // DeLong layers (ml_auc_delong): placement sums -> AUC + its
  // variance. All operands are exact-integer sums cast to double; the
  // (sp*sp / n1) products exceed BIGINT so they live in double on BOTH
  // engines (the ml_linreg m-product precedent).
  private val delongL1 = Seq(
    "CAST(n1 AS BIGINT) AS n1", "CAST(n0 AS BIGINT) AS n0",
    "sp / (2.0*n0*n1) AS auc",
    "((spp - sp*sp/n1) / (n1 - 1.0)) / (4.0*n0*n0) AS s10",
    "((sqq - sq*sq/n0) / (n0 - 1.0)) / (4.0*n1*n1) AS s01")
  private val delongL2 = Seq(
    "n1", "n0",
    "CAST(floor(1e6 * auc + 0.5) AS BIGINT) AS auc_ppm",
    "CAST(floor(1e12 * (s10/n1 + s01/n0) + 0.5) AS BIGINT) AS var_x1e12",
    "CAST(floor(1e6 * sqrt(s10/n1 + s01/n0) + 0.5) AS BIGINT) AS se_x1e6")

  private val aucSel =
    "round(CAST(r1x2 - n1*(n1 + 1) AS DOUBLE) / CAST(2*n1*n0 AS DOUBLE), 6) AS auc"

  /** Featurized GD frame + the 3-iteration weight trajectory — shared by
    * ml_logreg_gd / ml_auc / ml_calibration. The collected gradient is 3
    * longs per iteration (bounded driver action); the oracle replays the
    * identical iterations in SQL, and because the gradients are exact
    * integers the weights are bit-identical doubles on both engines. */
  // one weight fit per corpus per JVM (the bpeCache/ivfCache
  // amortization pattern): ml_logreg_gd / ml_auc / ml_calibration /
  // ml_roc_points each consume the SAME 3-pass trajectory, so without
  // the cache every entry refits from scratch (~8 s across the family
  // in BENCH_r07). The cached value is 3 doubles — nothing data-sized.
  private val gdCache =
    scala.collection.concurrent.TrieMap.empty[String, (Double, Double, Double)]

  // ml_poisson_reg's fitted (w0, w1) — 2 doubles per corpus, the gdCache
  // amortization pattern
  private val poissonCache =
    scala.collection.concurrent.TrieMap.empty[String, (Double, Double)]

  /** Rational exp for the Poisson GLM (the gdFit libm-free discipline
    * extended): E(z) = max(1 + z/32, 0)^32 by five squarings — pure
    * multiplications, bit-identical on both engines, where libm exp
    * differs by ulps across implementations and a quantizer boundary
    * would flip a per-row contribution. Relative error ≤ z²/64 on the
    * |z| ≲ 4 range this model visits — the link is DOCUMENTED as
    * rational-exp quasi-Poisson; the oracle checks engine parity of the
    * declared estimator, not agreement with textbook glm(). */
  private def rationalExp(z: Column): Column = {
    val u = greatest(lit(1.0) + z / lit(32.0), lit(0.0))
    val u2 = u * u; val u4 = u2 * u2; val u8 = u4 * u4
    val u16 = u8 * u8
    u16 * u16
  }

  private def gdFit(s: SparkSession, d: String)
      : (DataFrame, Double, Double, Double) = {
    val raw = t(s, d, "lineitem").select(
      (round(col("l_quantity")).cast("double") / 50.0).as("x1"),
      (round(col("l_discount") * 100).cast("double") / 10.0).as("x2"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("yy"))
      .ckpt(eager = false) // 3 GD passes + the consumer's pass
    val (c0, c1, c2) = gdCache.getOrElseUpdate(d, {
    val nD = raw.count().toDouble
    var w0 = 0.0; var w1 = 0.0; var w2 = 0.0
    for (_ <- 1 to 3) {
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      // per-row contribution stays a bigint on the 1e-12 grid, but the
      // SUM is decimal(38,0): |contrib| ≤ ~2e13, so a long sum wraps
      // silently past ~9e5 rows-per-unit headroom (sf ≳ 1.5) while the
      // DuckDB twin's sum(BIGINT) auto-promotes to HUGEINT — the
      // decimal sum keeps both engines exact at any sf
      def g(x: Column) =
        sum(round((sg - col("yy")) * x * lit(1e12)).cast("bigint")
          .cast("decimal(38,0)"))
      val r = raw.agg(g(lit(1.0)), g(col("x1")), g(col("x2"))).head()
      // identical update text as the oracle: w - 2.0*((g/1e12)/n);
      // BigDecimal→double is the same correctly-rounded conversion as
      // DuckDB's HUGEINT→DOUBLE cast
      def gd(i: Int) = r.getDecimal(i).doubleValue
      w0 = w0 - 2.0 * ((gd(0) / 1e12) / nD)
      w1 = w1 - 2.0 * ((gd(1) / 1e12) / nD)
      w2 = w2 - 2.0 * ((gd(2) / 1e12) / nD)
    }
    (w0, w1, w2)
    })
    (raw, c0, c1, c2)
  }

  // one scored frame per corpus per session: ml_naive_bayes /
  // ml_confusion / ml_cohens_kappa all consume the same scores; the
  // lazily-checkpointed handle materializes once (|test docs| × |classes|
  // rows — linear in the corpus, stored off-heap by localCheckpoint, not
  // on the driver). Session-keyed: the checkpoint handle is bound to the
  // SparkSession that created it ([[graft.core.SessionCache]]).
  private val nbCache = new graft.core.SessionCache[DataFrame]

  /** NB per-(test doc, class) integer ppm log-posterior scores — shared
    * by ml_naive_bayes, ml_confusion and ml_cohens_kappa. */
  private def nbScored(s: SparkSession, d: String): DataFrame =
    nbCache.getOrElseUpdate(s, d, nbScoredBuild(s, d)
      .ckpt(eager = false))

  private def nbScoredBuild(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
    val train = toks.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val counts = train.groupBy(col("lang").as("cls"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val classes = train.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("tot"), count_distinct(col("doc_id")).as("nd"))
    val consts = train.agg(count_distinct(col("w")).as("v"),
      count_distinct(col("doc_id")).as("ndall"))
    val classInfo = classes.crossJoin(broadcast(consts)) // 5 × 1 rows
    val testTf = toks.filter(pmod(col("doc_id"), lit(5)) === 0)
      .groupBy(col("doc_id"), col("lang").as("actual"), col("w"))
      .agg(count(lit(1)).as("tf"))
    // No floating point on the DECISION PATH: each token's log-likelihood
    // is quantized to an integer ppm grid BEFORE summation —
    // tf · floor(1e6·ln((cnt+1)/(tot+v)) + 0.5) — and the per-doc score is
    // an exact BIGINT sum (order-independent, so engine summation order
    // cannot move it; each ln sees identical operand pairs on both
    // engines). The previous formulation summed doubles then rounded to
    // 6 decimals: a cross-engine ulp in the ORDER-DEPENDENT sum near a
    // 6th-decimal boundary flipped a rounded score, and a flip on a
    // near-tied argmax changed `pred` → the r7/r8 ml_confusion driver
    // hash-fails. The argmax (nbWindow) now compares exact integers.
    val termPpm = floor(lit(1e6) *
      log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
          (col("tot") + col("v")).cast("double")) + lit(0.5)).cast("long")
    val priorPpm = floor(lit(1e6) *
      log(col("nd").cast("double") / col("ndall").cast("double"))
      + lit(0.5)).cast("long")
    testTf
      .join(broadcast(classInfo))                    // |classes| fan-out
      .join(counts, Seq("cls", "w"), "left")         // unseen → cnt null
      .groupBy(col("doc_id"), col("actual"), col("cls"))
      .agg((sum(col("tf") * termPpm) + first(priorPpm)).as("score_ppm"))
  }

  private def nbWindow =
    Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("cls"))

  val defs: Map[String, Q] = Map(

    // OLS: l_extendedprice (cents) ~ l_quantity + 100·l_discount.
    // Moments are exact integers — sums as decimal(38,0) ≡ HUGEINT (syy
    // alone exceeds bigint: (1e7 cents)² × 6e5 rows ≈ 6e19) — then cast
    // to double ONCE, so engine summation order cannot perturb the solve.
    "ml_linreg" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        round(col("l_extendedprice") * 100).cast("bigint").as("y"),
        round(col("l_quantity")).cast("bigint").as("x1"),
        round(col("l_discount") * 100).cast("bigint").as("x2"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      raw.agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
          dsum(col("x1") * col("x1")).as("s11"),
          dsum(col("x1") * col("x2")).as("s12"),
          dsum(col("x2") * col("x2")).as("s22"),
          dsum(col("y")).as("sy"),
          dsum(col("x1") * col("y")).as("s1y"),
          dsum(col("x2") * col("y")).as("s2y"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr(linregL1: _*).selectExpr(linregL2: _*)
        .selectExpr(linregL3: _*)
    }),

    // Split-conformal prediction interval (Papadopoulos et al. 2002 /
    // Lei et al. 2018) — the distribution-free coverage wrapper every
    // deployed regressor wants: fit on the train split, take the
    // ⌈(n_cal+1)·0.9⌉-th smallest absolute calibration residual as the
    // interval half-width q̂, and CHECK the ≥90% marginal coverage
    // guarantee on a held-out test split. Splits are the deterministic
    // l_orderkey mod 5 (0 = calibrate, 1 = test, rest = train).
    // NUMERICS: the OLS weights come from the ml_linreg closed form on
    // exact decimal moments and are ROUNDED to 6 dp before scoring (both
    // engines then score with identical doubles); residual scores are
    // floor-1e4 quantized BIGINTs, the rank-k selection is an exact
    // order statistic (value at rank k is tie-invariant), and k is the
    // integer (9·(n_cal+1)+9) div 10. Scale shape: two moment
    // aggregates, one distributed two-level rank over the calibration
    // scores, scalar broadcasts — no data-sized window, no collect.
    "ml_conformal_interval" -> ((s, d) => {
      // `raw` NOT checkpointed (r14, same reasoning as ml_kfold_cv): both
      // consumers re-derive it from a 4-column pruned parquet scan, which
      // recomputes cheaper than a corpus-sized localCheckpoint writes —
      // and at 100 TB materializing the projection is not an option.
      val raw = t(s, d, "lineitem").select(
          round(col("l_extendedprice") * 100).cast("bigint").as("y"),
          round(col("l_quantity")).cast("bigint").as("x1"),
          round(col("l_discount") * 100).cast("bigint").as("x2"),
          pmod(col("l_orderkey"), lit(5)).cast("int").as("split"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      val w = raw.filter(col("split") >= 2).agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
          dsum(col("x1") * col("x1")).as("s11"),
          dsum(col("x1") * col("x2")).as("s12"),
          dsum(col("x2") * col("x2")).as("s22"),
          dsum(col("y")).as("sy"),
          dsum(col("x1") * col("y")).as("s1y"),
          dsum(col("x2") * col("y")).as("s2y"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr(linregL1: _*).selectExpr(linregL2: _*)
        .selectExpr("round(b0, 6) AS b0", "round(b1, 6) AS b1",
          "round(b2, 6) AS b2")
      val scored = raw.filter(col("split") < 2).crossJoin(broadcast(w))
        .selectExpr("split",
          "CAST(floor(1e4 * abs(y - (b0 + b1 * x1 + b2 * x2)) + 0.5)" +
            " AS BIGINT) AS score")
        .ckpt(eager = false)
      val cal = scored.filter(col("split") === 0).select(col("score"))
      val kDf = cal.agg(count(lit(1)).as("n_cal"))
        .selectExpr("n_cal", "(9 * (n_cal + 1) + 9) div 10 AS k")
      // the rn = k filter is provably one row; the closing grouping-less
      // aggregate makes that visible to the plan audit's scalar-broadcast
      // exemption (and to Catalyst's 1-row stats)
      // eager = false (r12): the eager two-level-rank checkpoint dominated
      // the sf1 wall time (5.26 s vs 0.52 s for the same machinery over
      // the much smaller evt_uplift_qini user table); the lazy variant
      // folds the calibration-rank materialization into the scoring job
      val qhat = graft.ops.Partitioning
        .rankedRowNumber(cal, Seq(col("score")), 32, "rn", eager = false)
        .crossJoin(broadcast(kDf))
        .filter(col("rn") === col("k"))
        .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
          max(col("score")).as("qhat_e4"))
      scored.filter(col("split") === 1)
        .crossJoin(broadcast(qhat))
        .groupBy(col("n_cal"), col("k"), col("qhat_e4"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("score") <= col("qhat_e4"), 1L).otherwise(0L))
            .as("covered"))
        .selectExpr("n_cal", "k", "qhat_e4", "n_test", "covered",
          "CAST(floor(1e6 * covered / n_test + 0.5) AS BIGINT)" +
            " AS coverage_ppm",
          "2 * qhat_e4 AS width_e4")
    }),

    // 2-feature PCA: eigen-decomposition of the (quantity, discount-%)
    // covariance matrix in closed form from exact moments. Feature choice
    // is a numerics contract: per-row products ≤ 2500, so every moment
    // sum stays below 2^53 up to ~3e12 rows — the HUGEINT/decimal →
    // double casts are EXACT on both engines, and the eigen cancellation
    // (l2 = mean − sqrt) amplifies no input ulp. (A cents² moment ≈ 6e19
    // at sf0.1 demonstrably cast-drifts 1 ulp between engines and the
    // small eigenvalue magnifies it past round-6 — don't widen features
    // without rescaling.)
    "ml_pca" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        round(col("l_quantity")).cast("bigint").as("x"),
        round(col("l_discount") * 100).cast("bigint").as("y"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      raw.agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
          dsum(col("x") * col("x")).as("sxx"),
          dsum(col("x") * col("y")).as("sxy"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr(pcaL1: _*).selectExpr(pcaL2: _*).selectExpr(pcaL3: _*)
    }),

    // Full-batch GD, 3 iterations, lr = 2: P(return | quantity, discount)
    // with the rational sigmoid. Each iteration is ONE aggregation whose
    // per-row contributions are integers on a 1e-12 grid, summed as
    // DECIMAL(38,0) ≡ HUGEINT so the gradient is exact at any sf; the
    // collected gradient is 3 decimals (bounded driver action) and the
    // weight update replays the oracle's formula on identical doubles.
    "ml_logreg_gd" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val zf = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      raw.agg(
        round(lit(w0), 6).as("w0"), round(lit(w1), 6).as("w1"),
        round(lit(w2), 6).as("w2"),
        round(avg(when((zf >= 0) === (col("yy") === 1.0), 1.0)
          .otherwise(0.0)), 6).as("acc"))
    }),

    // Multinomial NB with Laplace smoothing: predict `lang` of held-out
    // docs (doc_id % 5 = 0) from token counts of the other 80%.
    "ml_naive_bayes" -> ((s, d) => {
      nbScored(s, d)
        .withColumn("rn", row_number().over(nbWindow))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("actual"), col("cls").as("pred"),
          col("score_ppm"))
    }),

    // Confusion-matrix summary of the NB classifier: per-class tp/fp/fn
    // and precision/recall/F1. Counts are exact integers; the ratios are
    // one shared CASE text (confusionSel) evaluated identically by both
    // engines.
    "ml_confusion" -> ((s, d) => {
      val pred = nbScored(s, d)
        .withColumn("rn", row_number().over(nbWindow))
        .filter(col("rn") === 1)
        .select(col("actual"), col("cls").as("pred"))
      val classes = t(s, d, "documents")
        .select(col("lang").as("cls")).distinct()
      val byActual = pred.groupBy(col("actual").as("cls"))
        .agg(count(lit(1)).as("n_act"),
          sum(when(col("actual") === col("pred"), 1L).otherwise(0L)).as("tp"))
      val byPred = pred.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("n_pred"))
      classes
        .join(byActual, Seq("cls"), "left")
        .join(byPred, Seq("cls"), "left")
        .select(col("cls"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("n_act"), lit(0L)).as("n_act"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"))
        .selectExpr(confusionSel: _*)
    }),

    // Cohen's kappa of the NB classifier: chance-corrected agreement
    // κ = (p_o − p_e)/(1 − p_e) with p_e from the marginal products —
    // the one-number summary ml_confusion's per-class table rolls up to.
    // All inputs exact integers; three ratios at the end.
    "ml_cohens_kappa" -> ((s, d) => {
      val pred = nbScored(s, d)
        .withColumn("rn", row_number().over(nbWindow))
        .filter(col("rn") === 1)
        .select(col("actual"), col("cls").as("pred"))
      val byActual = pred.groupBy(col("actual").as("cls"))
        .agg(count(lit(1)).as("n_act"),
          sum(when(col("actual") === col("pred"), 1L).otherwise(0L)).as("tp"))
      val byPred = pred.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("n_pred"))
      byActual.join(byPred, Seq("cls"), "full")
        .select(coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("n_act"), lit(0L)).as("n_act"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"))
        .agg(sum(col("tp")).as("tpsum"), sum(col("n_act")).as("nn"),
          sum(col("n_act") * col("n_pred")).as("crossp"))
        .selectExpr("nn AS n",
          "round(CAST(tpsum AS DOUBLE)/nn, 6) AS po",
          "round(CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE)), 6) AS pe",
          "round((CAST(tpsum AS DOUBLE)/nn - CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE))) / (1.0 - CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE))), 6) AS kappa")
    }),

    // Learning curve by cumulative-fold moment algebra: train on folds
    // {1}, {1,2}, {1,2,3}, {1,2,3,4} (a 4-row window prefix-sum over the
    // per-fold moments — NOT four training scans), always test on fold 0.
    // The same sufficient-statistics trick as ml_kfold_cv, shaped as the
    // sample-size/error diagnostic.
    "ml_learning_curve" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        pmod(col("l_orderkey"), lit(5)).as("fold"),
        round(col("l_extendedprice") * 100).cast("bigint").as("y"),
        round(col("l_quantity")).cast("bigint").as("x1"),
        round(col("l_discount") * 100).cast("bigint").as("x2"))
        .ckpt(eager = false) // moment pass + scoring pass
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      val byFold = raw.filter(col("fold") =!= 0)
        .groupBy(col("fold")).agg(
          count(lit(1)).cast("double").as("fn"),
          dsum(col("x1")).as("f1"), dsum(col("x2")).as("f2"),
          dsum(col("x1") * col("x1")).as("f11"),
          dsum(col("x1") * col("x2")).as("f12"),
          dsum(col("x2") * col("x2")).as("f22"),
          dsum(col("y")).as("fy"),
          dsum(col("x1") * col("y")).as("f1y"),
          dsum(col("x2") * col("y")).as("f2y"),
          dsum(col("y") * col("y")).as("fyy"))
      val wCum = Window.orderBy(col("fold"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = byFold.select(col("fold").as("k") +:
        Seq("fn" -> "n", "f1" -> "s1", "f2" -> "s2", "f11" -> "s11",
          "f12" -> "s12", "f22" -> "s22", "fy" -> "sy", "f1y" -> "s1y",
          "f2y" -> "s2y", "fyy" -> "syy").map { case (f, o) =>
          sum(col(f)).over(wCum).as(o)
        }: _*)
      val models = cum
        .selectExpr(Seq("k", "n AS n_train") ++ linregL1: _*)
        .selectExpr("k" +: "n_train" +:
          linregL2.filter(_.contains(" AS b")): _*)
      raw.filter(col("fold") === 0)
        .crossJoin(broadcast(models)) // 4-row model table, fold-bounded
        .select(col("k"), col("n_train"),
          (col("y").cast("double") - ((col("b0") + col("b1") * col("x1"))
            + col("b2") * col("x2"))).as("e"))
        .groupBy(col("k"))
        .agg(max(col("n_train")).cast("bigint").as("n_train"),
          count(lit(1)).as("n_test"),
          round(sqrt(sum(col("e") * col("e")) / count(lit(1))) / 100.0, 4)
            .as("test_rmse_dollars"))
        .orderBy(col("k"))
    }),

    // ROC AUC of the GD classifier via the rank statistic (AUC is the
    // normalized Mann-Whitney U of the scores): group by the EXACT score
    // double (bit-identical per row on both engines), one distributed
    // prefix sum for ranks — no global window, tie-averaged rank sum in
    // exact bigints (the agg_mannwhitney machinery).
    "ml_auc" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val byv = raw
        .select(((lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2"))
          .as("v"), col("yy"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n_v"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("n1_v"))
      val cum = Partitioning.rankedCumSum(
        byv, col("n_v"), Seq(col("v")), 32, "cum_n")
      cum.agg(
          sum(col("n1_v")).as("n1"),
          sum(col("n_v") - col("n1_v")).as("n0"),
          sum(col("n1_v") * (lit(2) * (col("cum_n") - col("n_v"))
            + col("n_v") + 1)).as("r1x2"))
        .selectExpr("n1", "n0", aucSel)
    }),

    // DeLong variance of the AUC — the standard error every AUC should
    // ship with (two models' AUCs are only comparably different past
    // ~2·SE): per-positive placements V10 = (#neg below + ties/2)/n0 and
    // the mirrored V01, computed as EXACT INTEGER placements scaled by
    // 2·n0 (resp. 2·n1) off the same grouped-by-score cumulative sums
    // ml_auc uses (rankedCumSumMulti — one range partition for both
    // cums). Var(AUC) = S10/n1 + S01/n0 from exact placement moments.
    // HEADROOM: the per-row moment products are computed IN DECIMAL —
    // n_v·(2·n0)² in BIGINT would wrap silently (non-ANSI) once a score
    // group times (2n0)² passes 9.2e18, ~1.3e6 rows worst-case (ADVICE
    // r10); decimal(12,0)·decimal(13,0)² caps at 38 digits = exact to
    // ~10¹² rows, far past any tested sf. Sums accumulate in
    // decimal(38,0).
    "ml_auc_delong" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      def dsum(e: Column) = sum(e.cast("decimal(38,0)")).cast("double")
      def cnt(c: Column) = c.cast("decimal(12,0)")
      def plc(c: Column) = c.cast("decimal(13,0)")
      val byv = raw
        .select(((lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2"))
          .as("v"), col("yy"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n_v"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("n1_v"))
        .withColumn("n0_v", col("n_v") - col("n1_v"))
      val cum = Partitioning.rankedCumSumMulti(byv,
        Seq(col("n0_v") -> "cum0", col("n1_v") -> "cum1"),
        Seq(col("v")), 32)
      val tot = cum.agg(sum(col("n1_v")).as("t1"), sum(col("n0_v")).as("t0"))
      cum.crossJoin(broadcast(tot))
        .withColumn("p2", lit(2) * (col("cum0") - col("n0_v")) + col("n0_v"))
        .withColumn("q2", lit(2) * (col("t1") - col("cum1")) + col("n1_v"))
        .agg(
          max(col("t1")).cast("double").as("n1"),
          max(col("t0")).cast("double").as("n0"),
          dsum(cnt(col("n1_v")) * plc(col("p2"))).as("sp"),
          dsum(cnt(col("n1_v")) * plc(col("p2")) * plc(col("p2"))).as("spp"),
          dsum(cnt(col("n0_v")) * plc(col("q2"))).as("sq"),
          dsum(cnt(col("n0_v")) * plc(col("q2")) * plc(col("q2"))).as("sqq"))
        .selectExpr(delongL1: _*).selectExpr(delongL2: _*)
    }),

    // Reliability diagram: fixed-width predicted-probability bins
    // (0.005-wide — after 3 mild GD iterations the scores live near 0.5,
    // so decile bins would collapse to one row) vs the observed positive
    // rate. Bin membership is an integer floor of the deterministic
    // per-row sigmoid — it cannot ulp-flip across engines.
    "ml_calibration" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("sg")), 6).as("pred_rate"),
          round(sum(when(col("yy") === 1.0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6).as("obs_rate"))
    }),

    // Brier score of the GD classifier — mean squared error between the
    // deterministic sigmoid score and the 0/1 label. NUMERICS: the
    // square is quantized floor(1e6·(sg−y)² + 0.5) PER ROW before
    // summation (the ml_confusion lesson — a raw double sum of 60k
    // squares is order-dependent; a BIGINT sum of per-row ppm integers
    // is engine-exact), and the mean is a floor-ppm of the exact
    // integer sum. One map-side-combinable aggregate over the shared
    // cached gdFit frame.
    "ml_brier" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      raw.select(
          floor(lit(1e6) * (sg - col("yy")) * (sg - col("yy")) + lit(0.5))
            .cast("long").as("sq_ppm"))
        .agg(count(lit(1)).as("n"), sum(col("sq_ppm")).as("brier_sum_ppm"))
        .withColumn("brier_ppm",
          floor(col("brier_sum_ppm") / col("n") + lit(0.5)).cast("long"))
    }),

    // group-fairness audit of a transparent threshold model (stump:
    // predict R iff quantity ≤ 25) across order priorities — demographic
    // parity (per-group positive-prediction rate) and equalized-odds
    // components (per-group TPR/FPR vs returnflag=R). The audit is the
    // operator; the model is deliberately a fixed, inspectable rule.
    // All counts exact integers, all rates floor-ppm — one co-keyed
    // equi-join + one grouped aggregate, |groups| bounded by the
    // priority domain (5).
    "ml_fairness_parity" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderpriority").as("grp"),
          when(round(col("l_quantity")) <= 25, 1L).otherwise(0L).as("pred"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("pred")).as("n_pred_pos"),
          sum(col("y")).as("n_pos"),
          sum(col("pred") * col("y")).as("tp"),
          sum(col("pred") * (lit(1L) - col("y"))).as("fp"))
        .select(col("grp"), col("n"),
          floor(lit(1e6) * col("n_pred_pos") / col("n") + lit(0.5))
            .cast("long").as("pred_pos_ppm"),
          when(col("n_pos") > 0,
            floor(lit(1e6) * col("tp") / col("n_pos") + lit(0.5))
              .cast("long")).otherwise(lit(0L)).as("tpr_ppm"),
          when(col("n") > col("n_pos"),
            floor(lit(1e6) * col("fp") / (col("n") - col("n_pos"))
              + lit(0.5)).cast("long")).otherwise(lit(0L)).as("fpr_ppm"))
    }),

    // McNemar's paired test between the two classifiers the board
    // already trains on the SAME rows — the GD sigmoid (threshold 0.5)
    // and the quantity stump (predict R iff q ≤ 25 ⟺ x1 ≤ 0.5 on the
    // gdFit grid). The statistic needs only the DISCORDANT counts
    // b (stump right, GD wrong) and c (stump wrong, GD right) — exact
    // integers — and (b−c)²/(b+c) lands as one floor-ppm division.
    // One aggregate over the cached gdFit frame; the sigmoid compare at
    // exactly 0.5 is engine-identical because sg is the same double.
    "ml_mcnemar" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      raw.select(
          when(sg >= 0.5, 1L).otherwise(0L).as("gd"),
          when(col("x1") <= 0.5, 1L).otherwise(0L).as("st"),
          col("yy").cast("long").as("y"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("st") === col("y") && col("gd") =!= col("y"), 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("st") =!= col("y") && col("gd") === col("y"), 1L)
            .otherwise(0L)).as("c"))
        .select(col("n"), col("b"), col("c"),
          when(col("b") + col("c") > 0,
            floor(lit(1e6) * (col("b") - col("c")) * (col("b") - col("c"))
              / (col("b") + col("c")) + lit(0.5)).cast("long"))
            .otherwise(lit(0L)).as("mcnemar_ppm"))
    }),

    // Variance inflation factor between the GD model's two predictors
    // (collinearity screen — VIF = 1/(1−r²); run BEFORE trusting the
    // ridge/OLS coefficients). r² comes from ONE moment aggregate over
    // the integer-recovered predictors (round(qty), round(100·disc) —
    // correlation is affine-invariant, so this matches the scaled gdFit
    // features exactly): all moment sums exact decimal(38,0) ≡ HUGEINT,
    // the n·Sxy − SxSy combinations ≤ ~9e14 (exactly representable in
    // a double), and the two outputs are floor-ppm divisions of
    // IEEE-deterministic products.
    "ml_vif" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      t(s, d, "lineitem").select(
          round(col("l_quantity")).cast("bigint").as("a"),
          round(col("l_discount") * 100).cast("bigint").as("b"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("a"))).as("sa"), sum(dec(col("b"))).as("sb"),
          sum(dec(col("a")) * dec(col("a"))).as("saa"),
          sum(dec(col("b")) * dec(col("b"))).as("sbb"),
          sum(dec(col("a")) * dec(col("b"))).as("sab"))
        .selectExpr("n",
          "CAST(n AS DECIMAL(38,0)) * sab - sa * sb AS cov_n",
          "CAST(n AS DECIMAL(38,0)) * saa - sa * sa AS va_n",
          "CAST(n AS DECIMAL(38,0)) * sbb - sb * sb AS vb_n")
        .selectExpr("n",
          "CAST(floor(1e6 * (CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))" +
            " / (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE)) + 0.5)" +
            " AS BIGINT) AS r2_ppm",
          "CAST(floor(1e6 * (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE))" +
            " / (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE)" +
            " - CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)) + 0.5)" +
            " AS BIGINT) AS vif_ppm")
    }),

    // Somers' D of the GD score (the credit-scoring "Gini of the model",
    // identically 2·AUC − 1 under mid-rank tie handling — pinned against
    // ml_auc in Round9Spec): concordant/discordant/tied pair counts from
    // ONE pass over the per-score table using the scale-safe two-level
    // prefix sums (never a global single-task window). All pair counts
    // are exact BIGINTs — C = Σ n1_v·prev_n0, D = Σ n0_v·prev_n1,
    // T = Σ n1_v·n0_v — and the statistic is one floor-ppm division.
    "ml_somers_d" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val byv = raw
        .select(((lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2"))
          .as("v"), col("yy"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n_v"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("n1_v"))
      Partitioning.rankedCumSumMulti(byv,
          Seq(col("n_v") -> "cum_n", col("n1_v") -> "cum_n1"),
          Seq(col("v")), 32)
        .select(col("n_v"), col("n1_v"),
          (col("n_v") - col("n1_v")).as("n0_v"),
          (col("cum_n1") - col("n1_v")).as("pn1"),
          ((col("cum_n") - col("n_v")) - (col("cum_n1") - col("n1_v")))
            .as("pn0"))
        .agg(sum(col("n1_v")).as("n1"),
          sum(col("n_v") - col("n1_v")).as("n0"),
          sum(col("n1_v") * col("pn0")).as("conc"),
          sum(col("n0_v") * col("pn1")).as("disc"),
          sum(col("n1_v") * col("n0_v")).as("ties"))
        .selectExpr("n1", "n0", "conc", "disc", "ties",
          "CAST(floor(1e6 * CAST(conc - disc AS DOUBLE)" +
            " / CAST(n1 * n0 AS DOUBLE) + 0.5) AS BIGINT) AS somers_ppm")
    }),

    // Decile lift/gain table of the GD score — the campaign-targeting
    // readout (how much better than random is the top 10%?). Rows are
    // deciled through the DISTINCT-score table: every tied score group
    // lands wholly in the decile of its first row (((cum − n_v)·10) div
    // N — integral, engine-exact; ntile's remainder placement is not),
    // using the same two-level prefix-sum scan as ml_somers_d. Per
    // decile: exact counts, floor-ppm response rate, lift vs the base
    // rate (pos·N / (n·P) — one IEEE-deterministic division of exact
    // integers), and cumulative gain over the ≤10-row decile table.
    "ml_lift_table" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val byv = raw
        .select(((lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2"))
          .as("v"), col("yy"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n_v"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("n1_v"))
      val cum = Partitioning.rankedCumSum(
        byv, col("n_v"), Seq(col("v").desc), 32, "cum_n")
      val tot = byv.agg(sum(col("n_v")).as("nn"), sum(col("n1_v")).as("pp"))
      val dec = cum.crossJoin(broadcast(tot))
        .withColumn("decile", expr("((cum_n - n_v) * 10) div nn"))
        .groupBy(col("decile"))
        .agg(sum(col("n_v")).as("n"), sum(col("n1_v")).as("pos"),
          max(col("nn")).as("nn"), max(col("pp")).as("pp"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      dec
        .withColumn("cum_pos", sum(col("pos")).over(wc))
        .selectExpr("decile", "n", "pos",
          "CAST(floor(1e6 * pos / n + 0.5) AS BIGINT) AS rate_ppm",
          "CAST(floor(1e6 * CAST(pos * nn AS DOUBLE)" +
            " / CAST(n * pp AS DOUBLE) + 0.5) AS BIGINT) AS lift_ppm",
          "CAST(floor(1e6 * cum_pos / pp + 0.5) AS BIGINT)" +
            " AS cum_gain_ppm")
    }),

    // Isotonic calibration of the GD sigmoid via the EXACT minimax
    // characterization of PAVA: f(k) = max_{i≤k} min_{j≥k} avg(y over
    // bins i..j) — no sequential pool-merge loop, so the whole fit is
    // three bounded relational steps over the ≤200-row score-bin table:
    // (1) prefix sums → every block average A(i,j) is one division of
    // exact counts (≤ 200·201/2 pairs); (2) a per-i suffix-min window
    // gives min_{j≥k} A(i,·) at each grid point (i, k); (3) one groupBy
    // max over i ≤ k (every grid row satisfies i ≤ k by construction).
    // Double comparisons on single-division values are IEEE-deterministic;
    // output quantized floor-ppm. Monotonicity + equality with a
    // reference sequential PAVA are pinned in Round9Spec.
    "ml_isotonic" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      val bins = raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("pos"))
      val wc = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cums = bins
        .withColumn("cn", sum(col("n")).over(wc))
        .withColumn("cp", sum(col("pos")).over(wc))
      val lo = cums.select(col("bin").as("i"),
        (col("cn") - col("n")).as("cni"), (col("cp") - col("pos")).as("cpi"))
      val hi = cums.select(col("bin").as("j"),
        col("cn").as("cnj"), col("cp").as("cpj"))
      val pairs = lo.join(hi, col("i") <= col("j"))
        .select(col("i"), col("j"),
          ((col("cpj") - col("cpi")).cast("double")
            / (col("cnj") - col("cni")).cast("double")).as("a"))
      val wm = Window.partitionBy(col("i")).orderBy(col("j").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      pairs.withColumn("sm", min(col("a")).over(wm))
        .groupBy(col("j").as("bin")).agg(max(col("sm")).as("fit"))
        .join(bins, Seq("bin"))
        .select(col("bin"), col("n"), col("pos"),
          floor(lit(1e6) * col("pos") / col("n") + 0.5).cast("long")
            .as("raw_ppm"),
          floor(lit(1e6) * col("fit") + 0.5).cast("long").as("iso_ppm"))
    }),

    // Matthews correlation coefficient of the GD sigmoid classifier —
    // the single-number confusion summary that stays honest under class
    // imbalance (accuracy and F1 both saturate; MCC is the full 2×2
    // correlation). All four cells are exact BIGINT counts from one
    // aggregate over the cached gdFit frame; the numerator tp·tn − fp·fn
    // is exact BIGINT (≤ ~4e11 at sf0.1, ~5 orders of headroom); the
    // denominator is the ONLY FP: one product of four exact-integer-
    // valued doubles + one sqrt, shared expression text with the twin
    // (IEEE mul/sqrt are correctly rounded, hence engine-deterministic
    // on identical operands), then a floor-ppm division.
    "ml_mcc" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      raw.select(
          when(sg >= 0.5, 1L).otherwise(0L).as("p"),
          col("yy").cast("long").as("y"))
        .agg(
          sum(when(col("p") === 1L && col("y") === 1L, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("p") === 1L && col("y") === 0L, 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("p") === 0L && col("y") === 1L, 1L).otherwise(0L))
            .as("fn"),
          sum(when(col("p") === 0L && col("y") === 0L, 1L).otherwise(0L))
            .as("tn"))
        .selectExpr("tp", "fp", "fn", "tn",
          "CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0 AND (tn+fp) > 0" +
            " AND (tn+fn) > 0 THEN" +
            " CAST(floor(1e6 * (tp*tn - fp*fn) /" +
            " sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)" +
            " * CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE)) + 0.5)" +
            " AS BIGINT) ELSE CAST(0 AS BIGINT) END AS mcc_ppm")
    }),

    // Precision-recall curve of the GD classifier over the calibration
    // score bins: predict-positive-at-bin-b ⇒ tp/pred are suffix sums of
    // the per-bin counts. The cumulative window runs over the BIN table
    // (≤ 200 rows by construction — the integer floor of the sigmoid —
    // never the data), so the unpartitioned window is a bounded single
    // task by design; ratios are floor-ppm integers (the ml_confusion
    // discipline).
    "ml_pr_curve" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      val bins = raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("np"))
      val w = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bins.agg(sum(col("np")).as("npos_total"))
      bins
        .withColumn("tp", sum(col("np")).over(w))
        .withColumn("pp", sum(col("n")).over(w))
        .crossJoin(broadcast(tot))
        .selectExpr("bin", "tp", "pp",
          "CAST(floor(1e6*tp/pp + 0.5) AS BIGINT) AS prec_ppm",
          "CASE WHEN npos_total > 0 THEN " +
            "CAST(floor(1e6*tp/npos_total + 0.5) AS BIGINT) " +
            "ELSE 0 END AS rec_ppm")
    }),

    // Expected calibration error — the single-number summary of
    // ml_calibration's reliability diagram. EXACT-INTEGER construction:
    // each row's confidence is quantized floor(1e6·sg + 0.5) BEFORE the
    // per-bin sum (never an avg of raw doubles), so the per-bin gap
    // |1e6·pos_b − Σ sg_ppm| is pure BIGINT and ECE is ONE terminal
    // floor division by N. Same ≤200-bin table as the pr-curve family.
    "ml_ece" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .withColumn("sgq", floor(lit(1e6) * col("sg") + 0.5).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("pos"),
          sum(col("sgq")).as("conf_sum_ppm"))
        .agg(count(lit(1)).as("n_bins"), sum(col("n")).as("n_rows"),
          sum(abs(lit(1000000L) * col("pos") - col("conf_sum_ppm")))
            .as("gap_sum"))
        .selectExpr("n_bins", "n_rows",
          "CAST(floor(CAST(gap_sum AS DOUBLE) / n_rows + 0.5) AS BIGINT)" +
            " AS ece_ppm")
    }),

    // Friedman test across THREE transparent classifiers on the same
    // blocks (the multi-classifier completion of ml_mcnemar's pairwise
    // test — the standard "is any of k models better, controlling for
    // dataset blocks?" readout): blocks = the 5 order priorities,
    // per-block classifier ranking by exact integer correct-counts
    // (same n within a block, so rank by rights), ties as DOUBLED
    // average ranks (stay integral), and the χ²_F statistic
    // 12/(bk(k+1))·ΣR_j² − 3b(k+1) as one floor-ppm expression of
    // exact integers. Everything data-sized is ONE co-keyed aggregate;
    // the ranking runs on the 5×3 block table.
    // NOTE (r14): a per-order pre-aggregate below the join (the
    // agg_rollup pattern) was tried and REVERTED — here the post-join
    // aggregate has only 5 groups (map-side reduction is already total),
    // so pre-grouping by the near-unique order key just adds a second
    // wide shuffle (measured 5.2 → 6.2 s at sf1). Pushdown pays when it
    // SHRINKS what the join shuffles, not when the downstream aggregate
    // is already free.
    "ml_friedman_test" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val y = when(col("l_returnflag") === "R", 1L).otherwise(0L)
      val rows = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderpriority").as("blk"), y.as("y"),
          when(round(col("l_quantity")) <= 25, 1L).otherwise(0L).as("c1"),
          when(round(col("l_discount") * 100) >= 5, 1L).otherwise(0L)
            .as("c2"),
          when(col("l_extendedprice") >= 30000.0, 1L).otherwise(0L)
            .as("c3"))
      val perBlk = rows.groupBy(col("blk")).agg(
        sum(when(col("c1") === col("y"), 1L).otherwise(0L)).as("r1"),
        sum(when(col("c2") === col("y"), 1L).otherwise(0L)).as("r2"),
        sum(when(col("c3") === col("y"), 1L).otherwise(0L)).as("r3"))
      val long = perBlk.selectExpr("blk", "stack(3, 1L, r1, 2L, r2," +
        " 3L, r3) AS (clf, rights)")
      // doubled mid-ranks: 2·rank = 2·(#worse) + (#tied) + 1 — integral
      // even under ties, engine-exact
      val rk = long.as("a").join(long.as("b"), col("a.blk") === col("b.blk"))
        .groupBy(col("a.blk").as("blk"), col("a.clf").as("clf"))
        .agg((lit(2L) * sum(when(col("b.rights") < col("a.rights"), 1L)
            .otherwise(0L))
          + sum(when(col("b.rights") === col("a.rights"), 1L)
            .otherwise(0L)) - 1L + lit(2L)).as("rank2"))
      rk.groupBy(col("clf")).agg(sum(col("rank2")).as("rsum2"))
        .agg(count(lit(1)).as("k"), sum(col("rsum2")).as("tot2"),
          sum(col("rsum2") * col("rsum2")).as("sq2"))
        // b blocks recovered from Σ2R = b·k(k+1): b = tot2 / (k(k+1))
        .selectExpr("k", "CAST(tot2 div (k * (k + 1)) AS BIGINT) AS b",
          "sq2")
        .selectExpr("b", "k",
          // χ²_F = 12/(b·k(k+1))·Σ(R_j²) − 3b(k+1), with R_j = rsum2/2
          "CAST(floor(1e6 * (3.0 * sq2 / (b * k * (k + 1)) " +
            "- 3.0 * b * (k + 1)) + 0.5) AS BIGINT) AS chi2_f_ppm")
    }),

    // Youden's J threshold sweep (max TPR − FPR — the diagnostic-test
    // optimum, vs best-F1's precision/recall optimum): over the same
    // suffix-sum bin table, J ∝ tp·N₀ − fp·N₁ on the common denominator
    // N₁·N₀ — so the ARGMAX runs on pure BIGINT numerators (no FP in
    // the decision at all) and only the reported j_ppm divides once.
    "ml_youden_j" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      val bins = raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("np"))
      val w = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bins.agg(sum(col("np")).as("n1"),
        sum(col("n") - col("np")).as("n0"))
      val wbest = Window.orderBy(col("jnum").desc, col("bin"))
      bins
        .withColumn("tp", sum(col("np")).over(w))
        .withColumn("pp", sum(col("n")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("jnum",
          col("tp") * col("n0") - (col("pp") - col("tp")) * col("n1"))
        .withColumn("rk", row_number().over(wbest))
        .filter(col("rk") === 1)
        .selectExpr("bin AS best_bin", "tp", "pp", "n1", "n0",
          "CAST(floor(1e6 * CAST(jnum AS DOUBLE)" +
            " / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) + 0.5)" +
            " AS BIGINT) AS j_ppm")
    }),

    // best-F1 threshold sweep — the deployment readout on top of
    // ml_pr_curve: F1 at predict-positive-above-bin-b collapses to
    // 2·tp/(pp + P) (since 2tp + fp + fn = pp + P), so the sweep is the
    // same ≤200-row suffix-sum table plus ONE argmax with a bin
    // tiebreak. Exact counts; one floor-ppm division per bin.
    "ml_best_f1" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      val bins = raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("np"))
      val w = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bins.agg(sum(col("np")).as("p_total"))
      val wbest = Window.orderBy(col("f1_ppm").desc, col("bin"))
      bins
        .withColumn("tp", sum(col("np")).over(w))
        .withColumn("pp", sum(col("n")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("f1_ppm",
          expr("CAST(floor(2e6 * tp / (pp + p_total) + 0.5) AS BIGINT)"))
        .withColumn("rk", row_number().over(wbest))
        .filter(col("rk") === 1)
        .select(col("bin").as("best_bin"), col("tp"), col("pp"),
          col("p_total"), col("f1_ppm"))
    }),

    // 1-split decision tree (decision stump) on quantity → returnflag=R:
    // candidate thresholds are the ≤50 DISTINCT integral quantities, so
    // after one grouped count the whole search is a 50-row cumulative +
    // argmin — the domain-bounding trick again (nothing data-sized past
    // the first aggregate). All split counts are exact integers and the
    // weighted-Gini expression text is shared with the twin, so the
    // argmin trajectory cannot diverge; ties break to the lowest
    // threshold.
    "ml_decision_stump" -> ((s, d) => {
      val byQ = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("bigint").as("q"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("nq"), sum(col("pos")).as("pq"))
      val w = Window.orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = byQ.agg(sum(col("nq")).as("n"), sum(col("pq")).as("p"))
      byQ
        .withColumn("nl", sum(col("nq")).over(w))
        .withColumn("pl", sum(col("pq")).over(w))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // right side must be non-empty
        .selectExpr("q AS threshold", "nl AS n_left", "n - nl AS n_right",
          stumpGini)
        .orderBy(col("gini_ppm"), col("threshold"))
        .limit(1)
    }),

    // AdaBoost, 2 rounds of boosted stumps (Freund & Schapire 1997) on
    // the same ≤50-value quantity grid → returnflag=R. The decision path
    // is INTEGER end-to-end (the ml_confusion lesson): round-1 weights
    // are raw counts, the stump argmin compares exact BIGINT weighted
    // errors over (threshold, polarity) candidates, and the round-2
    // reweight multiplies each grid cell by a floor-ppm integer factor
    // M = floor(1e6·e^{2α} + 0.5) (correct cells ×1e6), so round-2
    // errors are again exact BIGINTs. The only FP ops are one ln and one
    // exp per round on identical integer-derived operands — single
    // transcendental calls, never summed. α itself is published as
    // floor-ppm. Scale shape: ONE distributed grid aggregate; everything
    // after runs on the ≤50-row grid (two 1-row driver probes for the
    // chosen stumps — the gdFit bounded-collect pattern). Weight
    // headroom: tot_w2 ≤ n·M ≤ n·~3e6, inside BIGINT up to ~3e12 rows.
    "ml_adaboost" -> ((s, d) => {
      import s.implicits._
      val cells0 = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("bigint").as("q"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
        .groupBy(col("q"))
        .agg(sum(col("pos")).as("wpos"),
          (count(lit(1)) - sum(col("pos"))).as("wneg"))
        .ckpt(eager = false) // ≤50-row grid, read 4×
      // best (threshold, polarity) by exact weighted error; 'le' =
      // predict positive iff q ≤ t, 'gt' the complement; tie order
      // (err, pol, q) matches the twin's ORDER BY exactly
      def stump(cells: org.apache.spark.sql.DataFrame)
          : (Long, String, Long, Long) = {
        val w = Window.orderBy(col("q"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = cells.agg(sum(col("wpos")).as("tp"),
          sum(col("wneg")).as("tn"))
        val cum = cells
          .withColumn("cpos", sum(col("wpos")).over(w))
          .withColumn("cneg", sum(col("wneg")).over(w))
          .crossJoin(broadcast(tot))
          .select(col("q"),
            (col("cneg") + col("tp") - col("cpos")).as("errle"),
            (col("tp") + col("tn")).as("w"))
        val cand = cum.select(col("q"), lit("le").as("pol"),
            col("errle").as("err"), col("w"))
          .union(cum.select(col("q"), lit("gt").as("pol"),
            (col("w") - col("errle")).as("err"), col("w")))
        val r = cand.orderBy(col("err"), col("pol"), col("q"))
          .limit(1).collect()(0) // 1-row bounded probe
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      }
      // err clamped to the interior [1, w-1] before the ln — a perfectly
      // separable grid would otherwise send alpha to ±inf (and DuckDB's
      // floor(inf) diverges from the JVM's); on real data the clamp is
      // inert, and the twin applies the identical greatest/least guard
      def alphaPpm(err: Long, w: Long): Long = {
        val e = math.max(1L, math.min(err, w - 1))
        math.floor(1e6 * 0.5 *
          math.log((w - e).toDouble / e.toDouble) + 0.5).toLong
      }
      val (t1, pol1, err1, w1) = stump(cells0)
      val a1 = alphaPpm(err1, w1)
      val m1 = math.floor(1e6 *
        math.exp(2.0 * (a1.toDouble / 1e6)) + 0.5).toLong
      val misPos = if (pol1 == "le") col("q") > t1 else col("q") <= t1
      val misNeg = if (pol1 == "le") col("q") <= t1 else col("q") > t1
      val cells2 = cells0.select(col("q"),
        (col("wpos") * when(misPos, m1).otherwise(1000000L)).as("wpos"),
        (col("wneg") * when(misNeg, m1).otherwise(1000000L)).as("wneg"))
      val (t2, pol2, err2, w2) = stump(cells2)
      val a2 = alphaPpm(err2, w2)
      Seq((1L, pol1, t1, err1, w1, a1), (2L, pol2, t2, err2, w2, a2))
        .toDF("round", "pol", "threshold", "err_w", "tot_w", "alpha_ppm")
    }),

    // model-discrimination KS: the max gap between the positive and
    // negative score CDFs — the credit-scoring companion of ml_auc,
    // computed over the SAME ≤200-row sigmoid-bin table as ml_pr_curve
    // (never a per-row sort). D is a max over floor-ppm integers of
    // exact-count ratios, so the argmax bin and the statistic are
    // engine-identical.
    "ml_ks_model" -> ((s, d) => {
      val (raw, w0, w1, w2) = gdFit(s, d)
      val z = (lit(w0) + lit(w1) * col("x1")) + lit(w2) * col("x2")
      val sg = lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))
      val bins = raw.select(sg.as("sg"), col("yy"))
        .withColumn("bin", least(floor(col("sg") * 200), lit(199L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yy") === 1.0, 1L).otherwise(0L)).as("np"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bins.agg(sum(col("np")).as("tp"),
        sum(col("n") - col("np")).as("tn"))
      bins
        .withColumn("cp", sum(col("np")).over(w))
        .withColumn("cn", sum(col("n") - col("np")).over(w))
        .crossJoin(broadcast(tot))
        .selectExpr("bin",
          "abs(CAST(floor(1e6*cp/tp + 0.5) AS BIGINT) - " +
            "CAST(floor(1e6*cn/tn + 0.5) AS BIGINT)) AS gap_ppm")
        .orderBy(col("gap_ppm").desc, col("bin"))
        .limit(1)
        .selectExpr("bin AS ks_bin", "gap_ppm AS ks_ppm")
    }),

    // Gradient-boosted regression stumps (Friedman 2001), T = 3 rounds,
    // squared loss, shrinkage ν = 0.5: predict line price from the
    // (quantity, discount%) integer grid. The data-sized work is ONE
    // aggregate compacting lineitem to the ≤ 50·11 cell grid (n, Σy in
    // exact cents); every boosting round then runs on the grid alone —
    // per-cell residual sums are exact BIGINT milli-cents
    // (1000·Σy − n·pred, pred an accumulated integer), split search
    // scores cr²/cn + (R−cr)²/(N−cn) as double ops on identical integers
    // (correctly-rounded IEEE ops on identical inputs cannot diverge
    // between engines), and leaf steps are floor-rounded back onto the
    // milli-cent grid before they enter the next round's integers. Each
    // round's winner is a 1-row bounded probe (the ml_adaboost pattern).
    // BIGINT headroom: 1000·Σy per cell ≲ 4·10¹³ at sf1, five orders
    // below overflow; beyond ~10⁴× that, move sy to DECIMAL(38,0).
    "ml_gbm_stumps" -> ((s, d) => {
      val cells = t(s, d, "lineitem")
        .select(round(col("l_quantity")).cast("bigint").as("q"),
          round(col("l_discount") * 100).cast("bigint").as("dc"),
          round(col("l_extendedprice") * 100).cast("bigint").as("y"))
        .groupBy(col("q"), col("dc"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        .ckpt(eager = false) // read by all 3 rounds × 2 feature scans
      val t0 = cells.agg(sum(col("n")), sum(col("sy"))).head() // 1-row probe
      val m0 = math.floor(1000.0 * t0.getLong(1) / t0.getLong(0) + 0.5).toLong
      var pred: Column = lit(m0)
      val model = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long, Long, Long)]
      for (tr <- 1 to 3) {
        val rcell = cells.select(col("q"), col("dc"), col("n"),
          (col("sy") * 1000L - col("n") * pred).as("r"))
        def cand(f: String) = {
          val byf = rcell.groupBy(col(f).as("v"))
            .agg(sum(col("n")).as("cn0"), sum(col("r")).as("cr0"))
          val w = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, 0)
          val tt = byf.agg(sum(col("cn0")).as("tn"), sum(col("cr0")).as("tr"))
          byf.withColumn("cn", sum(col("cn0")).over(w))
            .withColumn("cr", sum(col("cr0")).over(w))
            .crossJoin(broadcast(tt))
            .filter(col("cn") < col("tn")) // right leaf must be non-empty
            .select(lit(f).as("feat"), col("v"),
              (col("cr").cast("double") * col("cr").cast("double")
                / col("cn").cast("double")
               + (col("tr") - col("cr")).cast("double")
                 * (col("tr") - col("cr")).cast("double")
                 / (col("tn") - col("cn")).cast("double")).as("score"),
              col("cn"), col("cr"), col("tn"), col("tr"))
        }
        val b = cand("q").unionAll(cand("dc"))
          .orderBy(col("score").desc, col("feat"), col("v"))
          .limit(1).collect().headOption // 1-row bounded probe per round
          .getOrElse(throw new IllegalStateException(
            s"ml_gbm_stumps: no admissible split at round $tr — every " +
              "candidate has an empty right leaf (degenerate cell grid " +
              "with a single distinct value per feature); the stump " +
              "model cannot be grown on this input"))
        val (feat, v) = (b.getString(0), b.getLong(1))
        val (cn, cr) = (b.getLong(3), b.getLong(4))
        val (tn, trr) = (b.getLong(5), b.getLong(6))
        val stepL = math.floor(0.5 * cr / cn + 0.5).toLong
        val stepR = math.floor(0.5 * (trr - cr) / (tn - cn) + 0.5).toLong
        pred = pred + when(col(feat) <= v, lit(stepL)).otherwise(lit(stepR))
        model += ((tr.toLong, feat, v, stepL, stepR))
      }
      import s.implicits._
      s.createDataset(model.toSeq)
        .toDF("round", "feature", "threshold", "step_left_mc",
          "step_right_mc")
    }),

    // SMOTE-style minority oversampling (Chawla et al. 2002), the
    // deterministic k=1 form: for every vector of the LEAST-frequent
    // label (the class a training pipeline would rebalance), find its
    // nearest same-class neighbor by ppm-quantized cosine (smallest-id
    // tiebreak) and synthesize the midpoint x̃ = (x + nn)/2 — published
    // as an index-ordered ppm checksum so the full synthetic vector is
    // hash-pinned without dumping dims as rows. The minority set rides a
    // broadcast self-join (queries = the minority class, the knn-label
    // shape): |minority|² similarity kernels inside whole-stage codegen
    // via the native cosine_similarity Expression. At corpus scale the
    // neighbor-candidate stage swaps to the IVF index (llm_ann_ivf) —
    // the brute pairing here is the exactness anchor, same adjudication
    // as llm_cosine_topk.
    "ml_smote_midpoints" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").filter(size(col("embedding")) > 0)
      val minoLab = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("n"), col("label")).limit(1)
        .select(col("label").as("mlabel"))
      val mino = emb.join(broadcast(minoLab), col("label") === col("mlabel"))
        .select(col("vec_id"), col("embedding"))
      val pairs = mino.alias("a")
        .join(broadcast(mino.alias("b")),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
          expr("CAST(floor(1e6 * cosine_similarity(a.embedding," +
            " b.embedding) + 0.5) AS BIGINT)").as("sim_ppm"),
          expr("CAST(floor(1e6 * aggregate(zip_with(" +
            "CAST(a.embedding AS ARRAY<DOUBLE>)," +
            " CAST(b.embedding AS ARRAY<DOUBLE>)," +
            " (x, y) -> (x + y) / 2.0), 0D, (acc, v) -> acc + v) + 0.5)" +
            " AS BIGINT)").as("mid_sum_ppm"),
          size(col("a.embedding")).as("n_dims"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("sim_ppm").desc, col("nbr"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("src"), col("nbr"), col("sim_ppm"), col("mid_sum_ppm"),
          col("n_dims"))
    }),

    // Ridge regression = the SAME normal-equation machinery with λ added
    // to the feature diagonal (intercept unpenalized) — regularized
    // training costs nothing extra at scale: identical one-pass moments,
    // one extra addition before the Cramer solve. λ = 10000 (raw units;
    // documented, not tuned — the operator contract is the algebra).
    // Poisson regression (count GLM) via 3 Newton steps: rate
    // μ = E(w0 + w1·x) with the rational exp [[rationalExp]] (libm-free),
    // y = quantity (a count), x = discount%/10. Each step is ONE
    // aggregate of five per-row contributions (μ, μx, μx², μ−y, (μ−y)x)
    // quantized to the 1e-6 grid as BIGINTs summed in decimal(38,0) —
    // order-independent — and the 2×2 Newton solve is one identical
    // double-formula text on both engines (the gdFit update pattern).
    // The driver holds 2 scalars; nothing data-sized leaves the executors.
    "ml_poisson_reg" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        round(col("l_quantity")).cast("double").as("y"),
        (round(col("l_discount") * 100).cast("double") / 10.0).as("x"))
        .ckpt(eager = false) // 3 Newton passes + the report pass
      def q(e: Column) = sum(round(e * lit(1e6)).cast("bigint")
        .cast("decimal(38,0)"))
      val (w0f, w1f) = poissonCache.getOrElseUpdate(d, {
        // Newton from w = 0 overshoots catastrophically on a log-link
        // (at mu = 1 the Hessian is tiny vs the gradient; the first step
        // jumped w0 to ~24). Seed the intercept by INVERTING the rational
        // exp at the mean rate: w0 = 32*((sy/n)^(1/32) - 1) via five
        // sqrts — sqrt is IEEE correctly-rounded on both engines (unlike
        // libm exp/ln), and E(w0) = mean(y) EXACTLY by construction, so
        // Newton starts at the intercept-only optimum and only refines.
        val sd = raw.agg(count(lit(1)).cast("double"),
          sum(col("y").cast("decimal(38,0)")).cast("double")).head()
        val m = sd.getDouble(1) / sd.getDouble(0)
        var w0 = 32.0 * (math.sqrt(math.sqrt(math.sqrt(math.sqrt(
          math.sqrt(m))))) - 1.0)
        var w1 = 0.0
        for (_ <- 1 to 3) {
          val mu = rationalExp(lit(w0) + lit(w1) * col("x"))
          val r = raw.agg(q(mu), q(mu * col("x")),
            q(mu * col("x") * col("x")),
            q(mu - col("y")), q((mu - col("y")) * col("x"))).head()
          def gv(i: Int) = r.getDecimal(i).doubleValue / 1e6
          val h00 = gv(0); val h01 = gv(1); val h11 = gv(2)
          val g0 = gv(3); val g1 = gv(4)
          val det = h00 * h11 - h01 * h01
          w0 = w0 - (h11 * g0 - h01 * g1) / det
          w1 = w1 - (h00 * g1 - h01 * g0) / det
        }
        (w0, w1)
      })
      val mu = rationalExp(lit(w0f) + lit(w1f) * col("x"))
      raw.agg(
        round(lit(w0f), 6).as("w0"), round(lit(w1f), 6).as("w1"),
        count(lit(1)).as("n"),
        // goodness check: total fitted rate vs total observed count (a
        // converged Poisson fit with an intercept matches totals exactly;
        // 3 Newton steps land within ~1e-4) — exact-grid numerator, the
        // y sum is integer-valued doubles (exact at any order)
        floor(lit(1e6) * ((q(mu).cast("double") / lit(1e6)) / sum(col("y")))
          + lit(0.5)).cast("long").as("fit_ratio_ppm"))
    }),

    // Huber robust regression via 2 unrolled IRLS steps — the
    // outlier-resistant sibling of ml_linreg (OLS lets one fat-tailed
    // row drag the fit; Huber caps each row's influence at k). 1-feature
    // price ~ quantity model. NUMERICS (the kmeans-iterate discipline
    // applied to IRLS): the OLS seed (a, b, k = 1.345·RMSE) comes from
    // exact integer sums with single divisions; per-row residuals are
    // ~3 FP ops on identical operands (bit-identical both engines); the
    // Huber weight is quantized to a ppm INTEGER before any sum, so
    // every weighted moment is an exact decimal(38,0) aggregate and the
    // 2-step trajectory cannot drift with summation order (r = 0 rows:
    // k/0 = +Inf → least(1, Inf) = 1 on both engines). Scale shape:
    // 3 full-scan aggregates total (OLS + one per IRLS step), each
    // map-side combined; the 1-row coefficient frame broadcasts back —
    // no driver loop over data.
    "ml_huber_irls" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        round(col("l_extendedprice") * 100).cast("bigint").as("y"),
        round(col("l_quantity")).cast("bigint").as("x"))
        .ckpt(eager = false) // OLS + 2 IRLS aggregates read it
      def dsum(e: Column) = sum(e.cast("decimal(38,0)")).cast("double")
      val ols = raw.agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
          dsum(col("x") * col("x")).as("sxx"),
          dsum(col("x") * col("y")).as("sxy"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr("n", "sx", "sy", "sxy", "syy",
          "(n*sxy - sx*sy) / (n*sxx - sx*sx) AS b")
        .selectExpr("n", "sxy", "syy", "sy", "b",
          "(sy - b*sx) / n AS a")
        .selectExpr("b", "a",
          "1.345 * sqrt(greatest(0.0, (syy - a*sy - b*sxy) / n)) AS k",
          "CAST(0 AS BIGINT) AS nd")
      def irls(coef: DataFrame): DataFrame = raw
        .crossJoin(broadcast(coef.select(col("a"), col("b"), col("k"))))
        .withColumn("r", col("y").cast("double") - col("a")
          - col("b") * col("x").cast("double"))
        .withColumn("w", floor(lit(1e6)
          * least(lit(1.0), col("k") / abs(col("r"))) + lit(0.5))
          .cast("long"))
        .agg(max(col("k")).as("k"),
          sum(when(col("w") < 1000000L, 1L).otherwise(0L)).as("nd"),
          dsum(col("w")).as("sw"),
          dsum(col("w") * col("x")).as("swx"),
          dsum(col("w") * col("y")).as("swy"),
          dsum(col("w") * col("x") * col("x")).as("swxx"),
          dsum(col("w") * col("x") * col("y")).as("swxy"))
        .selectExpr(huberC1: _*).selectExpr(huberC2: _*)
      val fit = irls(irls(ols))
      ols.select(round(col("a"), 6).as("a_ols"),
          round(col("b"), 6).as("b_ols"),
          round(col("k"), 6).as("k_cents"))
        .crossJoin(fit.select(round(col("a"), 6).as("a_huber"),
          round(col("b"), 6).as("b_huber"), col("nd").as("n_downweighted")))
    }),

    // per-group OLS — the "many models" pattern (one price model PER
    // SUPPLIER NATION): the ml_linreg closed form evaluated from ONE
    // grouped aggregate of exact integer sufficient statistics. No
    // per-group iteration, no driver loop — adding groups adds rows to a
    // map-side-combined hash aggregate, not jobs, which is how "fit a
    // model per segment" runs at 100 TB (contrast with looping a
    // single-model fit per segment: |groups| full scans). Numerics are
    // ml_linreg's verbatim: per-group sums are subsets of the global sums
    // that entry already proves exact in decimal(28,0) → double.
    "ml_group_linreg" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val su = t(s, d, "supplier")
      val raw = li.join(su, li("l_suppkey") === su("s_suppkey"))
        .select(su("s_nationkey").cast("bigint").as("g"),
          round(col("l_extendedprice") * 100).cast("bigint").as("y"),
          round(col("l_quantity")).cast("bigint").as("x1"),
          round(col("l_discount") * 100).cast("bigint").as("x2"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      raw.groupBy(col("g")).agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
          dsum(col("x1") * col("x1")).as("s11"),
          dsum(col("x1") * col("x2")).as("s12"),
          dsum(col("x2") * col("x2")).as("s22"),
          dsum(col("y")).as("sy"),
          dsum(col("x1") * col("y")).as("s1y"),
          dsum(col("x2") * col("y")).as("s2y"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr(("g" +: linregL1): _*)
        .selectExpr(("g" +: linregL2): _*)
        .selectExpr(("g" +: linregL3): _*)
    }),

    "ml_ridge" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        round(col("l_extendedprice") * 100).cast("bigint").as("y"),
        round(col("l_quantity")).cast("bigint").as("x1"),
        round(col("l_discount") * 100).cast("bigint").as("x2"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      raw.agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
          dsum(col("x1") * col("x1")).as("s11r"),
          dsum(col("x1") * col("x2")).as("s12"),
          dsum(col("x2") * col("x2")).as("s22r"),
          dsum(col("y")).as("sy"),
          dsum(col("x1") * col("y")).as("s1y"),
          dsum(col("x2") * col("y")).as("s2y"),
          dsum(col("y") * col("y")).as("syy"))
        .selectExpr("n", "s1", "s2", "s12", "sy", "s1y", "s2y", "syy",
          "s11r + 10000.0 AS s11", "s22r + 10000.0 AS s22")
        .selectExpr(linregL1: _*).selectExpr(linregL2: _*)
        .selectExpr(linregL3.filter(_.contains(" AS b")): _*)
    }),

    // 5-fold cross-validation of the OLS model WITHOUT retraining scans:
    // per-fold moment sums come from ONE grouped aggregate, and each
    // leave-fold-out model solves on (total − fold) moments — the
    // sufficient-statistics algebra that makes k-fold CV a single pass
    // at any scale. Out-of-sample scoring joins each row to its fold's
    // 5-row broadcast model. Moments are exact integers; the solve and
    // the residual accumulation reuse the shared Cramer texts.
    // `raw` is deliberately NOT checkpointed: both consumers re-derive it
    // from a 4-column pruned parquet scan + row-local arithmetic, which
    // is cheaper to recompute than a corpus-sized localCheckpoint is to
    // write AND hold in the block manager — and at 100 TB materializing
    // the full projection on executors is not an option at all.
    "ml_kfold_cv" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        pmod(col("l_orderkey"), lit(5)).as("fold"),
        round(col("l_extendedprice") * 100).cast("bigint").as("y"),
        round(col("l_quantity")).cast("bigint").as("x1"),
        round(col("l_discount") * 100).cast("bigint").as("x2"))
      def dsum(e: Column) = sum(e.cast("decimal(28,0)")).cast("double")
      val byFold = raw.groupBy(col("fold")).agg(
        count(lit(1)).cast("double").as("fn"),
        dsum(col("x1")).as("f1"), dsum(col("x2")).as("f2"),
        dsum(col("x1") * col("x1")).as("f11"),
        dsum(col("x1") * col("x2")).as("f12"),
        dsum(col("x2") * col("x2")).as("f22"),
        dsum(col("y")).as("fy"),
        dsum(col("x1") * col("y")).as("f1y"),
        dsum(col("x2") * col("y")).as("f2y"),
        dsum(col("y") * col("y")).as("fyy"))
      // leave-fold-out moments = column-wise (total − fold) over the
      // 5-row fold table (bounded window)
      val wAll = Window.partitionBy()
      val loo = byFold.select(col("fold") +:
        Seq("fn" -> "n", "f1" -> "s1", "f2" -> "s2", "f11" -> "s11",
          "f12" -> "s12", "f22" -> "s22", "fy" -> "sy", "f1y" -> "s1y",
          "f2y" -> "s2y", "fyy" -> "syy").map { case (f, o) =>
          (sum(col(f)).over(wAll) - col(f)).as(o)
        }: _*)
      val models = loo
        .selectExpr("fold" +: linregL1: _*)
        .selectExpr("fold" +: linregL2.filter(_.contains(" AS b")): _*)
      raw.join(broadcast(models), Seq("fold"))
        .select(col("fold"),
          (col("y").cast("double") - ((col("b0") + col("b1") * col("x1"))
            + col("b2") * col("x2"))).as("e"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_oos"),
          round(sqrt(sum(col("e") * col("e")) / count(lit(1))) / 100.0, 4)
            .as("oos_rmse_dollars"))
        .join(broadcast(models.select(col("fold"),
          round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
          round(col("b2"), 6).as("b2"))), Seq("fold"))
    }),

    // Apriori: frequent brands (support ≥ 10%) → pairs among frequent
    // only → directional rules at support ≥ 2%, confidence ≥ 12%. Every threshold is an
    // integer cross-multiplication — no FP boundary can flip membership.
    // r14 shape: ONE corpus-wide shuffle, and for item domains that fit a
    // long BITMASK (≤62 — TPC-H has 25 brands) the basket aggregate is
    // bit_or over (1L << brand_bit): a codegen DeclarativeAggregate with
    // an 8-byte partial buffer, so the exchange ships one long per
    // (map-partition, order) instead of a serialized set buffer, and
    // nothing falls back to sort-based aggregation (the evt_type_overlap
    // machinery). Identical baskets then collapse into a mask HISTOGRAM
    // (one row per observed brand combination, pair fan-out weighted by
    // its count), so pair volume is |distinct masks| · C(k,2), never
    // |orders| · C(k,2). Bit index = rank of the brand in sorted order,
    // so decoded arrays are sorted and the i<j generators emit each pair
    // once; names re-attach from a broadcast ≤62-row table at the end.
    // Wider domains keep the single-shuffle collect_set form (a bounded
    // probe picks the path — fallback, never failure).
    "ml_apriori_rules" -> ((s, d) => {
      val raw = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      // domain probe off the DIMENSION table (every joined brand is in
      // part); 63 means "wider than a long mask" → array fallback
      val brands = t(s, d, "part").select(col("p_brand")).distinct()
        .orderBy(col("p_brand")).limit(63).collect().map(_.getString(0))
      if (brands.length <= 62) {
        val bit = brands.zipWithIndex.foldLeft(lit(0L)) {
          case (acc, (b, i)) =>
            when(col("item") === b, lit(1L << i)).otherwise(acc)
        }
        val hist = raw.select(col("ok"), bit.as("b"))
          .groupBy(col("ok")).agg(bit_or(col("b")).as("mask"))
          .groupBy(col("mask")).agg(count(lit(1)).as("n"))
          .withColumn("bits", expr(
            "filter(sequence(0, 61), b -> (shiftright(mask, b) & 1) = 1)"))
          .ckpt(eager = false) // basket-pattern histogram feeds 3 legs
        val nb = hist.select(sum(col("n")).as("nn"))
        val freq = hist.select(explode(col("bits")).as("i"), col("n"))
          .groupBy(col("i")).agg(sum(col("n")).as("cnt"))
          .crossJoin(broadcast(nb))
          .filter(col("cnt") * 10 >= col("nn"))  // item support ≥ 0.10
          .select(col("i"), col("cnt"), col("nn"))
        // frequent set as a literal-shaped 1-row mask (OR of frequent bits)
        val fqm = freq.agg(sum(expr("shiftleft(1L, i)")).as("fqmask"))
        val pairs = hist
          .crossJoin(broadcast(fqm))
          .select(col("n"), expr(
            "filter(bits, b -> (shiftright(fqmask, b) & 1) = 1)").as("bits"))
          .filter(size(col("bits")) >= 2)
          .select(col("n"), col("bits"),
            posexplode(col("bits")).as(Seq("pi", "i1")))
          .select(col("n"), col("i1"), explode(expr(
            "slice(bits, pi + 2, size(bits) - pi - 1)")).as("i2"))
          .groupBy(col("i1"), col("i2"))
          .agg(sum(col("n")).as("n_both"))
        val both = pairs.select(col("i1").as("ai"), col("i2").as("ci"),
            col("n_both"))
          .union(pairs.select(col("i2"), col("i1"), col("n_both")))
        import s.implicits._
        val names = s.createDataset(
          brands.zipWithIndex.map { case (b, i) => (i, b) }.toSeq)
          .toDF("idx", "brand")
        both
          .join(broadcast(freq.select(col("i").as("ai"),
            col("cnt").as("n_a"))), Seq("ai"))
          .join(broadcast(freq.select(col("i").as("ci"),
            col("cnt").as("n_c"), col("nn"))), Seq("ci"))
          .filter(col("n_both") * 50 >= col("nn"))       // pair support ≥ 0.02
          .filter(col("n_both") * 25 >= col("n_a") * 3)  // confidence ≥ 0.12
          .join(broadcast(names.select(col("idx").as("ai"),
            col("brand").as("ante"))), Seq("ai"))
          .join(broadcast(names.select(col("idx").as("ci"),
            col("brand").as("cons"))), Seq("ci"))
          .select(col("ante"), col("cons"), col("n_both"),
            round(col("n_both").cast("double") / col("nn").cast("double"), 6)
              .as("support"),
            round(col("n_both").cast("double") / col("n_a").cast("double"), 6)
              .as("conf"),
            round(col("n_both").cast("double") * col("nn").cast("double") /
              (col("n_a").cast("double") * col("n_c").cast("double")), 6)
              .as("lift"))
      } else {
        val baskets = raw
          .groupBy(col("ok"))
          .agg(sort_array(collect_set(col("item"))).as("its"))
          .ckpt(eager = false) // basket universe feeds 3 legs
        val nb = baskets.select(count(lit(1)).as("nn"))
        val freq = baskets.select(explode(col("its")).as("item"))
          .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(nb))
          .filter(col("cnt") * 10 >= col("nn"))  // item support ≥ 0.10
          .select(col("item"), col("cnt"), col("nn"))
        val fset = freq.agg(sort_array(collect_set(col("item"))).as("fq"))
        val pairs = baskets
          .crossJoin(broadcast(fset))
          .select(expr("filter(its, x -> array_contains(fq, x))").as("its"))
          .filter(size(col("its")) >= 2)
          .select(col("its"), posexplode(col("its")).as(Seq("i", "i1")))
          .select(col("i1"), explode(expr(
            "slice(its, i + 2, size(its) - i - 1)")).as("i2"))
          .groupBy(col("i1"), col("i2"))
          .agg(count(lit(1)).as("n_both"))
        val both = pairs.select(col("i1").as("ante"), col("i2").as("cons"),
            col("n_both"))
          .union(pairs.select(col("i2"), col("i1"), col("n_both")))
        both
          .join(broadcast(freq.select(col("item").as("ante"),
            col("cnt").as("n_a"))), Seq("ante"))
          .join(broadcast(freq.select(col("item").as("cons"),
            col("cnt").as("n_c"), col("nn"))), Seq("cons"))
          .filter(col("n_both") * 50 >= col("nn"))       // pair support ≥ 0.02
          .filter(col("n_both") * 25 >= col("n_a") * 3)  // confidence ≥ 0.12
          .select(col("ante"), col("cons"), col("n_both"),
            round(col("n_both").cast("double") / col("nn").cast("double"), 6)
              .as("support"),
            round(col("n_both").cast("double") / col("n_a").cast("double"), 6)
              .as("conf"),
            round(col("n_both").cast("double") * col("nn").cast("double") /
              (col("n_a").cast("double") * col("n_c").cast("double")), 6)
              .as("lift"))
      }
    }))

  private def sel(exprs: Seq[String]) = exprs.mkString(", ")

  private val logregCtes =
    """raw AS (
        |  SELECT CAST(ROUND(l_quantity) AS DOUBLE)/50.0 AS x1,
        |         CAST(ROUND(l_discount*100) AS DOUBLE)/10.0 AS x2,
        |         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS yy
        |  FROM lineitem),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM raw),
        |s0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
        |g1 AS (
        |  SELECT
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * 1.0 * 1e12) AS BIGINT)) AS g0,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x1 * 1e12) AS BIGINT)) AS g1,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x2 * 1e12) AS BIGINT)) AS g2
        |  FROM raw, s0),
        |s1 AS (SELECT w0 - 2.0*((CAST(g0 AS DOUBLE)/1e12)/n) AS w0,
        |              w1 - 2.0*((CAST(g1 AS DOUBLE)/1e12)/n) AS w1,
        |              w2 - 2.0*((CAST(g2 AS DOUBLE)/1e12)/n) AS w2
        |       FROM s0, g1, nn),
        |g2 AS (
        |  SELECT
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * 1.0 * 1e12) AS BIGINT)) AS g0,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x1 * 1e12) AS BIGINT)) AS g1,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x2 * 1e12) AS BIGINT)) AS g2
        |  FROM raw, s1),
        |s2 AS (SELECT w0 - 2.0*((CAST(g0 AS DOUBLE)/1e12)/n) AS w0,
        |              w1 - 2.0*((CAST(g1 AS DOUBLE)/1e12)/n) AS w1,
        |              w2 - 2.0*((CAST(g2 AS DOUBLE)/1e12)/n) AS w2
        |       FROM s1, g2, nn),
        |g3 AS (
        |  SELECT
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * 1.0 * 1e12) AS BIGINT)) AS g0,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x1 * 1e12) AS BIGINT)) AS g1,
        |    sum(CAST(round((0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) - yy) * x2 * 1e12) AS BIGINT)) AS g2
        |  FROM raw, s2),
        |s3 AS (SELECT w0 - 2.0*((CAST(g0 AS DOUBLE)/1e12)/n) AS w0,
        |              w1 - 2.0*((CAST(g1 AS DOUBLE)/1e12)/n) AS w1,
        |              w2 - 2.0*((CAST(g2 AS DOUBLE)/1e12)/n) AS w2
        |       FROM s2, g3, nn)"""
      .stripMargin

  private val nbCtes =
    """toks AS (
        |  SELECT doc_id, lang, w
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |        FROM documents)
        |  WHERE w <> ''),
        |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
        |counts AS (SELECT lang AS cls, w, count(*) AS cnt
        |           FROM train GROUP BY 1, 2),
        |classes AS (SELECT lang AS cls, count(*) AS tot,
        |                   count(DISTINCT doc_id) AS nd
        |            FROM train GROUP BY 1),
        |consts AS (SELECT count(DISTINCT w) AS v,
        |                  count(DISTINCT doc_id) AS ndall
        |           FROM train),
        |test_tf AS (SELECT doc_id, lang AS actual, w, count(*) AS tf
        |            FROM toks WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT t.doc_id, t.actual, c.cls,
        |         CAST(sum(t.tf * CAST(floor(
        |                 1e6 * ln(CAST(coalesce(k.cnt, 0) + 1 AS DOUBLE)
        |                          / CAST(c.tot + s.v AS DOUBLE)) + 0.5)
        |               AS BIGINT))
        |           + CAST(floor(1e6 * ln(CAST(c.nd AS DOUBLE)
        |                                 / CAST(s.ndall AS DOUBLE)) + 0.5)
        |               AS BIGINT)
        |           AS BIGINT) AS score_ppm
        |  FROM test_tf t
        |  CROSS JOIN classes c
        |  CROSS JOIN consts s
        |  LEFT JOIN counts k ON k.cls = c.cls AND k.w = t.w
        |  GROUP BY t.doc_id, t.actual, c.cls, c.nd, s.ndall)"""
      .stripMargin

  /** ml_gbm_stumps twin: the per-cell prediction adjustment of an
    * already-chosen stump `w` (CTE alias), as applied to cell alias `c`. */
  private def gbmStep(w: String): String =
    s"(CASE WHEN ($w.feat = 'q' AND c.q <= $w.v)" +
      s" OR ($w.feat = 'dc' AND c.dc <= $w.v)" +
      s" THEN $w.stepl ELSE $w.stepr END)"

  /** One unrolled boosting round for the ml_gbm_stumps twin: residuals
    * against `pred` (exact BIGINT milli-cents), per-feature cumulative
    * split candidates, and the 1-row winner w$i — mirroring the engine's
    * bounded per-round probe. `from` lists the CTEs pred references. */
  private def gbmRound(i: Int, from: String, pred: String): String =
    s"""r$i AS (
       |  SELECT c.q, c.dc, c.n, c.sy * 1000 - c.n * ($pred) AS r
       |  FROM $from
       |), bq$i AS (
       |  SELECT q AS v, sum(n) AS cn0, sum(r) AS cr0 FROM r$i GROUP BY 1
       |), bd$i AS (
       |  SELECT dc AS v, sum(n) AS cn0, sum(r) AS cr0 FROM r$i GROUP BY 1
       |), cq$i AS (
       |  SELECT 'q' AS feat, v,
       |         sum(cn0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS cn,
       |         sum(cr0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS cr
       |  FROM bq$i
       |), cd$i AS (
       |  SELECT 'dc' AS feat, v,
       |         sum(cn0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS cn,
       |         sum(cr0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS cr
       |  FROM bd$i
       |), t$i AS (SELECT sum(n) AS tn, sum(r) AS tr FROM r$i),
       |w$i AS (
       |  SELECT feat, v,
       |         CAST(floor(0.5 * CAST(cr AS DOUBLE) / CAST(cn AS DOUBLE)
       |           + 0.5) AS BIGINT) AS stepl,
       |         CAST(floor(0.5 * CAST(tr - cr AS DOUBLE)
       |           / CAST(tn - cn AS DOUBLE) + 0.5) AS BIGINT) AS stepr
       |  FROM (SELECT * FROM cq$i UNION ALL SELECT * FROM cd$i), t$i
       |  WHERE cn < tn
       |  ORDER BY (CAST(cr AS DOUBLE) * CAST(cr AS DOUBLE)
       |              / CAST(cn AS DOUBLE)
       |            + CAST(tr - cr AS DOUBLE) * CAST(tr - cr AS DOUBLE)
       |              / CAST(tn - cn AS DOUBLE)) DESC, feat, v
       |  LIMIT 1
       |)""".stripMargin

  val sql: Map[String, String] = Map(
    "ml_gbm_stumps" -> s"""
      WITH cells AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(round(l_discount * 100) AS BIGINT) AS dc,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS sy
        FROM lineitem GROUP BY 1, 2
      ), m0 AS (
        SELECT CAST(floor(1000.0 * CAST(sum(sy) AS DOUBLE)
          / CAST(sum(n) AS DOUBLE) + 0.5) AS BIGINT) AS m FROM cells
      ),
      ${gbmRound(1, "cells c, m0 m", "m.m")},
      ${gbmRound(2, "cells c, m0 m, w1",
                 s"m.m + ${gbmStep("w1")}")},
      ${gbmRound(3, "cells c, m0 m, w1, w2",
                 s"m.m + ${gbmStep("w1")} + ${gbmStep("w2")}")}
      SELECT CAST(1 AS BIGINT) AS round, feat AS feature, v AS threshold,
             stepl AS step_left_mc, stepr AS step_right_mc FROM w1
      UNION ALL
      SELECT CAST(2 AS BIGINT), feat, v, stepl, stepr FROM w2
      UNION ALL
      SELECT CAST(3 AS BIGINT), feat, v, stepl, stepr FROM w3""",

    // minority 1-NN + midpoint checksum, index-ordered folds (the MMR
    // twin discipline) so every double matches the engine bit-for-bit
    "ml_smote_midpoints" -> """
      WITH cnt AS (
        SELECT label, count(*) AS n FROM embeddings
        WHERE len(embedding) > 0 GROUP BY 1
      ), ml AS (
        SELECT label AS mlabel FROM cnt ORDER BY n, label LIMIT 1
      ), mino AS (
        SELECT vec_id, embedding FROM embeddings, ml
        WHERE label = mlabel AND len(embedding) > 0
      ), pos AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM mino
      ), sims AS (
        -- zero-norm guard mirrors the engine (CosineSimilarity.scala:46
        -- returns 0.0 when either norm is 0): an all-zero embedding
        -- passes len>0 but must score sim 0, not NULL/Inf (ADVICE r12)
        SELECT qa.vec_id AS src, qb.vec_id AS nbr,
               CASE WHEN list_aggregate(list(qa.x * qa.x ORDER BY qa.i),
                            'sum') = 0
                      OR list_aggregate(list(qb.x * qb.x ORDER BY qa.i),
                            'sum') = 0
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor(1e6 *
                 list_aggregate(list(qa.x * qb.x ORDER BY qa.i), 'sum')
                 / sqrt(list_aggregate(list(qa.x * qa.x ORDER BY qa.i),
                          'sum')
                      * list_aggregate(list(qb.x * qb.x ORDER BY qa.i),
                          'sum')) + 0.5) AS BIGINT) END AS sim_ppm,
               CAST(floor(1e6 *
                 list_aggregate(list((qa.x + qb.x) / 2.0 ORDER BY qa.i),
                   'sum') + 0.5) AS BIGINT) AS mid_sum_ppm,
               CAST(count(*) AS INT) AS n_dims
        FROM pos qa JOIN pos qb
          ON qa.i = qb.i AND qa.vec_id <> qb.vec_id
        GROUP BY 1, 2
      )
      SELECT src, nbr, sim_ppm, mid_sum_ppm, n_dims
      FROM (SELECT *, row_number() OVER (PARTITION BY src
              ORDER BY sim_ppm DESC, nbr) AS rn FROM sims)
      WHERE rn = 1""",


    "ml_poisson_reg" -> {
      // rational-exp stage: u = max(1 + (w0 + w1·x)/32, 0), five
      // squarings — mirrors [[rationalExp]] term for term; carries
      // (y, x, w0, w1) through for the consumers
      def muSub(coef: String): String =
        s"""SELECT y, x, w0, w1, u16*u16 AS mu FROM (
          |   SELECT y, x, w0, w1, u8*u8 AS u16 FROM (
          |    SELECT y, x, w0, w1, u4*u4 AS u8 FROM (
          |     SELECT y, x, w0, w1, u2*u2 AS u4 FROM (
          |      SELECT y, x, w0, w1, u*u AS u2 FROM (
          |       SELECT r.y, r.x, c.w0, c.w1,
          |              greatest(1.0 + (c.w0 + c.w1*r.x)/32.0, 0.0) AS u
          |       FROM raw r, $coef c)))))""".stripMargin
      def newtonStage(prev: String, k: Int): String =
        s"""g$k AS (
          |  SELECT
          |    sum(CAST(round(mu * 1e6) AS BIGINT)) AS h00,
          |    sum(CAST(round(mu * x * 1e6) AS BIGINT)) AS h01,
          |    sum(CAST(round(mu * x * x * 1e6) AS BIGINT)) AS h11,
          |    sum(CAST(round((mu - y) * 1e6) AS BIGINT)) AS g0,
          |    sum(CAST(round((mu - y) * x * 1e6) AS BIGINT)) AS g1
          |  FROM (${muSub(prev)})),
          |d$k AS (SELECT w0, w1,
          |          CAST(h00 AS DOUBLE)/1e6 AS h00,
          |          CAST(h01 AS DOUBLE)/1e6 AS h01,
          |          CAST(h11 AS DOUBLE)/1e6 AS h11,
          |          CAST(g0 AS DOUBLE)/1e6 AS g0,
          |          CAST(g1 AS DOUBLE)/1e6 AS g1
          |        FROM g$k, $prev),
          |e$k AS (SELECT *, h00*h11 - h01*h01 AS det FROM d$k),
          |p$k AS (SELECT w0 - (h11*g0 - h01*g1)/det AS w0,
          |               w1 - (h00*g1 - h01*g0)/det AS w1 FROM e$k)"""
          .stripMargin
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_quantity) AS DOUBLE) AS y,
        |         CAST(ROUND(l_discount*100) AS DOUBLE)/10.0 AS x
        |  FROM lineitem),
        |p0 AS (SELECT 32.0*(sqrt(sqrt(sqrt(sqrt(sqrt(sy/n))))) - 1.0)
        |                AS w0, 0.0 AS w1
        |       FROM (SELECT CAST(count(*) AS DOUBLE) AS n,
        |                    CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) AS sy
        |             FROM raw)),
        |${newtonStage("p0", 1)},
        |${newtonStage("p1", 2)},
        |${newtonStage("p2", 3)}
        |SELECT round(w0, 6) AS w0, round(w1, 6) AS w1,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(floor(1e6 * ((CAST(sum(CAST(round(mu * 1e6) AS BIGINT))
        |              AS DOUBLE)/1e6) / sum(y)) + 0.5) AS BIGINT)
        |         AS fit_ratio_ppm
        |FROM (${muSub("p3")})
        |GROUP BY w0, w1""".stripMargin
    },

    "ml_huber_irls" -> {
      def irlsStage(coef: String, out: String): String = s"""
        |w_$out AS (
        |  SELECT max(k) AS k,
        |         CAST(sum(CASE WHEN w < 1000000 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS nd,
        |         CAST(sum(w) AS DOUBLE) AS sw,
        |         CAST(sum(w*x) AS DOUBLE) AS swx,
        |         CAST(sum(w*y) AS DOUBLE) AS swy,
        |         CAST(sum(w*x*x) AS DOUBLE) AS swxx,
        |         CAST(sum(w*x*y) AS DOUBLE) AS swxy
        |  FROM (SELECT r.x, r.y, c.k,
        |               CAST(floor(1e6 * least(1.0, c.k /
        |                 abs(CAST(r.y AS DOUBLE) - c.a
        |                     - c.b * CAST(r.x AS DOUBLE))) + 0.5)
        |                 AS BIGINT) AS w
        |        FROM raw r, $coef c)),
        |${out}a AS (SELECT ${sel(huberC1)} FROM w_$out),
        |$out AS (SELECT ${sel(huberC2)} FROM ${out}a)""".stripMargin
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x
        |  FROM lineitem),
        |sums AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x*x) AS DOUBLE) AS sxx,
        |         CAST(sum(x*y) AS DOUBLE) AS sxy,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw),
        |o1 AS (SELECT n, sx, sy, sxy, syy,
        |              (n*sxy - sx*sy) / (n*sxx - sx*sx) AS b FROM sums),
        |o2 AS (SELECT n, sxy, syy, sy, b, (sy - b*sx) / n AS a FROM o1),
        |ols AS (SELECT b, a,
        |               1.345 * sqrt(greatest(0.0, (syy - a*sy - b*sxy) / n))
        |                 AS k,
        |               CAST(0 AS BIGINT) AS nd FROM o2),
        |${irlsStage("ols", "c1")},
        |${irlsStage("c1", "c2")}
        |SELECT round(o.a, 6) AS a_ols, round(o.b, 6) AS b_ols,
        |       round(o.k, 6) AS k_cents,
        |       round(c2.a, 6) AS a_huber, round(c2.b, 6) AS b_huber,
        |       c2.nd AS n_downweighted
        |FROM ols o, c2""".stripMargin
    },

    "ml_group_linreg" ->
      s"""WITH raw AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS g,
        |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem li JOIN supplier s ON li.l_suppkey = s.s_suppkey),
        |sums AS (
        |  SELECT g, CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS s11,
        |         CAST(sum(x1*x2) AS DOUBLE) AS s12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS s22,
        |         CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x1*y) AS DOUBLE) AS s1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS s2y,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw GROUP BY g),
        |l1 AS (SELECT g, ${sel(linregL1)} FROM sums),
        |l2 AS (SELECT g, ${sel(linregL2)} FROM l1)
        |SELECT g, ${sel(linregL3)} FROM l2""".stripMargin,

    "ml_linreg" ->
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem),
        |sums AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS s11,
        |         CAST(sum(x1*x2) AS DOUBLE) AS s12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS s22,
        |         CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x1*y) AS DOUBLE) AS s1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS s2y,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw),
        |l1 AS (SELECT ${sel(linregL1)} FROM sums),
        |l2 AS (SELECT ${sel(linregL2)} FROM l1)
        |SELECT ${sel(linregL3)} FROM l2""".stripMargin,

    "ml_conformal_interval" ->
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2,
        |         CAST(l_orderkey % 5 AS INTEGER) AS split
        |  FROM lineitem),
        |sums AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS s11,
        |         CAST(sum(x1*x2) AS DOUBLE) AS s12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS s22,
        |         CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x1*y) AS DOUBLE) AS s1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS s2y,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw WHERE split >= 2),
        |l1 AS (SELECT ${sel(linregL1)} FROM sums),
        |l2 AS (SELECT ${sel(linregL2)} FROM l1),
        |w AS (SELECT round(b0, 6) AS b0, round(b1, 6) AS b1,
        |             round(b2, 6) AS b2 FROM l2),
        |scored AS MATERIALIZED (
        |  SELECT r.split,
        |         CAST(floor(1e4 * abs(r.y - (w.b0 + w.b1*r.x1 + w.b2*r.x2))
        |           + 0.5) AS BIGINT) AS score
        |  FROM raw r CROSS JOIN w WHERE r.split < 2),
        |kk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cal,
        |         (9 * (count(*) + 1) + 9) // 10 AS k
        |  FROM scored WHERE split = 0),
        |qh AS (
        |  SELECT kk.n_cal, CAST(kk.k AS BIGINT) AS k,
        |         s.score AS qhat_e4
        |  FROM (SELECT score, row_number() OVER (ORDER BY score) AS rn
        |        FROM scored WHERE split = 0) s
        |  JOIN kk ON s.rn = kk.k)
        |SELECT q.n_cal, q.k, q.qhat_e4,
        |       CAST(count(*) AS BIGINT) AS n_test,
        |       CAST(sum(CASE WHEN t.score <= q.qhat_e4 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS covered,
        |       CAST(floor(1e6 * sum(CASE WHEN t.score <= q.qhat_e4
        |           THEN 1 ELSE 0 END) / count(*) + 0.5) AS BIGINT)
        |         AS coverage_ppm,
        |       2 * q.qhat_e4 AS width_e4
        |FROM (SELECT score FROM scored WHERE split = 1) t
        |CROSS JOIN qh q
        |GROUP BY q.n_cal, q.k, q.qhat_e4""".stripMargin,

    "ml_pca" ->
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS y
        |  FROM lineitem),
        |sums AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x*x) AS DOUBLE) AS sxx,
        |         CAST(sum(x*y) AS DOUBLE) AS sxy,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw),
        |l1 AS (SELECT n, ${sel(pcaL1)} FROM sums),
        |l2 AS (SELECT ${sel(pcaL2)} FROM l1)
        |SELECT ${sel(pcaL3)} FROM l2""".stripMargin,

    "ml_logreg_gd" ->
      s"""WITH $logregCtes
        |SELECT round(w0, 6) AS w0, round(w1, 6) AS w1, round(w2, 6) AS w2,
        |       round(avg(CASE WHEN (((w0 + w1*x1) + w2*x2) >= 0) = (yy = 1.0)
        |                      THEN 1.0 ELSE 0.0 END), 6) AS acc
        |FROM raw, s3
        |GROUP BY w0, w1, w2""".stripMargin,

    "ml_naive_bayes" ->
      s"""WITH $nbCtes
        |SELECT doc_id, actual, cls AS pred, score_ppm
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_ppm DESC, cls) AS rn
        |      FROM scored)
        |WHERE rn = 1""".stripMargin,

    "ml_confusion" ->
      s"""WITH $nbCtes,
        |pred AS (
        |  SELECT actual, cls AS pred FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_ppm DESC, cls) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |cl AS (SELECT DISTINCT lang AS cls FROM documents),
        |ba AS (SELECT actual AS cls, count(*) AS n_act,
        |              sum(CASE WHEN actual = pred THEN 1 ELSE 0 END) AS tp
        |       FROM pred GROUP BY actual),
        |bp AS (SELECT pred AS cls, count(*) AS n_pred FROM pred GROUP BY pred),
        |m AS (SELECT cl.cls, CAST(coalesce(ba.tp, 0) AS BIGINT) AS tp,
        |             CAST(coalesce(ba.n_act, 0) AS BIGINT) AS n_act,
        |             CAST(coalesce(bp.n_pred, 0) AS BIGINT) AS n_pred
        |      FROM cl LEFT JOIN ba ON ba.cls = cl.cls
        |              LEFT JOIN bp ON bp.cls = cl.cls)
        |SELECT ${sel(confusionSel)} FROM m""".stripMargin,

    "ml_cohens_kappa" ->
      s"""WITH $nbCtes,
        |pred AS (
        |  SELECT actual, cls AS pred FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_ppm DESC, cls) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |ba AS (SELECT actual AS cls, count(*) AS n_act,
        |              sum(CASE WHEN actual = pred THEN 1 ELSE 0 END) AS tp
        |       FROM pred GROUP BY actual),
        |bp AS (SELECT pred AS cls, count(*) AS n_pred FROM pred GROUP BY pred),
        |cells AS (
        |  SELECT coalesce(ba.tp, 0) AS tp, coalesce(ba.n_act, 0) AS n_act,
        |         coalesce(bp.n_pred, 0) AS n_pred
        |  FROM ba FULL JOIN bp ON bp.cls = ba.cls),
        |tot AS (
        |  SELECT CAST(sum(tp) AS BIGINT) AS tpsum,
        |         CAST(sum(n_act) AS BIGINT) AS nn,
        |         CAST(sum(n_act * n_pred) AS BIGINT) AS crossp
        |  FROM cells)
        |SELECT nn AS n,
        |       round(CAST(tpsum AS DOUBLE)/nn, 6) AS po,
        |       round(CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE)), 6) AS pe,
        |       round((CAST(tpsum AS DOUBLE)/nn - CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE))) / (1.0 - CAST(crossp AS DOUBLE)/(CAST(nn AS DOUBLE)*CAST(nn AS DOUBLE))), 6) AS kappa
        |FROM tot""".stripMargin,

    "ml_learning_curve" ->
      s"""WITH raw AS (
        |  SELECT l_orderkey % 5 AS fold,
        |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem),
        |byfold AS (
        |  SELECT fold, CAST(count(*) AS DOUBLE) AS fn,
        |         CAST(sum(x1) AS DOUBLE) AS f1, CAST(sum(x2) AS DOUBLE) AS f2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS f11,
        |         CAST(sum(x1*x2) AS DOUBLE) AS f12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS f22,
        |         CAST(sum(y) AS DOUBLE) AS fy,
        |         CAST(sum(x1*y) AS DOUBLE) AS f1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS f2y,
        |         CAST(sum(y*y) AS DOUBLE) AS fyy
        |  FROM raw WHERE fold <> 0 GROUP BY fold),
        |cum AS (
        |  SELECT fold AS k,
        |         sum(fn) OVER w AS n, sum(f1) OVER w AS s1,
        |         sum(f2) OVER w AS s2, sum(f11) OVER w AS s11,
        |         sum(f12) OVER w AS s12, sum(f22) OVER w AS s22,
        |         sum(fy) OVER w AS sy, sum(f1y) OVER w AS s1y,
        |         sum(f2y) OVER w AS s2y, sum(fyy) OVER w AS syy
        |  FROM byfold
        |  WINDOW w AS (ORDER BY fold ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW)),
        |l1 AS (SELECT k, n AS n_train, ${sel(linregL1)} FROM cum),
        |models AS (SELECT k, n_train,
        |                  ${sel(linregL2.filter(_.contains(" AS b")))}
        |           FROM l1),
        |scored AS (
        |  SELECT m.k, m.n_train,
        |         CAST(r.y AS DOUBLE) - ((m.b0 + m.b1 * r.x1) + m.b2 * r.x2)
        |           AS e
        |  FROM raw r CROSS JOIN models m
        |  WHERE r.fold = 0)
        |SELECT k, CAST(max(n_train) AS BIGINT) AS n_train,
        |       count(*) AS n_test,
        |       round(sqrt(sum(e*e) / count(*)) / 100.0, 4)
        |         AS test_rmse_dollars
        |FROM scored GROUP BY k ORDER BY k""".stripMargin,

    "ml_auc" ->
      s"""WITH $logregCtes,
        |zz AS (SELECT ((w0 + w1*x1) + w2*x2) AS v, yy FROM raw, s3),
        |byv AS (SELECT v, count(*) AS n_v,
        |               sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS n1_v
        |        FROM zz GROUP BY v),
        |cum AS (SELECT *, sum(n_v) OVER (ORDER BY v) AS cum_n FROM byv),
        |p AS (SELECT CAST(sum(n1_v) AS BIGINT) AS n1,
        |             CAST(sum(n_v - n1_v) AS BIGINT) AS n0,
        |             CAST(sum(n1_v * (2 * (cum_n - n_v) + n_v + 1)) AS BIGINT)
        |               AS r1x2
        |      FROM cum)
        |SELECT n1, n0, $aucSel
        |FROM p""".stripMargin,

    "ml_auc_delong" ->
      s"""WITH $logregCtes,
        |zz AS (SELECT ((w0 + w1*x1) + w2*x2) AS v, yy FROM raw, s3),
        |byv AS (SELECT v, count(*) AS n_v,
        |               sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS n1_v,
        |               count(*) - sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END)
        |                 AS n0_v
        |        FROM zz GROUP BY v),
        |cum AS (SELECT *, sum(n0_v) OVER (ORDER BY v) AS cum0,
        |               sum(n1_v) OVER (ORDER BY v) AS cum1 FROM byv),
        |tot AS (SELECT CAST(sum(n1_v) AS BIGINT) AS t1,
        |               CAST(sum(n0_v) AS BIGINT) AS t0 FROM byv),
        |pl AS (SELECT c.*, t.t1, t.t0,
        |              2 * (c.cum0 - c.n0_v) + c.n0_v AS p2,
        |              2 * (t.t1 - c.cum1) + c.n1_v AS q2
        |       FROM cum c, tot t),
        |m AS (SELECT CAST(max(t1) AS DOUBLE) AS n1,
        |             CAST(max(t0) AS DOUBLE) AS n0,
        |             CAST(sum(n1_v * p2) AS DOUBLE) AS sp,
        |             CAST(sum(n1_v * p2 * p2) AS DOUBLE) AS spp,
        |             CAST(sum(n0_v * q2) AS DOUBLE) AS sq,
        |             CAST(sum(n0_v * q2 * q2) AS DOUBLE) AS sqq
        |      FROM pl),
        |l1 AS (SELECT ${sel(delongL1)} FROM m)
        |SELECT ${sel(delongL2)} FROM l1""".stripMargin,

    "ml_calibration" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3)
        |SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |       count(*) AS n,
        |       round(avg(sg), 6) AS pred_rate,
        |       round(CAST(sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS obs_rate
        |FROM sc
        |GROUP BY least(CAST(floor(sg*200) AS BIGINT), 199)""".stripMargin,

    "ml_mcnemar" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, x1, yy
        |       FROM raw, s3),
        |p AS (
        |  SELECT CASE WHEN sg >= 0.5 THEN 1 ELSE 0 END AS gd,
        |         CASE WHEN x1 <= 0.5 THEN 1 ELSE 0 END AS st,
        |         CAST(yy AS BIGINT) AS y
        |  FROM sc),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN st = y AND gd <> y THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b,
        |         CAST(sum(CASE WHEN st <> y AND gd = y THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c
        |  FROM p)
        |SELECT n, b, c,
        |       CASE WHEN b + c > 0
        |            THEN CAST(floor(1e6 * (b - c) * (b - c) / (b + c)
        |                   + 0.5) AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS mcnemar_ppm
        |FROM agg""".stripMargin,

    "ml_vif" -> """
      WITH m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT)
                 AS sa,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                 AS HUGEINT) AS sb,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS saa,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT)
                 AS sbb,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT)
                 AS sab
        FROM lineitem),
      c AS (
        SELECT n, n * sab - sa * sb AS cov_n,
               n * saa - sa * sa AS va_n,
               n * sbb - sb * sb AS vb_n
        FROM m)
      SELECT CAST(n AS BIGINT) AS n,
             CAST(floor(1e6 * (CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))
               / (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE)) + 0.5)
               AS BIGINT) AS r2_ppm,
             CAST(floor(1e6 * (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE))
               / (CAST(va_n AS DOUBLE) * CAST(vb_n AS DOUBLE)
               - CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)) + 0.5)
               AS BIGINT) AS vif_ppm
      FROM c""",

    "ml_somers_d" ->
      s"""WITH $logregCtes,
        |zz AS (SELECT ((w0 + w1*x1) + w2*x2) AS v, yy FROM raw, s3),
        |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_v,
        |               CAST(sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END)
        |                    AS BIGINT) AS n1_v
        |        FROM zz GROUP BY v),
        |cum AS (SELECT *, CAST(sum(n_v) OVER (ORDER BY v) AS BIGINT)
        |                    AS cum_n,
        |               CAST(sum(n1_v) OVER (ORDER BY v) AS BIGINT)
        |                    AS cum_n1
        |        FROM byv),
        |agg AS (
        |  SELECT CAST(sum(n1_v) AS BIGINT) AS n1,
        |         CAST(sum(n_v - n1_v) AS BIGINT) AS n0,
        |         CAST(sum(n1_v * ((cum_n - n_v) - (cum_n1 - n1_v)))
        |              AS BIGINT) AS conc,
        |         CAST(sum((n_v - n1_v) * (cum_n1 - n1_v)) AS BIGINT)
        |              AS disc,
        |         CAST(sum(n1_v * (n_v - n1_v)) AS BIGINT) AS ties
        |  FROM cum)
        |SELECT n1, n0, conc, disc, ties,
        |       CAST(floor(1e6 * CAST(conc - disc AS DOUBLE)
        |         / CAST(n1 * n0 AS DOUBLE) + 0.5) AS BIGINT) AS somers_ppm
        |FROM agg""".stripMargin,

    "ml_lift_table" ->
      s"""WITH $logregCtes,
        |zz AS (SELECT ((w0 + w1*x1) + w2*x2) AS v, yy FROM raw, s3),
        |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_v,
        |               CAST(sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END)
        |                    AS BIGINT) AS n1_v
        |        FROM zz GROUP BY v),
        |cum AS (SELECT *, CAST(sum(n_v) OVER (ORDER BY v DESC)
        |                    AS BIGINT) AS cum_n
        |        FROM byv),
        |tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS nn,
        |               CAST(sum(n1_v) AS BIGINT) AS pp FROM byv),
        |dec AS (SELECT CAST(((cum_n - n_v) * 10) // nn AS BIGINT)
        |                 AS decile,
        |               CAST(sum(n_v) AS BIGINT) AS n,
        |               CAST(sum(n1_v) AS BIGINT) AS pos,
        |               CAST(max(nn) AS BIGINT) AS nn,
        |               CAST(max(pp) AS BIGINT) AS pp
        |        FROM cum, tot GROUP BY 1)
        |SELECT decile, n, pos,
        |       CAST(floor(1e6 * pos / n + 0.5) AS BIGINT) AS rate_ppm,
        |       CAST(floor(1e6 * CAST(pos * nn AS DOUBLE)
        |         / CAST(n * pp AS DOUBLE) + 0.5) AS BIGINT) AS lift_ppm,
        |       CAST(floor(1e6 * sum(pos) OVER (ORDER BY decile
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         / pp + 0.5) AS BIGINT) AS cum_gain_ppm
        |FROM dec""".stripMargin,

    "ml_isotonic" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |                CAST(count(*) AS BIGINT) AS n,
        |                CAST(sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END)
        |                     AS BIGINT) AS pos
        |         FROM sc GROUP BY 1),
        |cums AS (SELECT bin, n, pos,
        |                CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |                CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        |         FROM bins),
        |pairs AS (SELECT lo.bin AS i, hi.bin AS j,
        |                 CAST(hi.cp - (lo.cp - lo.pos) AS DOUBLE)
        |                   / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS a
        |          FROM cums lo JOIN cums hi ON lo.bin <= hi.bin),
        |sm AS (SELECT i, j, min(a) OVER (PARTITION BY i ORDER BY j DESC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS sm
        |       FROM pairs),
        |fit AS (SELECT j AS bin, max(sm) AS fit FROM sm GROUP BY 1)
        |SELECT b.bin, b.n, b.pos,
        |       CAST(floor(1e6 * b.pos / b.n + 0.5) AS BIGINT) AS raw_ppm,
        |       CAST(floor(1e6 * f.fit + 0.5) AS BIGINT) AS iso_ppm
        |FROM bins b JOIN fit f ON f.bin = b.bin""".stripMargin,

    "ml_mcc" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |cells AS (
        |  SELECT CASE WHEN sg >= 0.5 THEN 1 ELSE 0 END AS p,
        |         CAST(yy AS BIGINT) AS y
        |  FROM sc),
        |agg AS (
        |  SELECT CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS tp,
        |         CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS fp,
        |         CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS fn,
        |         CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS tn
        |  FROM cells)
        |SELECT tp, fp, fn, tn,
        |       CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0 AND (tn+fp) > 0
        |            AND (tn+fn) > 0 THEN
        |         CAST(floor(1e6 * (tp*tn - fp*fn) /
        |           sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)
        |           * CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE)) + 0.5)
        |           AS BIGINT) ELSE CAST(0 AS BIGINT) END AS mcc_ppm
        |FROM agg""".stripMargin,

    "ml_brier" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |q AS (
        |  SELECT CAST(floor(1e6 * (sg - yy) * (sg - yy) + 0.5) AS BIGINT)
        |           AS sq_ppm
        |  FROM sc)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(sq_ppm) AS BIGINT) AS brier_sum_ppm,
        |       CAST(floor(CAST(sum(sq_ppm) AS BIGINT)
        |         / CAST(count(*) AS BIGINT) + 0.5) AS BIGINT) AS brier_ppm
        |FROM q""".stripMargin,

    "ml_fairness_parity" -> """
      WITH g AS (
        SELECT o.o_orderpriority AS grp,
               CASE WHEN round(l_quantity) <= 25 THEN 1 ELSE 0 END AS pred,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      agg AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pred) AS BIGINT) AS n_pred_pos,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(pred * y) AS BIGINT) AS tp,
               CAST(sum(pred * (1 - y)) AS BIGINT) AS fp
        FROM g GROUP BY grp)
      SELECT grp, n,
             CAST(floor(1e6 * n_pred_pos / n + 0.5) AS BIGINT)
               AS pred_pos_ppm,
             CASE WHEN n_pos > 0
                  THEN CAST(floor(1e6 * tp / n_pos + 0.5) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS tpr_ppm,
             CASE WHEN n > n_pos
                  THEN CAST(floor(1e6 * fp / (n - n_pos) + 0.5) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS fpr_ppm
      FROM agg""",

    "ml_pr_curve" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (
        |  SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |         count(*) AS n,
        |         sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS np
        |  FROM sc GROUP BY 1),
        |cum AS (
        |  SELECT bin,
        |         CAST(sum(np) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |         CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        |  FROM bins),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS npos_total FROM bins)
        |SELECT bin, tp, pp,
        |       CAST(floor(1e6*tp/pp + 0.5) AS BIGINT) AS prec_ppm,
        |       CASE WHEN npos_total > 0 THEN
        |         CAST(floor(1e6*tp/npos_total + 0.5) AS BIGINT)
        |         ELSE 0 END AS rec_ppm
        |FROM cum, tot""".stripMargin,

    "ml_friedman_test" -> """
      WITH rows_ AS (
        SELECT o.o_orderpriority AS blk,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CASE WHEN round(l_quantity) <= 25 THEN 1 ELSE 0 END AS c1,
               CASE WHEN round(l_discount * 100) >= 5 THEN 1 ELSE 0 END
                 AS c2,
               CASE WHEN l_extendedprice >= 30000.0 THEN 1 ELSE 0 END
                 AS c3
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      perblk AS (
        SELECT blk,
               CAST(sum(CASE WHEN c1 = y THEN 1 ELSE 0 END) AS BIGINT)
                 AS r1,
               CAST(sum(CASE WHEN c2 = y THEN 1 ELSE 0 END) AS BIGINT)
                 AS r2,
               CAST(sum(CASE WHEN c3 = y THEN 1 ELSE 0 END) AS BIGINT)
                 AS r3
        FROM rows_ GROUP BY blk),
      longf AS (
        SELECT blk, CAST(1 AS BIGINT) AS clf, r1 AS rights FROM perblk
        UNION ALL SELECT blk, 2, r2 FROM perblk
        UNION ALL SELECT blk, 3, r3 FROM perblk),
      rk AS (
        SELECT a.blk, a.clf,
               CAST(2 * sum(CASE WHEN b.rights < a.rights
                            THEN 1 ELSE 0 END)
                 + sum(CASE WHEN b.rights = a.rights THEN 1 ELSE 0 END)
                 + 1 AS BIGINT) AS rank2
        FROM longf a JOIN longf b ON a.blk = b.blk
        GROUP BY a.blk, a.clf),
      rs AS (SELECT clf, CAST(sum(rank2) AS BIGINT) AS rsum2
             FROM rk GROUP BY clf),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(rsum2) AS BIGINT) AS tot2,
                     CAST(sum(rsum2 * rsum2) AS BIGINT) AS sq2 FROM rs),
      bb AS (SELECT k, sq2, CAST(tot2 // (k * (k + 1)) AS BIGINT) AS b
             FROM agg)
      SELECT b, k,
             CAST(floor(1e6 * (3.0 * sq2 / (b * k * (k + 1))
               - 3.0 * b * (k + 1)) + 0.5) AS BIGINT) AS chi2_f_ppm
      FROM bb""",

    "ml_youden_j" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (
        |  SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |         count(*) AS n,
        |         sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS np
        |  FROM sc GROUP BY 1),
        |cum AS (
        |  SELECT bin,
        |         CAST(sum(np) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |         CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        |  FROM bins),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS n1,
        |               CAST(sum(n - np) AS BIGINT) AS n0 FROM bins),
        |scored AS (
        |  SELECT bin, tp, pp, n1, n0,
        |         tp * n0 - (pp - tp) * n1 AS jnum
        |  FROM cum, tot)
        |SELECT bin AS best_bin, tp, pp, n1, n0,
        |       CAST(floor(1e6 * CAST(jnum AS DOUBLE)
        |         / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) + 0.5)
        |         AS BIGINT) AS j_ppm
        |FROM (SELECT *, row_number() OVER (ORDER BY jnum DESC, bin)
        |        AS rk FROM scored)
        |WHERE rk = 1""".stripMargin,

    "ml_ece" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (
        |  SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS pos,
        |         CAST(sum(CAST(floor(1e6 * sg + 0.5) AS BIGINT))
        |              AS BIGINT) AS conf_sum_ppm
        |  FROM sc GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |         CAST(sum(n) AS BIGINT) AS n_rows,
        |         CAST(sum(abs(1000000 * pos - conf_sum_ppm)) AS BIGINT)
        |           AS gap_sum
        |  FROM bins)
        |SELECT n_bins, n_rows,
        |       CAST(floor(CAST(gap_sum AS DOUBLE) / n_rows + 0.5)
        |         AS BIGINT) AS ece_ppm
        |FROM agg""".stripMargin,

    "ml_best_f1" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (
        |  SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |         count(*) AS n,
        |         sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS np
        |  FROM sc GROUP BY 1),
        |cum AS (
        |  SELECT bin,
        |         CAST(sum(np) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |         CAST(sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        |  FROM bins),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS p_total FROM bins),
        |scored AS (
        |  SELECT bin, tp, pp, p_total,
        |         CAST(floor(2e6 * tp / (pp + p_total) + 0.5) AS BIGINT)
        |           AS f1_ppm
        |  FROM cum, tot)
        |SELECT bin AS best_bin, tp, pp, p_total, f1_ppm
        |FROM (SELECT *, row_number() OVER (ORDER BY f1_ppm DESC, bin)
        |        AS rk FROM scored)
        |WHERE rk = 1""".stripMargin,

    "ml_ks_model" ->
      s"""WITH $logregCtes,
        |sc AS (SELECT 0.5*(1.0 + ((w0 + w1*x1) + w2*x2)/(1.0 + abs((w0 + w1*x1) + w2*x2))) AS sg, yy
        |       FROM raw, s3),
        |bins AS (
        |  SELECT least(CAST(floor(sg*200) AS BIGINT), 199) AS bin,
        |         count(*) AS n,
        |         sum(CASE WHEN yy = 1.0 THEN 1 ELSE 0 END) AS np
        |  FROM sc GROUP BY 1),
        |cum AS (
        |  SELECT bin,
        |         CAST(sum(np) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
        |         CAST(sum(n - np) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
        |  FROM bins),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
        |               CAST(sum(n - np) AS BIGINT) AS tn FROM bins)
        |SELECT bin AS ks_bin,
        |       abs(CAST(floor(1e6*cp/tp + 0.5) AS BIGINT) -
        |           CAST(floor(1e6*cn/tn + 0.5) AS BIGINT)) AS ks_ppm
        |FROM cum, tot
        |ORDER BY ks_ppm DESC, bin
        |LIMIT 1""".stripMargin,

    "ml_decision_stump" ->
      s"""WITH byq AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS q, count(*) AS nq,
        |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pq
        |  FROM lineitem GROUP BY 1
        |), cum AS (
        |  SELECT q,
        |         CAST(sum(nq) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
        |         CAST(sum(pq) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
        |  FROM byq
        |), tot AS (
        |  SELECT CAST(sum(nq) AS BIGINT) AS n,
        |         CAST(sum(pq) AS BIGINT) AS p FROM byq)
        |SELECT q AS threshold, nl AS n_left, n - nl AS n_right, $stumpGini
        |FROM cum, tot WHERE nl < n
        |ORDER BY gini_ppm, threshold
        |LIMIT 1""".stripMargin,

    // 2 unrolled boosting rounds, integer weighted errors; the only FP
    // is one ln + one exp per round on identical integer-ratio operands
    "ml_adaboost" ->
      s"""WITH byq AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS wpos,
        |         CAST(count(*) -
        |              sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS wneg
        |  FROM lineitem GROUP BY 1),
        |cum1 AS (
        |  SELECT q,
        |         sum(wpos) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS cpos,
        |         sum(wneg) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS cneg
        |  FROM byq),
        |tot1 AS (SELECT sum(wpos) AS tp, sum(wneg) AS tn FROM byq),
        |cand1 AS (
        |  SELECT q, 'le' AS pol, cneg + tp - cpos AS err, tp + tn AS w
        |  FROM cum1, tot1
        |  UNION ALL
        |  SELECT q, 'gt', tp + tn - (cneg + tp - cpos), tp + tn
        |  FROM cum1, tot1),
        |s1 AS (
        |  SELECT q, pol, CAST(err AS BIGINT) AS err, CAST(w AS BIGINT) AS w
        |  FROM cand1 ORDER BY err, pol, q LIMIT 1),
        |a1 AS (
        |  SELECT q, pol, err, w,
        |         CAST(floor(1e6 * 0.5 * ln(
        |           CAST(w - greatest(least(err, w - 1), 1) AS DOUBLE)
        |           / CAST(greatest(least(err, w - 1), 1) AS DOUBLE))
        |           + 0.5) AS BIGINT) AS alpha_ppm
        |  FROM s1),
        |m1 AS (
        |  SELECT q, pol, err, w, alpha_ppm,
        |         CAST(floor(1e6 * exp(2 * (CAST(alpha_ppm AS DOUBLE) / 1e6))
        |           + 0.5) AS BIGINT) AS mult
        |  FROM a1),
        |cells2 AS (
        |  SELECT b.q,
        |         b.wpos * (CASE WHEN (m.pol = 'le' AND b.q > m.q)
        |                          OR (m.pol = 'gt' AND b.q <= m.q)
        |                        THEN m.mult ELSE 1000000 END) AS wpos,
        |         b.wneg * (CASE WHEN (m.pol = 'le' AND b.q <= m.q)
        |                          OR (m.pol = 'gt' AND b.q > m.q)
        |                        THEN m.mult ELSE 1000000 END) AS wneg
        |  FROM byq b, m1 m),
        |cum2 AS (
        |  SELECT q,
        |         sum(wpos) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS cpos,
        |         sum(wneg) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS cneg
        |  FROM cells2),
        |tot2 AS (SELECT sum(wpos) AS tp, sum(wneg) AS tn FROM cells2),
        |cand2 AS (
        |  SELECT q, 'le' AS pol, cneg + tp - cpos AS err, tp + tn AS w
        |  FROM cum2, tot2
        |  UNION ALL
        |  SELECT q, 'gt', tp + tn - (cneg + tp - cpos), tp + tn
        |  FROM cum2, tot2),
        |s2 AS (
        |  SELECT q, pol, CAST(err AS BIGINT) AS err, CAST(w AS BIGINT) AS w
        |  FROM cand2 ORDER BY err, pol, q LIMIT 1),
        |a2 AS (
        |  SELECT q, pol, err, w,
        |         CAST(floor(1e6 * 0.5 * ln(
        |           CAST(w - greatest(least(err, w - 1), 1) AS DOUBLE)
        |           / CAST(greatest(least(err, w - 1), 1) AS DOUBLE))
        |           + 0.5) AS BIGINT) AS alpha_ppm
        |  FROM s2)
        |SELECT CAST(1 AS BIGINT) AS round, pol, q AS threshold,
        |       err AS err_w, w AS tot_w, alpha_ppm FROM a1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), pol, q, err, w, alpha_ppm FROM a2""".stripMargin,

    "ml_ridge" ->
      s"""WITH raw AS (
        |  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem),
        |sums AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS s11r,
        |         CAST(sum(x1*x2) AS DOUBLE) AS s12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS s22r,
        |         CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x1*y) AS DOUBLE) AS s1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS s2y,
        |         CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM raw),
        |pen AS (SELECT n, s1, s2, s12, sy, s1y, s2y, syy,
        |               s11r + 10000.0 AS s11, s22r + 10000.0 AS s22
        |        FROM sums),
        |l1 AS (SELECT ${sel(linregL1)} FROM pen),
        |l2 AS (SELECT ${sel(linregL2)} FROM l1)
        |SELECT ${sel(linregL3.filter(_.contains(" AS b")))} FROM l2""".stripMargin,

    "ml_kfold_cv" ->
      s"""WITH raw AS (
        |  SELECT l_orderkey % 5 AS fold,
        |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
        |         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
        |         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem),
        |byfold AS (
        |  SELECT fold, CAST(count(*) AS DOUBLE) AS fn,
        |         CAST(sum(x1) AS DOUBLE) AS f1, CAST(sum(x2) AS DOUBLE) AS f2,
        |         CAST(sum(x1*x1) AS DOUBLE) AS f11,
        |         CAST(sum(x1*x2) AS DOUBLE) AS f12,
        |         CAST(sum(x2*x2) AS DOUBLE) AS f22,
        |         CAST(sum(y) AS DOUBLE) AS fy,
        |         CAST(sum(x1*y) AS DOUBLE) AS f1y,
        |         CAST(sum(x2*y) AS DOUBLE) AS f2y,
        |         CAST(sum(y*y) AS DOUBLE) AS fyy
        |  FROM raw GROUP BY fold),
        |loo AS (
        |  SELECT fold,
        |         sum(fn) OVER () - fn AS n,
        |         sum(f1) OVER () - f1 AS s1,
        |         sum(f2) OVER () - f2 AS s2,
        |         sum(f11) OVER () - f11 AS s11,
        |         sum(f12) OVER () - f12 AS s12,
        |         sum(f22) OVER () - f22 AS s22,
        |         sum(fy) OVER () - fy AS sy,
        |         sum(f1y) OVER () - f1y AS s1y,
        |         sum(f2y) OVER () - f2y AS s2y,
        |         sum(fyy) OVER () - fyy AS syy
        |  FROM byfold),
        |l1 AS (SELECT fold, ${sel(linregL1)} FROM loo),
        |models AS (SELECT fold, ${sel(linregL2.filter(_.contains(" AS b")))}
        |           FROM l1),
        |scored AS (
        |  SELECT r.fold,
        |         CAST(r.y AS DOUBLE) - ((m.b0 + m.b1 * r.x1) + m.b2 * r.x2)
        |           AS e
        |  FROM raw r JOIN models m ON m.fold = r.fold),
        |agg AS (
        |  SELECT fold, count(*) AS n_oos,
        |         round(sqrt(sum(e*e) / count(*)) / 100.0, 4)
        |           AS oos_rmse_dollars
        |  FROM scored GROUP BY fold)
        |SELECT a.fold, a.n_oos, a.oos_rmse_dollars,
        |       round(m.b0, 6) AS b0, round(m.b1, 6) AS b1,
        |       round(m.b2, 6) AS b2
        |FROM agg a JOIN models m ON m.fold = a.fold""".stripMargin,

    "ml_apriori_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT count(DISTINCT ok) AS nn FROM items),
        |freq AS (
        |  SELECT item, count(*) AS cnt, nn
        |  FROM items, nb GROUP BY item, nn
        |  HAVING count(*) * 10 >= nn),
        |fi AS (SELECT i.ok, i.item FROM items i
        |       JOIN freq f ON f.item = i.item),
        |pairs AS (
        |  SELECT a.item AS i1, b.item AS i2, count(*) AS n_both
        |  FROM fi a JOIN fi b ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2),
        |bidir AS (
        |  SELECT i1 AS ante, i2 AS cons, n_both FROM pairs
        |  UNION ALL
        |  SELECT i2, i1, n_both FROM pairs)
        |SELECT r.ante, r.cons, r.n_both,
        |       round(CAST(r.n_both AS DOUBLE) / CAST(fa.nn AS DOUBLE), 6)
        |         AS support,
        |       round(CAST(r.n_both AS DOUBLE) / CAST(fa.cnt AS DOUBLE), 6)
        |         AS conf,
        |       round(CAST(r.n_both AS DOUBLE) * CAST(fa.nn AS DOUBLE)
        |             / (CAST(fa.cnt AS DOUBLE) * CAST(fc.cnt AS DOUBLE)), 6)
        |         AS lift
        |FROM bidir r
        |JOIN freq fa ON fa.item = r.ante
        |JOIN freq fc ON fc.item = r.cons
        |WHERE r.n_both * 50 >= fa.nn
        |  AND r.n_both * 25 >= fa.cnt * 3""".stripMargin)
}
