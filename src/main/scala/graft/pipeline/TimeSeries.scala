package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with gap fill — the
  * feature-engineering step that turns an irregular event stream into
  * the fixed-step series a model consumes (per-entity activity curves,
  * sensor downsampling). Beyond-reference surface, same family as the
  * windowed/sessionized event operators in graft.streaming.
  */
object TimeSeries {

  private val Units = Set("minute", "hour", "day", "week")

  /** Resample each key's events onto a regular `unit` grid spanning that
    * key's [first, last] bucket, carrying (n, forward-filled sum):
    * gap buckets get n = 0 and the LAST OBSERVED per-bucket sum
    * (leading gaps stay NULL — nothing observed yet is not zero).
    *
    * The per-bucket sum aggregates in DECIMAL(18,6): decimal sums
    * commute exactly, so the output is bit-stable under any
    * partitioning AND SQL-replayable (a double sum is neither — Spark's
    * reduce order is nondeterministic); the fill then propagates the
    * exact decimal and only the final output casts to double.
    *
    * Plan shape: one partial/final aggregation keyed by (key, bucket),
    * one tiny per-key span aggregation, one grid explode (span/step
    * rows per key — bounded by the data's time window), one left join
    * back, one per-key ordered window for the fill. Everything shards
    * by the key column. */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, unit: String = "hour"): DataFrame = {
    require(Units.contains(unit.toLowerCase(java.util.Locale.ROOT)),
      s"resampleFill: unit must be one of $Units, got '$unit'")
    val u = unit.toLowerCase(java.util.Locale.ROOT)
    val agg = df
      .groupBy(col(keyCol), graft.functions.Exprs.dateTruncCivil(u, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
    // grid in CIVIL epoch space: sequence() over timestamps would coerce
    // the NTZ bounds through the session zone; every supported unit is
    // fixed-width in the UTC-read frame, so a long-typed sequence is both
    // session-zone-invariant and cheaper
    val stepUs = u match {
      case "minute" => 60L * 1000000
      case "hour" => 3600L * 1000000
      case "day" => 86400L * 1000000
      case "week" => 7L * 86400 * 1000000
    }
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol), explode(sequence(
        graft.functions.Exprs.epochMicrosCivil(col("__mn")),
        graft.functions.Exprs.epochMicrosCivil(col("__mx")),
        lit(stepUs))).as("__bus"))
      .select(col(keyCol),
        graft.functions.Exprs.civilFromMicros(col("__bus")).as("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(col(keyCol), col("bucket"),
      coalesce(col("n"), lit(0L)).as("n"),
      last(col("__s"), ignoreNulls = true).over(w).cast("double").as("filled"))
  }

  /** Trailing row-window statistics per key: for each event, the
    * mean/min/max/count of the previous `lookback` values INCLUDING the
    * current one, in (ts, tie) order — the rolling-feature transform
    * (e.g. "average of the user's last 5 purchase amounts"). The mean
    * folds in DECIMAL(18,6) (order-independent, SQL-replayable) and
    * divides by the actual in-window count, so heads shorter than
    * `lookback` are exact, not padded; the double division is the one
    * fixed-shape op at the edge.
    *
    * One key-sharded sort window — the stateful-operator posture (keys
    * shard the exchange; no global ordering anywhere). */
  def movingStats(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String, lookback: Int): DataFrame = {
    require(lookback > 0, "movingStats: lookback must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val v = col(valueCol).cast("decimal(18,6)")
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("win_n", count(v).over(w))
      .withColumn("win_sum", sum(v).over(w))
      .withColumn("win_mean",
        (col("win_sum").cast("double") / col("win_n").cast("double")))
      .withColumn("win_min", min(v).over(w).cast("double"))
      .withColumn("win_max", max(v).over(w).cast("double"))
      .drop("win_sum")
  }

  /** OHLC + VWAP bars: per (key, bucket), the open/high/low/close of
    * `priceCol` and the volume-weighted average price — the canonical
    * market-data downsample, but equally the "first/last reading per
    * sensor per hour" shape. Open/close are true ARG_MIN/ARG_MAX by
    * (ts, price) — a min/max over (epoch-µs, price) structs, so the
    * whole bar folds in ONE aggregation pass with no self-join and no
    * window; vwap divides exact decimal Σ(p·v)/Σv once at the edge.
    *
    * One (key, bucket)-keyed partial/final aggregate — nothing else. */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
               priceCol: String, volCol: String, unit: String): DataFrame = {
    require(Units(unit), s"ohlcBars: unit must be one of $Units")
    // Price keeps 6 fraction digits at 6 integer digits; volume keeps 6
    // fraction digits at 12 integer digits — fractional volumes stay
    // exact (a (18,0) cast would silently round them, skewing vwap) and
    // integral volumes fit to 1e12. (12,6)x(18,6) is a 31-digit product
    // at scale 12, int128-exact, and Spark's sum widens it to (38,12).
    // (Round 10: volume at (12,6) overflowed once event ids passed 1e6
    // at the 30x replica — Spark nulls on decimal overflow with ANSI
    // off, so vwap silently vanished while DuckDB raised loudly.)
    // The q_ohlc oracle carries volume one integer digit WIDER, at
    // (19,6): DuckDB needs width ≥19 to run the product in int128, and
    // oracle-wider guarantees an engine-side overflow shows up as a gate
    // mismatch rather than matching nulls.
    val p = col(priceCol).cast("decimal(12,6)")
    val v = col(volCol).cast("decimal(18,6)")
    val key = struct(graft.functions.Exprs.epochMicrosCivil(col(tsCol)).as("us"),
      col(priceCol).cast("double").as("p"))
    df.select(col(keyCol), graft.functions.Exprs.dateTruncCivil(unit, col(tsCol)).as("bucket"),
        key.as("__k"), p.as("__p"), v.as("__v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__k")).getField("p").as("open"),
        max(col("__p")).cast("double").as("high"),
        min(col("__p")).cast("double").as("low"),
        max(col("__k")).getField("p").as("close"),
        // Σ(p·v) and Σv can pass 2^53 unscaled: decimal → exact digit
        // string → double (correctly rounded everywhere — the q_corr
        // convention) before the one division.
        (sum(col("__p") * col("__v")).cast("string").cast("double") /
          sum(col("__v")).cast("string").cast("double")).as("vwap"),
        sum(col("__v")).cast("string").cast("double").as("volume"))
  }

  /** Two-sided CUSUM change detection per key — the classic
    * mean-shift monitor (Page 1954). The textbook recursion
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − target − slack) is not window-expressible,
    * but its CLOSED FORM is: with prefix Pᵢ = Σ(x − target − slack),
    * S⁺ᵢ = Pᵢ − min(0, min_{j<i} Pⱼ) — a cumulative sum plus a running
    * min, two frames of ONE key-sharded window pass. The low side is the
    * mirror (running MAX of its own prefix). All accumulation is
    * DECIMAL-exact, so both statistics are bit-stable under any
    * partitioning and fully SQL-replayable; doubles appear only at the
    * output edge through the digit string.
    *
    * `target` is the in-control mean, `slack` the half-width of
    * indifference (k), `threshold` the alarm level (h) — all supplied as
    * exact decimals by the caller (classic CUSUM practice: target/slack
    * come from a reference period, not the monitored window itself).
    * Output: (key, tie, s_hi, s_lo, alarm_hi, alarm_lo) per event. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            tieCol: String, target: BigDecimal, slack: BigDecimal,
            threshold: BigDecimal): DataFrame = {
    require(slack >= 0, "cusum: slack must be >= 0")
    require(threshold > 0, "cusum: threshold must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    val wp = w.rowsBetween(Window.unboundedPreceding, -1)
    val x = col(valueCol).cast("decimal(18,2)")
    val zero = lit(BigDecimal(0).underlying).cast("decimal(18,2)")
    def decLit(b: BigDecimal) = lit(b.underlying).cast("decimal(18,2)")
    def d(c: Column) = c.cast("string").cast("double")
    val out = df
      .withColumn("__ph", sum(x - decLit(target + slack)).over(wc))
      .withColumn("__pl", sum(x - decLit(target - slack)).over(wc))
      .withColumn("__sh", greatest(zero,
        col("__ph") - least(zero, coalesce(min(col("__ph")).over(wp), zero))))
      .withColumn("__sl", greatest(zero,
        greatest(zero, coalesce(max(col("__pl")).over(wp), zero)) - col("__pl")))
    out.select(col(keyCol), col(tieCol), d(col("__sh")).as("s_hi"),
      d(col("__sl")).as("s_lo"),
      (col("__sh") > decLit(threshold)).as("alarm_hi"),
      (col("__sl") > decLit(threshold)).as("alarm_lo"))
  }

  /** Seasonal profile per key: the slot-of-cycle baseline (hour-of-day
    * or ISO day-of-week) every seasonality-aware monitor needs — per
    * (key, slot): observation count, exact-decimal mean (digit-string
    * double), and the slot's share of the key's total mass (the shape of
    * the season, 6 dp). One (key, slot) aggregate; the per-key totals
    * broadcast back (≤ cycle-length rows per key). Slot: 'hour' (0-23)
    * or 'dow' (1 = Monday, ISO — matching the date-dimension gate). */
  def seasonalProfile(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, slot: String = "hour"): DataFrame = {
    require(Set("hour", "dow").contains(slot),
      s"seasonalProfile: slot must be 'hour' or 'dow', got '$slot'")
    def d(c: Column) = c.cast("string").cast("double")
    val slotCol = if (slot == "hour") hour(col(tsCol)).cast("int")
      else dayofweek(col(tsCol)).cast("int") // 1=Sunday..7=Saturday
    val isoSlot = if (slot == "hour") slotCol
      else pmod(slotCol + 5, lit(7)) + 1 // → 1=Monday..7=Sunday (ISO)
    val x = col(valueCol).cast("decimal(18,2)")
    val perSlot = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), isoSlot.as("slot"))
      .agg(count(lit(1)).as("n"), sum(x).as("__s"))
    val totals = perSlot.groupBy(col(keyCol))
      .agg(sum(col("__s")).cast("decimal(28,2)").as("__tot"))
    perSlot.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("slot"), col("n"),
        round(d(col("__s")) / col("n").cast("double"), 6).as("mean"),
        when(col("__tot") =!= 0,
          round(d(col("__s")) / d(col("__tot")), 6)).as("share"))
  }

  /** Hopping (sliding) window aggregation in batch: size `sizeSec`,
    * slide `slideSec`, size a multiple of slide — each event belongs to
    * exactly size/slide windows, generated by a codegen'd explode (the
    * same plan Structured Streaming's `window()` produces for its
    * overlapping-window case), then ONE (key, window) hash aggregate
    * with map-side partials. Windows are [start, start+size) half-open,
    * starts aligned to slide multiples of the epoch. Output per
    * (key, window_start_us): n, decimal-exact sum as a digit-string
    * double, window_end_us. */
  def hoppingWindows(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, sizeSec: Long,
                     slideSec: Long): DataFrame = {
    require(slideSec > 0 && sizeSec > 0, "hoppingWindows: sizes must be positive")
    require(sizeSec % slideSec == 0,
      "hoppingWindows: size must be a multiple of slide (else events cover a varying window count)")
    val k = (sizeSec / slideSec).toInt
    val slideUs = slideSec * 1000000L
    df.select(col(keyCol), graft.functions.Exprs.epochMicrosCivil(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .withColumn("__w0", expr(s"(__t div ${slideUs}L) * ${slideUs}L"))
      .withColumn("__i", explode(sequence(lit(0), lit(k - 1))))
      .select(col(keyCol), col("__v"),
        (col("__w0") - col("__i") * slideUs).as("window_start_us"))
      .groupBy(col(keyCol), col("window_start_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).cast("string").cast("double").as("sum_v"))
      .withColumn("window_end_us",
        col("window_start_us") + sizeSec * 1000000L)
  }

  /** Lag-k autocorrelation per key: Pearson r between the series and
    * itself shifted k steps (in (ts, tie) order), computed from the same
    * exact decimal moment sums as [[Profile.corrExact]] — one key-sharded
    * lag window to build the (xᵗ, xᵗ⁻ᵏ) pairs, then the moments fold.
    * The seasonality/persistence probe of time-series profiling.
    * Output: (key, n, corr, cov_samp) with n = series length − k. */
  def autocorrLag(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String, lagK: Int): DataFrame = {
    require(lagK >= 1, "autocorrLag: lag must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = df
      .withColumn("__lagged", lag(col(valueCol), lagK).over(w))
      .where(col("__lagged").isNotNull)
    Profile.corrExact(pairs, keyCol, valueCol, "__lagged")
  }

  /** Time-weighted average of a piecewise-constant signal per key (TWAP
    * — the price/level statistic where arithmetic means lie: a value
    * holds from its event until the NEXT event, so each observation
    * weighs by its holding duration). Weighted sum = Σ value·Δt in
    * exact decimals (micros are longs), one digit-string division at
    * the edge. Ordering is total via (ts, tie), so same-timestamp
    * duplicates get Δt = 0 deterministically; the last observation per
    * key bounds the window and carries no weight. Keys with a single
    * observation (zero span) report NULL. One key-sharded lead window +
    * one aggregate. Output: (key, n, span_micros, twap). */
  def twap(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           tieCol: String): DataFrame = {
    def d(c: Column) = c.cast("string").cast("double")
    val t = graft.functions.Exprs.epochMicrosCivil(col(tsCol))
    val seg2 = df.select(col(keyCol), t.as("__t"), col(tieCol).as("__tb"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .withColumn("__nt", lead(col("__t"), 1).over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("__t").asc, col("__tb").asc)))
    seg2.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        (max(col("__t")) - min(col("__t"))).as("span_micros"),
        sum(when(col("__nt").isNotNull,
          col("__v") * (col("__nt") - col("__t")))).as("__ws"))
      .select(col(keyCol), col("n"), col("span_micros"),
        when(col("span_micros") > 0,
          round(d(col("__ws")) / col("span_micros").cast("double"), 6))
          .as("twap"))
  }

  /** Truncated exponentially-weighted moving average per key: over the
    * last `lookback`+1 observations, weight 2^(lookback−j) for lag j —
    * i.e. α = 1/2 decay cut at a fixed horizon, which is what makes the
    * statistic EXACT (the weights are integers, the weighted sum is one
    * decimal expression) and shuffle-free beyond one key-sharded window
    * sort. The infinite-memory EWMA recursion has no bounded relational
    * form; at 8+ lags the dropped tail mass is < 0.4% — the standard
    * truncation. Warm-up rows use only the lags that exist (weights
    * renormalize over the present terms). Lag columns unroll at plan
    * build (lookback is a plan constant — keep it small, ≤ ~16).
    * Output: input key/tie + (n_terms, ewma). */
  def ewmaLags(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, tieCol: String, lookback: Int): DataFrame = {
    require(lookback >= 1 && lookback <= 20,
      "ewmaLags: lookback must be in [1, 20]")
    def d(c: Column) = c.cast("string").cast("double")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val base = df.select(col(keyCol), col(tsCol), col(tieCol),
      col(valueCol).cast("decimal(18,2)").as("__v"))
    val lagged = (0 to lookback).foldLeft(base) { (acc, j) =>
      acc.withColumn(s"__l$j",
        if (j == 0) col("__v") else lag(col("__v"), j).over(w))
    }
    val wsum = (0 to lookback).map { j =>
      val wj = 1L << (lookback - j)
      when(col(s"__l$j").isNotNull, col(s"__l$j") * lit(wj))
        .otherwise(lit(0L)).cast("decimal(30,2)")
    }.reduce(_ + _)
    val dsum = (0 to lookback).map { j =>
      val wj = 1L << (lookback - j)
      when(col(s"__l$j").isNotNull, lit(wj)).otherwise(lit(0L))
    }.reduce(_ + _)
    val nterms = (0 to lookback).map { j =>
      when(col(s"__l$j").isNotNull, lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)
    lagged.select(col(keyCol), col(tsCol), col(tieCol),
      nterms.as("n_terms"),
      round(d(wsum) / d(dsum), 6).as("ewma"))
  }

  /** Seasonal-residual anomaly flags — the STL-style detector: run
    * [[seasonalDecompose]], then flag days whose residual sits more
    * than `k`·MAD from the per-key residual median (lower-median
    * convention on BOTH medians — each statistic is an actual value of
    * the identical-dag residual doubles, so both engines agree
    * bit-for-bit; no interpolation anywhere). Per-key medians fold over
    * the distinct-residual table; the one-row-per-key (med, mad) frame
    * broadcasts back. Output: every day with (…, residual, med, mad,
    * anomaly). */
  def seasonalAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, k: Double = 3.0): DataFrame = {
    val base = seasonalDecompose(df, keyCol, tsCol, valueCol)
    def lowerMedian(in: DataFrame, vCol: String): DataFrame = {
      val counts = in.groupBy(col(keyCol), col(vCol).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val cum = counts.withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(keyCol)).orderBy(col("__v"))))
      val tot = counts.groupBy(col(keyCol)).agg(sum(col("__c")).as("__n"))
      cum.join(tot, Seq(keyCol))
        .where(col("__cum") >= expr("(__n + 1) div 2"))
        .groupBy(col(keyCol)).agg(min(col("__v")).as("med"))
    }
    val med = lowerMedian(base, "residual")
    val withMed = base.join(broadcast(med), Seq(keyCol))
      .withColumn("__adev", abs(col("residual") - col("med")))
    val mad = lowerMedian(withMed, "__adev")
      .withColumnRenamed("med", "mad")
    withMed.join(broadcast(mad), Seq(keyCol))
      .select(col(keyCol), col("day"), col("v"), col("trend"),
        col("seasonal"), col("residual"), col("med"), col("mad"),
        (col("__adev") > lit(k) * col("mad")).as("anomaly"))
  }

  /** Mann-Kendall trend test per key over the daily series — the
    * standard monotone-trend detector for irregular environmental/metric
    * data (no distributional assumption, tie-aware): S = Σ_{i<j}
    * sign(v_j − v_i) over the per-day decimal sums (exact integer — the
    * signs compare exact decimals), tie-corrected variance Var = (n(n−1)
    * (2n+5) − Σ t(t−1)(2t+5))/18, and the continuity-corrected z. The
    * pairwise join runs on the DAILY AGGREGATE (days², bounded by the
    * calendar — at any data scale the day table is the same size), never
    * on raw rows. Output: (key, n_days, s, z, trend ∈ up|down|none). */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    // S via the native O(n log n) inversion-count kernel over each key's
    // day-ordered value series (graft.functions.MannKendallS — see its
    // scaladoc for the sgn-pair identity). The r15 pairwise self-join
    // keyed on the GROUP column put the whole n² fan-out on #keys tasks
    // (14M comparison rows in ≤5 tasks at sf0.1); a calendar-bounded
    // series collects into one row at any corpus scale. Values ride as
    // exact scaled longs (decimal(12,2)·100), so comparisons are the
    // same decimal comparisons; NULL daily sums drop out exactly as the
    // pairwise form's three-valued sgn scored them (every NULL pair
    // contributed 0). The unchanged pairwise DuckDB oracle pins the
    // equivalence.
    // Scaled-long kernel input with a LOUD overflow guard: __v is the
    // widened decimal(22,2) sum, so |__v| > Long.MaxValue/100 would make
    // the non-ANSI cast NULL and silently drop the day from the S series
    // while still counting it in n_days and the tie/variance term (the
    // old pairwise form compared decimals directly and had no such
    // window). assert_true raises instead; NULL sums pass through NULL
    // (they score 0 downstream, as the pairwise three-valued sgn did).
    val svBound = lit("92233720368547758.07").cast("decimal(22,2)")
    val sv = when(assert_true(col("__v").isNull || abs(col("__v")) <= svBound,
        concat(lit("mannKendall: |daily sum| "), col("__v").cast("string"),
          lit(" overflows the scaled-long kernel input"))).isNull,
      (col("__v") * 100).cast("long"))
    val s = daily.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__day"),
        sv.as("__sv")))).as("__ord"))
      .select(col(keyCol), graft.functions.MannKendallS.mann_kendall_s(
        expr("filter(transform(__ord, x -> x.__sv), x -> x is not null)")).as("s"))
    val nAndTies = daily.groupBy(col(keyCol), col("__v"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(sum(col("__t")).as("n_days"),
        sum(col("__t") * (col("__t") - 1) *
          (lit(2L) * col("__t") + 5)).as("__tieTerm"))
    val nd = col("n_days").cast("double")
    val varS = (nd * (nd - lit(1.0)) * (lit(2.0) * nd + lit(5.0)) -
      col("__tieTerm").cast("double")) / lit(18.0)
    val sd = col("s").cast("double")
    s.join(nAndTies, Seq(keyCol))
      // single-day keys produced NO pair rows in the pairwise form (the
      // inner self-join dropped them from the output entirely); preserve
      // that output set — collect_list would otherwise emit a synthetic
      // (s=0, z=0, trend=none) row for them.
      .where(col("n_days") >= 2)
      .select(col(keyCol), col("n_days"), col("s"),
        round(when(col("s") > 0, (sd - lit(1.0)) / sqrt(varS))
          .when(col("s") < 0, (sd + lit(1.0)) / sqrt(varS))
          .otherwise(lit(0.0)), 6).as("z"))
      .withColumn("trend", when(col("z") > 1.96, "up")
        .when(col("z") < -1.96, "down").otherwise("none"))
  }

  /** Forecast-error metrics of the SEASONAL-NAIVE baseline (forecast =
    * the value `seasonLag` observed periods earlier) — the sanity floor
    * every forecasting pipeline reports before any model: per key, MAE /
    * RMSE / MAPE / sMAPE over the days where a forecast exists. Errors
    * e = v − f are EXACT decimals (daily sums); |e| sums stay decimal;
    * squares ride the (12,2) corrExact width; the ratio terms (MAPE,
    * sMAPE) round to 6 dp decimals before summing so the means are
    * order-independent. Zero-denominator terms are excluded and counted
    * separately. One aggregation + one key-sharded lag window + one
    * fold. Output: (key, n_eval, mae, rmse, mape, smape,
    * n_zero_denom). */
  def forecastErrors(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, seasonLag: Int = 7): DataFrame = {
    require(seasonLag >= 1, "forecastErrors: seasonLag must be >= 1")
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)"))
        .cast("decimal(12,2)").as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
    val withF = daily
      .withColumn("__f", lag(col("__v"), seasonLag).over(w))
      .where(col("__f").isNotNull)
      .withColumn("__e", (col("__v") - col("__f")).cast("decimal(13,2)"))
      .withColumn("__ae", abs(col("__e")))
    val denomA = abs(col("__v"))
    val denomS = abs(col("__v")) + abs(col("__f"))
    val scored = withF
      .withColumn("__mape_t", when(denomA > 0,
        round(d(col("__ae")) / d(denomA), 6).cast("decimal(18,6)")))
      .withColumn("__smape_t", when(denomS > 0,
        round(lit(2.0) * d(col("__ae")) / d(denomS), 6)
          .cast("decimal(18,6)")))
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        d(sum(col("__ae"))).as("__sae"),
        d(sum(col("__e").cast("decimal(12,2)") *
          col("__e").cast("decimal(12,2)"))).as("__se2"),
        sum(when(col("__mape_t").isNull, 1L).otherwise(0L))
          .as("n_zero_denom"),
        d(sum(col("__mape_t"))).as("__smt"),
        count(col("__mape_t")).as("__nmt"),
        d(sum(col("__smape_t"))).as("__sst"),
        count(col("__smape_t")).as("__nst"))
      .select(col(keyCol), col("n_eval"),
        (col("__sae") / col("n_eval").cast("double")).as("mae"),
        sqrt(col("__se2") / col("n_eval").cast("double")).as("rmse"),
        (col("__smt") / col("__nmt").cast("double")).as("mape"),
        (col("__sst") / col("__nst").cast("double")).as("smape"),
        col("n_zero_denom"))
  }

  /** Rolling Pearson correlation between two per-day series of the same
    * key — "did clicks stop tracking revenue this week?": daily decimal
    * sums for both columns, one `window`-row trailing frame carrying the
    * five moment sums (all exact DECIMAL — the corrExact convention in a
    * window), one fixed double dag per row. Rows with fewer than 2
    * window points or zero variance report NULL. Products stay at the
    * (12,2)·(12,2) = (24,4) width every decimal engine multiplies
    * exactly. One aggregation + one key-sharded window. */
  def rollingCorr(df: DataFrame, keyCol: String, tsCol: String,
                  xCol: String, yCol: String, window: Int): DataFrame = {
    require(window >= 2, "rollingCorr: window must be >= 2 rows")
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(xCol).cast("decimal(12,2)")).cast("decimal(12,2)").as("__x"),
        sum(col(yCol).cast("decimal(12,2)")).cast("decimal(12,2)").as("__y"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
      .rowsBetween(-(window - 1), Window.currentRow)
    val framed = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sy", sum(col("__y")).over(w))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .withColumn("__syy", sum(col("__y") * col("__y")).over(w))
    val nd = col("__n").cast("double")
    val cov = nd * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    val vx = nd * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val vy = nd * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    framed.select(col(keyCol),
      date_format(col("__day"), "yyyy-MM-dd").as("day"),
      col("__n").as("n_window"),
      when(col("__n") >= 2 && vx > lit(0.0) && vy > lit(0.0),
        cov / (sqrt(vx) * sqrt(vy))).as("rolling_corr"))
  }

  /** Lead-lag cross-correlation between two per-day series of the same
    * key: Pearson corr of (x_t, y_{t+lag}) for each lag in
    * [−maxLag, maxLag] — which series LEADS? Daily decimal sums once;
    * each lag is one self-join on (key, day+lag) feeding the exact
    * decimal moment fold (corrExact dag). Only overlapping days pair, n
    * per lag reported. Output: (key, lag, n, corr). */
  def crossCorrLags(df: DataFrame, keyCol: String, tsCol: String,
                    xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "crossCorrLags: maxLag must be >= 1")
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(xCol).cast("decimal(12,2)")).cast("decimal(12,2)").as("__x"),
        sum(col(yCol).cast("decimal(12,2)")).cast("decimal(12,2)").as("__y"))
    val lags = daily.crossJoin(
      broadcast(df.sparkSession.range(-maxLag.toLong, maxLag + 1L)
        .toDF("lag")))
    val shifted = lags.select(col(keyCol), col("lag"),
      // timestampadd keeps the TIMESTAMP type (date_add would degrade to
      // DATE and force an implicit cast at the join key)
      expr("timestampadd(DAY, CAST(lag AS INT), __day)").as("__jday"),
      col("__x"))
    val joined = shifted.join(
      daily.select(col(keyCol), col("__day").as("__jday"), col("__y")),
      Seq(keyCol, "__jday"))
    val m = joined.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n"),
        d(sum(col("__x"))).as("__sx"), d(sum(col("__y"))).as("__sy"),
        d(sum(col("__x") * col("__y"))).as("__sxy"),
        d(sum(col("__x") * col("__x"))).as("__sxx"),
        d(sum(col("__y") * col("__y"))).as("__syy"))
    val nd = col("n").cast("double")
    val cov = nd * col("__sxy") - col("__sx") * col("__sy")
    val vx = nd * col("__sxx") - col("__sx") * col("__sx")
    val vy = nd * col("__syy") - col("__sy") * col("__sy")
    m.select(col(keyCol), col("lag"), col("n"),
      when(col("n") >= 2 && vx > lit(0.0) && vy > lit(0.0),
        cov / (sqrt(vx) * sqrt(vy))).as("corr"))
  }

  /** Single mean-shift changepoint per key — binary segmentation's first
    * split: the day t* maximizing the between-segment sum of squares of
    * the daily series, i.e. argmax of g(t) = P_t²/t + (S−P_t)²/(n−t)
    * over split points t (P = prefix sum; the constant-trend identity
    * makes the full SSE decomposition unnecessary). Prefix sums stay
    * exact DECIMAL; g is one fixed dag per row; the argmax folds as
    * max(struct(g, −t)) so ties break to the EARLIEST split. Keys with
    * n < 2 have no split and drop. Output: (key, n_periods, break_day —
    * first day of the right segment, mean_left, mean_right, delta). */
  def breakpoint(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
    val stepped = daily
      .withColumn("__t", row_number().over(w))
      .withColumn("__p", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__s", sum(col("__v")).over(Window.partitionBy(col(keyCol))))
      .withColumn("__nday", lead(col("__day"), 1).over(w))
      .where(col("__t") < col("__n"))
    val td = col("__t").cast("double")
    val nd = col("__n").cast("double")
    val pd = d(col("__p"))
    val sd = d(col("__s"))
    val g = pd * pd / td + (sd - pd) * (sd - pd) / (nd - td)
    val cand = struct(g.as("g"), (-col("__t")).as("nt"), pd.as("p"),
      sd.as("s"), td.as("t"), nd.as("n"),
      date_format(col("__nday"), "yyyy-MM-dd").as("bday"))
    stepped
      .select(col(keyCol), cand.as("__c"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__splits"), max(col("__c")).as("__m"))
      .select(col(keyCol), (col("__splits") + 1).as("n_periods"),
        col("__m.bday").as("break_day"),
        (col("__m.p") / col("__m.t")).as("mean_left"),
        ((col("__m.s") - col("__m.p")) /
          (col("__m.n") - col("__m.t"))).as("mean_right"))
      .withColumn("delta", col("mean_right") - col("mean_left"))
  }

  /** Additive seasonal decomposition of the per-day value series —
    * STL-lite: value = trend + seasonal + residual, where trend is the
    * CENTERED 7-row moving average (partial at the edges, divided by the
    * actual in-window count), seasonal is the mean detrended value of
    * the day's ISO weekday, and residual is what remains. Determinism
    * chain: daily sums are exact DECIMAL; trend = digit-string/count
    * (one fixed dag); detrended rounds to 6 dp DECIMAL before the
    * per-weekday mean so the seasonal aggregate is order-independent;
    * seasonal and residual are fixed dags from there. Two key-sharded
    * windows + one (key, dow) aggregate joined back.
    * Output: (key, day, dow, v, trend, seasonal, residual). */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("__tn", count(lit(1)).over(w))
      .withColumn("__ts", sum(col("__v")).over(w))
      .withColumn("trend", d(col("__ts")) / col("__tn").cast("double"))
      .withColumn("__det",
        round(d(col("__v")) - col("trend"), 6).cast("decimal(18,6)"))
      .withColumn("dow", dayofweek(col("__day")))
    val seasonal = trended.groupBy(col(keyCol), col("dow"))
      .agg((sum(col("__det")).cast("string").cast("double") /
        count(lit(1)).cast("double")).as("seasonal"))
    trended.join(seasonal, Seq(keyCol, "dow"))
      .select(col(keyCol), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("dow"), d(col("__v")).as("v"), col("trend"), col("seasonal"),
        (d(col("__det")) - col("seasonal")).as("residual"))
  }

  /** Linear-interpolation gap fill — the companion to [[resampleFill]]'s
    * forward fill: missing grid buckets take the straight line between
    * the nearest observed buckets on each side; rows outside the first/
    * last observation stay NULL ("edge"). Observed buckets report their
    * exact decimal sum through the digit-string hop; the interpolation
    * is one fixed dag over (prev, next) struct lookups carried by two
    * ignoreNulls windows (the oracle replays them with known-counting
    * joins — different mechanism, same semantics). Output: (key, bucket,
    * n, value, src ∈ observed|interpolated|edge). */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, unit: String = "day"): DataFrame = {
    require(Units.contains(unit.toLowerCase(java.util.Locale.ROOT)),
      s"interpolateLinear: unit must be one of $Units")
    val u = unit.toLowerCase(java.util.Locale.ROOT)
    val agg = df
      .groupBy(col(keyCol), graft.functions.Exprs.dateTruncCivil(u, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
    // grid in CIVIL epoch space: sequence() over timestamps would coerce
    // the NTZ bounds through the session zone; every supported unit is
    // fixed-width in the UTC-read frame, so a long-typed sequence is both
    // session-zone-invariant and cheaper
    val stepUs = u match {
      case "minute" => 60L * 1000000
      case "hour" => 3600L * 1000000
      case "day" => 86400L * 1000000
      case "week" => 7L * 86400 * 1000000
    }
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol), explode(sequence(
        graft.functions.Exprs.epochMicrosCivil(col("__mn")),
        graft.functions.Exprs.epochMicrosCivil(col("__mx")),
        lit(stepUs))).as("__bus"))
      .select(col(keyCol),
        graft.functions.Exprs.civilFromMicros(col("__bus")).as("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val withPos = joined
      .withColumn("__pos", row_number().over(w))
      .withColumn("__dv", col("__s").cast("string").cast("double"))
    val known = when(col("__n").isNotNull,
      struct(col("__pos").as("p"), col("__dv").as("v")))
    val framed = withPos
      .withColumn("__pv", last(known, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__nx", first(known, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))
    framed.select(col(keyCol), col("bucket"),
      coalesce(col("__n"), lit(0L)).as("n"),
      when(col("__n").isNotNull, col("__dv"))
        .when(col("__pv").isNotNull && col("__nx").isNotNull,
          col("__pv.v") + (col("__nx.v") - col("__pv.v")) *
            (col("__pos") - col("__pv.p")).cast("double") /
            (col("__nx.p") - col("__pv.p")).cast("double"))
        .as("value"),
      when(col("__n").isNotNull, "observed")
        .when(col("__pv").isNotNull && col("__nx").isNotNull, "interpolated")
        .otherwise("edge").as("src"))
  }

  /** Bollinger bands over the per-day value series: trailing `window`-row
    * mean ± `mult`·σ (population) per key, with a breakout flag when the
    * day's value leaves the band. The window sums Σv and Σv² stay exact
    * DECIMAL (order-independent) and cross the digit-string hop per row;
    * mean/σ/bands are one fixed double dag (σ = √max(0, n·Σv² − (Σv)²)/n
    * — the max-guard absorbs the tiny negative fp residue a
    * constant-valued window can produce). Early rows use the partial
    * window (standard). One aggregation + one key-sharded ROWS frame. */
  def bollinger(df: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, window: Int, mult: Double): DataFrame = {
    require(window >= 2, "bollinger: window must be >= 2 rows")
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
      .rowsBetween(-(window - 1), Window.currentRow)
    val framed = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      // cast to (12,2) before squaring: (12,2)^2 = (24,4) products fit
      // int64-pair multiplication in every decimal engine (the corrExact
      // width rule) — (18,2) squares overflowed DuckDB's int64 decimal
      // representation at the 10x replica. Contract: per-day sums must
      // fit 10 integer digits; wider feeds should pre-scale.
      .withColumn("__s2", sum(col("__v").cast("decimal(12,2)") *
        col("__v").cast("decimal(12,2)")).over(w))
    val nd = col("__n").cast("double")
    val stats = framed
      .withColumn("mean", d(col("__s")) / nd)
      .withColumn("sd", sqrt(greatest(lit(0.0),
        nd * d(col("__s2")) - d(col("__s")) * d(col("__s")))) / nd)
    stats
      .withColumn("upper", col("mean") + lit(mult) * col("sd"))
      .withColumn("lower", col("mean") - lit(mult) * col("sd"))
      .select(col(keyCol),
        date_format(col("__day"), "yyyy-MM-dd").as("day"),
        d(col("__v")).as("v"), col("__n").as("n_window"),
        col("mean"), col("sd"), col("upper"), col("lower"),
        (d(col("__v")) > col("upper") || d(col("__v")) < col("lower"))
          .as("breakout"))
  }

  /** Maximum drawdown of the per-period value series — the
    * peak-to-trough decline risk metric (portfolio equity, daily
    * revenue, queue depth): per key, bucket values into exact
    * DECIMAL(12,2) period sums, track the running peak (prefix max —
    * one key-sharded window), and report the largest peak − value gap.
    * Everything stays decimal until the final digit-string→double hop,
    * so the statistic is bit-identical on any engine and partitioning.
    *
    * The trough is the EARLIEST period achieving the max drawdown —
    * folded in the same aggregate via max(struct(dd, −day, …)), no
    * second window pass. Output: (key, n_periods, max_drawdown,
    * trough_day, peak_at_trough). */
  def drawdown(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("string").cast("double")
    val daily = df.groupBy(col(keyCol),
        graft.functions.Exprs.dateTruncCivil("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = daily
      .withColumn("__peak", max(col("__v")).over(w))
      .withColumn("__dd", col("__peak") - col("__v"))
      .withColumn("__negday",
        -datediff(col("__day"), to_date(lit("1970-01-01"))).cast("long"))
    stepped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_periods"),
        max(struct(col("__dd"), col("__negday"), col("__peak"),
          col("__day"))).as("__m"))
      .select(col(keyCol), col("n_periods"),
        d(col("__m.__dd")).as("max_drawdown"),
        date_format(col("__m.__day"), "yyyy-MM-dd").as("trough_day"),
        d(col("__m.__peak")).as("peak_at_trough"))
  }
}
