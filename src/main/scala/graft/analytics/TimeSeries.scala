package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series regularization over the events stream: resample each key's
  * irregular observations onto a fixed time grid and gap-fill by
  * last-observation-carried-forward (LOCF) — the step every metrics /
  * feature-engineering pipeline runs before joining event-derived series
  * with anything sampled on a clock.
  *
  * All grid arithmetic is exact epoch-microsecond integer division (same
  * convention as [[Sessions]]): bucket = us div step, so engines agree
  * bit-for-bit and the observed `value` doubles are carried verbatim —
  * never recomputed — into the output.
  *
  * Scale shape: ONE shuffle on the key; the per-bucket last-observation
  * aggregate, the per-key grid bounds, the grid join, and the LOCF window
  * all share that partitioning. The grid explode emits span/step rows per
  * key on that key's task — the caller picks a step sane for the span
  * (a year of seconds-resolution grid per key would be 3e7 rows on one
  * task; resample hourly, then explode the hour into finer grain in a
  * second pass if truly needed).
  */
object TimeSeries {

  /** Gate grid step: 6 h over the one-month synthetic events span gives
    * ~120 buckets/key with purchase observations in ~10% of them — both
    * the observed and the gap-fill branch run on every key.
    */
  val GateStepMicros: Long = 6L * 3600 * 1000 * 1000

  /** One row per (key, grid bucket) from the key's first to last observed
    * bucket: `n_obs` observations landed in the bucket, `value` is the
    * bucket's LAST observation (max (ts, event id) — deterministic under
    * ties) carried forward through empty buckets, `is_gap` marks filled
    * rows. The first bucket per key is observed by construction, so
    * `value` is never null.
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, stepMicros: Long): DataFrame = {
    // the gap rows [obs_i, obs_{i+1}) are generated directly from each
    // observation and its lead — no materialized grid, no grid⋈obs join,
    // no unbounded window frames. One explicit repartition on the key up
    // front; HashPartitioning(key) satisfies both the (key, bucket)
    // aggregation and the window's (key) clustering, so the whole pipeline
    // is ONE shuffle + one sort.
    val obs = observedBuckets(events, keyCol, tsCol, idCol, valueCol, stepMicros)
    val w = Window.partitionBy("key").orderBy("bucket")
    obs
      .withColumn("nb", lead("bucket", 1).over(w))
      .select(col("key"), col("bucket").as("ob"), col("n_obs"),
        col("obs_value"),
        explode(sequence(col("bucket"),
          coalesce(col("nb") - 1, col("bucket")))).as("bucket"))
      .select(col("key"), col("bucket"),
        (col("bucket") * stepMicros).as("bucket_us"),
        when(col("bucket") === col("ob"), col("n_obs")).otherwise(lit(0L))
          .as("n_obs"),
        col("obs_value").as("value"),  // LOCF: gaps carry the left obs
        (col("bucket") =!= col("ob")).as("is_gap"))
  }

  /** Deterministic per-(key, bucket) observation summary — one partial-
    * aggregatable pass: (us, eid) is unique per event, so max(struct)
    * picks the last observation order-free.
    *
    * NULL-valued events are filtered up front: they are non-observations
    * (the pre-rewrite `last/first(ignoreNulls)` contract treated them as
    * gaps to carry/interpolate across), and without the filter a trailing
    * null in a bucket would be picked by max(struct) and then propagate
    * through the entire following gap run.
    */
  private def observedBuckets(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, valueCol: String,
      stepMicros: Long): DataFrame =
    events.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("eid"),
        unix_micros(col(tsCol)).as("us"), col(valueCol).as("value"))
      .withColumn("bucket", expr(s"us div ${stepMicros}L"))
      .repartition(col("key"))
      .groupBy("key", "bucket")
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("us"), col("eid"), col("value"))).as("lastObs"))
      .select(col("key"), col("bucket"), col("n_obs"),
        col("lastObs.value").as("obs_value"))

  /** Linear-interpolation variant of [[resampleLocf]]: empty buckets
    * between two observed buckets take the straight line between the
    * surrounding observations instead of carrying the left one forward —
    * the gap-fill a numeric feature series (sensor readings, spend rates)
    * wants where LOCF steps would bias downstream windows.
    *
    * Determinism: the interpolation runs in ONE fixed double-expression
    * order — `pv + (nv - pv) * (Δbucket / span)` with both bucket deltas
    * exact small integers in double — so any engine reproduces the bits.
    * The grid spans first..last OBSERVED bucket per key, so every gap row
    * has both neighbors and `value` is never null.
    *
    * Scale shape: same single-shuffle pipeline as LOCF — each gap run is
    * generated from its LEFT observation plus the lead (next) observation,
    * so both interpolation endpoints ride on the generating row and no
    * unbounded forward/backward frames are needed.
    */
  def resampleLerp(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, stepMicros: Long): DataFrame = {
    val obs = observedBuckets(events, keyCol, tsCol, idCol, valueCol, stepMicros)
    val w = Window.partitionBy("key").orderBy("bucket")
    obs
      .withColumn("nb", lead("bucket", 1).over(w))
      .withColumn("nv", lead("obs_value", 1).over(w))
      .select(col("key"), col("bucket").as("ob"), col("n_obs"),
        col("obs_value"), col("nb"), col("nv"),
        explode(sequence(col("bucket"),
          coalesce(col("nb") - 1, col("bucket")))).as("bucket"))
      .select(col("key"), col("bucket"),
        (col("bucket") * stepMicros).as("bucket_us"),
        when(col("bucket") === col("ob"), col("n_obs")).otherwise(lit(0L))
          .as("n_obs"),
        when(col("bucket") === col("ob"), col("obs_value"))
          .otherwise(col("obs_value") + (col("nv") - col("obs_value")) *
            ((col("bucket") - col("ob")).cast("double") /
              (col("nb") - col("ob")).cast("double"))).as("value"),
        (col("bucket") =!= col("ob")).as("is_gap"))
  }

  /** Gate hopping shape: 6 h windows every 2 h (overlap factor 3). */
  val GateHopSizeMicros: Long = 6L * 3600 * 1000 * 1000
  val GateHopSlideMicros: Long = 2L * 3600 * 1000 * 1000

  /** Hopping (sliding) event-time windows: each event lands in
    * `size/slide` overlapping windows — the alert/rate shape tumbling
    * windows can't express (`pa_monitor_windows` is the tumbling member of
    * the family, `evt_sessions` the session member). Window starts are
    * exact epoch-micros arithmetic: the last start ≤ us is
    * `(us div slide) * slide`; the event also belongs to the size/slide−1
    * earlier starts still covering it. The explode factor is the overlap
    * factor (a constant), then ONE shuffle keyed (window, group) with
    * partial aggregation — identical semantics to Structured Streaming's
    * `window(ts, size, slide)` groupBy, which is the streaming twin
    * (spec-asserted batch ≡ stream). One contract note: the `div` window
    * start truncates toward zero while `window()` floors, so identity
    * holds for post-1970 timestamps (negative epochs would misalign by
    * one slide — same data contract as the theta day buckets).
    */
  def hoppingWindowAgg(events: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, sizeMicros: Long, slideMicros: Long): DataFrame = {
    require(sizeMicros % slideMicros == 0,
      "window size must be a multiple of the slide (same rule as Spark's window())")
    val k = sizeMicros / slideMicros
    events.select(col(groupCol).as("grp"), unix_micros(col(tsCol)).as("us"),
        col(valueCol).as("value"))
      .withColumn("w0", expr(s"(us div ${slideMicros}L) * ${slideMicros}L"))
      .withColumn("window_start",
        explode(sequence(col("w0") - lit((k - 1) * slideMicros), col("w0"),
          lit(slideMicros))))
      .groupBy(col("window_start"), col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("window_start"), col("grp"), col("n"), col("total"))
  }

  /** Anomaly window: stats over the 20 observations BEFORE each row (the
    * row never dilutes its own baseline); z needs ≥5 of them.
    */
  val AnomalyWin = 20
  val AnomalyMinObs = 5
  val AnomalyZ = 3.0

  /** Rolling z-score anomaly detection per key: each observation is scored
    * against the mean/std of its trailing `win` PRECEDING observations
    * (ordered by (ts, id) — deterministic under timestamp ties). Output
    * adds (n_win, z, is_anomaly); z is null during the warm-up (< `minObs`
    * trailing rows) and when the trailing window has zero variance.
    *
    * Determinism: the windowed moments are DECIMAL sums (value and value²
    * at fixed scale — integer addition, so any engine's window-sum
    * association, running vs segment-tree, yields the same bits), and only
    * the final mean/var/z arithmetic runs in doubles, in one fixed
    * expression order. A double window-sum would NOT be reproducible:
    * Spark slides sequentially, other engines sum frames tree-wise.
    *
    * Scale shape: ONE shuffle on the key; the three frame aggregates share
    * one window spec (single sort, single pass). Keys are (user, type) so
    * no partition grows with corpus size.
    */
  def rollingAnomalies(events: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, valueCol: String, win: Int = AnomalyWin,
      minObs: Int = AnomalyMinObs, zThreshold: Double = AnomalyZ): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("us"), col(idCol))
      .rowsBetween(-win, -1)
    val base = events.select(
      keys :+ col(idCol) :+ unix_micros(col(tsCol)).as("us") :+
        col(valueCol).as("value"): _*)
    val dec = col("value").cast("decimal(18,4)")
    val scored = base
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s1", sum(dec).over(w).cast("double"))
      .withColumn("s2", sum(dec * dec).over(w).cast("double"))
    scored
      .withColumn("mean", col("s1") / col("n_win"))
      .withColumn("variance",
        (col("s2") - col("s1") * col("s1") / col("n_win")) / col("n_win"))
      .withColumn("z",
        when(col("n_win") >= minObs && col("variance") > 0.0,
          (col("value") - col("mean")) / sqrt(col("variance"))))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("s1", "s2", "mean", "variance")
  }

  /** Exponentially weighted moving average, exact on an integer grid.
    * True EWMA is a recurrence (`s_i = α·x_i + (1-α)·s_{i-1}`) — not
    * window-expressible and numerically order-fragile. The engine form
    * truncates the exponential tail at `EwmaLags` trailing events (weight
    * 2^-16 beyond ≈ nothing) which makes it a fixed-frame window: weight
    * 2^(15-k) on the k-th lag, value quantized to a decimal(.,4) grid, so
    * numerator and denominator are exact BIGINTs on ANY partitioning and
    * the smoothed value is one IEEE division of exactly-representable
    * longs — bit-identical in the oracle, no floating accumulation order
    * anywhere. One shuffle (the per-user window); the `EwmaLags` lag
    * columns live inside a single window spec, evaluated in one pass.
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("us"), col(idCol))
    val base = events.select(col(keyCol), col(idCol),
      unix_micros(col(tsCol)).as("us"),
      (col(valueCol).cast("decimal(18,4)") * 10000).cast("long").as("xq"))
    def lagK(k: Int) = if (k == 0) col("xq") else lag(col("xq"), k).over(w)
    val num = (0 until EwmaLags).map { k =>
      coalesce(lagK(k), lit(0L)) * (1L << (EwmaLags - 1 - k))
    }.reduce(_ + _)
    val den = (0 until EwmaLags).map { k =>
      when(lagK(k).isNotNull, 1L << (EwmaLags - 1 - k)).otherwise(0L)
    }.reduce(_ + _)
    base.withColumn("ewma_num", num).withColumn("ewma_den", den)
      .withColumn("ewma",
        col("ewma_num").cast("double") / col("ewma_den").cast("double") / 10000.0)
      .drop("xq")
  }

  /** Exponential-tail truncation depth: 16 lags, weights 2^15 … 2^0. */
  val EwmaLags = 16

  /** Lag-k autocorrelation per key — the periodicity detector of the
    * family (EWMA smooths, OLS detects drift, this detects cycles): the
    * Pearson correlation between the series and itself `lagK` steps back,
    * in (ts, id) order. All moments are exact integers on the decimal(.,4)
    * grid, accumulated in DECIMAL(38) (the `cov_num` device from
    * [[graft.sim.Covariance]]: `m·Σxy − Σx·Σy` overflows BIGINT at this
    * grid), and r is one fixed-order double expression of them —
    * `num / (sqrt(d_x)·sqrt(d_y))` with each decimal→double cast an
    * IEEE-exact integer conversion, so the gate hash-checks with no
    * tolerance. r is null when either side's variance is zero. One
    * shuffle (the per-key lag window), then a per-key aggregate.
    */
  def lagAutocorrelation(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, lagK: Int): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("us"), col("iid"))
    val dec = "decimal(38,0)"
    val base = events.select(col(keyCol).as("key"),
        unix_micros(col(tsCol)).as("us"), col(idCol).as("iid"),
        (col(valueCol).cast("decimal(18,4)") * 10000).cast("long").as("xq"))
      .withColumn("yq", lag(col("xq"), lagK).over(w))
      .filter(col("yq").isNotNull)
    val agg = base.groupBy("key").agg(
      count(lit(1)).cast(dec).as("m"),
      sum(col("xq").cast(dec)).as("sx"),
      sum(col("yq").cast(dec)).as("sy"),
      sum((col("xq").cast(dec) * col("yq").cast(dec))).as("sxy"),
      sum((col("xq").cast(dec) * col("xq").cast(dec))).as("sxx"),
      sum((col("yq").cast(dec) * col("yq").cast(dec))).as("syy"))
    agg.select(col("key"),
        lit(lagK).cast("long").as("lag"),
        col("m").cast("long").as("n_pairs"),
        (col("m") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("m") * col("sxx") - col("sx") * col("sx")).as("dx"),
        (col("m") * col("syy") - col("sy") * col("sy")).as("dy"))
      .withColumn("r",
        when(col("dx") > 0 && col("dy") > 0,
          col("num").cast("double") /
            (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double")))))
      .select("key", "lag", "n_pairs", "r")
  }

  /** Gate autocorrelation lag. */
  val GateAutocorrLag = 1

  /** Per-key ordinary-least-squares trend (slope + intercept of value
    * over time) from closed-form moment sums — regression as ONE partial
    * aggregate: per key, (n, Σx, Σy, Σxy, Σx²) where x = minutes since
    * the key's first observation and y = the decimal(.,4)-grid value.
    * Every moment is an exact BIGINT on any partitioning (x is bounded by
    * the observation span in minutes, so xy products stay far under
    * 2⁶³); the slope/intercept numerators (`n·Σxy − Σx·Σy` etc.) run in
    * DECIMAL(38) on the per-key result rows (they overflow BIGINT around
    * n≈10⁴ at this grid), and the final values are fixed-order double
    * divisions — hash-identical in the oracle. Keys with a degenerate
    * x-variance (fewer than 2 distinct times) emit null slope/intercept.
    *
    * Two narrow window/agg stages, both keyed on `keyCol` (one shuffle):
    * the min-time window shares the partitioning with the moment
    * aggregate.
    */
  def trendOls(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val base = events.select(col(keyCol),
      unix_micros(col(tsCol)).as("us"),
      (col(valueCol).cast("decimal(18,4)") * 10000).cast("long").as("yq"))
      .withColumn("min_us", min(col("us")).over(w))
      .withColumn("x", expr("(us - min_us) div 60000000"))
    val m = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("yq")).as("sy"),
        sum(col("x") * col("yq")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    m.withColumn("den", d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx")))
      .withColumn("slope_num",
        d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
      .withColumn("slope",
        when(col("den") =!= 0,
          col("slope_num").cast("double") / col("den").cast("double") / 10000.0))
      .withColumn("intercept",
        when(col("den") =!= 0,
          (d38(col("sy")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sxy")))
            .cast("double") / col("den").cast("double") / 10000.0))
      .select(keyCol, "n", "sx", "sy", "sxy", "sxx", "slope", "intercept")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_trend_ols" -> ((s, d) =>
      trendOls(Tables.events(s, d).filter(col("event_type") === "view"),
        "user_id", "ts", "value")
        .orderBy("user_id")),
    "evt_ewma" -> ((s, d) =>
      ewma(Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", "event_id", "value")
        .orderBy("user_id", "us", "event_id")),
    "evt_resample_locf" -> ((s, d) =>
      resampleLocf(Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", "event_id", "value", GateStepMicros)
        .orderBy("key", "bucket")),
    "evt_resample_lerp" -> ((s, d) =>
      resampleLerp(Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", "event_id", "value", GateStepMicros)
        .orderBy("key", "bucket")),
    "evt_hopping_windows" -> ((s, d) =>
      hoppingWindowAgg(Tables.events(s, d), "event_type", "ts", "value",
        GateHopSizeMicros, GateHopSlideMicros)
        .orderBy("window_start", "grp")),
    "evt_anomalies" -> ((s, d) =>
      rollingAnomalies(Tables.events(s, d), Seq("user_id", "event_type"),
        "ts", "event_id", "value")
        .orderBy("user_id", "event_type", "us", "event_id")),
    "evt_autocorr" -> ((s, d) =>
      lagAutocorrelation(Tables.events(s, d), "user_id", "ts", "event_id",
        "value", GateAutocorrLag)
        .orderBy("key")))

  /** DuckDB twin: identical bucket arithmetic over epoch_us; the
    * deterministic "last observation" is the row_number twin of the
    * Spark-side struct max, and LOCF is last_value IGNORE NULLS.
    */
  /** The EWMA oracle expands the same lag pyramid under a named window;
    * integer weights and one final double division, like the engine.
    */
  private val ewmaSql: String = {
    def lagK(k: Int) = if (k == 0) "xq" else s"LAG(xq, $k) OVER w"
    val num = (0 until EwmaLags)
      .map(k => s"COALESCE(${lagK(k)}, 0) * ${1L << (EwmaLags - 1 - k)}")
      .mkString(" + ")
    val den = (0 until EwmaLags)
      .map(k =>
        s"CASE WHEN ${lagK(k)} IS NOT NULL THEN ${1L << (EwmaLags - 1 - k)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
       |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
       |  FROM events WHERE event_type = 'purchase'),
       |l AS (SELECT user_id, event_id, us,
       |    $num AS ewma_num,
       |    $den AS ewma_den
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT user_id, event_id, us, ewma_num,
       |  CAST(ewma_den AS BIGINT) AS ewma_den,
       |  CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) / 10000.0 AS ewma
       |FROM l ORDER BY user_id, us, event_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same exact integer moments via HUGEINT (DuckDB's decimal multiply
    // binds precision p1+p2 ≤ 38, so the engine's DECIMAL(38) chain is
    // spelled int128 here — both are exact integers, and the final
    // integer→double casts are IEEE-identical)
    "evt_autocorr" -> s"""
      |WITH b AS (SELECT user_id AS key, epoch_us(ts) AS us, event_id AS iid,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
      |  FROM events),
      |l AS (SELECT key, xq,
      |    lag(xq, $GateAutocorrLag) OVER (PARTITION BY key ORDER BY us, iid) AS yq
      |  FROM b),
      |f AS (SELECT key, CAST(xq AS HUGEINT) AS x, CAST(yq AS HUGEINT) AS y
      |  FROM l WHERE yq IS NOT NULL),
      |a AS (SELECT key, CAST(COUNT(*) AS HUGEINT) AS m,
      |    SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM f GROUP BY key),
      |d AS (SELECT key, m,
      |    m * sxy - sx * sy AS num,
      |    m * sxx - sx * sx AS dx,
      |    m * syy - sy * sy AS dy
      |  FROM a)
      |SELECT key, CAST($GateAutocorrLag AS BIGINT) AS lag,
      |  CAST(m AS BIGINT) AS n_pairs,
      |  CASE WHEN dx > 0 AND dy > 0 THEN CAST(num AS DOUBLE) /
      |    (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) END AS r
      |FROM d ORDER BY key""".stripMargin,
    "evt_trend_ols" -> """
      |WITH b AS (SELECT user_id, epoch_us(ts) AS us,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yq
      |  FROM events WHERE event_type = 'view'),
      |x AS (SELECT user_id, yq,
      |    (us - MIN(us) OVER (PARTITION BY user_id)) // 60000000 AS x
      |  FROM b),
      |m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
      |    CAST(SUM(x * yq) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM x GROUP BY user_id),
      |d AS (SELECT *,
      |    CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0)) -
      |      CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS den
      |  FROM m)
      |SELECT user_id, n, sx, sy, sxy, sxx,
      |  CASE WHEN den <> 0 THEN
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0)) -
      |         CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) / 10000.0 END AS slope,
      |  CASE WHEN den <> 0 THEN
      |    CAST(CAST(CAST(sy AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0)) -
      |         CAST(sx AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) / 10000.0 END AS intercept
      |FROM d ORDER BY user_id""".stripMargin,
    "evt_ewma" -> ewmaSql,
    "evt_resample_locf" -> s"""
      |WITH e AS (SELECT user_id AS key, event_id AS eid, epoch_us(ts) AS us,
      |    value, epoch_us(ts) // ${GateStepMicros} AS bucket
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |cnt AS (SELECT key, bucket, CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM e GROUP BY 1, 2),
      |rk AS (SELECT key, bucket, value,
      |    row_number() OVER (PARTITION BY key, bucket ORDER BY us DESC, eid DESC) AS rn
      |  FROM e),
      |obs AS (SELECT key, bucket, n_obs, value AS obs_value
      |  FROM cnt JOIN (SELECT key, bucket, value FROM rk WHERE rn = 1)
      |  USING (key, bucket)),
      |span AS (SELECT key, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM e GROUP BY 1),
      |grid AS (SELECT key, unnest(range(b0, b1 + 1)) AS bucket FROM span),
      |j AS (SELECT g.key, g.bucket, o.n_obs, o.obs_value
      |  FROM grid g LEFT JOIN obs o USING (key, bucket))
      |SELECT key, bucket, bucket * ${GateStepMicros} AS bucket_us,
      |  COALESCE(n_obs, 0) AS n_obs,
      |  last_value(obs_value IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |  obs_value IS NULL AS is_gap
      |FROM j ORDER BY key, bucket""".stripMargin,
    // lerp twin: identical grid CTEs; prev/next neighbors via
    // IGNORE NULLS frames, interpolation in the same expression order as
    // the Spark side (pv + (nv - pv) * (Δ / span)) so doubles match bits
    "evt_resample_lerp" -> s"""
      |WITH e AS (SELECT user_id AS key, event_id AS eid, epoch_us(ts) AS us,
      |    value, epoch_us(ts) // ${GateStepMicros} AS bucket
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |cnt AS (SELECT key, bucket, CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM e GROUP BY 1, 2),
      |rk AS (SELECT key, bucket, value,
      |    row_number() OVER (PARTITION BY key, bucket ORDER BY us DESC, eid DESC) AS rn
      |  FROM e),
      |obs AS (SELECT key, bucket, n_obs, value AS obs_value
      |  FROM cnt JOIN (SELECT key, bucket, value FROM rk WHERE rn = 1)
      |  USING (key, bucket)),
      |span AS (SELECT key, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM e GROUP BY 1),
      |grid AS (SELECT key, unnest(range(b0, b1 + 1)) AS bucket FROM span),
      |j AS (SELECT g.key, g.bucket, o.n_obs, o.obs_value
      |  FROM grid g LEFT JOIN obs o USING (key, bucket)),
      |nn AS (SELECT *,
      |    last_value(obs_value IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN obs_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER wb AS pb,
      |    first_value(obs_value IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN obs_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nb
      |  FROM j
      |  WINDOW wb AS (PARTITION BY key ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY key ORDER BY bucket
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT key, bucket, bucket * ${GateStepMicros} AS bucket_us,
      |  COALESCE(n_obs, 0) AS n_obs,
      |  CASE WHEN obs_value IS NOT NULL THEN obs_value
      |       ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
      |  END AS value,
      |  obs_value IS NULL AS is_gap
      |FROM nn ORDER BY key, bucket""".stripMargin,
    "evt_hopping_windows" -> s"""
      |WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS us, value
      |  FROM events),
      |x AS (SELECT grp, value,
      |    unnest(range((us // ${GateHopSlideMicros}) * ${GateHopSlideMicros}
      |        - ${(GateHopSizeMicros / GateHopSlideMicros - 1) * GateHopSlideMicros},
      |      (us // ${GateHopSlideMicros}) * ${GateHopSlideMicros} + 1,
      |      ${GateHopSlideMicros})) AS window_start
      |  FROM e)
      |SELECT window_start, grp, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
      |FROM x GROUP BY 1, 2 ORDER BY window_start, grp""".stripMargin,
    "evt_anomalies" -> s"""
      |WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value
      |  FROM events),
      |f AS (SELECT *,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS s1,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS s2
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us, event_id
      |    ROWS BETWEEN $AnomalyWin PRECEDING AND 1 PRECEDING)),
      |g AS (SELECT *,
      |    (s2 - s1 * s1 / n_win) / n_win AS variance, s1 / n_win AS mean
      |  FROM f)
      |SELECT user_id, event_type, event_id, us, value, n_win,
      |  CASE WHEN n_win >= $AnomalyMinObs AND variance > 0.0
      |       THEN (value - mean) / sqrt(variance) END AS z,
      |  COALESCE(abs(CASE WHEN n_win >= $AnomalyMinObs AND variance > 0.0
      |       THEN (value - mean) / sqrt(variance) END) > $AnomalyZ, FALSE) AS is_anomaly
      |FROM g ORDER BY user_id, event_type, us, event_id""".stripMargin)
}
