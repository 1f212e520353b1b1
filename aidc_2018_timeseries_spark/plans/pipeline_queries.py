"""Catalog queries: composed dataset pipelines + array pad operators.

``turbofan_rul_pipeline`` is the flagship (entry()) query — the reference's
§3.1 chain (scale → strided windows → capped RUL labels) as one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.padding import (
    pad_front_repeat_first,
    pad_or_truncate_front_zero,
)
from aidc_2018_timeseries_spark.pipelines.turbofan import rul_window_features
from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.synthetic import adding_problem
from aidc_2018_timeseries_spark.sources.tables import load_table

_ORA_WIN = "PARTITION BY user_id ORDER BY ts, event_id"


# --- flagship: the full turbofan RUL feature pipeline on events ---
@register(
    "turbofan_rul_pipeline",
    f"""
    WITH scaled AS (
      SELECT user_id, event_id, ts,
             value / MAX(value) OVER (PARTITION BY user_id) AS v
      FROM events),
    r AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER ({_ORA_WIN}) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             ROUND(AVG(v) OVER ({_ORA_WIN}
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS win_mean
      FROM scaled)
    SELECT user_id, event_id, win_mean, CAST(LEAST(n - rn, 130) AS BIGINT) AS rul
    FROM r WHERE rn >= 20 AND (rn - 20) % 5 = 0
    """,
    doc="flagship: A1 scaling → W2 strided windows (T=20,skip=5) → W3/P5 "
    "capped RUL labels, single-shuffle composed plan (reference §3.1 chain)",
)
def turbofan_rul_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = rul_window_features(
        ev, "user_id", ["ts", "event_id"], "value", seq_len=20, skip=5, cap=130
    )
    return out.select("user_id", "event_id", "win_mean", "rul")


# --- S5: the adding problem, deterministic hash-derived randomness ---
def _adding_oracle(n: int = 1000, t: int = 50) -> str:
    h = lambda e: f"CAST(CONCAT('0x', SUBSTR(MD5({e}), 1, 15)) AS BIGINT)"  # noqa: E731
    space = float(1 << 60)
    return f"""
    WITH s AS (SELECT range AS sample_id FROM range({n})),
    p AS (
      SELECT sample_id,
             {h("CONCAT('p1:', sample_id::VARCHAR)")} % {t} AS pos1,
             {h("CONCAT('p2:', sample_id::VARCHAR)")} % {t - 1} AS pos2_raw
      FROM s),
    pp AS (
      SELECT sample_id, pos1,
             CASE WHEN pos2_raw >= pos1 THEN pos2_raw + 1 ELSE pos2_raw END AS pos2
      FROM p),
    v AS (
      SELECT sample_id, pos1, pos2,
             list_transform(range(0, {t}),
               j -> {h("CONCAT('v:', sample_id::VARCHAR, ':', j::VARCHAR)")} / {space})
               AS vals
      FROM pp)
    SELECT sample_id, pos1, pos2,
           ROUND(vals[CAST(pos1 + 1 AS INTEGER)] + vals[CAST(pos2 + 1 AS INTEGER)], 6)
             AS label
    FROM v
    """


@register(
    "s5_adding_problem",
    _adding_oracle(),
    doc="S5 synthetic adding-problem generator: hash-derived U(0,1) values, "
    "two distinct mask positions, label = their sum (RNG-parity-safe)",
)
def s5_adding_problem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = adding_problem(spark, n_samples=1000, seq_len=50)
    return df.select("sample_id", "pos1", "pos2", "label")


@register(
    "pyds_adding_problem",
    _adding_oracle(),
    doc="the adding-problem generator as a CUSTOM PYTHON DATA SOURCE "
    "(Spark 4 pyspark.sql.datasource API, sources/pydatasource.py): "
    "spark.read.format('adding_problem_py') with partition-parallel "
    "generation (partitions() splits the sample range; each worker "
    "produces its slice independently). Same md5-derived deterministic "
    "scheme as s5_adding_problem, so the SAME DuckDB oracle hash-checks "
    "a source implemented in Python — the scan-layer extension path for "
    "formats Spark lacks natively",
)
def pyds_adding_problem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.sources import pydatasource

    pydatasource.register(spark)
    return (
        spark.read.format("adding_problem_py")
        .option("n", "1000")
        .option("seq_len", "50")
        .option("numPartitions", "8")
        .load()
    )


# --- W14: autoregressive generation with the trailing-mean predictor ---
def _w14_mean_oracle(seq_len: int = 10, n_steps: int = 5) -> str:
    """Unroll the generate loop (seed window → predict mean → slide →
    feed back) into ``n_steps`` chained CTEs — the BPE-unroll trick
    applied to W14's general predictor. The trailing mean is a
    sequential left-fold sum / seq_len in BOTH engines (see
    ml/autoregressive.trailing_mean_predictor), so the fed-back doubles
    are bit-identical at every step and only the emitted values round."""
    steps = []
    for i in range(1, n_steps + 1):
        prev = "w0" if i == 1 else f"w{i - 1}"
        preds = "[p]" if i == 1 else "preds || [p]"
        steps.append(
            f"""g{i} AS (SELECT user_id, tail, w,
        {"" if i == 1 else "preds, "}list_reduce(w, (a, x) -> a + x)
          / {float(seq_len)}::DOUBLE AS p FROM {prev}),
    w{i} AS (SELECT user_id, tail, w[2:] || [p] AS w, {preds} AS preds
             FROM g{i})"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS (SELECT user_id, value, ts, event_id FROM events),
    s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
          FROM e GROUP BY user_id),
    t AS (SELECT user_id,
                 vals[greatest(len(vals) - {seq_len + n_steps} + 1, 1):] AS tail
          FROM s WHERE len(vals) >= {seq_len + 1}),
    w0 AS (SELECT user_id, tail, tail[1:{seq_len}] AS w FROM t),
    {chain}
    SELECT user_id, CAST(i AS INT) AS step,
           ROUND(preds[i], 6) AS generated,
           ROUND(CASE WHEN {seq_len} + i <= len(tail)
                      THEN tail[{seq_len} + i]
                      ELSE 'NaN'::DOUBLE END, 6) AS actual
    FROM w{n_steps}, unnest(range(1, {n_steps + 1})) AS u(i)
    """


@register(
    "w14_autoregressive_generation",
    _w14_mean_oracle(),
    doc="W14 autoregressive generation: seed window → predict → slide → "
    "feed back, per series via applyInPandas (parallel across series). "
    "ORACLE-CHECKED since round 7 (previously rows-only 'sequential per "
    "series'): with the default trailing-mean predictor the loop unrolls "
    "into 5 fixed SQL rounds (see _w14_mean_oracle) — the identity-"
    "predictor fixed point and the TCN closed form were rounds 4/7's "
    "steps; this closes the LAST W14 variant. Missing actuals emit NaN "
    "on both sides; output rounds at 6 dp, feedback stays unrounded",
)
def w14_autoregressive_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.ml.autoregressive import autoregressive_generate

    out = autoregressive_generate(
        load_table(spark, sf_dir, "events"),
        "user_id", ["ts", "event_id"], "value", seq_len=10, n_steps=5,
    )
    return out.select(
        "user_id", "step",
        F.round("generated", 6).alias("generated"),
        F.round("actual", 6).alias("actual"),
    )


# --- O2: seeded shuffle (order not hash-checkable — rows-only) ---
@register(
    "o2_seeded_shuffle",
    None,  # RNG parity with NumPy impossible (SURVEY §7); rows-only check
    doc="O2 seeded random permutation via orderBy(rand(seed)); X/y stay "
    "aligned because they are columns of one row",
)
def o2_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import seeded_shuffle

    ev = load_table(spark, sf_dir, "events")
    return seeded_shuffle(ev.select("event_id", "user_id", "value"), seed=42)


# --- W5: front-pad by repeating the first row (turbofan pad rule) ---
@register(
    "w5_pad_repeat_first",
    """
    WITH arr AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS a
      FROM events GROUP BY user_id),
    p AS (
      SELECT user_id,
             CASE WHEN len(a) >= 100 THEN a
                  ELSE list_concat(list_transform(range(1, 100 - len(a) + 1), i -> a[1]), a)
             END AS pa
      FROM arr)
    SELECT user_id, generate_subscripts(pa, 1) AS idx, unnest(pa) AS v FROM p
    """,
    doc="W5 left-pad short series by repeating the first value to length 100 "
    "(turbofan rule; exploded long form for value-hash checking)",
)
def w5_pad_repeat_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("a")
    )
    padded = arr.select("user_id", pad_front_repeat_first("a", 100).alias("pa"))
    return padded.select(
        "user_id", F.posexplode("pa").alias("idx0", "v")
    ).select("user_id", (F.col("idx0") + 1).cast("long").alias("idx"), "v")


# --- W6: zero-pad front / keep-last truncate to fixed length (music pad rule) ---
@register(
    "w6_pad_truncate_zero",
    """
    WITH arr AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS a
      FROM events GROUP BY user_id),
    p AS (
      SELECT user_id,
             CASE WHEN len(a) >= 50 THEN list_slice(a, len(a) - 49, len(a))
                  ELSE list_concat(list_transform(range(1, 50 - len(a) + 1), i -> 0.0), a)
             END AS pa
      FROM arr)
    SELECT user_id, generate_subscripts(pa, 1) AS idx, unnest(pa) AS v FROM p
    """,
    doc="W6 force length exactly 50: longer keeps LAST rows, shorter "
    "zero-pads at the front (music rule — intentionally ≠ W5)",
)
def w6_pad_truncate_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("a")
    )
    padded = arr.select("user_id", pad_or_truncate_front_zero("a", 50).alias("pa"))
    return padded.select(
        "user_id", F.posexplode("pa").alias("idx0", "v")
    ).select("user_id", (F.col("idx0") + 1).cast("long").alias("idx"), "v")


_H = "CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{seed}:', CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)"


# --- O2 (deterministic form): hash-keyed permutation, fully oracle-checked ---
@register(
    "o2_hash_permutation",
    f"""
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY {_H.format(seed='shuf:42')}, event_id) - 1 AS pos
    FROM events
    """,
    doc="O2 as a deterministic md5-keyed permutation — reproducible across "
    "engines/partitioning (unlike rand(seed)), so the full permutation is "
    "oracle-checked",
)
def o2_hash_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import hash_permutation_shuffle

    ev = load_table(spark, sf_dir, "events").select("event_id")
    return hash_permutation_shuffle(ev, "event_id", seed=42).select("event_id", "pos")


# --- deterministic Bernoulli + stratified sampling (100 TB reproducibility) ---
@register(
    "sample_hash_5pct",
    f"""
    SELECT event_id, user_id FROM events
    WHERE {_H.format(seed='sample:7')} % 1000000 < 50000
    """,
    doc="deterministic 5% Bernoulli sample keyed by md5(seed:id) — "
    "scan-shaped, reproducible across engines and partitionings",
)
def sample_hash_5pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import hash_sample

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return hash_sample(ev, "event_id", fraction=0.05, seed=7)


@register(
    "sample_stratified",
    f"""
    SELECT event_id, event_type FROM events
    WHERE {_H.format(seed='sample:7')} % 1000000 <
          CASE event_type WHEN 'view' THEN 20000 WHEN 'click' THEN 100000
                          WHEN 'error' THEN 1000000 END
    """,
    doc="stratified deterministic sample: downsample dominant types (2% "
    "views, 10% clicks), keep every error, drop the rest — reproducible "
    "sampleBy",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import stratified_hash_sample

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return stratified_hash_sample(
        ev, "event_id", "event_type",
        {"view": 0.02, "click": 0.10, "error": 1.0}, seed=7,
    )


_HDOC = (
    "CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('mix:7:', CAST(doc_id AS VARCHAR))), 1, 15)) "
    "AS BIGINT)"
)


@register(
    "sample_mixture_upweight",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                         WHEN 'src2' THEN 0 WHEN 'src3' THEN 3 ELSE 1 END
             + CASE WHEN {_HDOC} % 1000000 <
                    CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 500000
                                WHEN 'src2' THEN 0 WHEN 'src3' THEN 0 ELSE 0 END
               THEN 1 ELSE 0 END AS n
      FROM documents)
    SELECT doc_id, source, CAST(copy_idx AS BIGINT) AS copy_idx FROM (
      SELECT doc_id, source, unnest(generate_series(1, n)) AS copy_idx
      FROM d WHERE n >= 1)
    """,
    doc="LLM domain-mixture resampling with weights > 1 ('epochs per "
    "domain'): src3 ×3, src0 ×2.5 (hash-Bernoulli fractional copy), src1 "
    "×0.5 downsample, src2 dropped, everything else ×1 — map-side "
    "explode(sequence), no shuffle, no RNG, reproducible across engines",
)
def sample_mixture_upweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import upweight_mixture

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return upweight_mixture(
        d,
        "doc_id",
        "source",
        {"src0": 2.5, "src1": 0.5, "src2": 0.0, "src3": 3.0},
        seed=7,
    )


# --- §3.3 forecasting chain: W1(T+1) → next-point target → P4 → W13 split ---
@register(
    "forecasting_next_point",
    """
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING), 6) AS x_mean,
             -- zero-filter is over the X window ONLY (20 rows, excluding
             -- the current row = the y target), matching drop_zero_windows
             -- on the flattened x in next_point_dataset
             SUM(ABS(value)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS win_abs
      FROM events),
    w AS (SELECT user_id, rn, x_mean, value AS y FROM r
          WHERE rn >= 21 AND win_abs > 1e-12),
    s AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS krn,
                 CAST(ROUND(0.8 * COUNT(*) OVER (PARTITION BY user_id), 0) AS BIGINT)
                   AS cutoff FROM w)
    SELECT user_id, rn, x_mean, y,
           CASE WHEN krn <= cutoff THEN 'train' ELSE 'test' END AS split
    FROM s
    """,
    doc="§3.3 TimeSeries chain end-to-end: rolling (T+1)-windows (T=20) → "
    "X/next-point-y pairs → P4 zero filter → W13 80/20 time split, "
    "assigned PER SERIES (key-partitioned windows, no global sort — the "
    "100 TB-clean split; each series' most-recent 20% is held out)",
)
def forecasting_next_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.pipelines.forecasting import next_point_dataset

    ev = load_table(spark, sf_dir, "events")
    ds = next_point_dataset(ev, "user_id", ["ts", "event_id"], ["value"], seq_len=20)
    x_mean = F.aggregate(
        F.transform("x", lambda s: s["value"].cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    ) / F.lit(20.0)
    return ds.select(
        "user_id",
        "rn",
        F.round(x_mean, 6).alias("x_mean"),
        F.col("y")["value"].alias("y"),
        "split",
    )


# --- W14 with a last-value predictor: the one autoregressive case whose
# fixed point is SQL-expressible, upgrading W14 from rows-only to checked ---
@register(
    "w14_identity_autoregressive",
    """
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS len
      FROM events),
    full_series AS (SELECT DISTINCT user_id, len FROM r WHERE len >= 15),
    steps AS (SELECT user_id, len, unnest(range(1, 6)) AS step FROM full_series),
    seed AS (SELECT r.user_id, r.value AS generated FROM r
             JOIN full_series f ON f.user_id = r.user_id AND r.rn = f.len - 5)
    SELECT s.user_id, CAST(s.step AS INT) AS step,
           ROUND(seed.generated, 6) AS generated,
           ROUND(a.value, 6) AS actual
    FROM steps s
    JOIN seed ON seed.user_id = s.user_id
    JOIN r a ON a.user_id = s.user_id AND a.rn = s.len - 5 + s.step
    """,
    doc="W14 autoregressive loop with the identity (last-value) predictor: "
    "sliding the window onto its own prediction reaches a fixed point = "
    "the last seed value, so the whole generation is oracle-checkable "
    "(the general-predictor form stays rows-only as w14_autoregressive_generation)",
)
def w14_identity_autoregressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.ml.autoregressive import autoregressive_generate
    from aidc_2018_timeseries_spark.operators.filters import min_length_filter

    ev = load_table(spark, sf_dir, "events")
    ev = min_length_filter(ev, "user_id", min_len=15)
    out = autoregressive_generate(
        ev, "user_id", ["ts", "event_id"], "value",
        seq_len=10, n_steps=5, predictor=lambda w: float(w[-1]),
    )
    return out.select(
        "user_id", "step",
        F.round("generated", 6).alias("generated"),
        F.round("actual", 6).alias("actual"),
    )


# --- M11/M12 training curve: per-step loss of a deterministic GD fit ---
_GD_LR, _GD_STEPS, _GD_CAP, _GD_TRAIL = 0.1, 25, 130, 3


def _training_curve_oracle() -> str:
    """Replay the EXACT optimization trajectory in DuckDB: same integer
    sufficient statistics, same (identically-associated) double recurrence
    via recursive CTE — the driver hash-checks every iterate of the fit,
    not just the final metric. Arithmetic strings mirror
    ml/training.py:rul_gd_training_curve verbatim."""
    return f"""
    WITH RECURSIVE r AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS len
      FROM events),
    lab AS (SELECT rn AS x, LEAST(len - rn, {_GD_CAP}) AS y FROM r),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy
      FROM lab),
    d AS (
      SELECT n, syy,
             CAST(sy AS DOUBLE) / n AS ybar,
             sxx - CAST(sx AS DOUBLE) * sx / n AS suu,
             sxy - CAST(sx AS DOUBLE) * sy / n AS suy
      FROM stats),
    gd AS (
      SELECT 0 AS step, CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b
      UNION ALL
      SELECT step + 1,
             a - {_GD_LR!r} * 2.0 * (a - ybar),
             b - {_GD_LR!r} * 2.0 * (b - suy / suu)
      FROM gd, d WHERE step < {_GD_STEPS - 1}),
    curve AS (
      SELECT step,
             a*a + b*b*suu/n - 2.0*b*suy/n - 2.0*a*ybar + CAST(syy AS DOUBLE)/n AS loss
      FROM gd, d),
    tr AS (
      SELECT step, loss,
             AVG(loss) OVER (ORDER BY step
               ROWS BETWEEN {_GD_TRAIL - 1} PRECEDING AND CURRENT ROW) AS lt
      FROM curve)
    SELECT CAST(step AS BIGINT) AS step, ROUND(loss, 6) AS loss,
           ROUND(lt, 6) AS loss_trail
    FROM tr
    """


@register(
    "training_curve_gd",
    _training_curve_oracle(),
    doc="M11/M12 training-curve face: per-step MSE of a preconditioned GD "
    "fit of rul ~ a + b*(cycle - mean) — ONE distributed integer-exact "
    "statistics aggregation, then a deterministic scalar recurrence whose "
    "every iterate both engines reproduce bit-identically; loss_trail is "
    "the A8 trailing-3 mean over the real step series (reference "
    "training/timeseries_trainer.py:92-110 logs cost per iteration)",
)
def training_curve_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.ml.training import rul_gd_training_curve

    ev = load_table(spark, sf_dir, "events")
    return rul_gd_training_curve(
        ev, "user_id", ["ts", "event_id"],
        lr=_GD_LR, n_steps=_GD_STEPS, cap=_GD_CAP, trailing=_GD_TRAIL,
    )


# --- W14 with the TCN model predictor: reference-faithful generation ---
_W14_SEQ, _W14_STEPS = 10, 5


def _w14_tcn_weights():
    """The face's pinned model: 1 residual block, kernel 2, 2 hidden
    channels (seeded). Receptive field (k-1)·2+1 = 3, so the scalar
    prediction is a CLOSED FORM over the window's last three points —
    which is what makes the autoregressive loop oracle-expressible
    (round-6 verdict item 7; the ewma_final_fold recurrence pattern).
    The deep default config stays covered by the distributed==local
    parity pin in tests/test_autoregressive_seq2seq.py."""
    from aidc_2018_timeseries_spark.ml.tcn import TCNWeights

    return TCNWeights(n_features=1, n_hidden=2, levels=1, kernel_size=2, seed=42)


def _w14_tcn_step_sql(a: str, b: str, c: str) -> str:
    """One tcn_forward(window[-3:]) as a DuckDB expression with the
    weight-NORMALIZED constants inlined (one Python source of truth:
    _w14_tcn_weights + ml.tcn.weight_normalized). Float grouping mirrors
    the NumPy accumulation exactly: conv taps fold ((tap0 + tap1) + bias),
    two-term dots group (x·w0 + x·w1), relu = GREATEST(·, 0.0), residual
    adds after the main path's relu — so both engines produce the same
    doubles bit-for-bit and the 6-dp output round is cosmetic."""
    from aidc_2018_timeseries_spark.ml.tcn import weight_normalized

    v1, g1, b1, v2, g2, b2, side = _w14_tcn_weights().blocks[0]
    W1 = weight_normalized(v1, g1)  # (k=2, 1, 2)
    W2 = weight_normalized(v2, g2)  # (k=2, 2, 2)
    wr, br = _w14_tcn_weights().readout  # (2, 1), (1,)

    def h1(x0: str, x1: str, ch: int) -> str:
        return (
            f"GREATEST((({x0}) * {W1[0, 0, ch]!r} + ({x1}) * {W1[1, 0, ch]!r})"
            f" + {b1[ch]!r}, 0.0)"
        )

    h1p = [h1(a, b, ch) for ch in range(2)]  # h1 at T-2: taps x[T-3], x[T-2]
    h1l = [h1(b, c, ch) for ch in range(2)]  # h1 at T-1: taps x[T-2], x[T-1]
    h = []
    for ch in range(2):
        tap0 = f"({h1p[0]}) * {W2[0, 0, ch]!r} + ({h1p[1]}) * {W2[0, 1, ch]!r}"
        tap1 = f"({h1l[0]}) * {W2[1, 0, ch]!r} + ({h1l[1]}) * {W2[1, 1, ch]!r}"
        main = f"GREATEST((({tap0}) + ({tap1})) + {b2[ch]!r}, 0.0)"
        h.append(
            f"GREATEST(({main}) + ({c}) * {side[0, 0, ch]!r}, 0.0)"
        )
    return (
        f"(({h[0]}) * {wr[0, 0]!r} + ({h[1]}) * {wr[1, 0]!r}) + {br[0]!r}"
    )


def _w14_tcn_oracle() -> str:
    """The W14 loop unrolled: the seed window's last three points (rn =
    len-7..len-5 of each >=15-row series) feed step 1; each later step's
    inputs shift one generated value in — g2 = f(b, c, g1), g3 =
    f(c, g1, g2), ... — chained through CTEs with UNROUNDED doubles (the
    Spark loop feeds raw predictions forward too); only the final SELECT
    rounds."""
    steps = ""
    args = [("a", "b", "c"), ("b", "c", "g1"), ("c", "g1", "g2"),
            ("g1", "g2", "g3"), ("g2", "g3", "g4")]
    prev = "seed"
    for i, (x, y, z) in enumerate(args, start=1):
        steps += (
            f"    s{i} AS (SELECT *, {_w14_tcn_step_sql(x, y, z)} AS g{i}"
            f" FROM {prev}),\n"
        )
        prev = f"s{i}"
    case = " ".join(
        f"WHEN {s} THEN g{s}" for s in range(1, _W14_STEPS + 1)
    )
    return f"""
    WITH r AS (
      SELECT user_id, COALESCE(value, 0.0) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS len
      FROM events),
    seed AS (
      SELECT user_id,
             MAX(CASE WHEN rn = len - 7 THEN v END) AS a,
             MAX(CASE WHEN rn = len - 6 THEN v END) AS b,
             MAX(CASE WHEN rn = len - 5 THEN v END) AS c
      FROM r WHERE len >= {_W14_SEQ + _W14_STEPS} GROUP BY user_id),
{steps}    act AS (
      SELECT user_id, CAST(rn - (len - {_W14_STEPS}) AS INT) AS step, v AS actual
      FROM r WHERE len >= {_W14_SEQ + _W14_STEPS} AND rn > len - {_W14_STEPS}),
    gen AS (
      SELECT user_id, st.step,
             CASE st.step {case} END AS generated
      FROM s{_W14_STEPS} CROSS JOIN (VALUES (1), (2), (3), (4), (5)) st(step))
    SELECT g.user_id, CAST(g.step AS INT) AS step,
           ROUND(g.generated, 6) AS generated,
           ROUND(a.actual, 6) AS actual
    FROM gen g JOIN act a ON a.user_id = g.user_id AND a.step = g.step
    """


@register(
    "w14_tcn_autoregressive",
    _w14_tcn_oracle(),
    doc="W14 composed with the TCN forward pass (reference "
    "utils/inference.py:61 generates with the trained model): each series' "
    "sliding window feeds tcn_forward worker-side via applyInPandas; "
    "deterministic seeded weights make the output reproducible. "
    "ORACLE-CHECKED since round 7: the pinned 1-block/k=2/2-channel model "
    "has receptive field 3, so the whole generate loop is a closed form "
    "over the seed window's tail — the oracle unrolls it with the "
    "weight-normalized constants inlined and NumPy's exact float grouping "
    "(the ewma_final_fold recurrence pattern applied to a model in the "
    "loop). The deep default config remains pinned distributed==local in "
    "tests/test_autoregressive_seq2seq.py",
)
def w14_tcn_autoregressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.ml.autoregressive import (
        autoregressive_generate,
        tcn_predictor,
    )
    from aidc_2018_timeseries_spark.operators.filters import min_length_filter

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.coalesce(F.col("value"), F.lit(0.0))
    )
    ev = min_length_filter(ev, "user_id", min_len=_W14_SEQ + _W14_STEPS)
    out = autoregressive_generate(
        ev, "user_id", ["ts", "event_id"], "value",
        seq_len=_W14_SEQ, n_steps=_W14_STEPS,
        predictor=tcn_predictor(_w14_tcn_weights()),
    )
    return out.select(
        "user_id", "step",
        F.round("generated", 6).alias("generated"),
        F.round("actual", 6).alias("actual"),
    )


# --- music chain: W6 pad/truncate + W8 teacher forcing, end to end ---
@register(
    "music_pipeline_teacher_forcing",
    """
    WITH r AS (
      SELECT user_id AS song,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS len,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS vv
      FROM events),
    bits AS (
      SELECT song, rn, len, unnest(range(0, 8)) AS j,
             CAST(CAST(FLOOR(vv / POWER(2, unnest(range(0, 8)))) AS BIGINT) % 2
                  AS DOUBLE) AS bit
      FROM r),
    pos AS (
      SELECT song, len, unnest(range(1, 13)) AS p
      FROM (SELECT DISTINCT song, len FROM r)),
    posj AS (SELECT song, len, p, unnest(range(0, 8)) AS j FROM pos),
    src AS (
      SELECT song, p, j,
             CASE WHEN len >= 13 THEN len - 13 + p ELSE p - (13 - len) END AS sx,
             CASE WHEN len >= 13 THEN len - 13 + p + 1 ELSE p + 1 - (13 - len) END AS sy
      FROM posj)
    SELECT src.song, CAST(src.p AS INT) AS p, CAST(src.j AS INT) AS j,
           COALESCE(bx.bit, 0.0) AS x, COALESCE(by_.bit, 0.0) AS y
    FROM src
    LEFT JOIN bits bx ON bx.song = src.song AND bx.rn = src.sx AND bx.j = src.j
    LEFT JOIN bits by_ ON by_.song = src.song AND by_.rn = src.sy AND by_.j = src.j
    """,
    doc="music chain end-to-end (W6 zero-pad/left-truncate to T+1=13 + W8 "
    "teacher-forcing X/y shift) on an 8-key piano roll synthesized from "
    "the value bits; emitted at (song, position, key) scalar granularity",
)
def music_pipeline_teacher_forcing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.windowing import with_row_index
    from aidc_2018_timeseries_spark.pipelines.music import music_dataset

    ev = with_row_index(load_table(spark, sf_dir, "events"), "user_id", ["ts", "event_id"])
    # coalesce NULL values to 0 so both engines emit 0.0 bits for them
    # (the oracle's COALESCE(bit, 0.0) does this on the SQL side)
    vv = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0).cast("long")
    bit = lambda j: ((F.floor(vv / F.pow(F.lit(2.0), j)).cast("long")) % 2).cast("double")  # noqa: E731
    keys = F.array(*[bit(F.lit(float(j))) for j in range(8)])
    roll = ev.select(F.col("user_id").alias("song"), F.col("rn"), keys.alias("keys"))
    ds = music_dataset(roll, key="song", order="rn", keys_col="keys", seq_len=12, n_keys=8)
    z = ds.select("song", F.posexplode(F.arrays_zip("x", "y")).alias("p0", "r"))
    z = z.select("song", "p0", F.col("r.x").alias("xr"), F.col("r.y").alias("yr"))
    z = z.select("song", "p0", F.posexplode(F.arrays_zip("xr", "yr")).alias("j0", "rr"))
    return z.select(
        "song",
        (F.col("p0") + 1).cast("int").alias("p"),
        F.col("j0").cast("int").alias("j"),
        F.col("rr.xr").alias("x"),
        F.col("rr.yr").alias("y"),
    )


# --- §3.3 forecasting chain, predict_seq=True: W7 tumbling + look-ahead
# target + per-WINDOW time split (reference timeseries.py:65-81) ---
@register(
    "forecasting_tumbling_split",
    """
    WITH base AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             LEAD(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y,
             COUNT(*) OVER (PARTITION BY user_id) AS series_len
      FROM events),
    lim AS (
      SELECT *, CAST(FLOOR((series_len - 3) / 10) * 10 AS BIGINT) AS n_usable FROM base),
    win AS (
      SELECT user_id, CAST(FLOOR((rn - 1) / 10) AS BIGINT) AS window_id,
             CAST((rn - 1) % 10 AS BIGINT) AS t_in_window, value AS x, y
      FROM lim WHERE rn <= n_usable),
    keys AS (SELECT DISTINCT user_id, window_id FROM win),
    split AS (
      SELECT user_id, window_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY window_id) AS krn,
             CAST(ROUND(0.8 * COUNT(*) OVER (PARTITION BY user_id), 0) AS BIGINT)
               AS cutoff
      FROM keys)
    SELECT w.user_id, w.window_id, w.t_in_window, w.x, w.y,
           CASE WHEN s.krn <= s.cutoff THEN 'train' ELSE 'test' END AS split
    FROM win w JOIN split s ON s.user_id = w.user_id AND s.window_id = w.window_id
    """,
    doc="§3.3 predict_seq=True chain end-to-end: W7 tumbling windows "
    "(T=10) + look_ahead=3 shifted target + 80/20 split assigned per "
    "WINDOW within each series (the reference splits over the window "
    "axis; key-partitioned, no global sort)",
)
def forecasting_tumbling_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.pipelines.forecasting import sequence_forecast_dataset

    ev = load_table(spark, sf_dir, "events")
    ds = sequence_forecast_dataset(
        ev, "user_id", ["ts", "event_id"], "value", seq_len=10, look_ahead=3
    )
    return ds.select("user_id", "window_id", "t_in_window", "x", "y", "split")


_HRES = (
    "CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('res:7:', CAST(doc_id AS VARCHAR))), 1, 15)) "
    "AS BIGINT)"
)


@register(
    "sample_fixed_k_per_source",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY {_HRES} ASC, doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, source FROM r WHERE rk <= 5
    """,
    doc="deterministic fixed-k-per-group sample (reservoir semantics, no "
    "RNG): 5 docs per source by seeded-hash order — exactly min(k,|group|) "
    "rows per group, reproducible across engines/partitionings; the "
    "eval-holdout construction primitive",
)
def sample_fixed_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import fixed_k_per_group

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return fixed_k_per_group(d, "doc_id", "source", k=5, seed=7)


# --- snapshot diff between corpus versions (data versioning audit) ---
@register(
    "corpus_snapshot_diff",
    """
    WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END) AS h
      FROM documents WHERE doc_id % 13 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 11 = 0)
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    """,
    doc="corpus-version snapshot diff (the audit every dataset release "
    "needs: what changed between v1 and v2?): per doc, added / removed / "
    "changed / unchanged via a full outer join of CONTENT HASHES — at "
    "100 TB you diff fixed-width digests co-partitioned on doc_id, never "
    "shipping document bodies through the join. v2 is synthesized "
    "deterministically from v1 (every 13th doc deleted, every 7th "
    "edited, every 11th re-added under a new id) so both engines see "
    "identical versions",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = d.select("doc_id", F.md5("text").alias("h"))
    v2_kept = d.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" edited"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    v2_added = d.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), F.md5("text").alias("h")
    )
    v2 = v2_kept.unionByName(v2_added)
    j = v1.alias("a").join(v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        status.alias("status"),
    )


from aidc_2018_timeseries_spark.functions.hashing import hash64_seeded_sql

_HDOC_TEMP = hash64_seeded_sql("CAST(doc_id AS VARCHAR)", "mix:temp")


@register(
    "sample_temperature_mixture",
    f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t AS (SELECT SUM(n) AS tot FROM c),
    w AS (SELECT source, ROUND(SQRT(tot * 1.0 / n), 6) AS w6
          FROM c CROSS JOIN t),
    d AS (SELECT doc_id, documents.source,
                 CAST(FLOOR(w6) AS BIGINT)
                 + CASE WHEN {_HDOC_TEMP} % 1000000 <
                        CAST(ROUND((w6 - FLOOR(w6)) * 1000000) AS BIGINT)
                   THEN 1 ELSE 0 END AS n
          FROM documents JOIN w USING (source))
    SELECT doc_id, source, CAST(copy_idx AS BIGINT) AS copy_idx
    FROM (SELECT doc_id, source, unnest(generate_series(1, n)) AS copy_idx
          FROM d WHERE n >= 1)
    """,
    doc="TEMPERATURE-derived domain mixture (alpha = 0.5): per-source "
    "epochs = (corpus/n_source)^(1-alpha), the Gopher/LLaMA mixing rule "
    "that upweights scarce sources toward (but not to) uniformity — "
    "computed FROM the corpus's own source counts, where "
    "sample_mixture_upweight takes hand-set weights. Weights quantize to "
    "millionths and apply via the same hash-Bernoulli explode (map-side, "
    "no shuffle, no RNG); the count collect is one bounded "
    "rows-per-source scalar fetch, same class as the IVF centroid build. "
    "The oracle recomputes the weights relationally and must reproduce "
    "every copy exactly",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.split import upweight_mixture

    import math

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").count().collect()
    tot = sum(r["count"] for r in counts)
    # math.sqrt, NOT ** 0.5: IEEE-754 sqrt is correctly rounded in every
    # conforming libm, so math.sqrt(tot/n) and the oracle's
    # SQRT(tot*1.0/n) are bit-identical; pow(x, 0.5) carries no such
    # guarantee and a one-ulp libm difference at a millionth-quantization
    # boundary would flip a copy count (ADVICE r5).
    # floor(x*1e6 + 0.5): decimal HALF-UP quantization, matching the
    # oracle's ROUND(..., 6) (half away from zero == half-up for
    # positive weights). Python's round() is banker's rounding and would
    # diverge by one micro-unit exactly at halfway boundaries.
    weights = {
        r["source"]: math.floor(math.sqrt(tot / r["count"]) * 1e6 + 0.5) / 1e6
        for r in counts
    }
    return upweight_mixture(d, "doc_id", "source", weights, seed="temp")


# --- composed semantic curation: SemDeDup ∩ DSIR (round 8) ---------------
def _semantic_curation_oracle() -> str:
    """Compose the two round-8 capability oracles verbatim (their CTE
    bodies are the single sources of truth in similarity_queries /
    text_queries): SemDeDup keep verdicts over embeddings joined 1:1 to
    DSIR per-source selection over documents — the 'curate by geometry,
    select by domain' chain."""
    from aidc_2018_timeseries_spark.plans.similarity_queries import _semdedup_ctes
    from aidc_2018_timeseries_spark.plans.text_queries import _dsir_ctes

    return f"""
    WITH RECURSIVE {_semdedup_ctes()},
    ranked AS (
      SELECT a2.vec_id, grp.group_id,
             ROW_NUMBER() OVER (PARTITION BY grp.group_id
                                ORDER BY a2.cent_sim ASC, a2.vec_id ASC) AS rn
      FROM a2 JOIN grp USING (vec_id)),
    sem AS (SELECT vec_id AS doc_id,
                   CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT)
                     AS semantic_keep
            FROM ranked),
    {_dsir_ctes()}
    SELECT s.doc_id, s.source, s.weight_micro,
           COALESCE(sem.semantic_keep, 0) AS semantic_keep,
           s.selected AS dsir_selected,
           CAST(CASE WHEN COALESCE(sem.semantic_keep, 0) = 1
                      AND s.selected = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS final_keep
    FROM dsel s LEFT JOIN sem USING (doc_id)
    """


@register(
    "llm_semantic_curation_pipeline",
    _semantic_curation_oracle(),
    doc="composed curation chain over BOTH modalities of the same corpus "
    "(doc_id ≡ vec_id in the testdata): SemDeDup keep verdicts from the "
    "embedding side (cluster-bucketed semantic dedup) joined 1:1 onto "
    "DSIR per-source importance selection from the text side; "
    "final_keep = survived semantic dedup AND won the domain-matching "
    "resample — the two-stage recipe production corpora run between "
    "crawl and tokenize. Zero-norm vectors (no semantic verdict) default "
    "to semantic_keep = 0, mirrored by the oracle's COALESCE. The join "
    "is id-keyed (embedding verdicts are a narrow relation — verdict "
    "bits, never vector bodies, cross the shuffle); each side keeps its "
    "own operator's scale shape (SCALING.md round-8 decades for both)",
)
def llm_semantic_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import aidc_2018_timeseries_spark.operators.dedup as dd
    from aidc_2018_timeseries_spark.operators import similarity as sim
    from aidc_2018_timeseries_spark.operators import text as tx
    from aidc_2018_timeseries_spark.plans.similarity_queries import _SEMDEDUP_TAU
    from aidc_2018_timeseries_spark.plans.text_queries import _DSIR_BUCKETS, _DSIR_KEEP

    e = load_table(spark, sf_dir, "embeddings")
    sem = sim.semdedup_verdicts(e, threshold=_SEMDEDUP_TAU).select(
        F.col("vec_id").alias("doc_id"), F.col("keep").alias("semantic_keep")
    )
    d = dd._spread(load_table(spark, sf_dir, "documents"), "doc_id")
    dsel = tx.dsir_selection(
        d.withColumn("_is_target", F.col("lang") == "en"),
        id_col="doc_id",
        text_col="text",
        target_col="_is_target",
        group_col="source",
        n_buckets=_DSIR_BUCKETS,
        keep_frac=_DSIR_KEEP,
    ).select("doc_id", "source", "weight_micro", F.col("selected").alias("dsir_selected"))
    return dsel.join(sem, "doc_id", "left").select(
        "doc_id",
        "source",
        "weight_micro",
        F.coalesce("semantic_keep", F.lit(0)).cast("long").alias("semantic_keep"),
        "dsir_selected",
        F.when(
            (F.coalesce("semantic_keep", F.lit(0)) == 1) & (F.col("dsir_selected") == 1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("final_keep"),
    )
