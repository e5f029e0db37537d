"""Tokenizer / index-construction text ops: distributed BPE vocabulary
induction, skip-gram PMI co-occurrence, posting-list compression audit,
and Kaplan-Meier retention (SURVEY.md §2.15 LLM-pipeline extensions).

The flagship here is **BPE merge learning** — the op every LLM data
pipeline runs before anything else.  The classic sequential trainer
(Sennrich et al. 2016, public algorithm) is re-expressed Spark-first:

- train on the **word-type** table (word, freq) — vocabulary-bounded,
  corpus-size-independent; the 100 TB corpus collapses to a type table
  of at most a few hundred million rows after one hash aggregate.
- each round is: explode adjacent symbol pairs weighted by type freq
  (one combinable groupBy), pick the argmax pair (global top-1, ties
  broken lexicographically), then apply the merge to every type's
  symbol array with a **pure-Catalyst `F.aggregate` fold** — greedy
  left-to-right non-overlapping, the exact BPE convention ("aaaa" with
  merge (a,a) -> [aa, aa], never [aa, a, a]).  No UDFs, no collects:
  the winning pair rides a 1-row broadcast crossJoin, same pattern as
  hits.py's normalizer.
- the DuckDB oracle replicates the fold bit-for-bit with a recursive
  CTE stepper per round (one row per (type, position) step), so the
  gate compares true greedy semantics, not an approximation.

Scale notes (100 TB posture):
- BPE: all rounds run on the type table; per round one explode+groupBy
  shuffle and one broadcast — O(rounds) shuffles of vocab-sized data.
  Lineage grows linearly in rounds; a production trainer at thousands
  of merges would checkpoint the symbol table every ~50 rounds (the
  pregel checkpoint sink here does exactly that for graph state).
- skip-gram PMI: posexplode + bounded self-equi-join on (doc_id) with
  a window predicate — fan-out bounded by window size, never doc².
- posting compression: one groupBy(token) with sort_array(collect_set)
  per token; gap+varint sizing is a pure higher-order array expression.
  Postings for a 100 TB corpus shard by token hash; no skew beyond the
  stopword head, which the df cap prunes.
- Kaplan-Meier: two hash aggregates + one window cumulative product
  (exp-sum-log) over the tiny distinct-duration table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import load_table

_BPE_ROUNDS = 4


def _word_types(d: DataFrame) -> DataFrame:
    """(word, n) frequency table of whitespace word types."""
    return (
        d.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by type frequency.  The
    sequence is guarded for 1-symbol types (sequence(1,0) is DESCENDING
    in Spark — the ADVICE r03 #1 crash class)."""
    pairs = cur.select(
        "n",
        F.explode(
            F.when(
                F.size("s") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at("s", i).alias("a"),
                        F.element_at("s", i + F.lit(1)).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("pair_n"))


def _apply_merge(cur: DataFrame, top: DataFrame) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of the broadcast
    winning pair (ma, mb) into every type's symbol array — a pure
    Catalyst fold, no Python."""
    return cur.crossJoin(F.broadcast(top)).select(
        "word",
        "n",
        F.aggregate(
            "s",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("ma"))
                & (x == F.col("mb")),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.concat(F.col("ma"), F.col("mb"))),
                ),
            ).otherwise(F.concat(acc, F.array(x))).alias("s"),
        ).alias("s"),
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction over the document corpus: learn the
    first ``_BPE_ROUNDS`` merges on the word-type frequency table
    (chars as initial symbols; argmax adjacent pair per round, ties
    lexicographic on (lhs, rhs)).  Output one row per learned merge:
    (round, lhs, rhs, pair_n)."""
    d = load_table(spark, sf_dir, "documents")
    cur = _word_types(d).select("word", "n", F.split("word", "").alias("s"))
    outs: list[DataFrame] = []
    for r in range(1, _BPE_ROUNDS + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_n"), "a", "b")
            .limit(1)
            .select(
                F.col("a").alias("ma"),
                F.col("b").alias("mb"),
                F.col("pair_n").alias("mn"),
            )
        )
        outs.append(
            top.select(
                F.lit(r).cast("int").alias("round"),
                F.col("ma").alias("lhs"),
                F.col("mb").alias("rhs"),
                F.col("mn").alias("pair_n"),
            )
        )
        if r < _BPE_ROUNDS:
            cur = _apply_merge(cur, top)
    return reduce(DataFrame.unionAll, outs)


def _bpe_sql(rounds: int) -> str:
    """Unrolled-CTE DuckDB mirror: per round a pair-count CTE, a 1-row
    argmax CTE, and a recursive stepper CTE replicating the greedy
    fold (one row per (type, position))."""
    ctes = [
        """wt AS (
  SELECT w AS word, count(*) AS n
  FROM documents, unnest(string_split(lower(trim(text)), ' ')) AS t(w)
  WHERE length(w) >= 1 GROUP BY w
)""",
        """s0 AS (
  SELECT word, n,
         list_transform(generate_series(1, length(word)), i -> word[i:i]) AS s
  FROM wt
)""",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"""p{r} AS (
  SELECT u.p.a AS a, u.p.b AS b, CAST(sum(n) AS BIGINT) AS pair_n
  FROM (SELECT n, unnest(list_transform(generate_series(1, len(s) - 1),
          i -> {{'a': s[i], 'b': s[i + 1]}})) AS p
        FROM {prev} WHERE len(s) >= 2) u
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""m{r} AS (
  SELECT a, b, pair_n FROM p{r} ORDER BY pair_n DESC, a, b LIMIT 1
)"""
        )
        if r < rounds:
            ctes.append(
                f"""st{r} AS (
  SELECT word, n, s, 1 AS pos, [s[1]] AS acc FROM {prev}
  UNION ALL
  SELECT word, n, s, pos + 1,
    CASE WHEN acc[-1] = m.a AND s[pos + 1] = m.b
         THEN list_append(acc[1:len(acc) - 1], m.a || m.b)
         ELSE list_append(acc, s[pos + 1]) END
  FROM st{r}, m{r} m WHERE pos < len(s)
)"""
            )
            ctes.append(
                f"""s{r} AS (
  SELECT word, n, acc AS s FROM st{r} WHERE pos = len(s)
)"""
            )
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS round, a AS lhs, b AS rhs, pair_n FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + finals


SQL_BPE_MERGES = _bpe_sql(_BPE_ROUNDS)


# --------------------------------------------------------------------------
# Skip-gram PMI co-occurrence (word2vec-style embedding prep): count
# unordered token pairs within a ±_PMI_WINDOW window, score with PMI.
# Ordering/gating stays on EXACT integers (pair count, then pair text);
# the PMI double is a reported value column, rounded like doc_entropy's.
# --------------------------------------------------------------------------

_PMI_WINDOW = 2
_PMI_TOPK = 30


def _positions(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), " ")).alias("pos", "w"),
    )


def q_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_PMI_TOPK`` co-occurring token pairs by skip-gram count
    (window ±``_PMI_WINDOW`` inside each doc, pairs unordered via
    least/greatest), with PMI = log2(p(a,b) / (p(a) p(b))) where
    p(a,b) = n_pair / D (D = total window pairs) and p(w) = c_w / T
    (T = total tokens).  Output (a, b, n_pair, pmi)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _positions(d)
    unig = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot_t = unig.agg(F.sum("cw").alias("T"))

    t1 = toks.alias("t1")
    t2 = toks.alias("t2")
    raw = t1.join(
        t2,
        (F.col("t1.doc_id") == F.col("t2.doc_id"))
        & (F.col("t2.pos") > F.col("t1.pos"))
        & (F.col("t2.pos") <= F.col("t1.pos") + _PMI_WINDOW),
    ).select(
        F.least("t1.w", "t2.w").alias("a"),
        F.greatest("t1.w", "t2.w").alias("b"),
    )
    pc = raw.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pair"))
    tot_d = pc.agg(F.sum("n_pair").alias("D"))

    ua = unig.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = unig.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    scored = (
        pc.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_d))
        .select(
            "a",
            "b",
            "n_pair",
            # cast-first like the oracle's CAST(n_pair AS DOUBLE) * T * T:
            # the whole chain is left-assoc IEEE double multiplies in BOTH
            # engines, so no int64 product (n_pair*T*T, D*ca*cb can pass
            # 2^63 at large SF where Spark would wrap silently) ever forms
            F.round(
                F.log2(
                    F.col("n_pair").cast("double")
                    * F.col("T")
                    * F.col("T")
                    / (F.col("D").cast("double") * F.col("ca") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    wnd = Window.orderBy(F.desc("n_pair"), "a", "b")
    return (
        scored.withColumn("rk", F.row_number().over(wnd))
        .where(F.col("rk") <= _PMI_TOPK)
        .select("a", "b", "n_pair", "pmi")
    )


SQL_SKIPGRAM_PMI = f"""
WITH ws AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents
), toks AS (
  SELECT doc_id, t.i - 1 AS pos, w[t.i] AS w
  FROM ws, unnest(generate_series(1, len(w))) AS t(i)
), unig AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM toks GROUP BY w
), tot_t AS (
  SELECT CAST(sum(cw) AS BIGINT) AS T FROM unig
), pc AS (
  SELECT least(t1.w, t2.w) AS a, greatest(t1.w, t2.w) AS b,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM toks t1 JOIN toks t2
    ON t1.doc_id = t2.doc_id
   AND t2.pos > t1.pos AND t2.pos <= t1.pos + {_PMI_WINDOW}
  GROUP BY 1, 2
), tot_d AS (
  SELECT CAST(sum(n_pair) AS BIGINT) AS D FROM pc
)
SELECT a, b, n_pair,
       round(log2(CAST(n_pair AS DOUBLE) * T * T
                  / (CAST(D AS DOUBLE) * ua.cw * ub.cw)), 6) AS pmi
FROM pc
JOIN unig ua ON ua.w = pc.a
JOIN unig ub ON ub.w = pc.b
CROSS JOIN tot_t CROSS JOIN tot_d
QUALIFY row_number() OVER (ORDER BY n_pair DESC, a, b) <= {_PMI_TOPK}
"""


# --------------------------------------------------------------------------
# Posting-list compression audit: build the inverted index (token ->
# sorted distinct doc_ids) and size it raw (8 B/id) vs delta + varint.
# Gaps come from a window lag over (token, doc_id) — fully distributed,
# no per-token array materialization, so the stopword head never builds
# a corpus-sized list on one row (production would additionally shard
# hot postings into fixed-size blocks, block-max WAND style).
# --------------------------------------------------------------------------

_POSTING_TOPK = 30


def _varint_len(g):
    """Bytes to LEB128-encode gap ``g`` (>=1) — exact integer CASE, no
    float log boundaries."""
    return (
        F.when(g < 128, 1)
        .when(g < 16384, 2)
        .when(g < 2097152, 3)
        .when(g < 268435456, 4)
        .otherwise(5)
    )


def q_posting_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index size audit for the ``_POSTING_TOPK`` highest-df
    tokens: document frequency, raw posting bytes (8 B per doc id),
    delta+varint bytes (first gap = doc_id + 1 so id 0 encodes as 1),
    and the fractional savings.  Output (word, df, raw_bytes,
    varint_bytes, savings)."""
    d = load_table(spark, sf_dir, "documents")
    post = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), " ")).alias("w"),
        )
        .distinct()
    )
    wnd = Window.partitionBy("w").orderBy("doc_id")
    gaps = post.select(
        "w",
        (F.col("doc_id") - F.lag("doc_id", 1, -1).over(wnd)).alias("g"),
    )
    sized = gaps.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(_varint_len(F.col("g")).cast("long")).alias("varint_bytes"),
    )
    top = Window.orderBy(F.desc("df"), "word")
    return (
        sized.select(
            F.col("w").alias("word"),
            "df",
            (F.col("df") * 8).alias("raw_bytes"),
            "varint_bytes",
            F.round(
                F.lit(1.0) - F.col("varint_bytes") / (F.col("df") * 8), 6
            ).alias("savings"),
        )
        .withColumn("rk", F.row_number().over(top))
        .where(F.col("rk") <= _POSTING_TOPK)
        .select("word", "df", "raw_bytes", "varint_bytes", "savings")
    )


SQL_POSTING_COMPRESSION = f"""
WITH post AS (
  SELECT DISTINCT doc_id, w
  FROM documents, unnest(string_split(lower(trim(text)), ' ')) AS t(w)
), gaps AS (
  SELECT w,
         doc_id - lag(doc_id, 1, -1) OVER (PARTITION BY w ORDER BY doc_id) AS g
  FROM post
), sized AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2
                       WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4
                       ELSE 5 END) AS BIGINT) AS varint_bytes
  FROM gaps GROUP BY w
)
SELECT word, df, df * 8 AS raw_bytes, varint_bytes,
       round(1.0 - CAST(varint_bytes AS DOUBLE) / (df * 8), 6) AS savings
FROM sized
QUALIFY row_number() OVER (ORDER BY df DESC, word) <= {_POSTING_TOPK}
"""


# --------------------------------------------------------------------------
# Kaplan-Meier survival over SESSION lifetimes.  Events sessionize per
# user on a 30-minute inactivity gap; a session's duration is whole
# minutes from first to last event (exact integer microsecond
# arithmetic via unix_micros/epoch_us — no float timestamps).  Sessions
# whose last event lies within the gap of the dataset horizon are
# right-censored (still open).  Counts are exact integers; the product-
# limit estimator rides a cumulative exp-sum-log window with an explicit
# zero guard (ln(0) when the risk set empties at the last event time).
# --------------------------------------------------------------------------

_KM_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap / censor horizon


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit curve of session duration: one row per
    event time t (whole minutes) with the risk set size, observed
    session ends, censored (still-open) sessions, and the survival
    estimate.  Output (t, n_risk, d_events, c_censored, survival)."""
    e = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ in the parquet; the session timezone is pinned
    # UTC (session.py), so the cast is the identity mapping to epoch us.
    us = e.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    seq = Window.partitionBy("user_id").orderBy("us")
    sess = (
        us.withColumn(
            "brk",
            F.when(
                F.col("us") - F.lag("us", 1, 0).over(seq) > _KM_GAP_US, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(
                seq.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    horizon = us.agg(F.max("us").alias("max_us"))
    dur = sess.crossJoin(F.broadcast(horizon)).select(
        F.floor((F.col("e_us") - F.col("s_us")) / 60_000_000).alias("t"),
        (F.col("e_us") > F.col("max_us") - _KM_GAP_US).alias("censored"),
    )
    per_t = dur.groupBy("t").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d_events"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c_censored"),
    )
    total = dur.agg(F.count(F.lit(1)).alias("N"))
    prior = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risked = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("N")
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(prior),
            F.lit(0),
        ),
    )
    surv = risked.withColumn(
        "hit_zero",
        F.max(
            F.when(F.col("d_events") == F.col("n_risk"), 1).otherwise(0)
        ).over(upto),
    ).withColumn(
        "survival",
        F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            # factor neutralized to 1 on the zero row; the
                            # hit_zero guard overrides its output anyway
                            F.when(
                                F.col("d_events") == F.col("n_risk"),
                                F.lit(1.0),
                            ).otherwise(
                                F.lit(1.0)
                                - F.col("d_events") / F.col("n_risk")
                            )
                        )
                    ).over(upto)
                ),
                6,
            )
        ),
    )
    return surv.where(F.col("d_events") > 0).select(
        "t", "n_risk", "d_events", "c_censored", "survival"
    )


SQL_KM_SURVIVAL = f"""
WITH us AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), brk AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us, 1, 0) OVER (
                PARTITION BY user_id ORDER BY us
              ) > {_KM_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM us
), sid AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM brk
), sess AS (
  SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
  FROM sid GROUP BY user_id, sid
), horizon AS (
  SELECT max(us) AS max_us FROM us
), dur AS (
  SELECT CAST(floor((e_us - s_us) / 60000000.0) AS BIGINT) AS t,
         e_us > max_us - {_KM_GAP_US} AS censored
  FROM sess CROSS JOIN horizon
), per_t AS (
  SELECT t,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
           AS d_events,
         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
           AS c_censored
  FROM dur GROUP BY t
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS N FROM dur
), risked AS (
  SELECT t, d_events, c_censored,
         N - coalesce(sum(d_events + c_censored) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_risk
  FROM per_t CROSS JOIN total
), surv AS (
  SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d_events, c_censored,
         max(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS hit_zero,
         exp(sum(ln(CASE WHEN d_events = n_risk THEN 1.0
                         ELSE 1.0 - CAST(d_events AS DOUBLE) / n_risk
                    END)) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )) AS s_raw
  FROM risked
)
SELECT t, n_risk, d_events, c_censored,
       CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(s_raw, 6) END AS survival
FROM surv WHERE d_events > 0
"""


def registry():
    return {
        "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
        "skipgram_pmi": (q_skipgram_pmi, SQL_SKIPGRAM_PMI),
        "posting_compression": (q_posting_compression, SQL_POSTING_COMPRESSION),
        "km_survival": (q_km_survival, SQL_KM_SURVIVAL),
    }
