"""Query catalog: every operator exposed as ``fn(sf_dir) -> result`` with a
matching DuckDB oracle SQL where the semantics are SQL-expressible.

Column names match between Ray results and oracle SQL exactly (the driver
hashes values under sorted column names). Aggregates over float columns go
through integer cents (``round(x*100)::bigint``) so Ray's and DuckDB's
summation orders cannot produce differing IEEE results.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


@functools.lru_cache(maxsize=None)
def _file_schema(path: str):
    """Metadata-free file schema. The driver-written test parquet carries
    pandas metadata that makes ``pa.Schema`` unhashable, so every read
    spams Ray's "Failed to hash the schemas (for deduplication)" warning
    from the block-dedup fast path; passing an explicit stripped schema
    keeps the blocks hashable (and the bench tail clean)."""
    import pyarrow.parquet as pq

    return pq.read_schema(path).remove_metadata()


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    path = f"{sf_dir}/{table}.parquet"
    schema = _file_schema(path)
    if columns is not None:  # the explicit schema must match the projection
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def _cents(col):
    """float column -> integer cents (deterministic summation domain)."""
    return pc.round(pc.multiply(col, 100)).cast(pa.int64())


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.5 A1-A6 analogs on the test tables)
# ---------------------------------------------------------------------------

def q_doc_stats(sf_dir: str):
    """A2: per-doc word/char counts over documents (parser.py:257-266)."""
    from .pipelines.textops import doc_stats

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_stats, batch_format="pyarrow"
    )


SQL_DOC_STATS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS word_count,
       length(text)::BIGINT AS char_count
FROM documents
"""


def q_source_stats(sf_dir: str):
    """A1 analog: per-source doc count + distinct langs + total chars.
    Distinct langs via per-batch partial sets then an exact groupby —
    the count-distinct pattern of SURVEY.md §2.5 A1."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    pairs = ds.groupby(["source", "lang"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="chars")
    )
    out = pairs.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Count(alias_name="n_langs"),
        Sum("chars", alias_name="total_chars"),
    )
    return out


SQL_SOURCE_STATS = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT lang)::BIGINT AS n_langs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY source
"""


def q_top_langs(sf_dir: str):
    """A5 analog: grouped count + deterministic top-k."""
    ds = _read(sf_dir, "documents", ["lang"])
    counts = ds.groupby("lang").aggregate(Count(alias_name="n"))
    df = counts.to_pandas().sort_values(["n", "lang"], ascending=[False, True])
    return df.head(3).reset_index(drop=True)


SQL_TOP_LANGS = """
SELECT lang, count(*)::BIGINT AS n FROM documents
GROUP BY lang ORDER BY n DESC, lang LIMIT 3
"""


def q_recent_events(sf_dir: str):
    """A6 analog: sort desc + limit with unique tiebreak."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    return ds.sort(["ts", "event_id"], descending=[True, True]).limit(100)


SQL_RECENT_EVENTS = """
SELECT event_id, ts, event_type FROM events
ORDER BY ts DESC, event_id DESC LIMIT 100
"""


def q_daily_ohlc(sf_dir: str):
    """Daily OHLC over event values — the first/last-by-time aggregate
    family (open = value at the lexicographically first (ts, event_id)
    of the day, close = at the last, high/low = max/min), in exact
    integer cents. Everything is a MERGEABLE partial: each batch folds
    to one (day, argmin-triple, argmax-triple, min, max) row, so only
    O(blocks x days) fixed-width rows reach the final O(days) fold —
    no shuffle, no per-key co-location needed."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["ts"].notna() & df["value"].notna()]
        if not len(df):
            return pa.table({
                "day": pa.nulls(0, pa.string()),
                "o_ts": pa.nulls(0, pa.int64()), "o_id": pa.nulls(0, pa.int64()),
                "open_cents": pa.nulls(0, pa.int64()),
                "c_ts": pa.nulls(0, pa.int64()), "c_id": pa.nulls(0, pa.int64()),
                "close_cents": pa.nulls(0, pa.int64()),
                "low_cents": pa.nulls(0, pa.int64()),
                "high_cents": pa.nulls(0, pa.int64()),
            })
        df = df.assign(
            day=df["ts"].dt.strftime("%Y-%m-%d"),
            us=df["ts"].astype("int64"),
            cents=(df["value"] * 100).round().astype("int64"),
        ).sort_values(["day", "us", "event_id"], kind="stable")
        g = df.groupby("day", sort=False)
        first, last = g.head(1), g.tail(1)
        mm = g["cents"].agg(["min", "max"]).reset_index()
        out = first[["day", "us", "event_id", "cents"]].rename(columns={
            "us": "o_ts", "event_id": "o_id", "cents": "open_cents"})
        out = out.merge(last[["day", "us", "event_id", "cents"]].rename(
            columns={"us": "c_ts", "event_id": "c_id",
                     "cents": "close_cents"}), on="day")
        out = out.merge(mm.rename(columns={"min": "low_cents",
                                           "max": "high_cents"}), on="day")
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"day": pa.nulls(0, pa.string()),
                             "open_cents": pa.nulls(0, pa.int64()),
                             "high_cents": pa.nulls(0, pa.int64()),
                             "low_cents": pa.nulls(0, pa.int64()),
                             "close_cents": pa.nulls(0, pa.int64())})
        opens = (df.sort_values(["day", "o_ts", "o_id"], kind="stable")
                 .groupby("day", sort=True).head(1)[["day", "open_cents"]])
        closes = (df.sort_values(["day", "c_ts", "c_id"],
                                 ascending=[True, False, False], kind="stable")
                  .groupby("day", sort=True).head(1)[["day", "close_cents"]])
        mm = df.groupby("day", sort=True).agg(
            low_cents=("low_cents", "min"),
            high_cents=("high_cents", "max")).reset_index()
        out = opens.merge(closes, on="day").merge(mm, on="day")
        out = out[["day", "open_cents", "high_cents", "low_cents",
                   "close_cents"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    p = ds.map_batches(partial, batch_format="pyarrow")
    return p.repartition(1).map_batches(final, batch_format="pyarrow")


SQL_DAILY_OHLC = """
WITH e AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
r AS (
  SELECT day, cents,
         row_number() OVER (PARTITION BY day ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY day
                            ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM e
)
SELECT day,
       max(CASE WHEN rn_a = 1 THEN cents END)::BIGINT AS open_cents,
       max(cents)::BIGINT AS high_cents,
       min(cents)::BIGINT AS low_cents,
       max(CASE WHEN rn_z = 1 THEN cents END)::BIGINT AS close_cents
FROM r GROUP BY day
"""


def q_new_users_daily(sf_dir: str):
    """New-vs-cumulative users per day — first-touch attribution: each
    user's first-seen day, the per-day count of first-sightings, and the
    running cumulative distinct-user total. Plan: per-batch partial
    min(ts) per user (bounds the exchange at O(blocks x users-per-batch)
    rows), ONE hash exchange by user (``bucketed_reduce``) folding
    partial mins and emitting <= |days| (day, new_users) partial rows
    per bucket, then a single O(days) final task for the sum + running
    cumulative (days are bounded — 10^3-ish — regardless of row scale).
    NULL user_ids are excluded (COUNT over users semantics)."""
    from .pipelines.relational import bucketed_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["user_id"]))
        g = t.group_by(["user_id"]).aggregate([("ts", "min")])
        return g.rename_columns(["user_id", "ft"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        f = t.group_by(["user_id"]).aggregate([("ft", "min")])
        days = pc.strftime(f["ft_min"], format="%Y-%m-%d")
        vc = days.to_pandas().value_counts()
        return pa.table({"day": pa.array(vc.index, pa.string()),
                         "new_users": pa.array(vc.to_numpy(), pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby("day", sort=True)["new_users"]
              .sum().reset_index())
        return pa.table({
            "day": pa.array(df["day"], pa.string()),
            "new_users": pa.array(df["new_users"], pa.int64()),
            "cum_users": pa.array(df["new_users"].cumsum(), pa.int64()),
        })

    p = ds.map_batches(partial, batch_format="pyarrow")
    small = bucketed_reduce(p, "user_id", bucket_fn, n_buckets=8)
    return small.repartition(1).map_batches(final, batch_format="pyarrow")


SQL_NEW_USERS_DAILY = """
WITH f AS (SELECT user_id, min(ts) AS ft FROM events
           WHERE user_id IS NOT NULL GROUP BY 1),
d AS (SELECT strftime(ft, '%Y-%m-%d') AS day, count(*)::BIGINT AS new_users
      FROM f GROUP BY 1)
SELECT day, new_users,
       sum(new_users) OVER (ORDER BY day)::BIGINT AS cum_users
FROM d
"""


def q_event_rollup(sf_dir: str):
    """A3 analog: global per-type rollup (count + exact cent sums)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    with_cents = ds.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "cents": _cents(t["value"])}
        ),
        batch_format="pyarrow",
    )
    return with_cents.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("cents", alias_name="sum_cents"),
        Min("cents", alias_name="min_cents"),
        Max("cents", alias_name="max_cents"),
    )


SQL_EVENT_ROLLUP = """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents,
       min(CAST(round(value * 100) AS BIGINT))::BIGINT AS min_cents,
       max(CAST(round(value * 100) AS BIGINT))::BIGINT AS max_cents
FROM events GROUP BY event_type
"""


def q_hourly_windows(sf_dir: str):
    """§2.9 streaming analog: tumbling 1-hour event-time windows per type."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": win,
                "cents": _cents(t["value"]),
            }
        )

    return ds.map_batches(add_window, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))


SQL_HOURLY_WINDOWS = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_priority_variance(sf_dir: str):
    """Distributed POPULATION VARIANCE per group via integer sufficient
    statistics (the `price_regression` discipline applied to the
    second-moment aggregate): per-batch (n, Σcents, Σcents²) int64
    partials per priority — all LINEAR, so the driver folds O(blocks x
    groups) rows and computes var = (n·Σx² − (Σx)²) // n² in Python
    big-ints (Σx² overflows int64-squared territory at scale), emitted
    as exact integer centi-cents² — never a float-associative Welford
    pass."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        tmp = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "s": cents,
            "s2": pc.multiply(cents, cents),
        })
        return tmp.group_by(["o_orderpriority"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["o_orderpriority"], [0, 0, 0])
        a[0] += int(r["n_sum"])
        a[1] += int(r["s_sum"])
        a[2] += int(r["s2_sum"])
    keys = sorted(acc)
    var = [(acc[k][0] * acc[k][2] - acc[k][1] ** 2) // (acc[k][0] ** 2)
           for k in keys]
    return pa.table({
        "o_orderpriority": pa.array(keys, pa.string()),
        "n": pa.array([acc[k][0] for k in keys], pa.int64()),
        "var_cents2": pa.array(var, pa.int64()),
    })


SQL_PRIORITY_VARIANCE = """
WITH s AS (
  SELECT o_orderpriority,
         count(*)::HUGEINT AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::HUGEINT AS sx,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT
             * CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT) AS sx2
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n::BIGINT AS n,
       ((n * sx2 - sx * sx) // (n * n))::BIGINT AS var_cents2
FROM s
"""


def q_user_top_event(sf_dir: str):
    """Grouped MODE — each user's most frequent event type (ties break
    to the alphabetically first type, then nothing else is needed: the
    count makes it deterministic). Per-batch (user, type, n) partials,
    ONE exchange by user (``bucketed_reduce``) summing partials and
    taking the per-user argmax vectorized — the low-cardinality value
    domain means <= |types| rows per user ever cross the exchange."""
    from .pipelines.relational import bucketed_reduce

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["user_id"]),
                             pc.is_valid(t["event_type"])))
        tmp = pa.table({"user_id": t["user_id"],
                        "event_type": t["event_type"],
                        "n": pa.array(np.ones(t.num_rows, np.int64))})
        return tmp.group_by(["user_id", "event_type"]).aggregate(
            [("n", "sum")]).rename_columns(["user_id", "event_type", "n"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby(["user_id", "event_type"], sort=False)
              ["n"].sum().reset_index())
        top = (df.sort_values(["user_id", "n", "event_type"],
                              ascending=[True, False, True], kind="stable")
               .groupby("user_id", sort=False).head(1))
        return pa.table({
            "user_id": pa.array(top["user_id"], pa.int64()),
            "event_type": pa.array(top["event_type"], pa.string()),
            "n": pa.array(top["n"], pa.int64()),
        })

    p = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_reduce(p, "user_id", bucket_fn, n_buckets=8)


SQL_USER_TOP_EVENT = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT user_id, event_type, n FROM c
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
"""


ASSOC_MIN_USERS = 5


def q_association_rules(sf_dir: str):
    """Association rules over per-user event-type BASKETS — the Apriori
    support/confidence/lift family (Agrawal et al., SIGMOD 1993): for
    every ordered type pair (a -> b) held by >= ``ASSOC_MIN_USERS``
    users, support/confidence/lift as EXACT ppm integers (big-int floor
    division, HUGEINT-restatable; lift needs n_ab*N*10^6 which overflows
    int64 at scale). Distributed shape: per-batch DISTINCT (user, type)
    partials, ONE exchange by user (``bucketed_reduce``) — each user's
    basket completes in its bucket and fans out vectorized to ordered
    pairs (per-segment triu, both directions); a bucket emits <=
    |types|^2 pair partials + |types| singleton partials + 1 user-count
    row, so the driver folds O(buckets x 31) fixed rows, never a user."""
    from .pipelines.relational import bucketed_reduce

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["user_id"]),
                             pc.is_valid(t["event_type"])))
        return (t.select(["user_id", "event_type"])
                .group_by(["user_id", "event_type"]).aggregate([]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.nulls(0, pa.string()),
                          "b": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().drop_duplicates(["user_id", "event_type"])
              .sort_values(["user_id", "event_type"], kind="stable"))
        u = df["user_id"].to_numpy()
        ty = df["event_type"].to_numpy()
        seg = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        lens = np.diff(np.r_[seg, len(u)])
        aa, bb = [], []
        for s, l in zip(seg, lens):
            if l < 2:
                continue
            ii, jj = np.triu_indices(l, 1)
            aa.extend((ty[s + ii], ty[s + jj]))   # a -> b
            bb.extend((ty[s + jj], ty[s + ii]))   # b -> a (ordered rules)
        out_a: list = []
        out_b: list = []
        out_n: list = []
        if aa:
            g = (pd.DataFrame({"a": np.concatenate(aa),
                               "b": np.concatenate(bb)})
                 .groupby(["a", "b"], sort=False).size())
            for (a, b), n in g.items():
                out_a.append(a)
                out_b.append(b)
                out_n.append(int(n))
        for a, n in pd.Series(ty).value_counts().items():
            out_a.append(a)
            out_b.append(None)                    # singleton support row
            out_n.append(int(n))
        out_a.append(None)                        # distinct-user count row
        out_b.append(None)
        out_n.append(len(seg))
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    parts = bucketed_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                            "user_id", bucket_fn, n_buckets=8)
    n_users = 0
    singles: dict[str, int] = {}
    pairs: dict[tuple[str, str], int] = {}
    for r in parts.take_all():                    # O(buckets x 31) rows
        a, b, n = r["a"], r["b"], int(r["n"])
        if a is None:
            n_users += n
        elif b is None:
            singles[a] = singles.get(a, 0) + n
        else:
            pairs[(a, b)] = pairs.get((a, b), 0) + n
    keys = sorted(k for k, n in pairs.items() if n >= ASSOC_MIN_USERS)
    cols: dict[str, list] = {c: [] for c in (
        "antecedent", "consequent", "n_a", "n_ab",
        "support_ppm", "conf_ppm", "lift_ppm")}
    for a, b in keys:
        n_ab = pairs[(a, b)]
        n_a, n_b = singles[a], singles[b]
        cols["antecedent"].append(a)
        cols["consequent"].append(b)
        cols["n_a"].append(n_a)
        cols["n_ab"].append(n_ab)
        cols["support_ppm"].append(n_ab * 1_000_000 // n_users)
        cols["conf_ppm"].append(n_ab * 1_000_000 // n_a)
        cols["lift_ppm"].append(n_ab * n_users * 1_000_000 // (n_a * n_b))
    return pa.table({
        "antecedent": pa.array(cols["antecedent"], pa.string()),
        "consequent": pa.array(cols["consequent"], pa.string()),
        "n_a": pa.array(cols["n_a"], pa.int64()),
        "n_ab": pa.array(cols["n_ab"], pa.int64()),
        "support_ppm": pa.array(cols["support_ppm"], pa.int64()),
        "conf_ppm": pa.array(cols["conf_ppm"], pa.int64()),
        "lift_ppm": pa.array(cols["lift_ppm"], pa.int64()),
    })


SQL_ASSOCIATION_RULES = f"""
WITH b AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
nu AS (SELECT count(DISTINCT user_id)::HUGEINT AS n_users FROM b),
s AS (SELECT event_type, count(*)::HUGEINT AS c FROM b GROUP BY 1),
p AS (
  SELECT x.event_type AS a, y.event_type AS bb, count(*)::HUGEINT AS c
  FROM b x JOIN b y
    ON x.user_id = y.user_id AND x.event_type <> y.event_type
  GROUP BY 1, 2
)
SELECT p.a AS antecedent, p.bb AS consequent,
       sa.c::BIGINT AS n_a, p.c::BIGINT AS n_ab,
       (p.c * 1000000 // nu.n_users)::BIGINT AS support_ppm,
       (p.c * 1000000 // sa.c)::BIGINT AS conf_ppm,
       (p.c * nu.n_users * 1000000 // (sa.c * sb.c))::BIGINT AS lift_ppm
FROM p
JOIN s sa ON sa.event_type = p.a
JOIN s sb ON sb.event_type = p.bb
CROSS JOIN nu
WHERE p.c >= {ASSOC_MIN_USERS}
"""


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate over the big table, with per-batch
    partial pre-aggregation before the groupby (ray_guide 'Aggregation at
    scale')."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.round(t["l_quantity"]).cast(pa.int64())
        price_c = _cents(t["l_extendedprice"])
        disc_pct = _cents(t["l_discount"])          # discount in integer %%-cents
        # discount amount in centi-cent units: exact integer product on both
        # sides (avoids Arrow banker's-rounding vs DuckDB half-away on .5)
        disc_cc = pc.multiply(price_c, disc_pct)
        tmp = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": qty,
                "sum_price_cents": price_c,
                "sum_disc_centicents": disc_cc,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        # Arrow-native partial aggregation (no pandas round-trip; int64
        # sums stay int64)
        g = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"),
             ("sum_disc_centicents", "sum"), ("n", "sum")]
        )
        renames = {"sum_qty_sum": "sum_qty",
                   "sum_price_cents_sum": "sum_price_cents",
                   "sum_disc_centicents_sum": "sum_disc_centicents",
                   "n_sum": "n"}
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        return g.select(["l_returnflag", "l_linestatus", "sum_qty",
                         "sum_price_cents", "sum_disc_centicents", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_centicents", alias_name="sum_disc_centicents"),
        Sum("n", alias_name="n"),
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT))::BIGINT AS sum_disc_centicents,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_brand_revenue(sf_dir: str):
    """J1 analog: broadcast small-side hash join (part -> lineitem) +
    grouped revenue. The part table is ray.put once; each batch does an
    in-memory merge — no shuffle join."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    part_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    def join_rev(t: pa.Table) -> pa.Table:
        # broadcast dict: ray.get of the same ref is cached per worker
        brand_of = ray.get(part_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        brands = pd.Series(pk).map(brand_of)
        price_c = _cents(t["l_extendedprice"])
        disc_pct = _cents(t["l_discount"])
        rev_cc = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        # §2.5 pre-aggregation: collapse to <= |brands| partial rows per
        # batch BEFORE anything shuffles (was: one row per lineitem)
        g = pd.DataFrame({"p_brand": brands,
                          "rev_centicents": rev_cc.to_numpy()}).groupby(
            "p_brand", as_index=False).agg(
            rev_centicents=("rev_centicents", "sum"), n_items=("rev_centicents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    partials = ds.map_batches(join_rev, batch_format="pyarrow").to_pandas()
    # driver fold of O(blocks x |brands|) partial rows (bounded)
    return (
        partials.groupby("p_brand", as_index=False)
        .agg(rev_centicents=("rev_centicents", "sum"), n_items=("n_items", "sum"))
        .astype({"rev_centicents": "int64", "n_items": "int64"})
    )


SQL_BRAND_REVENUE = """
SELECT p.p_brand,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT AS rev_centicents,
       count(*)::BIGINT AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def q_customer_orders(sf_dir: str):
    """Fact-side aggregate + broadcast dim join (J1 + §2.5
    pre-aggregation): the small customer dim broadcasts once
    (``ray.put``), each order batch maps custkey -> segment and
    collapses to <= |segments| partial rows, and ONE tiny
    ``groupby(segment)`` merges the partials — total shuffle volume
    O(blocks x segments), never a row per order or per customer. (An
    earlier formulation reduced per customer first; that global
    groupby shuffled ~|customers| rows through the Aggregate
    small-block single-task sort-map for no semantic gain.)"""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def seg_partial(t: pa.Table) -> pa.Table:
        # ray.get of the same broadcast ref is cached per worker process —
        # a task stage suffices, no actor-pool spin-up for a plain dict
        seg = ray.get(seg_ref)
        df = pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        ).to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders.map_batches(seg_partial, batch_format="pyarrow").to_pandas()
    # driver fold of O(blocks x |segments|) partial rows (bounded, the
    # grouped_quantiles totals precedent) — a Dataset groupby here pays
    # the Aggregate's multi-second fixed cost for a 5-row result
    return (
        partials.groupby("c_mktsegment", as_index=False)
        .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
        .astype({"n_orders": "int64", "total_cents": "int64"})
    )


SQL_CUSTOMER_ORDERS = """
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# URL / string functions (SURVEY.md §2.8) on a constructed column
# ---------------------------------------------------------------------------

def q_supplier_regions(sf_dir: str):
    """Dimension-chain broadcast join (supplier -> nation -> region):
    classic small-side star lookup, no shuffle join."""
    import ray

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, r2name))

    class AddRegion:
        def __init__(self):
            self.n2r, self.r2name = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rk = df["s_nationkey"].map(self.n2r)
            return pd.DataFrame(
                {
                    "r_name": rk.map(self.r2name),
                    "cents": (df["s_acctbal"] * 100).round().astype("int64"),
                }
            )

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    return sup.map_batches(AddRegion, batch_format="pandas", concurrency=2).groupby(
        "r_name"
    ).aggregate(Count(alias_name="n_suppliers"), Sum("cents", alias_name="acctbal_cents"))


SQL_SUPPLIER_REGIONS = """
SELECT r.r_name,
       count(*)::BIGINT AS n_suppliers,
       sum(CAST(round(s.s_acctbal * 100) AS BIGINT))::BIGINT AS acctbal_cents
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_url_canon(sf_dir: str):
    """M13/M14/M15: canonicalization over a deterministic URL family built
    from table columns (mixed-case scheme/host, default port, fragment)."""
    from .canon import canonicalize, host_of, is_internal

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def build(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        sources = t["source"].to_pylist()
        raw = [
            f"HTTPS://{s.upper()}.Example.COM:443/Docs/{d}#frag{d % 7}"
            for d, s in zip(doc_ids, sources)
        ]
        canon = [canonicalize(u) for u in raw]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url_canon": pa.array(canon, pa.string()),
                "host": pa.array([host_of(u) for u in canon], pa.string()),
                "is_internal": pa.array(
                    [is_internal(u, "https://src0.example.com/") for u in canon],
                    pa.bool_(),
                ),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


SQL_URL_CANON = """
SELECT doc_id,
       'https://' || lower(source) || '.example.com/Docs/' || doc_id AS url_canon,
       lower(source) || '.example.com' AS host,
       (lower(source) || '.example.com' = 'src0.example.com') AS is_internal
FROM documents
"""


# ---------------------------------------------------------------------------
# Dedup / fingerprint / quality / tokens
# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    from .pipelines.dedup import exact_dedup_groups

    return exact_dedup_groups(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_EXACT_DEDUP = """
SELECT md5(text) AS fp, count(*)::BIGINT AS n_dups, min(doc_id)::BIGINT AS keep_doc_id
FROM documents GROUP BY md5(text)
"""


def q_fingerprint(sf_dir: str):
    from .pipelines.textops import fingerprint

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint, batch_format="pyarrow"
    )


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_quality(sf_dir: str):
    from .pipelines.textops import QualityScorer

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pandas", concurrency=2
    )


SQL_QUALITY = """
SELECT doc_id,
       CASE WHEN trim(text)='' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> x IN ('the','a','and','of','to','in','is','it')))::BIGINT AS n_stopwords,
       (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::BIGINT AS n_alpha,
       length(text)::BIGINT AS n_chars
FROM documents
"""


def q_token_totals(sf_dir: str):
    """Corpus token counting: per-lang totals via per-batch partials."""
    from .pipelines.textops import doc_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        stats = doc_stats(t)
        return pa.table(
            {
                "lang": t["lang"],
                "tokens": stats["word_count"],
                "chars": stats["char_count"],
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("tokens", alias_name="tokens"),
        Sum("chars", alias_name="chars"),
        Count(alias_name="n_docs"),
    )


SQL_TOKEN_TOTALS = """
SELECT lang,
       sum(CASE WHEN trim(text)='' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT AS tokens,
       sum(length(text))::BIGINT AS chars,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY lang
"""


def q_distinct_pairs(sf_dir: str):
    """D-family: distinct (lang, source) combinations (ds.unique analog)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])
    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))


SQL_DISTINCT_PAIRS = """
SELECT lang, source, count(*)::BIGINT AS n FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# ANN over embeddings
# ---------------------------------------------------------------------------

def q_order_priority_revenue(sf_dir: str):
    """Both-sides-large equi-join (bucketed hash join, ray_guide pattern):
    orders x lineitem on the order key, revenue per order priority."""
    from .pipelines.relational import bucketed_hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "rev_centicents": pc.multiply(
                    _cents(t["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
                ),
            }
        )

    items_p = items.map_batches(prep, batch_format="pyarrow")
    joined = bucketed_hash_join(orders, items_p, "o_orderkey", n_buckets=16)

    # per-batch partial pre-aggregation before the grouped reduce — a bare
    # groupby.aggregate over the join output is ~8x slower (ray_guide
    # "Aggregation at scale"; measured 22s -> 2.8s at sf0.1)
    def partial_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            rev_centicents=("rev_centicents", "sum"),
            n_items=("rev_centicents", "size"),
        )

    return joined.map_batches(partial_agg, batch_format="pandas").groupby(
        "o_orderpriority"
    ).aggregate(
        Sum("rev_centicents", alias_name="rev_centicents"),
        Sum("n_items", alias_name="n_items"),
    )


SQL_ORDER_PRIORITY_REVENUE = """
SELECT o.o_orderpriority,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT AS rev_centicents,
       count(*)::BIGINT AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5 shape — the canonical 6-table star plan, and the proof
    the join planner composes: customer / supplier / nation / region are
    DIMENSIONS (broadcast once via ``ray.put``, probed per batch — never
    shuffled), so the ONE real exchange is orders x lineitem bucketed on
    the order key. The Q5 twist — revenue only counts when the customer
    and the line's supplier share a nation — becomes a vectorized
    equality filter AFTER the join, over two broadcast-mapped nation
    columns. Per-block partial aggregation bounds what leaves each
    bucket at <= |nations| rows; revenue in exact centicents."""
    import ray

    from .pipelines.relational import bucketed_hash_join

    lo = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    asia = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = nation[nation["n_regionkey"] == asia]
    n2name = dict(zip(asia_nations["n_nationkey"], asia_nations["n_name"]))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    ref = ray.put((dict(zip(cust["c_custkey"], cust["c_nationkey"])),
                   dict(zip(supp["s_suppkey"], supp["s_nationkey"])),
                   n2name))

    # plain TASK functions, not actor pools: the only state is the
    # broadcast ref (ray.get on a put object is a cached zero-copy read
    # per worker), and the join's schema probe re-executes its inputs —
    # actor-pool spin-up paid twice dominated the wall (9.4 s -> ~4 s).
    # Both prep outputs are materialized (small: int64 columns only) so
    # the probe and the split read the same blocks.
    def orders_prep(t: pa.Table) -> pa.Table:
        c2n, _, n2name = ray.get(ref)
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        df = t.to_pandas()
        cn = df["o_custkey"].map(c2n)
        keep = cn.isin(n2name.keys()).to_numpy()
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"][keep], pa.int64()),
            "c_nat": pa.array(cn[keep].astype("int64"), pa.int64()),
        })

    def items_prep(t: pa.Table) -> pa.Table:
        _, s2n, n2name = ray.get(ref)
        df = t.to_pandas()
        sn = df["l_suppkey"].map(s2n)
        keep = sn.isin(n2name.keys()).to_numpy()
        df = df[keep]
        rev = ((df["l_extendedprice"] * 100).round().astype("int64")
               * (100 - (df["l_discount"] * 100).round().astype("int64")))
        return pa.table({
            "o_orderkey": pa.array(df["l_orderkey"], pa.int64()),
            "s_nat": pa.array(sn[keep].astype("int64"), pa.int64()),
            "rev_centicents": pa.array(rev, pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                       "l_extendedprice", "l_discount"])
    joined = bucketed_hash_join(
        orders.map_batches(orders_prep, batch_format="pyarrow").materialize(),
        items.map_batches(items_prep, batch_format="pyarrow").materialize(),
        "o_orderkey", n_buckets=16)

    def block_partial(t: pa.Table) -> pa.Table:
        _, _, n2name = ray.get(ref)
        t = t.filter(pc.equal(t["c_nat"], t["s_nat"]))
        g = (t.select(["c_nat", "rev_centicents"])
             .group_by(["c_nat"]).aggregate([("rev_centicents", "sum")]))
        return pa.table({
            "n_name": pa.array([n2name[k] for k in
                                g["c_nat"].to_pylist()], pa.string()),
            "rev_centicents": g["rev_centicents_sum"].cast(pa.int64()),
        })

    part = joined.map_batches(block_partial, batch_format="pyarrow",
                              batch_size=None)
    final = part.groupby("n_name").aggregate(
        Sum("rev_centicents", alias_name="rev_centicents"))
    return final.sort(["rev_centicents", "n_name"], descending=[True, False])


SQL_REGIONAL_REVENUE = """
SELECT n.n_name,
       sum((CAST(round(l.l_extendedprice * 100) AS BIGINT))
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
         AS rev_centicents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
               AND s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate <  DATE '1998-01-01'
GROUP BY n.n_name
ORDER BY rev_centicents DESC, n.n_name
"""


def q_top_orders(sf_dir: str):
    """TPC-H Q3 shape — the canonical 3-table plan: (1) the BUILDING
    customer keys never join, they REDUCE — a bloom-gated
    ``bucketed_semi_join`` drops non-segment orders before the wide
    join; (2) date filters push to both scans; (3) the one real
    exchange is orders x lineitem bucketed on the order key; (4) the
    join output is bucket-per-block, so every order's rows are already
    CO-LOCATED — the per-(order, date) revenue aggregate and a top-10
    partial both complete inside each block (``batch_size=None`` keeps
    block==bucket), and only O(buckets x 10) rows reach the final
    sort-limit. Deterministic tiebreak (rev desc, orderkey asc) in
    both engines."""
    from .pipelines.relational import bucketed_hash_join, bucketed_semi_join

    cut = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], "BUILDING")
        return pa.table({"o_custkey": t.filter(keep)["c_custkey"]})

    building = cust.map_batches(seg_keys, batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    orders_f = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cut)),
        batch_format="pyarrow")
    orders_f = bucketed_semi_join(orders_f, building, "o_custkey",
                                  bloom_bits=1 << 16)
    orders_f = orders_f.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount",
                   "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "rev_centicents": pc.multiply(
                _cents(t["l_extendedprice"]),
                pc.subtract(pa.scalar(100, pa.int64()),
                            _cents(t["l_discount"]))),
        })

    joined = bucketed_hash_join(
        orders_f, items.map_batches(prep, batch_format="pyarrow"),
        "o_orderkey", n_buckets=16)

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.Series([], "int64"),
                                 "o_orderdate": pd.Series([], "datetime64[us]"),
                                 "rev_centicents": pd.Series([], "int64")})
        g = (df.groupby(["o_orderkey", "o_orderdate"], as_index=False)
             ["rev_centicents"].sum())
        g = g.sort_values(["rev_centicents", "o_orderkey"],
                          ascending=[False, True]).head(10)
        return g.rename(columns={"o_orderkey": "l_orderkey"})

    parts = joined.map_batches(
        block_topk, batch_format="pandas", batch_size=None).to_pandas()
    return (
        parts.sort_values(["rev_centicents", "l_orderkey"],
                          ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
        .astype({"l_orderkey": "int64", "rev_centicents": "int64"})
    )


SQL_TOP_ORDERS = """
SELECT l.l_orderkey,
       o.o_orderdate,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
           AS rev_centicents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY rev_centicents DESC, l.l_orderkey ASC
LIMIT 10
"""


def q_daily_top_event(sf_dir: str):
    """Window-function analog (row_number()=1 per partition): per
    (user_id, day) the highest-value event; partial per-batch argmax then
    a tiny grouped reduce — the full table never shuffles."""
    from .pipelines.relational import grouped_argmax

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "event_id": t["event_id"],
                "cents": _cents(t["value"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_argmax(prepped, ["user_id", "day"], "cents", "event_id")
    return out.select_columns(["user_id", "day", "event_id", "cents"])


SQL_DAILY_TOP_EVENT = """
SELECT user_id, day, event_id, cents FROM (
  SELECT user_id, date_trunc('day', ts) AS day, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id
         ) AS rn
  FROM events
) WHERE rn = 1
"""


EMB_NEARDUP_LIMIT = 1000
EMB_NEARDUP_THRESHOLD = 0.35


def q_embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-duplicate pairs: all (a < b) pairs of the
    first EMB_NEARDUP_LIMIT vectors with cosine >= threshold. Batch-vs-
    broadcast float64 matmul per block; only pairs above threshold leave
    a task."""
    import ray

    from .pipelines.ann import _matrix, _normalize

    ds = _read(sf_dir, "embeddings").map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], EMB_NEARDUP_LIMIT)),
        batch_format="pyarrow",
    )
    full = ds.to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy().astype(np.int64)
    m = _normalize(np.stack(full["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put({"ids": ids, "m": m})

    def pairs(t: pa.Table) -> pa.Table:
        import numpy as _np

        d = ray.get(ref)
        sub = _normalize(_matrix(t))
        sub_ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        sims = sub @ d["m"].T                      # (B, N)
        rows, cols = _np.nonzero(sims >= EMB_NEARDUP_THRESHOLD)
        a = sub_ids[rows]
        b = d["ids"][cols]
        mask = a < b
        # pair identity only: DuckDB's list_cosine_similarity computes in
        # float32, so the value itself can't be matched exactly
        return pa.table({"a": pa.array(a[mask]), "b": pa.array(b[mask])})

    return ds.map_batches(pairs, batch_format="pyarrow")


SQL_EMBEDDING_NEAR_DUPS = f"""
SELECT a.vec_id::BIGINT AS a, b.vec_id::BIGINT AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < {EMB_NEARDUP_LIMIT} AND b.vec_id < {EMB_NEARDUP_LIMIT}
  AND list_cosine_similarity(a.embedding, b.embedding) >= {EMB_NEARDUP_THRESHOLD}
"""


def q_running_sum(sf_dir: str):
    """Per-user running value sum in event-time order (the SUM OVER
    (PARTITION BY user ORDER BY ts, id) analog): hash-partition by user,
    per-partition segmented cumsum — one shuffle, no global sort, no
    driver pass. The incremental bucket-actor variant lives in
    ``streaming.running_sum_incremental``."""
    from .pipelines.streaming import running_sum_per_key

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "cents": _cents(t["value"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return running_sum_per_key(prepped, "user_id", "ts", "cents", "event_id")


SQL_RUNNING_SUM = """
SELECT event_id,
       sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       )::BIGINT AS running
FROM events
"""


SESSION_GAP_SECONDS = 1800


def q_sessions(sf_dir: str):
    """Gap-based session windows over the events log (streaming
    sessionization): per (user, session) start/end/count/value-sum,
    sessions split at >30 min of inactivity. Hash-partitioned segment
    reduce — one shuffle, no driver pass."""
    from .pipelines.streaming import sessionize

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "cents": _cents(t["value"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return sessionize(prepped, "user_id", "ts", "cents", "event_id",
                      gap_seconds=SESSION_GAP_SECONDS)


SQL_SESSIONS = f"""
WITH e AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_SECONDS} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id, session_id::BIGINT AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS cents_sum
FROM s GROUP BY user_id, session_id
"""


def q_span_histogram(sf_dir: str):
    """Span-kind histogram over a deterministic synthetic mini-corpus —
    grouped count over the interleaved doc table (A5 family, rows-only)."""
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(300, cfg.world.n_urls))]
    # 8 blocks, not one-row-per-block: from_items defaults to ~1 block per
    # item here, turning 300 cheap parses into 300 tasks + a 300-block
    # aggregate (measured 34.5 s; 8 blocks run the same work in ~3 s)
    ds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def count_kinds(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for u in t["url"].to_pylist():
            for k, _t, _m in parse_document(world.gen_page(u), u).spans:
                c[k] += 1
        kinds = sorted(c)
        return pa.table(
            {"kind": pa.array(kinds), "n": pa.array([c[k] for k in kinds], pa.int64())}
        )

    return ds.map_batches(count_kinds, batch_format="pyarrow").groupby(
        "kind"
    ).aggregate(Sum("n", alias_name="n"))


def q_ngram_jaccard(sf_dir: str):
    """n-gram Jaccard similarity join: exact pairwise word-3-gram Jaccard
    over a bounded doc subset (the standalone verify kernel of the
    MinHash-LSH path). Integer intersection/union sizes -> exact oracle."""
    import ray

    from .pipelines.dedup import word_shingles

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 30)), batch_format="pyarrow"
    )
    small = ds.to_pandas().sort_values("doc_id")
    sh = {int(d): set(word_shingles(t, 3)) for d, t in zip(small["doc_id"], small["text"])}
    ref = ray.put(sh)

    def pairs_batch(t: pa.Table) -> pa.Table:
        shingles = ray.get(ref)
        rows_a, rows_b, inter, union = [], [], [], []
        for a in t["doc_id"].to_pylist():
            sa = shingles[int(a)]
            for b in sorted(shingles):
                if b <= a:
                    continue
                sb = shingles[b]
                ni = len(sa & sb)
                if ni > 0:
                    rows_a.append(int(a)); rows_b.append(b)
                    inter.append(ni); union.append(len(sa) + len(sb) - ni)
        return pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "n_inter": pa.array(inter, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
            }
        )

    return ds.map_batches(pairs_batch, batch_format="pyarrow")


SQL_NGRAM_JACCARD = """
WITH d AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in range(1, len(words) - 1)]) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents WHERE doc_id < 30)
)
SELECT x.doc_id::BIGINT AS a, y.doc_id::BIGINT AS b,
       len(list_intersect(x.sh, y.sh))::BIGINT AS n_inter,
       (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::BIGINT AS n_union
FROM d x JOIN d y ON x.doc_id < y.doc_id
WHERE len(list_intersect(x.sh, y.sh)) > 0
"""


def q_asof_last_view(sf_dir: str):
    """As-of join (backward): every purchase event joined to the same
    user's most recent view event at or before it (nulls when none).
    The custom-operator case the brief names: Ray Data has no asof
    call; ``relational.asof_join`` is the bucketed merge implementation,
    DuckDB ``ASOF LEFT JOIN`` is the oracle."""
    from .pipelines.relational import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def side(t: pa.Table, kind: str, rename: bool) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], kind))
        if rename:
            return pa.table({"user_id": t["user_id"],
                             "view_event_id": t["event_id"],
                             "view_ts": t["ts"]})
        return t.select(["event_id", "user_id", "ts"])

    left = ev.map_batches(
        functools.partial(side, kind="purchase", rename=False),
        batch_format="pyarrow")
    right = ev.map_batches(
        functools.partial(side, kind="view", rename=True),
        batch_format="pyarrow")
    joined = asof_join(left, right, key="user_id",
                       left_ts="ts", right_ts="view_ts")

    def sentinels(t: pa.Table) -> pa.Table:
        # unmatched-row nulls -> fixed sentinels so the driver's value
        # hash sees identical bytes from Ray and DuckDB
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"],
            "view_event_id": pc.fill_null(t["view_event_id"], -1),
            "view_ts": pc.fill_null(
                t["view_ts"], pa.scalar(0, pa.timestamp("us"))),
        })

    return joined.map_batches(sentinels, batch_format="pyarrow")


SQL_ASOF_LAST_VIEW = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, event_id AS view_event_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.ts,
       coalesce(v.view_event_id, -1) AS view_event_id,
       coalesce(v.view_ts, TIMESTAMP '1970-01-01') AS view_ts
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts >= v.view_ts
"""


def q_sliding_windows(sf_dir: str):
    """Hopping-window aggregate: 3-hour windows advancing hourly over
    events — count + cents sum per window (streaming §2.9 family;
    partial-aggregated explode, see ``streaming.sliding_window_agg``)."""
    from .pipelines.streaming import sliding_window_agg

    ev = _read(sf_dir, "events", ["ts", "value"])
    return sliding_window_agg(ev, ts="ts", value="value",
                              width_hours=3, slide_hours=1)


SQL_SLIDING_WINDOWS = """
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS base,
         round(value * 100)::BIGINT AS cents
  FROM events
),
w AS (SELECT unnest([base - 2, base - 1, base]) AS ws, cents FROM e)
SELECT make_timestamp(ws * 3600000000) AS window_start,
       count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS cents_sum
FROM w GROUP BY 1
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition filters over documents: exact integer
    numerator/denominator pairs for top-word, duplicate-word and
    top-bigram fractions (``textops.repetition_stats``)."""
    from .pipelines.textops import repetition_stats

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        repetition_stats, batch_format="pandas"
    )


SQL_REPETITION = """
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
  FROM documents WHERE trim(text) <> ''
),
w AS (SELECT doc_id, unnest(ws) AS word FROM d),
wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
wagg AS (
  SELECT doc_id, max(c) AS top_word_n,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_word_n,
         sum(c) AS n_words
  FROM wc GROUP BY 1
),
bg AS (
  SELECT doc_id,
         unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]) AS bigram
  FROM d
),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
bagg AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY 1)
SELECT docs.doc_id,
       coalesce(wagg.n_words, 0)::BIGINT AS n_words,
       coalesce(wagg.top_word_n, 0)::BIGINT AS top_word_n,
       coalesce(wagg.dup_word_n, 0)::BIGINT AS dup_word_n,
       greatest(coalesce(wagg.n_words, 0) - 1, 0)::BIGINT AS n_bigrams,
       coalesce(bagg.top_bigram_n, 0)::BIGINT AS top_bigram_n
FROM documents docs
LEFT JOIN wagg ON docs.doc_id = wagg.doc_id
LEFT JOIN bagg ON docs.doc_id = bagg.doc_id
"""


def q_split(sf_dir: str):
    """Deterministic stratified train/val/test split over documents
    (``textops.stratified_split``; md5-mod membership -> SQL-restatable)."""
    from .pipelines.textops import stratified_split

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        stratified_split, batch_format="pyarrow"
    )


SQL_SPLIT = """
WITH b AS (
  SELECT doc_id,
         (md5_number_upper('split-v1:' || doc_id::VARCHAR)::HUGEINT
          % 1000000)::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 900000 THEN 'train'
            WHEN bucket < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


REBALANCE_RATES_PM = {"en": 400, "zh": 800}   # cap over-represented classes


def q_rebalance(sf_dir: str):
    """Class-rebalancing downsample over documents: English capped at
    40%, Chinese at 80% survival, other languages kept whole — per-class
    deterministic md5 membership (``textops.rebalance_sample``)."""
    from .pipelines.textops import rebalance_sample

    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        functools.partial(rebalance_sample, rates_pm=REBALANCE_RATES_PM),
        batch_format="pyarrow",
    )


SQL_REBALANCE = """
WITH b AS (
  SELECT doc_id, lang,
         (md5_number_upper('rebalance-v1:' || doc_id::VARCHAR)::HUGEINT
          % 1000)::BIGINT AS bucket
  FROM documents
),
r(lang, rate) AS (VALUES ('en', 400), ('zh', 800))
SELECT b.doc_id, b.lang, b.bucket
FROM b LEFT JOIN r ON b.lang = r.lang
WHERE b.bucket < coalesce(r.rate, 1000)
"""


ANN_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]
ANN_K = 5


def q_ann_cosine(sf_dir: str):
    from .pipelines.ann import brute_force_topk

    return brute_force_topk(_read(sf_dir, "embeddings"), ANN_QUERY_IDS, k=ANN_K)


SQL_ANN_COSINE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {len(ANN_QUERY_IDS)}),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM sims
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= {ANN_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Crawl-engine queries (not SQL-expressible -> rows-only driver check)
# ---------------------------------------------------------------------------

def _crawl_cfg(sf_dir: str):
    from .engine import EngineConfig
    from .synth import WorldConfig

    # scale the synthetic world with sf (sf0.001 -> small, sf0.1 -> larger)
    n_docs = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}
    key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    n = n_docs.get(key, 2000)
    return EngineConfig(
        world=__import__("crawlray.synth", fromlist=["WorldConfig"]).WorldConfig(
            n_urls=max(500, n), n_hosts=max(10, min(60, n // 80))
        ),
        n_seeds=min(40, max(8, n // 60)),
        max_rounds=2,
    )


def q_crawl(sf_dir: str):
    """Flagship: full crawl on the sf-scaled synthetic world; returns the
    doc summary (no spans — schema-stable across sf)."""
    import shutil
    import tempfile

    from .engine import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawlq_")
    eng = None
    try:
        cfg = _crawl_cfg(sf_dir)
        eng = CrawlEngine(cfg, out)
        eng.run()
        from .storage import read_corpus

        docs = read_corpus(
            out,
            columns=["doc_id", "url", "host", "round", "priority", "seq",
                     "status", "n_spans", "n_links", "n_images"],
        )
        return docs.take(
            pc.sort_indices(docs, sort_keys=[("seq", "ascending")])
        )
    finally:
        if eng is not None:
            eng.shutdown()
        shutil.rmtree(out, ignore_errors=True)


def q_crawl_outlinks(sf_dir: str):
    """Outlink extraction over synthetic pages: one row per (src, url)."""
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(200, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def fetch_parse(t: pa.Table) -> pa.Table:
        rows_src, rows_url, rows_int, rows_rank, rows_anchor = [], [], [], [], []
        for u in t["url"].to_pylist():
            res = parse_document(world.gen_page(u), u)
            for link in res.links:
                rows_src.append(u)
                rows_url.append(link.url)
                rows_int.append(link.is_internal)
                rows_rank.append(link.rank)
                rows_anchor.append(link.text)
        return pa.table(
            {
                "src": pa.array(rows_src, pa.string()),
                "url": pa.array(rows_url, pa.string()),
                "is_internal": pa.array(rows_int, pa.bool_()),
                "discovery_rank": pa.array(rows_rank, pa.int32()),
                "anchor_text": pa.array(rows_anchor, pa.string()),
            }
        )

    return seeds.map_batches(fetch_parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequential VALUES-literal oracles for the crawl family.
#
# The crawl queries are deterministic functions of the synthetic world but
# not SQL-computable (span parser, round-based frontier). Following the
# ``_media_sql`` precedent the oracle is a SEQUENTIAL single-process
# (no-Ray) restatement of the same kernels — ``crawlray.oracle`` for the
# frontier semantics, ``parse_document`` for the page kernels — rendered as
# a SQL VALUES literal at the driver's correctness scale (sf0.01). The
# driver check then proves the DISTRIBUTED engine reproduces the sequential
# oracle row-for-row (the north rule's crawl-determinism contract, made a
# hash-checked oracle instead of a pytest-only assertion).
# ---------------------------------------------------------------------------

_ORACLE_SF_DIR = "/root/testdata/sf0.01"   # config shape only, no reads


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_sql(t: pa.Table, casts: dict[str, str]) -> str:
    """Render an Arrow table as ``SELECT ... FROM (VALUES ...)`` with
    explicit casts so DuckDB's inferred types match the Ray schema."""
    cols = t.column_names
    parts = []
    for r in t.to_pylist():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, str):
                vals.append(_sql_str(v))
            elif isinstance(v, bool):
                vals.append("true" if v else "false")
            else:
                vals.append(str(v))
        parts.append("(" + ", ".join(vals) + ")")
    sel = ", ".join(
        f"{c}::{casts[c]} AS {c}" if c in casts else c for c in cols
    )
    return (
        f"SELECT {sel} FROM (VALUES\n"
        + ",\n".join(parts)
        + f"\n) AS t({', '.join(cols)})"
    )


@functools.lru_cache(maxsize=1)
def _crawl_expected_table() -> pa.Table:
    """Sequential restatement of ``q_crawl`` at sf0.01: the pure-Python
    crawl simulator (``crawlray/oracle.py``) supplies the fetch log
    (round/priority/seq/url/status); per-page counts re-run the same
    ``parse_document`` kernel the engine's fused fetch+parse stage uses."""
    from .canon import host_of
    from .htmlx import KIND_IMAGE, parse_document
    from .oracle import simulate_crawl
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    res = simulate_crawl(world, cfg.n_seeds, cfg.max_rounds)
    rows = sorted(res.fetch_log, key=lambda r: r[2])   # by seq
    out = {k: [] for k in ("doc_id", "url", "host", "round", "priority",
                           "seq", "status", "n_spans", "n_links", "n_images")}
    for rnd, pri, seq, url, status in rows:
        if status == "ok":
            p = parse_document(world.gen_page(url), url)
            ns, nl = len(p.spans), len(p.links)
            ni = sum(1 for k, _, _ in p.spans if k == KIND_IMAGE)
        else:
            ns = nl = ni = 0
        out["doc_id"].append(f"d{seq:012d}")
        out["url"].append(url)
        out["host"].append(host_of(url))
        out["round"].append(rnd)
        out["priority"].append(pri)
        out["seq"].append(seq)
        out["status"].append(status)
        out["n_spans"].append(ns)
        out["n_links"].append(nl)
        out["n_images"].append(ni)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "round": pa.array(out["round"], pa.int32()),
            "priority": pa.array(out["priority"], pa.int32()),
            "seq": pa.array(out["seq"], pa.int64()),
            "status": pa.array(out["status"], pa.string()),
            "n_spans": pa.array(out["n_spans"], pa.int32()),
            "n_links": pa.array(out["n_links"], pa.int32()),
            "n_images": pa.array(out["n_images"], pa.int32()),
        }
    )


def _crawl_sql() -> str:
    return _values_sql(
        _crawl_expected_table(),
        casts={"round": "INTEGER", "priority": "INTEGER", "seq": "BIGINT",
               "n_spans": "INTEGER", "n_links": "INTEGER",
               "n_images": "INTEGER"},
    )


@functools.lru_cache(maxsize=1)
def _outlinks_expected_table() -> pa.Table:
    """Sequential restatement of ``q_crawl_outlinks`` at sf0.01 — the same
    urls, the same ``parse_document`` kernel, one process, no Ray."""
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(200, cfg.world.n_urls))]
    src, url, isint, rank, anchor = [], [], [], [], []
    for u in urls:
        for link in parse_document(world.gen_page(u), u).links:
            src.append(u)
            url.append(link.url)
            isint.append(link.is_internal)
            rank.append(link.rank)
            anchor.append(link.text)
    return pa.table(
        {
            "src": pa.array(src, pa.string()),
            "url": pa.array(url, pa.string()),
            "is_internal": pa.array(isint, pa.bool_()),
            "discovery_rank": pa.array(rank, pa.int32()),
            "anchor_text": pa.array(anchor, pa.string()),
        }
    )


def _outlinks_sql() -> str:
    return _values_sql(
        _outlinks_expected_table(),
        casts={"is_internal": "BOOLEAN", "discovery_rank": "INTEGER"},
    )


@functools.lru_cache(maxsize=1)
def _span_hist_expected_table() -> pa.Table:
    """Sequential restatement of ``q_span_histogram`` at sf0.01."""
    from collections import Counter

    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(300, cfg.world.n_urls))]
    c: Counter = Counter()
    for u in urls:
        for k, _t, _m in parse_document(world.gen_page(u), u).spans:
            c[k] += 1
    kinds = sorted(c)
    return pa.table(
        {"kind": pa.array(kinds), "n": pa.array([c[k] for k in kinds], pa.int64())}
    )


def _span_hist_sql() -> str:
    return _values_sql(_span_hist_expected_table(), casts={"n": "BIGINT"})


@functools.lru_cache(maxsize=1)
def _bulk_expected_table() -> pa.Table:
    """Sequential restatement of ``q_bulk_crawl`` at sf0.01: the same
    per-row kernels the fused partition worker uses (``normalize_seed_rows``
    validation, ``parse_document``, ``filter_outlinks``) driven by a flat
    in-process loop, with the synth fetch gating (robots -> auth -> 404)
    restated exactly as ``crawlray/oracle.py`` does for the crawl family.
    The distributed plumbing under test: CSV indexing, hash partitioning,
    the fused map_groups worker, deterministic rank-derived file naming."""
    import json as _json

    from .canon import split_url
    from .htmlx import parse_document
    from .stages.render import filter_outlinks
    from .stages.sources import normalize_seed_rows
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    wcfg = cfg.world
    world = World(wcfg)
    n_rows = min(60, wcfg.n_urls // 4)
    raw = pd.DataFrame({
        "url": [f"https://{world.hosts[i % wcfg.n_hosts]}/p/{i % 7}"
                for i in range(n_rows)],
        "mode": ["link" if i % 5 == 4 else "content" for i in range(n_rows)],
        "format": [["txt", "md", "txt,json"][i % 3] for i in range(n_rows)],
        "link_type": ["all"] * n_rows,
    })
    norm = normalize_seed_rows(raw)
    out = {k: [] for k in ("seed_rank", "url", "mode", "status", "error_code",
                           "title", "n_links", "n_images", "files")}

    def emit(rank, url, mode, status, error_code="", title="",
             n_links=0, files=()):
        out["seed_rank"].append(rank)
        out["url"].append(url)
        out["mode"].append(mode)
        out["status"].append(status)
        out["error_code"].append(error_code)
        out["title"].append(title)
        out["n_links"].append(n_links)
        out["n_images"].append(0)          # download_images absent -> False
        out["files"].append(_json.dumps(list(files)))

    for rank in range(n_rows):
        r = norm.iloc[rank]
        url, host, mode = r["url"], r["host"], r["mode"]
        path = split_url(url)[2]
        if world.robots_disallowed(host, path):
            emit(rank, url, mode, "robots_denied", "ROBOTS_DENIED")
            continue
        if world.auth_required(host):
            emit(rank, url, mode, "http_401", "401")
            continue
        if world.fetch_plan(url)[0] == 404:
            emit(rank, url, mode, "http_404", "404")
            continue
        res = parse_document(world.gen_page(url), url)
        if res.error_code:
            emit(rank, url, mode, "failed", res.error_code)
            continue
        if mode == "link":
            tbl = pa.table({
                "url": pa.array([l.url for l in res.links], pa.string()),
                "is_internal": pa.array([l.is_internal for l in res.links],
                                        pa.bool_()),
            })
            n_links = filter_outlinks(tbl, link_type="all").num_rows
            files = [f"links/{rank:06d}.txt", f"links/{rank:06d}.json"]
            emit(rank, url, mode, "ok", title=res.title,
                 n_links=n_links, files=files)
        else:
            files = [f"docs/{rank:06d}.{fmt}" for fmt in r["formats"]]
            emit(rank, url, mode, "ok", title=res.title,
                 n_links=len(res.links), files=files)

    return pa.table({
        "seed_rank": pa.array(out["seed_rank"], pa.int64()),
        "url": pa.array(out["url"], pa.string()),
        "mode": pa.array(out["mode"], pa.string()),
        "status": pa.array(out["status"], pa.string()),
        "error_code": pa.array(out["error_code"], pa.string()),
        "title": pa.array(out["title"], pa.string()),
        "n_links": pa.array(out["n_links"], pa.int64()),
        "n_images": pa.array(out["n_images"], pa.int64()),
        "files": pa.array(out["files"], pa.string()),
    })


def _bulk_sql() -> str:
    return _values_sql(
        _bulk_expected_table(),
        casts={"seed_rank": "BIGINT", "n_links": "BIGINT",
               "n_images": "BIGINT"},
    )


HLL_COLS = ("event_id", "event_type", "user_id")
HLL_P = 12


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate count-distinct over three events columns
    (unique int, low-card string, mid-card int) in ONE streaming pass —
    ``sketch.approx_distinct_multi``: per-block 2^p-byte registers, an
    elementwise-max merge, never a key shuffle. ``approx_n`` is the
    rounded estimate; the sketch is deterministic (SipHash), so the
    estimate is reproducible bit-for-bit."""
    from .pipelines.sketch import approx_distinct_multi

    ev = _read(sf_dir, "events", list(HLL_COLS))
    est = approx_distinct_multi(ev, list(HLL_COLS), p=HLL_P)
    cols = sorted(HLL_COLS)
    return pa.table({
        "col": pa.array(cols, pa.string()),
        "approx_n": pa.array([int(round(est[c])) for c in cols], pa.int64()),
    })


@functools.lru_cache(maxsize=1)
def _approx_distinct_expected_table() -> pa.Table:
    """Sequential restatement of ``q_approx_distinct`` at sf0.01: fold
    each whole column through the SAME HLL kernels in one process.
    Register-max merging is exact (``test_hll_merge_equals_single_fold``),
    so the distributed per-block fold + merge must reproduce this
    single-fold estimate bit-for-bit. Under test: the map_batches
    partials, the sketch merge, and block-format / ordering invariance."""
    import pyarrow.parquet as pq

    from .pipelines.sketch import _hll_fold, hash_col, hll_estimate

    t = pq.read_table(f"{_ORACLE_SF_DIR}/events.parquet",
                      columns=list(HLL_COLS))
    cols = sorted(HLL_COLS)
    return pa.table({
        "col": pa.array(cols, pa.string()),
        "approx_n": pa.array(
            [int(round(hll_estimate(_hll_fold(hash_col(t[c]), HLL_P))))
             for c in cols], pa.int64()),
    })


def _approx_distinct_sql() -> str:
    return _values_sql(_approx_distinct_expected_table(),
                       casts={"approx_n": "BIGINT"})


MINHASH_JACCARD_THRESHOLD = 0.4


def q_minhash_dedup(sf_dir: str):
    """Near-dup detection (MinHash-LSH) over documents; returns verified
    pair rows (a, b, jaccard). ``token_hash="md5"`` (md5-upper-8 ==
    DuckDB ``md5_number_upper``) so the ENTIRE chain — shingle hash ->
    128 wrapped-arithmetic permutations -> FNV band fold -> lag-pairing
    -> exact-Jaccard verify — is restated in ``SQL_MINHASH_DEDUP``; the
    SipHash token path remains the scale default of
    ``minhash_lsh_pairs``."""
    from .pipelines.dedup import minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(docs, jaccard_threshold=MINHASH_JACCARD_THRESHOLD,
                             token_hash="md5")


def _minhash_common_ctes() -> str:
    """The shared MinHash-LSH CTE prefix (through band hashes ``bh`` and
    distinct shingle lists ``shl``): an EXACT restatement of the engine
    chain with ``token_hash="md5"`` — md5-upper-8 shingle hashes mod the
    Mersenne prime, the 128 seeded (a*x+b) permutations in the same
    wrapped uint64 arithmetic numpy uses, FNV-1a band folds (>>1 to
    int64). Tails: ``_minhash_ctes`` (symmetric within-bucket chain
    pairing, the dedup oracle) and ``SQL_FUZZY_DECONTAMINATE`` (the
    asymmetric cross-side collision join)."""
    num_perm, bands, seed = 128, 32, 13
    rpb = num_perm // bands
    m = (1 << 61) - 1
    rng = np.random.RandomState(seed)
    pa_ = rng.randint(1, m, size=num_perm, dtype=np.int64)
    pb_ = rng.randint(0, m, size=num_perm, dtype=np.int64)
    perms = ", ".join(
        f"({i}, {int(pa_[i])}::HUGEINT, {int(pb_[i])}::HUGEINT)"
        for i in range(num_perm)
    )
    fnv = "14695981039346656037::HUGEINT"
    for c in range(rpb):
        fnv = (f"((xor(({fnv})::UBIGINT, v{c}::UBIGINT)::HUGEINT"
               f" * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)")
    pivots = ",\n         ".join(
        f"max(CASE WHEN i % {rpb} = {c} THEN v END) AS v{c}" for c in range(rpb)
    )
    return f"""
perms(i, pa, pb) AS (VALUES {perms}),
w_arr AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
          FROM documents),
shl AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in range(1, len(words) - 1)]) AS sh
  FROM w_arr
),
shx AS (
  SELECT doc_id,
         (md5_number_upper(s)::HUGEINT % 2305843009213693951::HUGEINT) AS x
  FROM (SELECT doc_id, unnest(sh) AS s FROM shl)
),
mh0 AS (
  SELECT doc_id, p.i,
         min((((p.pa * shx.x) % 18446744073709551616::HUGEINT + p.pb)
              % 18446744073709551616::HUGEINT)
             % 2305843009213693951::HUGEINT) AS v
  FROM shx CROSS JOIN perms p GROUP BY doc_id, p.i
),
mh AS (
  -- docs with no shingles carry the all-max signature (the Python
  -- contract: shingle-less docs are trivially identical)
  SELECT d.doc_id, p.i, coalesce(mh0.v, 18446744073709551615::HUGEINT) AS v
  FROM documents d CROSS JOIN perms p
  LEFT JOIN mh0 ON mh0.doc_id = d.doc_id AND mh0.i = p.i
),
bandvals AS (
  SELECT doc_id, i // {rpb} AS band_id,
         {pivots}
  FROM mh GROUP BY doc_id, i // {rpb}
),
bh AS (
  SELECT doc_id, band_id, (({fnv}) >> 1)::BIGINT AS band_hash FROM bandvals
)"""


def _minhash_ctes(jaccard_threshold: float) -> str:
    """Symmetric dedup tail over the common prefix, ending in
    ``vpairs`` (a, b, jaccard): within-bucket adjacent chain pairing
    via ``lag`` (== the engine's adjacent_pairs_sorted), distinct
    pairs, exact-Jaccard verify over distinct shingle lists with the
    empty-union=1 contract."""
    return _minhash_common_ctes() + f""",
cand AS (
  SELECT lag(doc_id) OVER (PARTITION BY band_id, band_hash
                           ORDER BY doc_id) AS a,
         doc_id AS b
  FROM bh
),
pairs AS (SELECT DISTINCT a, b FROM cand WHERE a IS NOT NULL),
verify AS (
  SELECT p.a, p.b,
         len(list_intersect(xa.sh, xb.sh)) AS ni,
         len(xa.sh) + len(xb.sh) - len(list_intersect(xa.sh, xb.sh)) AS nu
  FROM pairs p
  JOIN shl xa ON xa.doc_id = p.a
  JOIN shl xb ON xb.doc_id = p.b
),
vpairs AS (
  SELECT a::BIGINT AS a, b::BIGINT AS b,
         (CASE WHEN nu = 0 THEN 1.0 ELSE ni::DOUBLE / nu END) AS jaccard
  FROM verify
  WHERE (CASE WHEN nu = 0 THEN 1.0 ELSE ni::DOUBLE / nu END)
        >= {jaccard_threshold}
)"""


SQL_MINHASH_DEDUP = (
    f"WITH {_minhash_ctes(MINHASH_JACCARD_THRESHOLD)}\n"
    "SELECT a, b, jaccard FROM vpairs"
)

SQL_MINHASH_CLUSTERS = f"""
WITH RECURSIVE {_minhash_ctes(MINHASH_JACCARD_THRESHOLD)},
nodes AS (SELECT a AS x FROM vpairs UNION SELECT b FROM vpairs),
edges AS (SELECT a AS s, b AS d FROM vpairs UNION SELECT b, a FROM vpairs),
reach(x, y) AS (
  SELECT x, x FROM nodes
  UNION
  SELECT r.x, e.d FROM reach r JOIN edges e ON r.y = e.s
)
SELECT x::BIGINT AS doc_id, min(y)::BIGINT AS cluster FROM reach GROUP BY x
"""


def q_simhash(sf_dir: str):
    """SimHash signatures per doc. Token hash = md5-upper-8 little-endian
    == DuckDB ``md5_number_upper``, so the full 64-bit signature AND the
    4x16-bit band decomposition are restated exactly in SQL."""
    from .pipelines.dedup import SimHasher

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", concurrency=2
    )


# sign-aggregate each md5 token-hash bit over the doc's words, assemble the
# positive-sum bits into a 64-bit signature (unsigned, then two's-complement
# to BIGINT to match the int64 Ray column), and slice the 16-bit bands
SQL_SIMHASH = """
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE trim(text) <> ''
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (md5_number_upper(word) >> b.bit) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM w CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
),
full_sig AS (
  SELECT d.doc_id, coalesce(sig.u, 0::HUGEINT) AS u
  FROM documents d LEFT JOIN sig USING (doc_id)
)
SELECT doc_id,
       (CASE WHEN u >= 9223372036854775808::HUGEINT
             THEN u - 18446744073709551616::HUGEINT ELSE u END)::BIGINT AS simhash,
       ((u >> 0) & 65535)::BIGINT AS sh_band0,
       ((u >> 16) & 65535)::BIGINT AS sh_band1,
       ((u >> 32) & 65535)::BIGINT AS sh_band2,
       ((u >> 48) & 65535)::BIGINT AS sh_band3
FROM full_sig
"""


def q_bpe_tokens(sf_dir: str):
    """BPE-ish token counts per doc (the pretokenizer pass of byte-pair
    encoders) — compiled-regex count in an actor pool, restated exactly
    by DuckDB's regexp_extract_all (RE2-safe pattern)."""
    from .pipelines.textops import BpeTokenCounter

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        BpeTokenCounter, batch_format="pandas", concurrency=2
    )


def _bpe_sql() -> str:
    from .pipelines.textops import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_bpe_tokens
FROM documents
"""


SQL_BPE_TOKENS = _bpe_sql()


def q_lang_id(sf_dir: str):
    from .pipelines.textops import LangId

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=2
    )


POSTINGS_CAP = 10


def q_inverted_index(sf_dir: str):
    """Inverted-index construction — the core search-engine build step:
    per term, its document frequency and the first ``POSTINGS_CAP``
    postings (sorted doc ids, comma-joined — capped so hot terms emit
    bounded rows; the full posting list would be a parquet list column
    in production). Per-batch DISTINCT (term, doc_id) pairs bound the
    exchange; ONE hash exchange by term (``bucketed_reduce``) completes
    each term's posting list in a single bucket."""
    from .pipelines.relational import bucketed_reduce

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        ex = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(),
                                words.str.len().fillna(0).astype(int)),
            "term": np.concatenate([w for w in words if w] or [[]]),
        })
        return ex.drop_duplicates(["term", "doc_id"])[["term", "doc_id"]]

    def bucket_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["term", "doc_id"])
        if not len(df):
            return pa.table({"term": pa.nulls(0, pa.string()),
                             "df": pa.nulls(0, pa.int64()),
                             "postings": pa.nulls(0, pa.string())})
        g = (df.sort_values(["term", "doc_id"])
             .groupby("term", sort=False)["doc_id"]
             .agg(df_=("size"),
                  postings=lambda s: ",".join(map(str, s.head(POSTINGS_CAP))))
             .reset_index())
        return pa.table({"term": pa.array(g["term"], pa.string()),
                         "df": pa.array(g["df_"], pa.int64()),
                         "postings": pa.array(g["postings"], pa.string())})

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    p = docs.map_batches(pairs, batch_format="pandas")
    return bucketed_reduce(p, "term", bucket_fn, n_buckets=8)


SQL_INVERTED_INDEX = f"""
WITH t AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
)
SELECT term, count(*)::BIGINT AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:{POSTINGS_CAP}], ',')
         AS postings
FROM t GROUP BY term
"""


TOP_BIGRAMS_K = 20


def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-k adjacent word bigrams — the co-occurrence
    counting pre-pass of embedding training (GloVe-style) and phrase
    mining. Per-batch partial bigram counts (vectorized shift-and-concat,
    bounded by distinct bigrams per batch), ONE hash exchange by bigram
    (``bucketed_reduce``), then exact global top-k via per-bucket
    output + sort-limit (count desc, bigram asc tiebreak)."""
    from .pipelines.relational import bucketed_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        flats = [w for w in words if len(w) >= 2]
        if not flats:
            return pd.DataFrame({"bigram": pd.array([], dtype="string"),
                                 "n": pd.array([], dtype="int64")})
        lefts, rights = [], []
        for w in flats:
            a = np.asarray(w, dtype=object)
            lefts.append(a[:-1])
            rights.append(a[1:])
        bg = pd.Series(np.char.add(np.char.add(
            np.concatenate(lefts).astype(str), " "),
            np.concatenate(rights).astype(str)))
        vc = bg.value_counts()
        return pd.DataFrame({"bigram": vc.index.astype("string"),
                             "n": vc.to_numpy().astype("int64")})

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = t.group_by(["bigram"]).aggregate([("n", "sum")])
        out = pa.table({"bigram": g["bigram"],
                        "n": g["n_sum"].cast(pa.int64())})
        # per-bucket top-k prune: global top-k rows all survive (each
        # bigram is complete inside its one bucket)
        df = out.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True]).head(TOP_BIGRAMS_K)
        return pa.Table.from_pandas(df, preserve_index=False).cast(out.schema)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    p = docs.map_batches(partial, batch_format="pandas")
    counts = bucketed_reduce(p, "bigram", bucket_fn, n_buckets=8)
    return counts.sort(["n", "bigram"],
                       descending=[True, False]).limit(TOP_BIGRAMS_K)


SQL_TOP_BIGRAMS = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''
),
b AS (
  SELECT w[i] || ' ' || w[i + 1] AS bigram
  FROM t, unnest(generate_series(1, len(w) - 1)) AS g(i)
  WHERE len(w) >= 2
)
SELECT bigram, count(*)::BIGINT AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram LIMIT {TOP_BIGRAMS_K}
"""


def q_weekly_retention(sf_dir: str):
    """Cohort retention matrix — the canonical growth-analytics query:
    users grouped by first-seen WEEK (epoch-week = floor(days-since-
    1970-01-01 / 7), an exact integer both engines compute identically),
    and for each (cohort_week, week_offset) the count of cohort users
    active that week. ONE hash exchange by user (``bucketed_reduce``
    over per-batch (user, week) distinct partials): each user's whole
    history lands in one bucket, so first-week and per-offset activity
    complete locally; only <= |weeks|^2 partial rows per bucket cross to
    the final O(weeks^2) fold."""
    from .pipelines.relational import bucketed_reduce

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["user_id"]))
        days = pc.cast(pc.floor(pc.divide(
            pc.cast(t["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))), pa.int64())
        week = pc.cast(pc.floor(pc.divide(pc.cast(days, pa.float64()),
                                          pa.scalar(7.0))), pa.int64())
        pairs = pa.table({"user_id": t["user_id"], "week": week})
        return pairs.group_by(["user_id", "week"]).aggregate([])

    def bucket_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"cohort_week": pa.nulls(0, pa.int64()),
                             "week_offset": pa.nulls(0, pa.int64()),
                             "n_users": pa.nulls(0, pa.int64())})
        df = df.drop_duplicates(["user_id", "week"])
        first = df.groupby("user_id")["week"].min().rename("cohort")
        df = df.join(first, on="user_id")
        df["week_offset"] = df["week"] - df["cohort"]
        g = (df.groupby(["cohort", "week_offset"])["user_id"]
             .nunique().reset_index(name="n_users"))
        return pa.table({
            "cohort_week": pa.array(g["cohort"], pa.int64()),
            "week_offset": pa.array(g["week_offset"], pa.int64()),
            "n_users": pa.array(g["n_users"], pa.int64()),
        })

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["cohort_week", "week_offset"]).aggregate(
            [("n_users", "sum")])
        return pa.table({
            "cohort_week": g["cohort_week"],
            "week_offset": g["week_offset"],
            "n_users": g["n_users_sum"].cast(pa.int64()),
        })

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    p = ds.map_batches(partial, batch_format="pyarrow")
    small = bucketed_reduce(p, "user_id", bucket_fn, n_buckets=8)
    return small.repartition(1).map_batches(final, batch_format="pyarrow")


SQL_WEEKLY_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id,
         (date_diff('day', DATE '1970-01-01', ts::DATE) // 7)::BIGINT AS week
  FROM events WHERE user_id IS NOT NULL
),
f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1)
SELECT f.cohort::BIGINT AS cohort_week,
       (uw.week - f.cohort)::BIGINT AS week_offset,
       count(DISTINCT uw.user_id)::BIGINT AS n_users
FROM uw JOIN f USING (user_id)
GROUP BY 1, 2
"""


TERMS_PER_LANG_K = 3


def q_top_terms_per_lang(sf_dir: str):
    """Per-language top-k most frequent terms — grouped EXACT heavy
    hitters, the per-group counterpart of ``heavy_hitters`` (corpus
    vocabulary reporting per language stratum). One fused per-batch
    stage predicts the language (the ``LangId`` heuristic) AND emits
    partial (lang, term, count) rows for the SAME rows — no join; then
    ONE hash exchange by term (``bucketed_reduce``: every (lang, term)
    pair completes in one bucket, hot languages spread across buckets
    because the TERM is the salt), then ``grouped_topk`` over the tiny
    exact-count table (<= k rows per (batch, group) shuffle)."""
    from .pipelines.relational import bucketed_reduce, grouped_topk
    from .pipelines.textops import LangId

    class TermsByLang(LangId):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            pred = super().__call__(batch)
            lang = dict(zip(pred["doc_id"], pred["lang_pred"]))
            # token explode in Arrow C (split_whitespace + flatten +
            # parent-index take), per-doc lang lookup stays O(docs)
            doc_lang = pa.array(batch["doc_id"].map(lang), pa.string())
            lists = pc.utf8_split_whitespace(
                pa.array(batch["text"].fillna(""), pa.string()))
            flat = pc.list_flatten(lists)
            langs = doc_lang.take(pc.list_parent_indices(lists))
            if len(flat) == 0:
                return pd.DataFrame({"lang": pd.array([], dtype="string"),
                                     "term": pd.array([], dtype="string"),
                                     "n": pd.array([], dtype="int64")})
            g = (pa.table({"lang": langs, "term": flat})
                 .group_by(["lang", "term"])
                 .aggregate([("term", "count")]))
            return pd.DataFrame({
                "lang": g["lang"].to_pandas(),
                "term": g["term"].to_pandas(),
                "n": g["term_count"].to_pandas().astype("int64"),
            })

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "term"]).aggregate([("n", "sum")])
        return pa.table({"lang": g["lang"], "term": g["term"],
                         "n": g["n_sum"].cast(pa.int64())})

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    partials = docs.map_batches(TermsByLang, batch_format="pandas",
                                concurrency=(2, 8))
    counts = bucketed_reduce(
        partials, "term", bucket_fn, n_buckets=8,
        schema=pa.schema([("lang", pa.string()), ("term", pa.string()),
                          ("n", pa.int64())]))
    return grouped_topk(counts, ["lang"], "n", "term", k=TERMS_PER_LANG_K)


def _top_terms_per_lang_sql() -> str:
    from .pipelines.textops import STOPWORDS

    values = ", ".join(
        f"('{w}', '{lang}')"
        for lang, ws in sorted(STOPWORDS.items())
        for w in sorted(ws)
    )
    return f"""
WITH stop(word, lang) AS (VALUES {values}),
w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents WHERE trim(text) <> ''
),
hits AS (
  SELECT w.doc_id, s.lang, count(*)::BIGINT AS n
  FROM w JOIN stop s ON w.word = s.word
  GROUP BY w.doc_id, s.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rn
  FROM hits
),
lang AS (
  SELECT d.doc_id, coalesce(b.lang, 'und') AS lang
  FROM documents d
  LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
cnt AS (
  SELECT l.lang, t.term, count(*)::BIGINT AS n
  FROM tok t JOIN lang l USING (doc_id) GROUP BY 1, 2
)
SELECT lang, term, n FROM cnt
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n DESC, term) <= {TERMS_PER_LANG_K}
"""


def _lang_id_sql() -> str:
    from .pipelines.textops import STOPWORDS

    values = ", ".join(
        f"('{w}', '{lang}')"
        for lang, ws in sorted(STOPWORDS.items())
        for w in sorted(ws)
    )
    return f"""
WITH stop(word, lang) AS (VALUES {values}),
w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents WHERE trim(text) <> ''
),
hits AS (
  SELECT w.doc_id, s.lang, count(*)::BIGINT AS n
  FROM w JOIN stop s ON w.word = s.word
  GROUP BY w.doc_id, s.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
FROM documents d
LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
"""


SQL_LANG_ID = _lang_id_sql()


def q_bulk_crawl(sf_dir: str):
    """The reference's primary user flow end-to-end (bulk CSV crawl):
    per-row configs incl. modes/formats/scope/auth/images -> fused
    fetch+parse+render+write partitions -> per-row result records."""
    import shutil
    import tempfile

    from .pipelines.bulk import bulk_crawl
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    wcfg = cfg.world
    world = World(wcfg)
    tmp = tempfile.mkdtemp(prefix="bulkq_")
    try:
        n_rows = min(60, wcfg.n_urls // 4)
        lines = ["url,mode,format,link_type"]
        for i in range(n_rows):
            host = world.hosts[i % wcfg.n_hosts]
            mode = "link" if i % 5 == 4 else "content"
            fmt = ["txt", "md", '"txt,json"'][i % 3]
            lines.append(f"https://{host}/p/{i % 7},{mode},{fmt},all")
        csv_path = f"{tmp}/seeds.csv"
        with open(csv_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        results, _rejects = bulk_crawl(csv_path, f"{tmp}/out", wcfg, n_parts=4)
        return results.to_pandas().sort_values("seed_rank").reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_minhash_clusters(sf_dir: str):
    """Near-dup CLUSTERS: MinHash-LSH verified pairs -> distributed
    min-label-propagation connected components (doc_id, cluster). The
    oracle (``SQL_MINHASH_CLUSTERS``) restates the same pair chain plus
    a recursive-CTE transitive closure with min-reachable-id labels."""
    from .pipelines.dedup import connected_components_ds, minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=MINHASH_JACCARD_THRESHOLD,
                              token_hash="md5")
    return connected_components_ds(pairs)


EMB_LSH_THRESHOLD = 0.45
EMB_LSH_PLANES = 64
EMB_LSH_BANDS = 16
EMB_LSH_SEED = 11


def q_embedding_lsh_dups(sf_dir: str):
    """Embedding near-dup pairs at scale: random-hyperplane LSH blocking
    + exact cosine verify (the scale path of embedding_near_dups). The
    band shape is tuned to the threshold: 16 bands x 4 bits gives ~0.96
    detection at cos 0.45 (the synthetic table's near-dup band; its max
    off-diagonal cosine is ~0.51). Oracled by ``SQL_EMBEDDING_LSH_DUPS``:
    the plane matrix is embedded as literals, sign bits / band keys /
    lag-pairing / cosine-verify restated in SQL (cos compared at 6dp —
    the two engines' float64 summation orders differ in the last ulp)."""
    import ray

    from .pipelines.ann import embedding_lsh_pairs

    res = embedding_lsh_pairs(_read(sf_dir, "embeddings"),
                              cos_threshold=EMB_LSH_THRESHOLD,
                              n_planes=EMB_LSH_PLANES, bands=EMB_LSH_BANDS,
                              seed=EMB_LSH_SEED)
    # collect to a typed Arrow table: Ray's to_pandas drops the schema of
    # an all-empty Dataset, and near-dup pair sets can legitimately be
    # empty (they are the small side by construction)
    return pa.concat_tables(ray.get(res.to_arrow_refs()))


def _embedding_lsh_sql() -> str:
    """SRP-LSH restated in DuckDB: the seeded plane matrix as DOUBLE[]
    literals (shortest-repr round-trips float64 exactly); a vector's sign
    bit per plane from the raw dot product (normalization never flips a
    sign); 4-bit band keys; within-bucket adjacent pairing via ``lag``;
    exact cosine verify. The embedding dim is 64 in every testdata sf
    (asserted by the Ray path's own dim probe)."""
    rs = np.random.RandomState(EMB_LSH_SEED)
    planes = rs.randn(EMB_LSH_PLANES, 64)
    rpb = EMB_LSH_PLANES // EMB_LSH_BANDS
    rows = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (p, ", ".join(repr(float(v)) for v in planes[p]))
        for p in range(EMB_LSH_PLANES)
    )
    return f"""
WITH planes(p, arr) AS (VALUES {rows}),
bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.arr) > 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes pl
),
bands AS (
  SELECT vec_id, p // {rpb} AS band_id,
         sum(bit * (1 << (p % {rpb})))::BIGINT AS band_key
  FROM bits GROUP BY vec_id, p // {rpb}
),
cand AS (
  SELECT lag(vec_id) OVER (PARTITION BY band_id, band_key
                           ORDER BY vec_id) AS a,
         vec_id AS b
  FROM bands
),
pairs AS (SELECT DISTINCT a, b FROM cand WHERE a IS NOT NULL),
v AS (
  SELECT p.a, p.b,
         list_cosine_similarity(ea.embedding::DOUBLE[],
                                eb.embedding::DOUBLE[]) AS c
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.a
  JOIN embeddings eb ON eb.vec_id = p.b
)
SELECT a::BIGINT AS a, b::BIGINT AS b, round(c, 6)::DOUBLE AS cos
FROM v WHERE c >= {EMB_LSH_THRESHOLD}
"""


SQL_EMBEDDING_LSH_DUPS = _embedding_lsh_sql()


def q_ann_ivf(sf_dir: str):
    from .pipelines.ann import ivf_topk

    return ivf_topk(_read(sf_dir, "embeddings"), ANN_QUERY_IDS, k=ANN_K)


def q_ann_ivf_exhaustive(sf_dir: str):
    """IVF with n_probe == n_centroids: every bucket probed, so the result
    must EQUAL exact brute force — which makes the whole IVF machinery
    (centroid training, bucket assignment, pruned scan, partial top-k
    merge) verifiable against the same SQL oracle as ``ann_cosine``."""
    from .pipelines.ann import ivf_topk

    return ivf_topk(
        _read(sf_dir, "embeddings"), ANN_QUERY_IDS, k=ANN_K,
        n_centroids=16, n_probe=16,
    )


def q_media_pipeline(sf_dir: str):
    """Multimodal plumbing: crawl a few pages -> image-span worklist ->
    media fetch actor pool -> fake decode. rows = decoded media records."""
    from .pipelines.media import MediaDecoder, MediaFetcher, media_refs_from_docs
    from .htmlx import parse_document
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table(
        {"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)}
    )
    work = media_refs_from_docs(docs)
    ds = rd.from_arrow(work)
    fetched = ds.map_batches(
        MediaFetcher, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return fetched.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=2
    )


PHASH_MAX_HAMMING = 3


def _phash_worklist(sf_dir: str) -> list[str]:
    """Distinct image media_refs of the media worklist (the same pages
    q_media_pipeline crawls), sorted — small and driver-known by
    construction (it is parsed out of the bounded synth page set)."""
    from .htmlx import parse_document
    from .pipelines.media import media_refs_from_docs
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table({"doc_id": pa.array(ids),
                     "spans": build_spans_column(span_lists)})
    return sorted(set(media_refs_from_docs(docs)["media_ref"].to_pylist()))


def q_image_phash_dups(sf_dir: str):
    """Image near-duplicate detection — the IMAGE leg of the near-dup
    family: media worklist -> fetch actor pool -> perceptual dHash
    (``media.PHasher``; fake backend simulates re-encode families, real
    decode is the documented stub) -> the SAME 4x16-bit banding +
    vectorized Hamming verify as text SimHash
    (``dedup.banded_hamming_pairs``). Output: (ref_a, ref_b, hamming)
    for every pair within Hamming <= 3; ids are md5-upper-8 of the ref
    (the oracle id contract), refs re-attached from the driver-known
    worklist map."""
    import ray

    from .pipelines.dedup import banded_hamming_pairs
    from .pipelines.media import MediaFetcher, PHasher, PHASH_ID_MOD
    from .util import md5_id_bucket

    refs = _phash_worklist(sf_dir)
    work = rd.from_arrow(pa.table({"media_ref": pa.array(refs, pa.string())}))
    fetched = work.map_batches(MediaFetcher, batch_format="pyarrow",
                               batch_size=64, concurrency=2)
    sigs = fetched.map_batches(PHasher, batch_format="pyarrow",
                               batch_size=64, concurrency=2)
    pairs = banded_hamming_pairs(sigs, max_hamming=PHASH_MAX_HAMMING)

    id2ref = dict(zip(md5_id_bucket("phash-v1", refs, PHASH_ID_MOD), refs))
    ref_map = ray.put(id2ref)

    class AttachRefs:
        def __init__(self):
            self.m = ray.get(ref_map)

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table({
                "ref_a": pa.array([self.m[i] for i in t["a"].to_pylist()],
                                  pa.string()),
                "ref_b": pa.array([self.m[i] for i in t["b"].to_pylist()],
                                  pa.string()),
                "hamming": t["hamming"].combine_chunks().cast(pa.int64()),
            })

    return pairs.map_batches(AttachRefs, batch_format="pyarrow",
                             concurrency=2)


@functools.lru_cache(maxsize=1)
def _image_phash_sql() -> str:
    """The banding + Hamming verify RESTATED IN SQL (band extraction,
    band-equality candidate join, xor/bit_count verify, id derivation
    from the ref via md5_number_upper — all real SQL); only the dHash
    signatures are sequential literals (the fake decode is blake2b,
    which SQL cannot express — same footing as the media/crawl-family
    oracles)."""
    from .pipelines.media import MediaFetcher, PHasher

    refs = _phash_worklist(_ORACLE_SF_DIR)
    fetch, ph = MediaFetcher(), PHasher()
    rows = []
    for r in refs:
        payload = fetch._bytes_for(r)
        if payload is None:
            continue
        sig = ph.dhash64(ph._fake_grid(payload))
        sig64 = sig - (1 << 64) if sig >= (1 << 63) else sig
        rows.append(f"({_sql_str(r)}, {sig64})")
    lits = ",\n".join(rows)
    return f"""
WITH s(ref, sig) AS (VALUES
{lits}
),
ids AS (
  SELECT ref, sig,
         (md5_number_upper('phash-v1:' || ref)::HUGEINT
          % 2305843009213693951::HUGEINT)::BIGINT AS id
  FROM s
),
b AS (
  SELECT id, ref, sig, band, (sig >> (band * 16)) & 65535 AS key
  FROM ids CROSS JOIN (VALUES (0), (1), (2), (3)) t(band)
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM b x JOIN b y ON x.band = y.band AND x.key = y.key AND x.id < y.id
)
SELECT ia.ref AS ref_a, ib.ref AS ref_b,
       bit_count(xor(ia.sig, ib.sig))::BIGINT AS hamming
FROM cand JOIN ids ia ON ia.id = cand.a JOIN ids ib ON ib.id = cand.b
WHERE bit_count(xor(ia.sig, ib.sig)) <= {PHASH_MAX_HAMMING}
"""


def _media_expected_table() -> pa.Table:
    """SEQUENTIAL (single-process, no Ray) application of the exact
    kernels q_media_pipeline distributes, at the driver's correctness
    scale (sf0.01)."""
    from .htmlx import parse_document
    from .pipelines.media import MediaDecoder, MediaFetcher, media_refs_from_docs
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)   # config shape only, no reads
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table({"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)})
    return MediaDecoder()(MediaFetcher()(media_refs_from_docs(docs)))


@functools.lru_cache(maxsize=1)
def _media_sql() -> str:
    """The media pipeline's expected output restated as a SQL VALUES
    literal. The pipeline is fully deterministic (blake2b-derived
    synthetic bytes and metadata) but blake2b is not SQL-computable, so
    the oracle is the sequential restatement of the same kernels — the
    driver check then verifies the DISTRIBUTED plumbing (worklist
    explode, actor-pool fetch, decode stage, schema) reproduces the
    sequential result row-for-row. Valid at sf0.01, the driver's
    correctness scale."""
    t = _media_expected_table()

    def esc(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n".join(
        "(%s, %s, %s, %s, %d, %s, %d, %d, %s)" % (
            esc(r["doc_id"]), esc(r["media_ref"]), esc(r["alt"]),
            esc(r["media_status"]), r["n_bytes"], esc(r["ext"]),
            r["width"], r["height"], esc(r["feature"]),
        )
        for r in t.to_pylist()
    )
    return f"""
SELECT doc_id, media_ref, alt, media_status, n_bytes::BIGINT AS n_bytes,
       ext, width::INTEGER AS width, height::INTEGER AS height, feature
FROM (VALUES {rows})
  AS t(doc_id, media_ref, alt, media_status, n_bytes, ext, width, height,
       feature)
"""


# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Round-3 wave 2: interval join, windowed top-k, exact quantiles, link-graph
# PageRank, TF-IDF — the remaining operator families a training-data /
# crawl-analytics pipeline needs (SURVEY.md §2.4 custom operators; §2.5
# aggregates; graph analytics over the crawl's own outlink edges).
# ---------------------------------------------------------------------------


def q_range_active_events(sf_dir: str):
    """Keyed interval (range) join: every event matched to the 3-day
    opening window of its user's active ISO weeks — both sides derived
    from ``events``, so DuckDB restates the join with a plain
    ``BETWEEN``-style predicate. Exercises ``relational.range_join``
    (the bucketed equi-key + vectorized interval filter lowering)."""
    from .pipelines.relational import range_join
    from .util import keep_first_sorted

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    DAY = np.int64(86_400_000_000)

    def weeks(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        days = ts // DAY
        monday = (days - (days + np.int64(3)) % 7) * DAY   # epoch was a Thursday
        u = t["user_id"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([u, monday], axis=1), axis=0)
        return pa.table({
            "user_id": pa.array(uniq[:, 0], pa.int64()),
            "lo": pa.array(uniq[:, 1].view("datetime64[us]")),
        })

    # per-batch unique -> global dedup via the sort-based idiom, then
    # attach the window end
    w = keep_first_sorted(
        ev.map_batches(weeks, batch_format="pyarrow").sort(["user_id", "lo"]),
        ["user_id", "lo"],
    )

    def with_hi(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).view(np.int64)
        return t.append_column(
            "hi", pa.array((lo + 3 * DAY).view("datetime64[us]"))
        )

    right = w.map_batches(with_hi, batch_format="pyarrow")
    return range_join(ev, right, key="user_id", left_ts="ts",
                      right_lo="lo", right_hi="hi", n_buckets=16)


SQL_RANGE_ACTIVE_EVENTS = """
WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS lo
           FROM events),
r AS (SELECT user_id, lo, lo + INTERVAL 3 DAY AS hi FROM w)
SELECT e.event_id, e.ts, e.user_id, r.lo, r.hi
FROM events e JOIN r ON e.user_id = r.user_id
WHERE e.ts >= r.lo AND e.ts < r.hi
"""


def q_top_events_per_type(sf_dir: str):
    """Windowed top-k: the 5 highest-value events per event_type (ties ->
    smallest event_id) — ``row_number() OVER (PARTITION BY ...) <= k``
    via ``relational.grouped_topk`` (per-batch partial head(k), sort,
    block-carry ranked filter)."""
    from .pipelines.relational import grouped_topk

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    return grouped_topk(ev, ["event_type"], "value", "event_id", k=5)


SQL_TOP_EVENTS_PER_TYPE = """
SELECT event_id, ts, user_id, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id ASC) <= 5
"""


def q_price_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (p50/p90/p99 in per-mille
    integers) of lineitem extended price in integer cents, grouped by
    return flag — ``stats.grouped_quantiles`` (value-histogram partials,
    never a full sort of the input)."""
    from .pipelines.stats import grouped_quantiles

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "flag": t["l_returnflag"],
            "cents": pa.array(
                np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
                .astype(np.int64)
            ),
        })

    return grouped_quantiles(
        li.map_batches(cents, batch_format="pyarrow"), "flag", "cents",
        [500, 900, 990],
    )


SQL_PRICE_QUANTILES = """
WITH t AS (SELECT l_returnflag AS flag,
                  round(l_extendedprice * 100)::BIGINT AS cents
           FROM lineitem),
c AS (SELECT flag, cents, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
w AS (SELECT flag, cents,
             sum(n) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             sum(n) OVER (PARTITION BY flag) AS tot
      FROM c),
q AS (SELECT unnest([500, 900, 990]) AS q_pm)
SELECT w.flag, q.q_pm::BIGINT AS q_pm, min(w.cents) AS cents
FROM w CROSS JOIN q
WHERE w.cum >= (q.q_pm * w.tot + 999) // 1000
GROUP BY 1, 2
"""


PAGERANK_N_URLS = 150
PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85


def _pagerank_edge_lists(sf_dir: str):
    """(src, dst) outlink edges of the bounded synthetic mini-web — the
    SAME page kernel both the Ray query and the sequential SQL
    restatement parse."""
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    src, dst = [], []
    for u in urls:
        for link in parse_document(world.gen_page(u), u).links:
            src.append(u)
            dst.append(link.url)
    return src, dst


def q_pagerank(sf_dir: str):
    """PageRank over the mini-web's outlink graph: 5 synchronous power
    iterations, damping 0.85, dangling mass not redistributed
    (``graph.pagerank`` — sharded raw-task state, the §2.4 case-(c)
    iterative operator). Ranks rounded to 6dp (both engines sum float64
    in different orders; last-ulp differences are below 6dp)."""
    from .htmlx import parse_document
    from .pipelines.graph import pagerank
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    pr = pagerank(edges, n_shards=8, iters=PAGERANK_ITERS,
                  damping=PAGERANK_DAMPING)

    def round6(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 6)),
        })

    return pr.map_batches(round6, batch_format="pyarrow")


def _host_edge_lists(sf_dir: str):
    """Host-graph coarsening of the outlink edge list: DISTINCT
    (host(src), host(dst)) pairs, self-loops dropped — the same
    collapse both the Ray query and the SQL restatement apply."""
    from .canon import host_of

    src, dst = _pagerank_edge_lists(sf_dir)
    pairs = sorted({(host_of(s), host_of(t)) for s, t in zip(src, dst)
                    if host_of(s) != host_of(t)})
    return [p[0] for p in pairs], [p[1] for p in pairs]


def q_host_pagerank(sf_dir: str):
    """PageRank over the COARSENED host graph (distinct cross-host
    edges, self-loops dropped) — the graph-coarsening pattern: domain
    authority instead of page authority, same sharded-state
    ``graph.pagerank`` operator on a graph 10^2-10^3x smaller. The
    coarsening itself is distributed: per-batch host-pair distinct +
    sort-based global dedup (``keep_first_sorted``), never a driver
    edge set."""
    from .canon import host_of
    from .htmlx import parse_document
    from .pipelines.graph import pagerank
    from .synth import World
    from .util import keep_first_sorted

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def host_edges(t: pa.Table) -> pa.Table:
        pairs = set()
        for u in t["url"].to_pylist():
            hs = host_of(u)
            for link in parse_document(world.gen_page(u), u).links:
                hd = host_of(link.url)
                if hs != hd:
                    pairs.add((hs, hd))
        pairs = sorted(pairs)
        return pa.table({"src": pa.array([p[0] for p in pairs], pa.string()),
                         "dst": pa.array([p[1] for p in pairs], pa.string())})

    e = seeds.map_batches(host_edges, batch_format="pyarrow")
    e = keep_first_sorted(e.sort(["src", "dst"]), ["src", "dst"])
    pr = pagerank(e, n_shards=4, iters=PAGERANK_ITERS,
                  damping=PAGERANK_DAMPING)

    def round6(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["url"],
            "rank": pa.array(np.round(
                t["rank"].to_numpy(zero_copy_only=False), 6)),
        })

    return pr.map_batches(round6, batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _host_pagerank_sql() -> str:
    src, dst = _host_edge_lists(_ORACLE_SF_DIR)
    return _pagerank_sql_for(src, dst, out_col="host")


@functools.lru_cache(maxsize=1)
def _pagerank_sql() -> str:
    """The same 5 power iterations unrolled as CTEs over a VALUES edge
    list. The per-edge term is written ``0.85 * p.r / dg.g`` — the exact
    operation order of the engine's ``d * rank / outdeg`` — so only
    float64 SUMMATION order differs between the engines (handled by the
    6dp rounding both sides apply)."""
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    return _pagerank_sql_for(src, dst, out_col="url")


def _pagerank_sql_for(src: list[str], dst: list[str],
                      out_col: str = "url") -> str:
    n_nodes = len(set(src) | set(dst))
    init = repr(1.0 / n_nodes)
    teleport = repr((1.0 - PAGERANK_DAMPING) / n_nodes)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    iter_ctes = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iter_ctes.append(f"""
r{i} AS (
  SELECT n.u AS u,
         {teleport} + coalesce(sum({PAGERANK_DAMPING!r} * p.r / dg.g), 0) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.u
  LEFT JOIN {prev} p ON p.u = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n.u
)""")
        prev = f"r{i}"
    return f"""
WITH edges(src, dst) AS (VALUES
{rows}
),
nodes AS (SELECT src AS u FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*)::DOUBLE AS g FROM edges GROUP BY 1),
r0 AS (SELECT u, {init} AS r FROM nodes),
{','.join(iter_ctes)}
SELECT u AS {out_col}, round(r, 6) AS rank FROM {prev}
"""


HITS_ITERS = 5


def q_hits(sf_dir: str):
    """HITS hub/authority scores (Kleinberg 1999) over the mini-web's
    outlink graph — the bidirectional complement of ``pagerank``: 5
    synchronous iterations, L1 (sum) normalization so every op is
    +, /, sum and the SQL restatement needs no sqrt. ``graph.hits``
    routes each edge twice at split time (by src shard for the
    authority pass, by dst shard for the hub pass); an iteration is two
    K×K object-store exchanges and the driver sees only 2K norm
    partials. Scores rounded to 6dp (the pagerank float-summation
    contract)."""
    from .htmlx import parse_document
    from .pipelines.graph import hits
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    hs = hits(edges, n_shards=8, iters=HITS_ITERS)

    def round6(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "hub": pa.array(np.round(
                t["hub"].to_numpy(zero_copy_only=False), 6)),
            "authority": pa.array(np.round(
                t["authority"].to_numpy(zero_copy_only=False), 6)),
        })

    return hs.map_batches(round6, batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _hits_sql() -> str:
    """The same 5 HITS iterations unrolled as CTEs over a VALUES edge
    list: each half-step is a LEFT-JOIN sum (authority from in-edge
    hubs, hub from out-edge authorities) followed by the L1 divide —
    the exact operation order of the engine's fold + ``raw / total``;
    only float64 SUMMATION order differs (6dp rounding both sides)."""
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    n_nodes = len(set(src) | set(dst))
    init = repr(1.0 / n_nodes)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    # each CTE is referenced exactly ONCE by the next (DuckDB inlines
    # CTEs, so a doubly-referenced level re-evaluates the whole chain —
    # exponential in iters); the L1 divide therefore rides the SAME
    # grouped select via sum(...) OVER () instead of a scalar subquery
    iter_ctes = []
    prev_h = "h0"
    for i in range(1, HITS_ITERS + 1):
        iter_ctes.append(f"""
a{i} AS (
  SELECT n.u AS u,
         coalesce(sum(p.h), 0)
           / sum(coalesce(sum(p.h), 0)) OVER () AS a
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.u
  LEFT JOIN {prev_h} p ON p.u = e.src
  GROUP BY n.u
),
h{i} AS (
  SELECT n.u AS u,
         coalesce(sum(q.a), 0)
           / sum(coalesce(sum(q.a), 0)) OVER () AS h
  FROM nodes n
  LEFT JOIN edges e ON e.src = n.u
  LEFT JOIN a{i} q ON q.u = e.dst
  GROUP BY n.u
)""")
        prev_h = f"h{i}"
    last = HITS_ITERS
    return f"""
WITH edges(src, dst) AS (VALUES
{rows}
),
nodes AS (SELECT src AS u FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT u, {init} AS h FROM nodes),
{','.join(iter_ctes)}
SELECT h{last}.u AS url, round(h{last}.h, 6) AS hub,
       round(a{last}.a, 6) AS authority
FROM h{last} JOIN a{last} ON h{last}.u = a{last}.u
"""


BFS_N_SEEDS = 8
BFS_MAX_DEPTH = 8


def q_bfs_depths(sf_dir: str):
    """Crawl depth (shortest-hop BFS level) of every page reachable from
    the first ``BFS_N_SEEDS`` seed URLs over the mini-web's outlink graph
    — the breadth-first frontier expansion the reference performs
    implicitly by crawling its seed list in order. ``graph.bfs_depths``:
    sharded first-visit propagation; the driver sees per-level NEW-NODE
    COUNTS only (integer output — no float concerns)."""
    from .htmlx import parse_document
    from .pipelines.graph import bfs_depths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    return bfs_depths(edges, urls[:BFS_N_SEEDS], n_shards=8,
                      max_depth=BFS_MAX_DEPTH)


@functools.lru_cache(maxsize=1)
def _bfs_depths_sql() -> str:
    """The same BFS as a recursive CTE over a VALUES edge list: the
    recursive UNION enumerates every (node, depth ≤ cap) pair reachable
    from the seeds; ``min(depth)`` per node is the first-visit level —
    exactly what the sharded engine records."""
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    seed_urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
                 for i in range(BFS_N_SEEDS)]
    seed_rows = ", ".join(f"({_sql_str(u)})" for u in seed_urls)
    return f"""
WITH RECURSIVE edges(src, dst) AS (VALUES
{rows}
),
-- seeds absent from the edge set are ignored (the engine's contract:
-- the graph never saw them)
seeds(u) AS (
  SELECT u FROM (VALUES {seed_rows}) s(u)
  WHERE u IN (SELECT src FROM edges UNION SELECT dst FROM edges)
),
walk(u, d) AS (
  SELECT u, 0 FROM seeds
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.u
  WHERE w.d < {BFS_MAX_DEPTH}
)
SELECT u AS url, min(d)::BIGINT AS depth FROM walk GROUP BY u
"""


def q_anchor_index(sf_dir: str):
    """Anchor-text index — the classic web-search aggregation: for every
    link TARGET, the inlink count and the sorted distinct anchor texts
    pointing at it (how search engines describe a page by what OTHERS
    call it; generalizes the reference's link metadata,
    ``backend/crawler/link_extractor.py:70-90``, from per-page rows to a
    corpus-wide inverted view). Plan: per-batch distinct
    (url, src, anchor) triples (zero shuffle, bounds the exchange), then
    ONE hash exchange by target url (``relational.bucketed_reduce``);
    the string_agg runs once per bucket over complete groups."""
    from .htmlx import parse_document
    from .pipelines.relational import bucketed_reduce
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges(t: pa.Table) -> pa.Table:
        src, dst, anch = [], [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
                anch.append(link.text)
        e = pa.table({"url": pa.array(dst, pa.string()),
                      "src": pa.array(src, pa.string()),
                      "anchor": pa.array(anch, pa.string())})
        return e.group_by(["url", "src", "anchor"]).aggregate([])

    def bucket_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"url": pa.nulls(0, pa.string()),
                             "n_inlinks": pa.nulls(0, pa.int64()),
                             "anchors": pa.nulls(0, pa.string())})
        g = df.groupby("url", sort=False).agg(
            n_inlinks=("src", "size"),
            anchors=("anchor", lambda s: "|".join(sorted(set(s)))),
        ).reset_index()
        return pa.table({"url": pa.array(g["url"], pa.string()),
                         "n_inlinks": pa.array(g["n_inlinks"], pa.int64()),
                         "anchors": pa.array(g["anchors"], pa.string())})

    e = seeds.map_batches(edges, batch_format="pyarrow")
    return bucketed_reduce(e, "url", bucket_fn, n_buckets=8)


@functools.lru_cache(maxsize=1)
def _anchor_index_sql() -> str:
    """Sequential restatement: the same page kernel's (src, url, anchor)
    triples as a VALUES literal (the crawl-family oracle pattern), the
    aggregation itself in plain SQL."""
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    rows = set()
    for u in urls:
        for link in parse_document(world.gen_page(u), u).links:
            rows.add((u, link.url, link.text))
    lits = ",\n".join(f"({_sql_str(s)}, {_sql_str(d)}, {_sql_str(a)})"
                      for s, d, a in sorted(rows))
    return f"""
WITH e(src, url, anchor) AS (VALUES
{lits}
)
SELECT url, count(*)::BIGINT AS n_inlinks,
       string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
FROM e GROUP BY url
"""


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check (the q_host_near_matches verify
    kernel; property-tested against a Levenshtein DP)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                           # one substitution
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0                                  # one insertion into a
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def q_host_near_matches(sf_dir: str):
    """Entity resolution by edit distance — host names within edit
    distance 1 (typo-squat / alias detection), found WITHOUT the O(n^2)
    cross join: deletion-neighborhood blocking (the spell-correction
    identity: ed(a,b) <= 1 iff {a} ∪ del1(a) intersects {b} ∪ del1(b)),
    so each name emits len+1 block keys, candidates meet in ONE hash
    exchange by key (``bucketed_reduce``), and only intra-block pairs
    run the exact verify. The verify is per-candidate Python DP — fine
    off the hot path because blocking has already collapsed n^2 to the
    true-near-match neighborhood."""
    from .pipelines.relational import bucketed_reduce
    from .synth import World
    from .util import keep_first_sorted

    hosts = sorted(set(World(_crawl_cfg(sf_dir).world).hosts))
    ds = rd.from_items([{"name": h} for h in hosts], override_num_blocks=4)

    def block_keys(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in t["name"].to_pylist():
            keys.append(s)
            names.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1:])
                names.append(s)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "name": pa.array(names, pa.string())})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["key", "name"])
        aa, bb = [], []
        for _, g in df.groupby("key", sort=False):
            names = sorted(set(g["name"]))
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    if _ed_le1(names[i], names[j]):
                        aa.append(names[i])
                        bb.append(names[j])
        return pa.table({"a": pa.array(aa, pa.string()),
                         "b": pa.array(bb, pa.string())})

    k = ds.map_batches(block_keys, batch_format="pyarrow")
    pairs = bucketed_reduce(k, "key", bucket_pairs, n_buckets=8)
    # a pair can collide in several blocks -> distributed pair dedup
    uniq = keep_first_sorted(pairs.sort(["a", "b"]), ["a", "b"])
    return uniq.map_batches(
        lambda t: t.append_column("dist", pa.array(np.ones(t.num_rows,
                                                           np.int64))),
        batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _host_near_matches_sql() -> str:
    from .synth import World

    hosts = sorted(set(World(_crawl_cfg(_ORACLE_SF_DIR).world).hosts))
    lits = ",\n".join(f"({_sql_str(h)})" for h in hosts)
    return f"""
WITH h(name) AS (VALUES
{lits}
)
SELECT x.name AS a, y.name AS b, 1::BIGINT AS dist
FROM h x JOIN h y ON x.name < y.name
WHERE levenshtein(x.name, y.name) <= 1
"""


def q_degree_histogram(sf_dir: str):
    """Degree distribution of the outlink graph — the first diagnostic
    of web-graph shape (power-law check, hub detection): for each
    direction (out = per src, in = per dst), how many nodes have each
    degree. Two bounded reductions: per-batch (node, partial-degree)
    counts, ONE exchange by node (``bucketed_reduce``, both directions
    melted through the same exchange with a direction tag), then the
    degree histogram folds to O(distinct degrees) rows."""
    from .pipelines.relational import bucketed_reduce
    from .htmlx import parse_document
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def melt_edges(t: pa.Table) -> pa.Table:
        dirs, nodes = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                dirs.append("out")
                nodes.append(u)
                dirs.append("in")
                nodes.append(link.url)
        e = pa.table({"node": pa.array(nodes, pa.string()),
                      "direction": pa.array(dirs, pa.string()),
                      "n": pa.array(np.ones(len(nodes), np.int64))})
        g = e.group_by(["node", "direction"]).aggregate([("n", "sum")])
        return g.rename_columns(["node", "direction", "n"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = t.group_by(["node", "direction"]).aggregate([("n", "sum")])
        h = (pa.table({"direction": g["direction"],
                       "degree": g["n_sum"].cast(pa.int64()),
                       "one": pa.array(np.ones(g.num_rows, np.int64))})
             .group_by(["direction", "degree"]).aggregate([("one", "sum")]))
        return h.rename_columns(["direction", "degree", "n_nodes"])

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["direction", "degree"]).aggregate([("n_nodes", "sum")])
        return pa.table({"direction": g["direction"],
                         "degree": g["degree"],
                         "n_nodes": g["n_nodes_sum"].cast(pa.int64())})

    e = seeds.map_batches(melt_edges, batch_format="pyarrow")
    per_node = bucketed_reduce(e, "node", bucket_fn, n_buckets=8)
    return per_node.repartition(1).map_batches(final, batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _degree_histogram_sql() -> str:
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    lits = ",\n".join(f"({_sql_str(s)}, {_sql_str(d)})"
                      for s, d in zip(src, dst))
    return f"""
WITH e(src, dst) AS (VALUES
{lits}
),
deg AS (
  SELECT 'out' AS direction, src AS node, count(*)::BIGINT AS degree
  FROM e GROUP BY 1, 2
  UNION ALL
  SELECT 'in', dst, count(*)::BIGINT FROM e GROUP BY 1, 2
)
SELECT direction, degree, count(*)::BIGINT AS n_nodes
FROM deg GROUP BY 1, 2
"""


CO_CITE_MIN_SHARED = 2


def q_co_citation(sf_dir: str):
    """Related pages by co-citation — pairs of source pages that link to
    >= 2 common targets (the classic link-based similarity signal,
    Small 1973 / the "related:" operator): a self-join of the outlink
    graph on the TARGET. Distributed shape: ONE exchange of (dst, src)
    edges by dst (``bucketed_reduce``); inside each bucket every dst's
    sorted src list fans out to its src-pairs VECTORIZED (triu indices
    per dst segment, no per-edge Python), emitting (a, b) partial pair
    counts; a second tiny exchange by pair-hash sums counts and applies
    the >= min_shared filter. Hub targets are the documented skew: pair
    fan-out is O(indegree^2), so production would cap/star hot dsts
    (``dedup._ham_pairs`` precedent) — the synth mini-web's max indegree
    is bounded and exact here."""
    from .htmlx import parse_document
    from .pipelines.relational import bucketed_reduce
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"dst": pa.array(dst, pa.string()),
                         "src": pa.array(src, pa.string())})

    def pair_fanout(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["dst", "src"])
        if not len(df):
            return pa.table({"a": pa.nulls(0, pa.string()),
                             "b": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        df = df.sort_values(["dst", "src"], kind="stable")
        dst = df["dst"].to_numpy()
        src = df["src"].to_numpy()
        seg_starts = np.r_[0, np.flatnonzero(dst[1:] != dst[:-1]) + 1]
        seg_lens = np.diff(np.r_[seg_starts, len(dst)])
        aa, bb = [], []
        for s, l in zip(seg_starts, seg_lens):
            if l < 2:
                continue
            ii, jj = np.triu_indices(l, 1)
            aa.append(src[s + ii])
            bb.append(src[s + jj])
        if not aa:
            return pa.table({"a": pa.nulls(0, pa.string()),
                             "b": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        pairs = pd.DataFrame({"a": np.concatenate(aa),
                              "b": np.concatenate(bb)})
        g = pairs.groupby(["a", "b"], sort=False).size().rename("n").reset_index()
        return pa.table({"a": pa.array(g["a"], pa.string()),
                         "b": pa.array(g["b"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    def pair_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b"]).aggregate([("n", "sum")])
        out = pa.table({"a": g["a"], "b": g["b"],
                        "n": g["n_sum"].cast(pa.int64())})
        return out.filter(pc.greater_equal(out["n"],
                                           pa.scalar(CO_CITE_MIN_SHARED,
                                                     pa.int64())))

    e = seeds.map_batches(edges, batch_format="pyarrow")
    pairs = bucketed_reduce(e, "dst", pair_fanout, n_buckets=8)
    return bucketed_reduce(pairs, "a", pair_sum, n_buckets=8)


@functools.lru_cache(maxsize=1)
def _co_citation_sql() -> str:
    """Edges as VALUES literals (the crawl-family pattern); the
    self-join + pair count + HAVING all real SQL."""
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = sorted(set(zip(src, dst)))
    lits = ",\n".join(f"({_sql_str(s)}, {_sql_str(d)})" for s, d in rows)
    return f"""
WITH e(src, dst) AS (VALUES
{lits}
)
SELECT x.src AS a, y.src AS b, count(*)::BIGINT AS n
FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
GROUP BY 1, 2
HAVING count(*) >= {CO_CITE_MIN_SHARED}
"""


def _lpm_rules(sf_dir: str) -> dict[str, str]:
    """Robots-style prefix rules over the synth world's hosts, three
    tiers so longest-match is genuinely exercised: a global catch-all,
    a per-host tier for every 3rd host, and the world's own robots
    semantics (every host with index % 7 == 3 disallows the '/p/1'
    path prefix — ``synth.py:84``) as the most specific tier."""
    from .synth import World

    world = World(_crawl_cfg(sf_dir).world)
    rules = {"https://": "allow"}
    for i, h in enumerate(world.hosts):
        if i % 3 == 0:
            rules[f"https://{h}/"] = "host_policy"
        if i % 7 == 3:
            rules[f"https://{h}/p/1"] = "disallow"
    return rules


def q_robots_lpm(sf_dir: str):
    """Longest-prefix-match robots classification of every URL the
    mini-web's pages link to (srcs and dsts of the outlink graph):
    label = the action of the LONGEST matching rule prefix
    (``relational.longest_prefix_match`` — broadcast rule set, one
    vectorized slice+probe per distinct rule length)."""
    from .htmlx import parse_document
    from .pipelines.relational import longest_prefix_match
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def nodes_of(t: pa.Table) -> pa.Table:
        out = set()
        for u in t["url"].to_pylist():
            out.add(u)
            out.update(link.url for link in
                       parse_document(world.gen_page(u), u).links)
        return pa.table({"url": pa.array(sorted(out), pa.string())})

    nodes = seeds.map_batches(nodes_of, batch_format="pyarrow")
    # cross-block dedup: sort + keep-first (nodes_of dedups per block only)
    from .util import keep_first_sorted

    nodes = keep_first_sorted(nodes.sort("url"), ["url"])
    return longest_prefix_match(nodes, "url", _lpm_rules(sf_dir))


@functools.lru_cache(maxsize=1)
def _robots_lpm_sql() -> str:
    from .synth import World

    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    pages = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
             for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    # page set unioned explicitly: a page with zero outlinks is still a
    # node (the engine adds every crawled page unconditionally)
    urls = sorted(set(src) | set(dst) | set(pages))
    url_rows = ",\n".join(f"({_sql_str(u)})" for u in urls)
    rule_rows = ",\n".join(
        f"({_sql_str(r)}, {_sql_str(a)})"
        for r, a in sorted(_lpm_rules(_ORACLE_SF_DIR).items())
    )
    return f"""
WITH u(url) AS (VALUES
{url_rows}
),
r(rule, action) AS (VALUES
{rule_rows}
)
SELECT u.url, r.rule, r.action
FROM u JOIN r ON starts_with(u.url, r.rule)
QUALIFY row_number() OVER (PARTITION BY u.url
                           ORDER BY length(r.rule) DESC, r.rule) = 1
"""


KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table: K=8, 3 Lloyd
    iterations, deterministic init (vectors of vec_id < K), centroids
    rounded to 6dp after every update in both engines
    (``cluster.kmeans`` — broadcast centroids, per-batch partial sums,
    O(blocks x k x dim) driver fold; vectors never shuffle). Output is
    the final integer assignment (vec_id, cluster)."""
    from .pipelines.cluster import kmeans

    return kmeans(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                  k=KMEANS_K, iters=KMEANS_ITERS)


@functools.lru_cache(maxsize=1)
def _kmeans_sql() -> str:
    """The same Lloyd iterations unrolled as CTEs: assignment =
    ``row_number() OVER (ORDER BY list_distance, c) = 1`` (sqrt of the
    engine's squared L2 — monotone, tie-break identical), update =
    per-dimension ``round(avg(x), 6)`` with ``coalesce`` keeping an empty
    cluster's previous centroid. Rounding each iteration in both engines
    keeps assignment inputs bit-identical; see
    ``crawlray/pipelines/cluster.py`` for the determinism argument."""
    k, T = KMEANS_K, KMEANS_ITERS
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS (
  SELECT vec_id::INT AS c, list_transform(v, x -> round(x, 6)) AS v
  FROM e WHERE vec_id < {k})""",
    ]
    for t in range(1, T + 1):
        ctes.append(f"""a{t} AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, c.c,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c.v), c.c) AS rn
    FROM e CROSS JOIN c{t - 1} c) WHERE rn = 1)""")
        ctes.append(f"""m{t} AS (
  SELECT c, i, round(avg(x), 6) AS x FROM (
    SELECT a.c AS c, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
    FROM a{t} a JOIN e ON a.vec_id = e.vec_id
  ) GROUP BY c, i)""")
        ctes.append(f"""c{t} AS (
  SELECT p.c, coalesce(mm.v, p.v) AS v
  FROM c{t - 1} p
  LEFT JOIN (SELECT c, list(x ORDER BY i) AS v FROM m{t} GROUP BY c) mm
    ON mm.c = p.c)""")
    return "WITH " + ",\n".join(ctes) + f"""
SELECT vec_id, c::BIGINT AS cluster FROM (
  SELECT e.vec_id, c.c,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_distance(e.v, c.v), c.c) AS rn
  FROM e CROSS JOIN c{T} c) WHERE rn = 1
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top term by tf/df score (the exactly-restatable
    tf-idf variant: one IEEE division, bit-identical in both engines,
    unlike ``ln(N/df)`` whose libm differs). Emits integer (tf, df)
    evidence columns. ``textops.tfidf_top_terms_ds``: two explicit
    K x K hash exchanges (df computed inside the term bucket, argmax
    inside the doc bucket) — no Ray-Data groupby, no sort."""
    from .pipelines.textops import tfidf_top_terms_ds

    return tfidf_top_terms_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TFIDF_TOP_TERMS = """
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf::DOUBLE / df.df AS score
      FROM tf JOIN df USING (term))
SELECT doc_id, term, tf, df FROM s
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term ASC) = 1
"""


BM25_TERMS = ["join", "stream", "vector", "window"]
BM25_K = 100


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval: global top-k documents for a broadcast query
    (``textops.bm25_topk_ds``). Rational-idf variant (k1=3/2, b=3/4
    exactly-representable doubles; idf and the tf saturation are int64
    rationals, one IEEE division + one multiply each, term sums in
    sorted-term order) so the score column is bit-identical to the SQL
    restatement. Two streaming passes: O(blocks) one-row stat partials,
    then score + per-batch top-k prune, exact sort+limit over <= k x
    blocks rows."""
    from .pipelines.textops import bm25_topk_ds

    return bm25_topk_ds(_read(sf_dir, "documents", ["doc_id", "text"]),
                        BM25_TERMS, k=BM25_K)


def _bm25_sql() -> str:
    terms = sorted(BM25_TERMS)
    in_list = ", ".join(_sql_str(t) for t in terms)
    pivots = ",\n".join(
        f"             coalesce(max(CASE WHEN term = {_sql_str(t)} "
        f"THEN st END), 0.0) AS s{i}"
        for i, t in enumerate(terms))
    total = "s0"
    for i in range(1, len(terms)):
        total = f"({total} + s{i})"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
             (SELECT coalesce(sum(dl), 0) FROM dl)::BIGINT AS l),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
       WHERE term IN ({in_list}) GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
st AS (SELECT tf.doc_id, tf.term,
              ((20 * tf.tf * s.l)::DOUBLE
                / (8 * s.l * tf.tf + 3 * s.l + 9 * dl.dl * s.n)::DOUBLE)
              * ((2 * s.n + 1)::DOUBLE / (2 * df.df + 1)::DOUBLE) AS st
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN s),
p AS (SELECT doc_id,
{pivots}
      FROM st GROUP BY doc_id)
SELECT doc_id, {total} AS score
FROM p
ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""


def q_embedding_clusters(sf_dir: str):
    """Embedding near-dup CLUSTERS: SRP-LSH verified pairs -> the same
    distributed connected-components as the MinHash cluster path
    (min-reachable-id labels). Closes the symmetry: both text AND
    embedding near-dup families now have a pairs view and a clusters
    view, each oracled."""
    from .pipelines.ann import embedding_lsh_pairs
    from .pipelines.dedup import connected_components_ds

    pairs = embedding_lsh_pairs(_read(sf_dir, "embeddings"),
                                cos_threshold=EMB_LSH_THRESHOLD,
                                n_planes=EMB_LSH_PLANES, bands=EMB_LSH_BANDS,
                                seed=EMB_LSH_SEED)
    cc = connected_components_ds(pairs)
    return cc.map_batches(lambda t: t.rename_columns(["vec_id", "cluster"]),
                          batch_format="pyarrow")


def _embedding_clusters_sql() -> str:
    """Transitive closure over the SRP-LSH pair SQL (the
    SQL_MINHASH_CLUSTERS idiom: recursive reach + min-reachable-id)."""
    return f"""
WITH RECURSIVE vp AS ({SQL_EMBEDDING_LSH_DUPS}),
nodes AS (SELECT a AS x FROM vp UNION SELECT b FROM vp),
edges AS (SELECT a AS s, b AS d FROM vp UNION SELECT b, a FROM vp),
reach(x, y) AS (
  SELECT x, x FROM nodes
  UNION
  SELECT r.x, e.d FROM reach r JOIN edges e ON r.y = e.s
)
SELECT x::BIGINT AS vec_id, min(y)::BIGINT AS cluster FROM reach GROUP BY x
"""


def q_inactive_customers(sf_dir: str):
    """Anti join: customers with no URGENT order (the ``NOT EXISTS``
    shape; the synth data gives every customer SOME order, so the plain
    version would be a degenerate all-empty result). Both sides large ->
    ``relational.bucketed_anti_join`` hash exchange; the right side
    reduces to distinct keys inside each bucket task. The priority
    filter is pushed into the read batches before any shuffle."""
    from .pipelines.relational import bucketed_anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"], "1-URGENT")
        return t.filter(keep).select(["o_custkey"]).rename_columns(["c_custkey"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        urgent, batch_format="pyarrow"
    )
    return bucketed_anti_join(cust, orders, key="c_custkey")


SQL_INACTIVE_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
"""


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gap (the ``LAG() OVER`` window analog):
    microseconds since the user's previous event, -1 for the first
    (``streaming.lag_gap``; one hash shuffle, vectorized diff)."""
    from .pipelines.streaming import lag_gap

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_gap(ev, key="user_id", ts="ts", id_col="event_id")


SQL_EVENT_GAPS = """
SELECT event_id,
       coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)), -1)::BIGINT AS gap_us
FROM events
"""


PACK_CAPACITY = 2048


def q_pack_chunks(sf_dir: str):
    """Training-sequence packing over documents: whitespace token counts
    concatenated in doc_id order and cut every 2048 tokens — per doc its
    global token offset and first/last chunk index
    (``streaming.pack_chunks``: a distributed prefix scan)."""
    from .pipelines.streaming import pack_chunks
    from .pipelines.textops import doc_stats

    wc = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_stats, batch_format="pyarrow"
    ).select_columns(["doc_id", "word_count"])
    return pack_chunks(wc, order_col="doc_id", tokens_col="word_count",
                       capacity=PACK_CAPACITY)


SQL_PACK_CHUNKS = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
  FROM d
)
SELECT doc_id, n_tokens::BIGINT AS n_tokens, off::BIGINT AS token_offset,
       (off // 2048)::BIGINT AS chunk_start,
       ((off + greatest(n_tokens, 1) - 1) // 2048)::BIGINT AS chunk_end
FROM s
"""


DECON_EVAL_MOD = 97     # doc_id % 97 == 0 -> the held-out "benchmark" set
DECON_NGRAM = 5


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: count, per training doc, how many of
    its distinct word-5-grams appear anywhere in the held-out eval set
    (docs with ``doc_id % 97 == 0``) — the overlap signal training-data
    pipelines drop contaminated docs on (GPT-3 appx. C / PaLM style).

    Scale plan: benchmark suites are tiny relative to the corpus, so the
    eval side collapses to ONE broadcast set of shingles (``ray.put``
    once, read per actor); the train side is a single embarrassingly
    parallel ``map_batches`` pass — no shuffle at all."""
    import ray

    from .pipelines.dedup import word_shingles

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n = DECON_NGRAM

    def eval_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % DECON_EVAL_MOD == 0))

    ev_docs = ds.map_batches(eval_side, batch_format="pyarrow").to_pandas()
    ev_set: set[str] = set()
    for text in ev_docs["text"]:
        ev_set.update(word_shingles(text, n))
    ref = ray.put(ev_set)

    class CountHits:
        def __init__(self):
            self.ev = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % DECON_EVAL_MOD != 0))
            hits = [len(set(word_shingles(x, n)) & self.ev)
                    for x in t["text"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"],
                             "n_hits": pa.array(hits, pa.int64())})

    # autoscaling pool (min 1): a fixed floor equal to the session's CPU
    # count deadlocks small sessions (actors reserve every CPU; the read
    # tasks starve). One broadcast-set deserialization per actor either way.
    return ds.map_batches(CountHits, batch_format="pyarrow",
                          concurrency=(1, 16))


SQL_DECONTAMINATE = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents WHERE trim(text) <> ''
),
ev AS (
  SELECT DISTINCT unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          || ' ' || words[i+3] || ' ' || words[i+4]
                          for i in range(1, len(words) - 3)]) AS g
  FROM w WHERE doc_id % 97 = 0
),
tg AS (
  SELECT doc_id, unnest(list_distinct(
           [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
            || ' ' || words[i+3] || ' ' || words[i+4]
            for i in range(1, len(words) - 3)])) AS g
  FROM w WHERE doc_id % 97 <> 0
),
hits AS (SELECT tg.doc_id, count(*) AS n_hits FROM tg JOIN ev USING (g) GROUP BY 1)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
"""


# ---------------------------------------------------------------------------
# Wave-4 operators (round 3): privacy, normalization, sketch-driven exact
# heavy hitters, rolling windows, semi join, shared-ngram coverage, profiling
# ---------------------------------------------------------------------------

def q_pii_scan(sf_dir: str):
    """PII-style detection + redaction (``textops.PiiScanner`` actor
    pool; regex compiled once per actor): count pattern hits per row and
    emit the redacted text. The test tables carry no phone/email-shaped
    text, so the query instantiates the generic scanner with a digit-run
    pattern over ``events.props`` — every row exercises the redaction
    path; the default ``PHONE_PATTERN`` stays the production shape."""
    from .pipelines.textops import PiiScanner

    ev = _read(sf_dir, "events", ["event_id", "props"])
    return ev.map_batches(
        PiiScanner,
        fn_constructor_args=("event_id", "props"),
        fn_constructor_kwargs={"pattern": r"[0-9]+", "repl": "<NUM>"},
        batch_format="pandas",
        concurrency=(1, 8),
    )


SQL_PII_SCAN = r"""
SELECT event_id,
       len(regexp_extract_all(props, '[0-9]+'))::BIGINT AS n_pii,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted
FROM events
"""


def q_normalize_text(sf_dir: str):
    """Canonical normalization + md5 of the normalized form over
    documents (``textops.TextNormalizer`` actor pool)."""
    from .pipelines.textops import TextNormalizer

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TextNormalizer, batch_format="pandas", concurrency=(1, 8)
    )


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
       length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))::BIGINT
           AS norm_len,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_fp
FROM documents
"""


HH_THRESHOLD_PM = 10  # words covering >= 1% of the corpus word stream


def q_heavy_hitters(sf_dir: str):
    """Exact global heavy hitters over document words via per-block
    Misra-Gries sketches + an exact candidate-only second pass
    (``sketch.heavy_hitters``; the raw word stream never shuffles)."""
    from .pipelines.sketch import heavy_hitters

    docs = _read(sf_dir, "documents", ["text"])
    return heavy_hitters(docs, text_col="text", threshold_pm=HH_THRESHOLD_PM)


SQL_HEAVY_HITTERS = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents WHERE trim(text) <> ''
),
t AS (SELECT count(*) AS n_total FROM w)
SELECT word, count(*)::BIGINT AS n
FROM w, t
GROUP BY word, n_total
HAVING count(*) * 1000 >= n_total * 10
"""


ROLL_WINDOW = 4


def q_rolling_sum(sf_dir: str):
    """Per-user rolling sum over the last 4 events (the ROWS-window
    analog; ``streaming.rolling_sum_rows``: one hash shuffle + vectorized
    cumsum-difference). floor(value) int64 domain keeps IEEE out."""
    from .pipelines.streaming import rolling_sum_rows

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return rolling_sum_rows(ev, key="user_id", ts="ts", id_col="event_id",
                            val="value", window=ROLL_WINDOW)


SQL_ROLLING_SUM = """
SELECT event_id,
       sum(CAST(floor(value) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT AS roll_sum
FROM events
"""


def q_urgent_customers(sf_dir: str):
    """Semi join (EXISTS): customers with at least one URGENT order —
    the complement of ``inactive_customers``, same B-wide hash exchange
    (``relational.bucketed_semi_join``), left columns only, no
    multiplicity blow-up."""
    from .pipelines.relational import bucketed_semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"], "1-URGENT")
        return t.filter(keep).select(["o_custkey"]).rename_columns(["c_custkey"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        urgent, batch_format="pyarrow"
    )
    return bucketed_semi_join(cust, orders, key="c_custkey")


SQL_URGENT_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
"""


SHARED_NGRAM_N = 4


def q_shared_ngrams(sf_dir: str):
    """Cross-document exact substring-duplication signal (the n-gram
    form of Lee et al. 2022's dedup analysis): per document, its distinct
    4-gram count and how many of those 4-grams occur in >= 2 documents.
    Distributed shape (``dedup.shared_ngram_stats``): two explicit K x K
    hash exchanges — gram strings cross once (by gram hash; doc counts,
    shared flags and per-doc partials all inside the bucket task), then
    fixed-width partials re-exchange by doc hash. Zero Ray-Data
    groupbys: the Aggregate sort-map coalesces small blocks into one
    task (measured 2 x ~5 s at sf0.1 for sub-second compute)."""
    from .pipelines.dedup import shared_ngram_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return shared_ngram_stats(docs, n=SHARED_NGRAM_N)


SQL_SHARED_NGRAMS = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents WHERE trim(text) <> ''
),
g AS (
  SELECT doc_id, unnest(list_distinct(
           [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
            || ' ' || words[i+3] for i in range(1, len(words) - 2)])) AS g
  FROM w WHERE len(words) >= 4
),
c AS (SELECT g, count(*) AS nd FROM g GROUP BY g)
SELECT g.doc_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared
FROM g JOIN c USING (g) GROUP BY g.doc_id
"""


PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def q_table_profile(sf_dir: str):
    """Single-pass per-column profile (rows / nulls / min / max) over
    lineitem's integer columns (``stats.table_profile``: only
    O(blocks x cols) scalars cross the cluster)."""
    from .pipelines.stats import table_profile

    return table_profile(_read(sf_dir, "lineitem", PROFILE_COLS), PROFILE_COLS)


SQL_TABLE_PROFILE = """
SELECT 'l_orderkey' AS col, count(*)::BIGINT AS n_rows,
       (count(*) - count(l_orderkey))::BIGINT AS n_nulls,
       min(l_orderkey)::BIGINT AS min_v, max(l_orderkey)::BIGINT AS max_v
FROM lineitem
UNION ALL
SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
       min(l_partkey), max(l_partkey) FROM lineitem
UNION ALL
SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
       min(l_suppkey), max(l_suppkey) FROM lineitem
UNION ALL
SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
       min(l_linenumber), max(l_linenumber) FROM lineitem
"""



MIX_RATES = {"src0": 250, "src1": 500}  # other sources keep everything


def q_corpus_mix(sf_dir: str):
    """Deterministic training-mix composition over documents: per-source
    per-mille sampling + a reproducible global shuffle position
    (``textops.mix_corpora``; zero shuffle — consumers sort by
    ``mix_pos`` to interleave sources into one stream)."""
    from .pipelines.textops import mix_corpora

    return _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        lambda t: mix_corpora(t, MIX_RATES), batch_format="pyarrow"
    )


SQL_CORPUS_MIX = """
WITH b AS (
  SELECT doc_id, source,
         (md5_number_upper('mix-rate-v1:' || doc_id::VARCHAR)::HUGEINT
          % 1000)::BIGINT AS rb,
         (md5_number_upper('mix-pos-v1:' || doc_id::VARCHAR)::HUGEINT
          % 1000000000)::BIGINT AS mix_pos
  FROM documents
),
r(source, rate) AS (VALUES ('src0', 250), ('src1', 500))
SELECT doc_id, source, mix_pos
FROM b LEFT JOIN r USING (source)
WHERE b.rb < coalesce(r.rate, 1000)
"""


GROUP_SAMPLE_K = 20


def q_group_sample(sf_dir: str):
    """Deterministic per-group k-sample: for each language, the 20
    documents with the largest md5 sample key — reproducible group-wise
    subsampling (eval-set carving, per-class inspection) as a
    composition of the md5 key + ``relational.grouped_topk`` (partial
    head(k) per batch, so at most k rows per (batch, group) shuffle)."""
    from .pipelines.relational import grouped_topk

    def keyed(t: pa.Table) -> pa.Table:
        from .util import md5_id_bucket

        h = md5_id_bucket("sample-v1", t["doc_id"].to_pylist(), 1_000_000)
        return pa.table({"lang": t["lang"], "doc_id": t["doc_id"],
                         "h": pa.array(h)})

    keyed_ds = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    return grouped_topk(keyed_ds, group_keys=["lang"], value="h",
                        tiebreak="doc_id", k=GROUP_SAMPLE_K)


SQL_GROUP_SAMPLE = """
SELECT lang, doc_id,
       (md5_number_upper('sample-v1:' || doc_id::VARCHAR)::HUGEINT
        % 1000000)::BIGINT AS h
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h DESC, doc_id) <= 20
"""


IVF_N_CENTROIDS = 16
IVF_N_PROBE = 4


@functools.lru_cache(maxsize=1)
def _ann_ivf_sql() -> str:
    """Exact SQL restatement of the PRUNED IVF path (q_ann_ivf): the
    centroids are deterministic (seeded k-means on the seeded id sample;
    at sf0.01 the sample is the whole 500-row table), so they embed as
    DOUBLE[] literals computed by the SAME training code, Ray-free.
    Bucket assignment restates as argmax over raw inner products —
    mathematically identical to the engine's normalized argmax because
    normalization divides by a positive scalar — with the same
    lowest-centroid tiebreak; the probe set is the UNION of every
    query's n_probe nearest centroids (the engine deliberately skips
    per-query bucket masking); the final ranking is SQL_ANN_COSINE's
    shape restricted to the shortlist. Valid at the driver's fixed
    sf=0.01 (centroid literals derive from that table, like every
    VALUES-literal oracle in this catalog)."""
    import pyarrow.parquet as pq

    from .pipelines.ann import _normalize, train_centroids

    tb = pq.read_table(f"{_ORACLE_SF_DIR}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    df = tb.to_pandas().sort_values("vec_id")
    sm = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    cents = train_centroids(sm, IVF_N_CENTROIDS)
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in cents[j])
        )
        for j in range(len(cents))
    )
    return f"""
WITH c(cid, cv) AS (VALUES
    {rows}),
e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS ev FROM embeddings),
ip AS (SELECT e.vec_id, c.cid, list_inner_product(e.ev, c.cv) AS ip
       FROM e CROSS JOIN c),
a AS (SELECT vec_id, cid AS bucket FROM ip
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ip DESC, cid) = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe, ev AS qev FROM e
      WHERE vec_id < {len(ANN_QUERY_IDS)}),
qp AS (SELECT q.query_id, c.cid, list_inner_product(q.qev, c.cv) AS ip
       FROM q CROSS JOIN c),
probe AS (SELECT query_id, cid FROM qp
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY ip DESC, cid) <= {IVF_N_PROBE}),
wanted AS (SELECT DISTINCT cid FROM probe),
short AS (SELECT a.vec_id FROM a JOIN wanted w ON a.bucket = w.cid),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN e JOIN short s ON e.vec_id = s.vec_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM sims
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= {ANN_K}
ORDER BY query_id, rank
"""


def q_customer_urgent_counts(sf_dir: str):
    """LEFT OUTER join: every customer with their URGENT-order count,
    zero for customers with none (``bucketed_hash_join(...,
    join_type="left outer")`` — unmatched left rows keep null right
    columns, coalesced to 0 in a final Arrow pass). Completes the join
    family: inner / left outer / semi / anti / as-of / range."""
    from .pipelines.relational import bucketed_hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def urgent(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"], "1-URGENT")
        return t.filter(keep).select(["o_custkey"]).rename_columns(["c_custkey"])

    counts = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(urgent, batch_format="pyarrow")
        .groupby("c_custkey").count()
        .map_batches(lambda t: t.rename_columns(["c_custkey", "n_urgent"]),
                     batch_format="pyarrow")
    )
    joined = bucketed_hash_join(cust, counts, key="c_custkey",
                                join_type="left outer")

    def coalesce(t: pa.Table) -> pa.Table:
        n = t["n_urgent"].cast(pa.int64())
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"],
            "n_urgent": pc.fill_null(n, pa.scalar(0, pa.int64())),
        })

    return joined.map_batches(coalesce, batch_format="pyarrow")


SQL_CUSTOMER_URGENT_COUNTS = """
SELECT c.c_custkey, c.c_name, coalesce(o.n, 0)::BIGINT AS n_urgent
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_orderpriority = \'1-URGENT\' GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


def q_daily_activity(sf_dir: str):
    """FULL OUTER join: per-day URGENT-order count vs per-day returned-
    shipment count — a day appearing on EITHER side survives with the
    other side's count 0 (``bucketed_hash_join(..., join_type="full
    outer")``; Acero coalesces the key). Urgent orders and R-flag
    shipments are day-sparse, so both unmatched branches genuinely
    execute. Completes the join family: inner / left outer / full outer
    / semi / anti / as-of / range."""
    from .pipelines.relational import bucketed_hash_join

    def _day_counts(flag_col: str, flag_val: str, date_col: str, out: str):
        # §2.5 pre-aggregation: per-batch day counts (<= |days| partial
        # rows per batch) — a Dataset groupby over ~2.4k day-keys is the
        # tiny-group Aggregate pathology (measured 15-30 s for the pair)
        def partial(t: pa.Table) -> pa.Table:
            days = pc.strftime(
                t.filter(pc.equal(t[flag_col], flag_val))[date_col],
                format="%Y-%m-%d",
            )
            vc = days.to_pandas().value_counts()
            return pa.table({"d": pa.array(vc.index, pa.string()),
                             out: pa.array(vc.to_numpy(), pa.int64())})

        return partial

    left_partials = (
        _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
        .map_batches(_day_counts("o_orderpriority", "1-URGENT",
                                 "o_orderdate", "n_urgent"),
                     batch_format="pyarrow")
        .to_pandas()  # bounded driver fold: O(blocks x |days|) partials
    )
    right_partials = (
        _read(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])
        .map_batches(_day_counts("l_returnflag", "R",
                                 "l_shipdate", "n_returned"),
                     batch_format="pyarrow")
        .to_pandas()
    )
    left = rd.from_pandas(
        left_partials.groupby("d", as_index=False).agg(n_urgent=("n_urgent", "sum"))
    )
    right = rd.from_pandas(
        right_partials.groupby("d", as_index=False).agg(n_returned=("n_returned", "sum"))
    )
    # the operator under test: the distributed full outer exchange join
    joined = bucketed_hash_join(left, right, key="d", join_type="full outer",
                                n_buckets=8)

    def coalesce(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "d": t["d"],
            "n_urgent": pc.fill_null(t["n_urgent"].cast(pa.int64()), zero),
            "n_returned": pc.fill_null(t["n_returned"].cast(pa.int64()), zero),
        })

    return joined.map_batches(coalesce, batch_format="pyarrow")


SQL_DAILY_ACTIVITY = """
SELECT coalesce(o.d, l.d) AS d,
       coalesce(o.n, 0)::BIGINT AS n_urgent,
       coalesce(l.n, 0)::BIGINT AS n_returned
FROM (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS n
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
) o
FULL OUTER JOIN (
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, count(*) AS n
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
) l ON o.d = l.d
"""


NTILE_K = 8


def q_event_ntiles(sf_dir: str):
    """Per-user NTILE(8) over event time (``streaming.ntile_per_key``:
    one hash shuffle, closed-form integer tile math on the within-key
    rank — SQL's exact first-tiles-get-ceil distribution)."""
    from .pipelines.streaming import ntile_per_key

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return ntile_per_key(ev, key="user_id", ts="ts", id_col="event_id",
                         k=NTILE_K)


SQL_EVENT_NTILES = """
SELECT event_id,
       ntile(8) OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS tile
FROM events
"""


def q_price_histogram(sf_dir: str):
    """Fixed-width value histogram over lineitem prices ($1000 bins on
    the integer-cents domain): per-batch partial (bin, n, cents) rows +
    a bounded driver fold — the §2.5 pre-aggregation rule; nothing but
    O(blocks x bins) scalars leaves a block."""
    import ray

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bins = cents // 100_000
        uniq, inv, cnt = np.unique(bins, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({"bin": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64)),
                         "cents": pa.array(sums)})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby("bin", as_index=False)
        .agg(n=("n", "sum"), cents=("cents", "sum"))
        .astype({"bin": "int64", "n": "int64", "cents": "int64"})
    )


SQL_PRICE_HISTOGRAM = """
SELECT (CAST(round(l_extendedprice * 100) AS BIGINT) // 100000)::BIGINT AS bin,
       count(*)::BIGINT AS n,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS cents
FROM lineitem GROUP BY 1
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_pivot(sf_dir: str):
    """PIVOT (wide conditional aggregation): per-day counts of each
    event type as its own column (SQL ``count(*) FILTER (...)``).
    Per-batch (day, type) partials — <= |days| x |types| rows per batch
    — then a bounded O(blocks x days x types) driver fold + reshape;
    nothing but partial count rows ever leaves a block (§2.5)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "d": pc.strftime(t["ts"], format="%Y-%m-%d").to_pandas(),
            "et": t["event_type"].to_pandas(),
        })
        g = df.groupby(["d", "et"], as_index=False).size()
        return pa.table({"d": pa.array(g["d"], pa.string()),
                         "et": pa.array(g["et"], pa.string()),
                         "n": pa.array(g["size"].to_numpy(), pa.int64())})

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    folded = parts.groupby(["d", "et"], as_index=False).agg(n=("n", "sum"))
    wide = folded.pivot_table(index="d", columns="et", values="n",
                              aggfunc="sum", fill_value=0)
    # fixed output contract: one column per known type, 0 when absent
    wide = wide.reindex(columns=list(EVENT_TYPES), fill_value=0).astype("int64")
    wide.columns = [f"n_{c}" for c in wide.columns]
    return wide.reset_index().rename(columns={"d": "d"})


SQL_EVENT_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS d,
       count(*) FILTER (event_type = 'click')::BIGINT    AS n_click,
       count(*) FILTER (event_type = 'error')::BIGINT    AS n_error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT   AS n_signup,
       count(*) FILTER (event_type = 'view')::BIGINT     AS n_view
FROM events GROUP BY 1
"""


def _nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Per-nation lineitem revenue via the supplier dimension: supplier
    (suppkey -> nationkey) broadcasts once (J1); each lineitem batch
    reduces to <= |nations| partial rows (searchsorted suppkey lookup +
    np.add.at, the price_histogram kernel) and the driver fold is
    O(blocks x 25). Returns columns (nk, rev_centicents, n_items) —
    the shared base grain for rollup / cube / ratio-to-report."""
    import ray

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    order = np.argsort(sup["s_suppkey"].to_numpy())
    ref = ray.put((sup["s_suppkey"].to_numpy()[order],
                   sup["s_nationkey"].to_numpy()[order]))

    class NationPartial:
        def __init__(self):
            self.keys, self.nat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            nk = self.nat[np.searchsorted(self.keys, sk)]
            pe = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
            dc = _cents(t["l_discount"]).to_numpy(zero_copy_only=False)
            rev = pe * (100 - dc)
            uniq, inv, cnt = np.unique(nk, return_inverse=True,
                                       return_counts=True)
            sums = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, rev)
            return pa.table({"nk": pa.array(uniq.astype(np.int64)),
                             "rev": pa.array(sums),
                             "n": pa.array(cnt.astype(np.int64))})

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice",
                                    "l_discount"])
    parts = li.map_batches(NationPartial, batch_format="pyarrow",
                           concurrency=2).to_pandas()
    return parts.groupby("nk", as_index=False).agg(
        rev_centicents=("rev", "sum"), n_items=("n", "sum"))


def q_revenue_rollup(sf_dir: str):
    """GROUPING SETS (``GROUP BY ROLLUP(r_name, n_name)``): supplier
    revenue at nation grain, region subtotals, and the grand total in
    one result; rolled-up key levels surface as 'ALL'. Base grain from
    :func:`_nation_revenue`; the super-aggregate levels are derived
    from the nation grain (n_name functionally determines r_name) —
    the rollup costs no second pass over the fact table."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    per_nat = _nation_revenue(sf_dir)
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    per_nat["n_name"] = per_nat["nk"].map(n2name)
    per_nat["r_name"] = per_nat["nk"].map(lambda k: r2name[n2r[k]])
    base = per_nat[["r_name", "n_name", "rev_centicents", "n_items"]]
    per_region = base.groupby("r_name", as_index=False).agg(
        rev_centicents=("rev_centicents", "sum"), n_items=("n_items", "sum"))
    per_region["n_name"] = "ALL"
    total = pd.DataFrame({
        "r_name": ["ALL"], "n_name": ["ALL"],
        "rev_centicents": [base["rev_centicents"].sum()],
        "n_items": [base["n_items"].sum()],
    })
    out = pd.concat([base, per_region, total], ignore_index=True)
    return out[["r_name", "n_name", "rev_centicents", "n_items"]].astype(
        {"rev_centicents": "int64", "n_items": "int64"})


SQL_REVENUE_ROLLUP = """
SELECT coalesce(r.r_name, 'ALL') AS r_name,
       coalesce(n.n_name, 'ALL') AS n_name,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT AS rev_centicents,
       count(*)::BIGINT AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


SETOP_YEARS = (1996, 1997)


def _year_buyers(sf_dir: str, year: int) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def f(t: pa.Table, y=year) -> pa.Table:
        keep = pc.equal(pc.year(t["o_orderdate"]), y)
        return t.filter(keep).select(["o_custkey"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_matched_order_pairs(sf_dir: str):
    """Set op INTERSECT ALL (bag/multiset semantics — each occurrence
    matches one occurrence): per-customer order slots common to 1996
    and 1997, i.e. custkey appears min(orders_1996, orders_1997) times.
    Same exchange as the DISTINCT ops, but the lazy pre-pass keeps
    per-block COUNTS (summed in the bucket) and the bucket emits each
    row min(cnt_l, cnt_r) times."""
    from .pipelines.relational import bucketed_set_op

    a = _year_buyers(sf_dir, SETOP_YEARS[0])
    b = _year_buyers(sf_dir, SETOP_YEARS[1])
    return bucketed_set_op(a, b, ["o_custkey"], op="intersect all",
                           n_buckets=16)


SQL_MATCHED_ORDER_PAIRS = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT ALL
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_unreturned_shipments(sf_dir: str):
    """Set op EXCEPT ALL (bag/multiset semantics): part keys of
    shipments with multiplicity = shipments - returned shipments per
    part (EXCEPT ALL removes ONE occurrence per right row, unlike
    DISTINCT EXCEPT which removes a part entirely if it was ever
    returned). Per-block count pre-pass -> one exchange -> per-bucket
    max(cnt_l - cnt_r, 0) replication."""
    from .pipelines.relational import bucketed_set_op

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])
    shipped = items.map_batches(
        lambda t: t.select(["l_partkey"]), batch_format="pyarrow")
    returned = items.map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R"))
                   .select(["l_partkey"]),
        batch_format="pyarrow")
    return bucketed_set_op(shipped, returned, ["l_partkey"],
                           op="except all", n_buckets=16)


SQL_UNRETURNED_SHIPMENTS = """
SELECT l_partkey FROM lineitem
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
"""


def q_repeat_buyers(sf_dir: str):
    """Set op INTERSECT (distinct set semantics): customers who ordered
    in BOTH 1996 and 1997 (``relational.bucketed_set_op``: lazy
    per-batch distinct pre-pass so only per-block distinct rows enter
    the exchange, one B-wide hash exchange, per-bucket distinct + inner
    join over the null-safe key encoding)."""
    from .pipelines.relational import bucketed_set_op

    a = _year_buyers(sf_dir, SETOP_YEARS[0])
    b = _year_buyers(sf_dir, SETOP_YEARS[1])
    return bucketed_set_op(a, b, ["o_custkey"], op="intersect", n_buckets=16)


SQL_REPEAT_BUYERS = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def q_lapsed_buyers(sf_dir: str):
    """Set op EXCEPT: customers who ordered in 1996 but NOT in 1997
    (same ``bucketed_set_op`` exchange, per-bucket left-anti join)."""
    from .pipelines.relational import bucketed_set_op

    a = _year_buyers(sf_dir, SETOP_YEARS[0])
    b = _year_buyers(sf_dir, SETOP_YEARS[1])
    return bucketed_set_op(a, b, ["o_custkey"], op="except", n_buckets=16)


SQL_LAPSED_BUYERS = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


UNPIVOT_MEASURES = ["qty_cents", "price_cents", "disc_cents"]


def q_unpivot_measures(sf_dir: str):
    """UNPIVOT / melt: per-returnflag sums of three measures reshaped
    wide-to-long — (flag, measure, val) rows. The aggregate is the §2.5
    per-batch-partial + bounded-driver-fold shape (<= |flags| x 3 rows
    per batch); the reshape is the operator under test:
    ``relational.unpivot``, a lazy zero-shuffle per-batch kernel that
    works unchanged on a wide FACT table (R rows -> R x len(measures))."""
    from .pipelines.relational import unpivot

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "qty_cents": _cents(t["l_quantity"]).to_pandas(),
            "price_cents": _cents(t["l_extendedprice"]).to_pandas(),
            "disc_cents": _cents(t["l_discount"]).to_pandas(),
        })
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    wide = parts.groupby("l_returnflag", as_index=False).sum()
    return unpivot(rd.from_pandas(wide), ["l_returnflag"], UNPIVOT_MEASURES,
                   var_name="measure", value_name="val")


SQL_UNPIVOT_MEASURES = """
WITH w AS (
  SELECT l_returnflag,
         sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS qty_cents,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS price_cents,
         sum(CAST(round(l_discount * 100) AS BIGINT))::BIGINT AS disc_cents
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, 'qty_cents' AS measure, qty_cents AS val FROM w
UNION ALL
SELECT l_returnflag, 'price_cents', price_cents FROM w
UNION ALL
SELECT l_returnflag, 'disc_cents', disc_cents FROM w
"""


Q17_BRAND = "Brand#1"


def q_small_qty_revenue(sf_dir: str):
    """Correlated scalar subquery, decorrelated (the TPC-H Q17 shape):
    revenue from lineitems whose quantity is below 20% of the per-part
    AVERAGE quantity, for one brand's parts. The average never
    materializes as a float — ``qty < 0.2 * sum/cnt`` lowers to the
    pure-integer ``5 * qty_cents * cnt < sum_cents``, so Ray and DuckDB
    cannot diverge on IEEE division. Distributed shape: the brand's
    partkey set broadcasts once (|parts|/25 keys); surviving rows
    exchange ONCE by partkey (``relational.bucketed_reduce``) and each
    bucket computes its per-part totals, filters its own rows locally
    (no join back, no second fact-table pass), and returns ONE partial
    row — O(B) rows reach the driver."""
    import ray

    from .pipelines.relational import bucketed_reduce

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    keys = np.sort(
        part.map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"], Q17_BRAND))
            .select(["p_partkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()["p_partkey"]
        .to_numpy()
    )
    ref = ray.put(keys)

    class BrandFilter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            if len(self.keys):
                pos = np.minimum(np.searchsorted(self.keys, pk),
                                 len(self.keys) - 1)
                keep = self.keys[pos] == pk
            else:
                keep = np.zeros(len(pk), bool)
            t = t.filter(pa.array(keep))
            return pa.table({
                "pk": t["l_partkey"].cast(pa.int64()),
                "qty": _cents(t["l_quantity"]),
                "price": _cents(t["l_extendedprice"]),
            })

    rows = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(BrandFilter, batch_format="pyarrow", concurrency=2)

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"total_cents": pa.array([0], pa.int64()),
                             "n_items": pa.array([0], pa.int64())})
        pk = t["pk"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        price = t["price"].to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(pk, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, qty)
        keep = 5 * qty * cnt[inv] < sums[inv]
        return pa.table({
            "total_cents": pa.array([int(price[keep].sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = bucketed_reduce(rows, "pk", bucket_fn, n_buckets=16).to_pandas()
    return pd.DataFrame({
        "total_cents": [int(parts["total_cents"].sum())],
        "n_items": [int(parts["n_items"].sum())],
    })


SQL_SMALL_QTY_REVENUE = """
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
agg AS (
  SELECT l_partkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS s,
         count(*) AS c
  FROM lineitem JOIN pk ON l_partkey = p_partkey GROUP BY 1
)
SELECT coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)::BIGINT
         AS total_cents,
       count(*)::BIGINT AS n_items
FROM lineitem l JOIN agg a ON l.l_partkey = a.l_partkey
WHERE 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * a.c < a.s
"""


def q_priority_statuses(sf_dir: str):
    """String aggregation (LISTAGG / string_agg): per order priority the
    ','-joined SORTED list of distinct order statuses plus their count.
    Per-batch distinct (priority, status) pairs — <= 5 x 3 rows per
    batch — then a bounded driver fold + join (§2.5): the string concat
    happens over the folded distinct pairs, never over raw rows."""
    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = t.select(["o_orderpriority", "o_orderstatus"])
        return pairs.group_by(
            ["o_orderpriority", "o_orderstatus"], use_threads=False
        ).aggregate([])

    parts = (
        ords.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    g = (
        parts.groupby("o_orderpriority")["o_orderstatus"]
        .agg(statuses=lambda s: ",".join(sorted(set(s))),
             n_statuses=lambda s: len(set(s)))
        .reset_index()
    )
    return g.astype({"n_statuses": "int64"})


SQL_PRIORITY_STATUSES = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       count(DISTINCT o_orderstatus)::BIGINT AS n_statuses
FROM orders GROUP BY 1
"""


def q_nation_share(sf_dir: str):
    """Ratio-to-report window (``rev * 1000 // sum(rev) OVER ()``): each
    nation's revenue share in per-mille integers. Base grain from
    :func:`_nation_revenue` (O(blocks x 25) driver fold); the window is
    over 25 rows, so the "share of total" — normally a full-pass window
    function — costs nothing beyond the base aggregation. Integer
    floor-division keeps the share exact (no IEEE drift vs the oracle)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    per_nat = _nation_revenue(sf_dir)
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    per_nat["n_name"] = per_nat["nk"].map(n2name)
    total = int(per_nat["rev_centicents"].sum())
    per_nat["share_pm"] = (per_nat["rev_centicents"] * 1000) // total
    out = per_nat[["n_name", "rev_centicents", "share_pm"]]
    return out.astype({"rev_centicents": "int64", "share_pm": "int64"})


SQL_NATION_SHARE = """
WITH per AS (
  SELECT n.n_name,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT AS rev_centicents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT n_name, rev_centicents,
       (rev_centicents * 1000 // sum(rev_centicents) OVER ())::BIGINT AS share_pm
FROM per
"""


def q_revenue_cube(sf_dir: str):
    """``GROUP BY CUBE(n_name, o_orderpriority)``: order revenue at the
    (customer-nation, priority) base grain plus BOTH one-dimension
    rollups and the grand total ('ALL' levels). Unlike the rollup's
    supplier chain, the dimensions here are NOT functionally dependent,
    so all four grouping sets genuinely differ. orders x customer is a
    real B-wide hash exchange (``bucketed_hash_join`` — customer is
    fact-sized at scale, never broadcast); per-joined-batch partials
    reduce to <= 25 x 5 rows, the driver fold is O(blocks x 125), and
    every super-aggregate level derives from the base grain without a
    second pass over the join output."""
    from .pipelines.relational import bucketed_hash_join

    def order_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "o_orderpriority": t["o_orderpriority"],
            "cents": _cents(t["o_totalprice"]),
        })

    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderpriority", "o_totalprice"]
                 ).map_batches(order_cents, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = bucketed_hash_join(ords, cust, key="c_custkey")

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(
            ["c_nationkey", "o_orderpriority"], use_threads=False
        ).aggregate([("cents", "sum"), ("cents", "count")])

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    base = parts.groupby(["c_nationkey", "o_orderpriority"],
                         as_index=False).agg(
        rev_cents=("cents_sum", "sum"), n_orders=("cents_count", "sum"))
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    base["n_name"] = base["c_nationkey"].map(n2name)
    base = base[["n_name", "o_orderpriority", "rev_cents", "n_orders"]]

    def level(df, by, all_cols):
        g = df.groupby(by, as_index=False).agg(
            rev_cents=("rev_cents", "sum"), n_orders=("n_orders", "sum"))
        for c in all_cols:
            g[c] = "ALL"
        return g

    by_nation = level(base, ["n_name"], ["o_orderpriority"])
    by_prio = level(base, ["o_orderpriority"], ["n_name"])
    total = pd.DataFrame({
        "n_name": ["ALL"], "o_orderpriority": ["ALL"],
        "rev_cents": [base["rev_cents"].sum()],
        "n_orders": [base["n_orders"].sum()],
    })
    out = pd.concat([base, by_nation, by_prio, total], ignore_index=True)
    out = out[["n_name", "o_orderpriority", "rev_cents", "n_orders"]]
    return out.astype({"rev_cents": "int64", "n_orders": "int64"})


SQL_REVENUE_CUBE = """
SELECT coalesce(n.n_name, 'ALL') AS n_name,
       coalesce(o.o_orderpriority, 'ALL') AS o_orderpriority,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents,
       count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE(n.n_name, o.o_orderpriority)
"""


def q_part_median_price(sf_dir: str):
    """Exact per-group median at HIGH group cardinality: the median
    lineitem extended price (cents) per part key. ``price_quantiles``'
    value-histogram partials compress only when (group, value) repeats;
    at partkey grain the histogram is as large as the input, so the
    scalable plan flips to co-location — ONE explicit hash exchange by
    l_partkey (``bucketed_reduce``), then a vectorized lexsort +
    group-boundary pick per bucket. Per-bucket memory is bounded by
    raising B, and no single group needs to fit anywhere but its own
    bucket. Median contract: the lower median ``sorted[(n-1)//2]``,
    DuckDB's ``quantile_disc(x, 0.5)``."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"].cast(pa.int64()),
            "cents": _cents(t["l_extendedprice"]),
        })

    def median_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_partkey": pa.nulls(0, pa.int64()),
                             "n_items": pa.nulls(0, pa.int64()),
                             "median_cents": pa.nulls(0, pa.int64())})
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        v = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        cnt = np.diff(np.r_[starts, len(k)])
        return pa.table({
            "l_partkey": pa.array(k[starts].astype(np.int64)),
            "n_items": pa.array(cnt.astype(np.int64)),
            "median_cents": pa.array(v[starts + (cnt - 1) // 2].astype(np.int64)),
        })

    return bucketed_reduce(li.map_batches(cents, batch_format="pyarrow"),
                           "l_partkey", median_bucket)


SQL_PART_MEDIAN_PRICE = """
SELECT l_partkey::BIGINT AS l_partkey,
       count(*)::BIGINT AS n_items,
       quantile_disc(round(l_extendedprice * 100)::BIGINT, 0.5) AS median_cents
FROM lineitem GROUP BY 1
"""


BIG_SPENDER_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")
BIG_SPENDER_CUTOFF = "2000-01-01"


def q_big_spenders(sf_dir: str):
    """TPC-H Q22 shape — scalar-subquery decorrelation + NOT EXISTS:
    per market segment, the count and total balance of customers whose
    balance beats the GLOBAL positive-balance average for those
    segments and who have no order since the cutoff (the synth data
    gives every customer SOME order, so the plain "never ordered"
    predicate would be degenerate-empty). The scalar subquery folds to
    two integers via per-batch partials (sum cents, count) — broadcast
    for free in the driver closure; the above-average comparison stays
    exact as ``cents * n > sum`` (no IEEE average); the NOT EXISTS is
    the B-wide ``bucketed_anti_join`` against post-cutoff order
    custkeys (the date filter pushed into the read batches before the
    exchange); the final per-segment aggregate folds O(blocks x 3)
    partials."""
    from .pipelines.relational import bucketed_anti_join

    segs = list(BIG_SPENDER_SEGMENTS)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])

    def seg_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["c_mktsegment"], value_set=pa.array(segs)))
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_mktsegment": t["c_mktsegment"],
            "cents": _cents(t["c_acctbal"]),
        })

    in_segs = cust.map_batches(seg_cents, batch_format="pyarrow")

    def avg_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["cents"], 0))
        return pa.table({
            "s": pa.array([pc.sum(pos["cents"]).as_py() or 0], pa.int64()),
            "n": pa.array([pos.num_rows], pa.int64()),
        })

    fold = in_segs.map_batches(avg_partial, batch_format="pyarrow").to_pandas()
    s, n = int(fold["s"].sum()), int(fold["n"].sum())

    rich = in_segs.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(
            t["cents"].cast(pa.int64()), pa.scalar(n, pa.int64())),
            pa.scalar(s, pa.int64()))),
        batch_format="pyarrow",
    )
    cutoff = np.datetime64(BIG_SPENDER_CUTOFF, "us")

    def recent_keys(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            t["o_orderdate"], pa.scalar(cutoff, t["o_orderdate"].type))
        return t.filter(keep).select(["o_custkey"]).rename_columns(
            ["c_custkey"])

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        recent_keys, batch_format="pyarrow")
    never_ordered = bucketed_anti_join(rich, okeys, key="c_custkey")

    def seg_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["c_mktsegment"], use_threads=False).aggregate(
            [("cents", "sum"), ("c_custkey", "count")])

    parts = never_ordered.map_batches(
        seg_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # all-empty blocks arrive schema-less (quirk l)
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_custs": pd.Series([], dtype="int64"),
                             "bal_cents": pd.Series([], dtype="int64")})
    out = parts.groupby("c_mktsegment", as_index=False).agg(
        n_custs=("c_custkey_count", "sum"), bal_cents=("cents_sum", "sum"))
    return out.astype({"n_custs": "int64", "bal_cents": "int64"})


SQL_BIG_SPENDERS = f"""
WITH g AS (
  SELECT sum(round(c_acctbal * 100)::BIGINT) AS s, count(*)::BIGINT AS n
  FROM customer
  WHERE c_mktsegment IN {BIG_SPENDER_SEGMENTS!r} AND round(c_acctbal * 100) > 0
)
SELECT c_mktsegment,
       count(*)::BIGINT AS n_custs,
       sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS bal_cents
FROM customer, g
WHERE c_mktsegment IN {BIG_SPENDER_SEGMENTS!r}
  AND round(c_acctbal * 100)::BIGINT * g.n > g.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{BIG_SPENDER_CUTOFF}')
GROUP BY 1
"""


def q_monthly_growth(sf_dir: str):
    """LAG window over an aggregated series: monthly order revenue with
    the previous month's revenue and the month-over-month delta.
    Per-batch partials (<= |months| rows each: strftime + Arrow
    group_by) fold O(blocks x months) on the driver; the lag itself
    runs over the folded ~24-row series, so the window costs nothing
    beyond the base aggregation. First month's prev/delta are NULL,
    exactly as ``lag() OVER (ORDER BY month)``."""
    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.strftime(t["o_orderdate"], format="%Y-%m")
        g = pa.table({"month": m, "cents": _cents(t["o_totalprice"])})
        return g.group_by(["month"], use_threads=False).aggregate(
            [("cents", "sum")])

    parts = ords.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = parts.groupby("month", as_index=False).agg(
        rev_cents=("cents_sum", "sum")).sort_values("month")
    rev = m["rev_cents"].to_numpy(np.int64)
    if len(rev) == 0:
        return pa.table({"month": pa.array([], pa.string()),
                         "rev_cents": pa.array([], pa.int64()),
                         "prev_cents": pa.array([], pa.int64()),
                         "delta_cents": pa.array([], pa.int64())})
    prev = np.r_[0, rev[:-1]]
    return pa.table({
        "month": pa.array(m["month"].tolist(), pa.string()),
        "rev_cents": pa.array(rev),
        "prev_cents": pa.array([None, *prev[1:].tolist()], pa.int64()),
        "delta_cents": pa.array(
            [None, *(rev[1:] - prev[1:]).tolist()], pa.int64()),
    })


SQL_MONTHLY_GROWTH = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
  FROM orders GROUP BY 1
)
SELECT month, rev_cents,
       lag(rev_cents) OVER (ORDER BY month) AS prev_cents,
       (rev_cents - lag(rev_cents) OVER (ORDER BY month))::BIGINT AS delta_cents
FROM m
"""


def q_media_frames(sf_dir: str):
    """Multimodal fan-out plumbing: crawl pages -> media worklist ->
    actor-pool fetch -> ``VideoFrameSampler`` (one binary row fans out
    to N frame rows; failed fetches emit zero). Payloads are dropped at
    the sampler boundary, so only fixed-width frame records travel
    downstream — the flat_map shape frame-level dedup/captioning needs.
    Small ``batch_size`` because rows carry binaries (memory-aware
    sizing)."""
    from .htmlx import parse_document
    from .pipelines.media import (MediaFetcher, VideoFrameSampler,
                                  media_refs_from_docs)
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table(
        {"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)}
    )
    work = media_refs_from_docs(docs)
    fetched = rd.from_arrow(work).map_batches(
        MediaFetcher, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return fetched.map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=64, concurrency=2
    )


@functools.lru_cache(maxsize=1)
def _media_frames_sql() -> str:
    """q_media_frames' expected output restated as a SQL VALUES literal —
    the ``_media_sql`` precedent: the kernels are deterministic but
    blake2b is not SQL-computable, so the oracle is the SEQUENTIAL
    (single-process, no Ray) application of the same kernels and the
    driver check verifies the distributed fan-out reproduces it
    row-for-row. Valid at sf0.01, the driver's correctness scale."""
    from .htmlx import parse_document
    from .pipelines.media import (MediaFetcher, VideoFrameSampler,
                                  media_refs_from_docs)
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)   # config shape only, no reads
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table(
        {"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)}
    )
    t = VideoFrameSampler()(MediaFetcher()(media_refs_from_docs(docs)))

    def esc(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n".join(
        "(%s, %s, %d, %d, %s)" % (
            esc(r["doc_id"]), esc(r["media_ref"]), r["frame_idx"],
            r["ts_ms"], esc(r["frame_feature"]),
        )
        for r in t.to_pylist()
    )
    return f"""
SELECT doc_id, media_ref, frame_idx::INTEGER AS frame_idx,
       ts_ms::BIGINT AS ts_ms, frame_feature
FROM (VALUES {rows})
  AS t(doc_id, media_ref, frame_idx, ts_ms, frame_feature)
"""


def q_media_audio(sf_dir: str):
    """Audio-chunk plumbing — the audio leg of the multimodal family:
    crawl pages -> media worklist -> actor-pool fetch ->
    ``AudioChunker`` (one binary row fans out to N fixed-stride chunk
    rows with RMS/feature metadata; failed fetches emit zero). Payloads
    drop at the chunker boundary; small ``batch_size`` because input
    rows carry binaries (memory-aware sizing)."""
    from .htmlx import parse_document
    from .pipelines.media import (AudioChunker, MediaFetcher,
                                  media_refs_from_docs)
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table(
        {"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)}
    )
    work = media_refs_from_docs(docs)
    fetched = rd.from_arrow(work).map_batches(
        MediaFetcher, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return fetched.map_batches(
        AudioChunker, batch_format="pyarrow", batch_size=64, concurrency=2
    )


@functools.lru_cache(maxsize=1)
def _media_audio_sql() -> str:
    """q_media_audio's expected output as a SQL VALUES literal — the
    ``_media_frames_sql`` precedent: blake2b is not SQL-computable, so
    the oracle is the SEQUENTIAL (single-process, no Ray) application
    of the same kernels; the driver check verifies the distributed
    fan-out reproduces it row-for-row. Valid at sf0.01."""
    from .htmlx import parse_document
    from .pipelines.media import (AudioChunker, MediaFetcher,
                                  media_refs_from_docs)
    from .stages.parse import build_spans_column
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)   # config shape only, no reads
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, 0) for i in range(cfg.world.n_hosts)]
    span_lists, ids = [], []
    for u in urls:
        res = parse_document(world.gen_page(u), u)
        span_lists.append(res.spans)
        ids.append(u)
    docs = pa.table(
        {"doc_id": pa.array(ids), "spans": build_spans_column(span_lists)}
    )
    t = AudioChunker()(MediaFetcher()(media_refs_from_docs(docs)))

    def esc(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n".join(
        "(%s, %s, %d, %d, %d, %d, %s)" % (
            esc(r["doc_id"]), esc(r["media_ref"]), r["chunk_idx"],
            r["start_ms"], r["duration_ms"], r["rms"],
            esc(r["chunk_feature"]),
        )
        for r in t.to_pylist()
    )
    return f"""
SELECT doc_id, media_ref, chunk_idx::INTEGER AS chunk_idx,
       start_ms::BIGINT AS start_ms, duration_ms::BIGINT AS duration_ms,
       rms::BIGINT AS rms, chunk_feature
FROM (VALUES {rows})
  AS t(doc_id, media_ref, chunk_idx, start_ms, duration_ms, rms, chunk_feature)
"""


def q_props_stats(sf_dir: str):
    """JSON extraction over a string column (§2.8 JSON): pull the ``k``
    field out of events' JSON ``props`` and aggregate per event type.
    The parse is ONE vectorized Arrow kernel per batch
    (``pc.extract_regex`` -> struct field -> int cast), never a Python
    json.loads loop; per-batch partials reduce to <= |event types| rows
    and the driver fold is O(blocks x types)."""
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        g = pa.table({"event_type": t["event_type"], "k": k})
        return g.group_by(["event_type"], use_threads=False).aggregate(
            [("k", "sum"), ("k", "max"), ("k", "count")])

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n_events=("k_count", "sum"), k_total=("k_sum", "sum"),
        k_max=("k_max", "max"))
    return out.astype({"n_events": "int64", "k_total": "int64",
                       "k_max": "int64"})


SQL_PROPS_STATS = """
SELECT event_type,
       count(json_extract(props, '$.k'))::BIGINT AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_total,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_max
FROM events GROUP BY 1
"""


def q_value_quantiles(sf_dir: str):
    """Exact GLOBAL quantiles (p50/p90/p99) of event value cents via
    iterative histogram refinement (``stats.exact_quantiles_hist``) —
    the scale regime price_quantiles' sort-the-distinct-values plan
    can't reach: no group key to amortize the sort and a near-unique
    continuous domain. Each pass streams one O(bins)-partial scan; a
    cents domain resolves in 2 passes and nothing row-shaped reaches
    the driver."""
    from .pipelines.stats import exact_quantiles_hist

    ev = _read(sf_dir, "events", ["value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(t["value"])})

    return exact_quantiles_hist(
        ev.map_batches(cents, batch_format="pyarrow"), "cents",
        [500, 900, 990],
    )


SQL_VALUE_QUANTILES = """
WITH t AS (SELECT round(value * 100)::BIGINT AS cents FROM events
           WHERE value IS NOT NULL),
c AS (SELECT cents, count(*)::BIGINT AS n FROM t GROUP BY 1),
w AS (SELECT cents,
             sum(n) OVER (ORDER BY cents) AS cum,
             sum(n) OVER () AS tot
      FROM c),
q AS (SELECT unnest([500, 900, 990]) AS q_pm)
SELECT q.q_pm::BIGINT AS q_pm, min(w.cents) AS cents
FROM w CROSS JOIN q
WHERE w.cum >= (q.q_pm * w.tot + 999) // 1000
GROUP BY 1
"""


def q_trimmed_stats(sf_dir: str):
    """Quantile-trimmed corpus stats — the standard length-outlier
    filter of a training-data pipeline: PASS 1 resolves the exact
    p05/p95 ``n_chars`` cutoffs by histogram refinement
    (``stats.exact_quantiles_hist``: O(blocks x bins) integer partials,
    nothing row-shaped on the driver); the two ints ride the closure
    into PASS 2, one more streaming scan that keeps
    ``p05 <= n_chars <= p95`` and folds per-source survivor counts +
    total chars. Two bounded passes where a sort-based trim would be
    an all-to-all shuffle of the whole corpus."""
    from .pipelines.stats import exact_quantiles_hist

    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    cuts = exact_quantiles_hist(
        docs.select_columns(["n_chars"]), "n_chars", [50, 950])
    by_pm = dict(zip(cuts["q_pm"].to_pylist(), cuts["n_chars"].to_pylist()))
    lo, hi = int(by_pm[50]), int(by_pm[950])

    def partial(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((nc >= lo) & (nc <= hi)))
        part = t.group_by(["source"]).aggregate(
            [("n_chars", "count"), ("n_chars", "sum")])
        return part.rename_columns(["source", "n_docs", "total_chars"])

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
        .astype({"n_docs": "int64", "total_chars": "int64"})
    )


SQL_TRIMMED_STATS = """
WITH c AS (SELECT n_chars, count(*)::BIGINT AS n FROM documents GROUP BY 1),
w AS (SELECT n_chars,
             sum(n) OVER (ORDER BY n_chars) AS cum,
             sum(n) OVER () AS tot
      FROM c),
lo AS (SELECT min(n_chars) AS v FROM w WHERE cum >= (50 * tot + 999) // 1000),
hi AS (SELECT min(n_chars) AS v FROM w WHERE cum >= (950 * tot + 999) // 1000)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS total_chars
FROM documents d, lo, hi
WHERE d.n_chars BETWEEN lo.v AND hi.v
GROUP BY d.source
"""


def q_user_day_stats(sf_dir: str):
    """COMPOSITE-key join: per (user_id, day) click counts inner-joined
    to per (user_id, day) purchase cents — the days a user both clicked
    AND purchased, with both measures. Each side pre-aggregates per
    batch (<= |(user, day)| partial rows) and then folds through a
    Dataset groupby; the join is ``bucketed_hash_join`` on the
    two-column key (bucketing on user_id alone routes composite-equal
    rows together; the per-bucket Acero join matches on both). The
    partial fold avoids the Dataset groupby (the tiny-group Aggregate
    sort-map pathology) via ``bucketed_reduce`` keyed on user_id —
    composite-equal partials share a user, so a per-bucket pandas
    groupby is globally correct."""
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    def side(event_type: str, out_col: str, agg: str):
        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], event_type))
            g = pa.table({
                "user_id": t["user_id"],
                "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                "m": _cents(t["value"]) if agg == "sum"
                else pa.array(np.ones(t.num_rows, np.int64)),
            })
            return g.group_by(["user_id", "day"],
                              use_threads=False).aggregate([("m", "sum")])

        def fold(t: pa.Table) -> pa.Table:
            df = t.to_pandas().groupby(
                ["user_id", "day"], as_index=False)["m_sum"].sum()
            return pa.table({
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
                "day": pa.array(df["day"], pa.string()),
                out_col: pa.array(df["m_sum"].to_numpy(np.int64)),
            })

        ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
        parts = ds.map_batches(partial, batch_format="pyarrow")
        return bucketed_reduce(parts, "user_id", fold, n_buckets=8)

    clicks = side("click", "n_clicks", "count")
    buys = side("purchase", "purchase_cents", "sum")
    return bucketed_hash_join(clicks, buys, key=["user_id", "day"],
                              n_buckets=8)


SQL_USER_DAY_STATS = """
WITH c AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         count(*)::BIGINT AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
p AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         sum(round(value * 100)::BIGINT)::BIGINT AS purchase_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.user_id, c.day, c.n_clicks, p.purchase_cents
FROM c JOIN p ON c.user_id = p.user_id AND c.day = p.day
"""


WEIGHTED_SAMPLE_K = 20
_WS_MOD = 1 << 62


def q_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED per-group sampling: per source, the
    ``k`` documents with the smallest integer priority ``md5(id) //
    n_chars`` — longer documents draw proportionally smaller priorities,
    so the sample upweights them, yet membership stays a pure function
    of (salt, doc_id, weight): resume-stable and restatable in SQL with
    exact integer ops (an integer lowering of priority-key weighted
    sampling; same md5 contract as split/fingerprint/corpus_mix).
    Distributed shape = ``grouped_topk`` on the negated priority: at
    most k candidate rows per (batch, group) ever shuffle."""
    from .pipelines.relational import grouped_topk

    def keyed(t: pa.Table) -> pa.Table:
        from .util import md5_id_bucket

        t = t.filter(pc.greater(t["n_chars"], 0))
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_id_bucket("wsample-v1", t["doc_id"].to_pylist(), _WS_MOD)
        pri = h // w
        return pa.table({
            "source": t["source"],
            "doc_id": t["doc_id"],
            "n_chars": t["n_chars"],
            "priority": pa.array(pri),
            "neg": pa.array(-pri),
        })

    keyed_ds = _read(sf_dir, "documents",
                     ["doc_id", "source", "n_chars"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    top = grouped_topk(keyed_ds, group_keys=["source"], value="neg",
                       tiebreak="doc_id", k=WEIGHTED_SAMPLE_K)
    return top.map_batches(lambda t: t.drop_columns(["neg"]),
                           batch_format="pyarrow")


SQL_WEIGHTED_SAMPLE = f"""
SELECT source, doc_id, n_chars,
       ((md5_number_upper('wsample-v1:' || doc_id::VARCHAR)::HUGEINT
         % {_WS_MOD})::BIGINT // n_chars) AS priority
FROM documents
WHERE n_chars > 0
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY priority, doc_id) <= {WEIGHTED_SAMPLE_K}
"""


FUZZY_DECON_MOD = 10


def q_fuzzy_decontaminate(sf_dir: str):
    """Fuzzy (MinHash-LSH) decontamination: verified near-dup pairs
    between the training corpus and the held-out eval slice
    (``doc_id % 10 == 0`` — membership a pure function of the id, so
    the oracle restates it). The fuzzy complement of the exact 5-gram
    ``decontaminate``; candidates are ALL cross-side band collisions
    (asymmetric composite-key band join — NOT the symmetric chain
    pairing, which can bridge a train-eval pair through another train
    doc and hide the edge). ``token_hash="md5"`` so the whole chain is
    SQL-restatable, exactly like ``minhash_dedup``."""
    from .pipelines.dedup import fuzzy_decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return fuzzy_decontaminate(docs, eval_mod=FUZZY_DECON_MOD,
                               jaccard_threshold=MINHASH_JACCARD_THRESHOLD,
                               token_hash="md5")


def _fuzzy_decontaminate_sql() -> str:
    return "WITH " + _minhash_common_ctes() + f""",
cand AS (
  SELECT DISTINCT t.doc_id AS a, e.doc_id AS b
  FROM bh t JOIN bh e
    ON t.band_id = e.band_id AND t.band_hash = e.band_hash
  WHERE t.doc_id % {FUZZY_DECON_MOD} <> 0 AND e.doc_id % {FUZZY_DECON_MOD} = 0
),
verify AS (
  SELECT p.a, p.b,
         len(list_intersect(xa.sh, xb.sh)) AS ni,
         len(xa.sh) + len(xb.sh) - len(list_intersect(xa.sh, xb.sh)) AS nu
  FROM cand p
  JOIN shl xa ON xa.doc_id = p.a
  JOIN shl xb ON xb.doc_id = p.b
)
SELECT a::BIGINT AS train_id, b::BIGINT AS eval_id,
       (CASE WHEN nu = 0 THEN 1.0 ELSE ni::DOUBLE / nu END) AS jaccard
FROM verify
WHERE (CASE WHEN nu = 0 THEN 1.0 ELSE ni::DOUBLE / nu END)
      >= {MINHASH_JACCARD_THRESHOLD}
"""


TRIANGLE_PART_MOD = 5


def q_triangle_counts(sf_dir: str):
    """Per-node triangle counts of the co-purchase graph (parts sharing
    an order; restricted to ``l_partkey % 5 == 0`` to bound the graph
    — a pure-function predicate the oracle restates). Completes the
    graph family (PageRank, connected components, triangles) with the
    node-iterator-with-orientation plan: group-colocated edge build →
    lowest-vertex wedge generation → composite-key close join → bounded
    per-node count fold (``graph.triangle_counts``)."""
    from .pipelines.graph import triangle_counts

    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")
    out = triangle_counts(li, group="l_orderkey", node="l_partkey")
    return out.map_batches(
        lambda t: t.rename_columns(["l_partkey", "n_triangles"]),
        batch_format="pyarrow",
    )


SQL_TRIANGLE_COUNTS = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % {TRIANGLE_PART_MOD} = 0),
pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
),
wedges AS (SELECT e1.a AS p, e1.b AS x, e2.b AS y
           FROM pairs e1 JOIN pairs e2 ON e1.a = e2.a AND e1.b < e2.b),
tris AS (SELECT w.p, w.x, w.y FROM wedges w
         JOIN pairs e ON e.a = w.x AND e.b = w.y),
nodes AS (SELECT p AS part FROM tris
          UNION ALL SELECT x FROM tris
          UNION ALL SELECT y FROM tris)
SELECT part::BIGINT AS l_partkey, count(*)::BIGINT AS n_triangles
FROM nodes GROUP BY 1
"""


def q_grouped_distinct(sf_dir: str):
    """Keyed HyperLogLog: approximate distinct users PER event type in
    one streaming pass (``sketch.grouped_approx_distinct``) — the
    sketch-per-key scale path where the exact grouped count-distinct
    would shuffle every key. Only O(blocks x groups) 4 KiB register
    rows ever cross the cluster; register-max merging is exact so the
    estimate is reproducible bit-for-bit."""
    from .pipelines.sketch import grouped_approx_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_approx_distinct(ev, "event_type", "user_id", p=HLL_P)


def _grouped_distinct_expected_table() -> pa.Table:
    """Sequential restatement of ``q_grouped_distinct`` at sf0.01: fold
    each group's whole column through the SAME HLL kernels in one
    process (register-max merging is exact, so the distributed
    per-block fold must reproduce this bit-for-bit)."""
    import pyarrow.parquet as pq

    from .pipelines.sketch import _hll_fold, hash_col, hll_estimate

    t = pq.read_table(f"{_ORACLE_SF_DIR}/events.parquet",
                      columns=["event_type", "user_id"])
    keys = t["event_type"].to_pandas().to_numpy()
    h = hash_col(t["user_id"])
    uniq = sorted(np.unique(keys).tolist())
    return pa.table({
        "event_type": pa.array(uniq, pa.string()),
        "approx_n": pa.array(
            [int(round(hll_estimate(_hll_fold(h[keys == g], HLL_P))))
             for g in uniq], pa.int64()),
    })


def _grouped_distinct_sql() -> str:
    return _values_sql(_grouped_distinct_expected_table(),
                       casts={"approx_n": "BIGINT"})


def q_distinct_users(sf_dir: str):
    """EXACT distinct users per event type — the all-hot-keys grouped
    count-distinct (5 groups x billions of rows at scale). The naive
    plan caps parallelism at 5 reducers; ``salted_distinct_count``
    salts the exchange with the VALUE hash so every reducer carries a
    slice of every group, and only per-bucket partial counts
    (B x 5 rows) reach the final sum. Complements ``grouped_distinct``
    (the keyed-HLL approximate path) with the exact path."""
    from .pipelines.relational import salted_distinct_count

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return salted_distinct_count(ev, "event_type", "user_id",
                                 count_name="distinct_users")


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
FROM events GROUP BY event_type
"""


def q_rank_normalize(sf_dir: str):
    """Per-group percent-rank feature transform (per-mille integer
    ``(rank-1)*1000 // (n-1)`` of n_chars within each lang) WITHOUT
    co-locating any group — langs are few and huge, so an exchange by
    lang would cap parallelism at |langs|. Instead PASS 1 folds
    per-batch (lang, n_chars, count) histogram partials (bounded by
    langs x distinct lengths, independent of row count); the driver
    turns them into per-(lang, value) cumulative ranks — rank(v) =
    cum(<v) + 1, exactly SQL ``rank()`` under ties — and PASS 2 maps
    every doc through the broadcast rank table. Single-doc groups get
    NULL (SQL's n-1 = 0 divisor)."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return g.rename_columns(["lang", "n_chars", "n"])

    hist = (docs.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["lang", "n_chars"], as_index=False)["n"].sum()
            .sort_values(["lang", "n_chars"]))
    hist["cum_below"] = (hist.groupby("lang")["n"].cumsum() - hist["n"])
    totals = hist.groupby("lang")["n"].transform("sum")
    pr_pm = (hist["cum_below"] * 1000) // (totals - 1)
    rank_table = pd.DataFrame({
        "lang": hist["lang"],
        "n_chars": hist["n_chars"].astype("int64"),
        "pr_pm": pr_pm.where(totals > 1).astype("Int64"),
    })
    rank_ref = ray.put(rank_table)

    class RankMapper:
        def __init__(self, ref):
            self.rank_table = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.rank_table, on=["lang", "n_chars"],
                            how="left")

    return docs.map_batches(
        RankMapper, fn_constructor_args=(rank_ref,),
        batch_format="pandas", concurrency=(1, 8),
    )


SQL_RANK_NORMALIZE = """
SELECT doc_id, lang, n_chars,
       ((rank() OVER (PARTITION BY lang ORDER BY n_chars) - 1) * 1000
        // nullif(count(*) OVER (PARTITION BY lang) - 1, 0))::BIGINT AS pr_pm
FROM documents
"""


def q_event_transitions(sf_dir: str):
    """Markov transition-matrix estimation over per-user event
    sequences — the LEAD window at scale: next-event pairs need each
    user's events ORDERED AND CO-LOCATED, so the plan is ONE
    ``bucketed_reduce`` exchange by user_id; the bucket kernel
    lexsorts (user, ts) once and takes vectorized adjacent pairs (a
    shifted equality mask, never a per-event loop), emitting
    <= |types|^2 partial rows per bucket; the driver folds
    O(buckets x 25) rows. Deterministic because (user_id, ts) is
    unique in the events table."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    empty = pa.table({"from_type": pa.nulls(0, pa.string()),
                      "to_type": pa.nulls(0, pa.string()),
                      "n": pa.nulls(0, pa.int64())})

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_pandas().to_numpy()
        order = np.lexsort((ts, u))
        u, et = u[order], et[order]
        same = u[:-1] == u[1:]
        frm, to = et[:-1][same], et[1:][same]
        if len(frm) == 0:
            return empty
        g = (pd.DataFrame({"from_type": frm, "to_type": to})
             .value_counts().reset_index(name="n"))
        return pa.table({
            "from_type": pa.array(g["from_type"], pa.string()),
            "to_type": pa.array(g["to_type"], pa.string()),
            "n": pa.array(g["n"].astype("int64")),
        })

    parts = bucketed_reduce(ev, "user_id", pairs, n_buckets=32).to_pandas()
    return (
        parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
        .astype({"n": "int64"})
    )


SQL_EVENT_TRANSITIONS = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts) AS next_type
           FROM events)
SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


def q_price_regression(sf_dir: str):
    """Distributed OLS (price ~ quantity) via SUFFICIENT STATISTICS —
    the ML-analytics pattern: the normal equations need only
    (n, Σx, Σy, Σxy, Σx²), which are LINEAR, so each block folds five
    int64 partials inside ``map_batches`` and the driver sums O(blocks)
    rows; no row ever moves. The slope/intercept contract is exact
    integer ppm — Python arbitrary-precision ints on the folded sums
    (n·Σxy overflows int64 at scale), floor-divided identically to the
    DuckDB HUGEINT restatement — so the comparison is bit-exact, never
    float-associative."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.round(t["l_quantity"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        y = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
        })

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy, sxy, sxx = (int(parts[c].sum())
                           for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope_ppm = (n * sxy - sx * sy) * 1_000_000 // (n * sxx - sx * sx)
    intercept_ppm = (sy * 1_000_000 - slope_ppm * sx) // n
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "slope_ppm": pd.Series([slope_ppm], dtype="int64"),
                         "intercept_ppm": pd.Series([intercept_ppm],
                                                    dtype="int64")})


SQL_PRICE_REGRESSION = """
WITH s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT))::HUGEINT AS sx,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::HUGEINT AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT))::HUGEINT AS sxy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT))::HUGEINT AS sxx
  FROM lineitem)
SELECT n::BIGINT AS n,
       ((n*sxy - sx*sy) * 1000000 // (n*sxx - sx*sx))::BIGINT AS slope_ppm,
       ((sy * 1000000
         - ((n*sxy - sx*sy) * 1000000 // (n*sxx - sx*sx)) * sx) // n)::BIGINT
           AS intercept_ppm
FROM s
"""


CM_QUERY_USERS = list(range(10))


def q_cm_user_counts(sf_dir: str):
    """Count-Min point-frequency estimates (users 0-9 over the events
    stream) — the LINEAR member of the synopsis family (HLL merges by
    max, Misra-Gries by reduce; CM simply ADDS): each block folds into
    one fixed 4 x 4096 integer table, the driver sums O(blocks) flat
    128 KiB tables (never a key), point reads are min-of-4 cells.
    Additive merging is exact, so the distributed estimate is
    bit-identical to a sequential fold — which is what the oracle
    restates."""
    from .pipelines.sketch import cm_point_estimates

    ev = _read(sf_dir, "events", ["user_id"])
    return cm_point_estimates(
        ev, "user_id", pa.array(CM_QUERY_USERS, pa.int64()))


def _cm_user_counts_expected_table() -> pa.Table:
    """Sequential restatement of ``q_cm_user_counts`` at sf0.01: fold the
    whole column through the SAME CM kernels in one process (additive
    merging is exact, so the distributed fold must reproduce this
    bit-for-bit — the ``grouped_distinct`` precedent)."""
    import pyarrow.parquet as pq

    from .pipelines.sketch import _cm_fold, _cm_row_idx, hash_col

    t = pq.read_table(f"{_ORACLE_SF_DIR}/events.parquet",
                      columns=["user_id"])
    h = hash_col(t["user_id"].drop_null().combine_chunks())
    d, w = 4, 1 << 12
    tbl = _cm_fold(h, d, w)
    keys = pa.array(CM_QUERY_USERS, pa.int64())
    kh = hash_col(keys)
    est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
    for r in range(d):
        est = np.minimum(est, tbl[r, _cm_row_idx(kh, r, w)])
    return pa.table({"user_id": keys, "est_n": pa.array(est, pa.int64())})


def _cm_user_counts_sql() -> str:
    return _values_sql(_cm_user_counts_expected_table(),
                       casts={"user_id": "BIGINT", "est_n": "BIGINT"})


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_stages(sf_dir: str):
    """Strict-order 3-stage funnel (view -> click -> purchase): how many
    users reach each stage, where stage k+1 must happen AT OR AFTER the
    first stage-k completion (the sequential-pattern analytics shape —
    ``q_conversion_lag`` is the 2-stage lag variant). Each user's whole
    history must be co-located, so ONE ``bucketed_reduce`` exchange by
    user_id; the bucket kernel lexsorts once and walks the funnel per
    USER with a searchsorted per stage, emitting a 3-int partial per
    bucket; the final fold is O(buckets)."""
    from .pipelines.relational import bucketed_reduce

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_in(t["event_type"],
                                value_set=pa.array(list(FUNNEL_STAGES))),
                       pc.is_valid(t["user_id"]))
        t = t.filter(keep)
        stage = np.zeros(t.num_rows, np.int8)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        for i, s in enumerate(FUNNEL_STAGES):
            stage[et == s] = i
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "stage": pa.array(stage, pa.int8())})

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
        pick, batch_format="pyarrow")

    def funnel_bucket(t: pa.Table) -> pa.Table:
        counts = np.zeros(len(FUNNEL_STAGES), np.int64)
        if t.num_rows:
            u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            ts = (t["ts"].to_numpy(zero_copy_only=False)
                  .astype("datetime64[us]").astype(np.int64))
            stg = t["stage"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ts, u))
            u, ts, stg = u[order], ts[order], stg[order]
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            ends = np.r_[starts[1:], len(u)]
            for s, e in zip(starts, ends):
                cut = np.iinfo(np.int64).min
                for k in range(len(FUNNEL_STAGES)):
                    seg = ts[s:e][stg[s:e] == k]
                    j = np.searchsorted(seg, cut)
                    if j == len(seg):
                        break
                    counts[k] += 1
                    cut = seg[j]
        return pa.table({"stage": pa.array(
            np.arange(1, len(FUNNEL_STAGES) + 1, dtype=np.int64)),
            "n_users": pa.array(counts, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["stage"]).aggregate([("n_users", "sum")])
        return pa.table({"stage": g["stage"],
                         "n_users": g["n_users_sum"].cast(pa.int64())})

    part = bucketed_reduce(ev, "user_id", funnel_bucket, n_buckets=8)
    return part.repartition(1).map_batches(final, batch_format="pyarrow")


SQL_FUNNEL_STAGES = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1)
SELECT 1::BIGINT AS stage, count(*)::BIGINT AS n_users FROM v
UNION ALL SELECT 2, count(*) FROM c
UNION ALL SELECT 3, count(*) FROM p
"""


def q_conversion_lag(sf_dir: str):
    """Funnel conversion lag: per user, the MICROSECONDS between their
    FIRST view and their first purchase AT OR AFTER that view (users who
    never convert are dropped; integer epoch-microsecond difference —
    exact in both engines, unlike date_diff's boundary-crossing count).
    The cross-event condition (purchase >= first view) can't be two
    independent aggregates — it needs every event of a user in one
    place, so the plan is ONE ``bucketed_reduce`` exchange by user_id;
    the bucket kernel loops over USERS (two numpy slices + a
    searchsorted each), never over events."""
    from .pipelines.relational import bucketed_reduce

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["view", "purchase"]))
        t = t.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "is_view": pc.equal(t["event_type"], "view"),
        })

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
        pick, batch_format="pyarrow")

    def lag_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.nulls(0, pa.int64()),
                             "lag_us": pa.nulls(0, pa.int64())})
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts = ts.astype(np.int64)
        isv = t["is_view"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, isv = u[order], ts[order], isv[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        users, lags = [], []
        for s, e in zip(starts, ends):
            seg_v = ts[s:e][isv[s:e]]
            if seg_v.size == 0:
                continue
            v0 = seg_v[0]                      # first view (ts sorted)
            seg_p = ts[s:e][~isv[s:e]]
            j = np.searchsorted(seg_p, v0)     # first purchase >= v0
            if j == len(seg_p):
                continue
            users.append(u[s])
            lags.append(seg_p[j] - v0)
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "lag_us": pa.array(lags, pa.int64())})

    return bucketed_reduce(ev, "user_id", lag_bucket, n_buckets=16)


SQL_CONVERSION_LAG = """
WITH v AS (
  SELECT user_id, min(ts) AS v0 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS p0
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.v0
  GROUP BY 1
)
SELECT v.user_id, (epoch_us(p.p0) - epoch_us(v.v0))::BIGINT AS lag_us
FROM v JOIN p ON v.user_id = p.user_id
"""


def q_part_price_mad(sf_dir: str):
    """Grouped MEDIAN ABSOLUTE DEVIATION — the robust dispersion partner
    of `part_median_price` (variance is moment-foldable; MAD is NOT, it
    needs two order statistics over the same group, so co-location is
    the only scalable plan): ONE hash exchange by part key, then each
    bucket computes med = lower median and mad = lower median of
    |cents − med| with two vectorized lexsort passes — no group ever
    leaves its bucket, no second exchange. Contract: lower medians
    (``quantile_disc 0.5``) end to end, exact int64 cents."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"].cast(pa.int64()),
            "cents": _cents(t["l_extendedprice"]),
        })

    def mad_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_partkey": pa.nulls(0, pa.int64()),
                          "n_items": pa.nulls(0, pa.int64()),
                          "median_cents": pa.nulls(0, pa.int64()),
                          "mad_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        v = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.diff(np.r_[starts, len(ks)])
        med = vs[starts + (cnt - 1) // 2]
        # per-row group index -> |x - group median|, second order-stat pass
        gid = np.cumsum(np.r_[False, ks[1:] != ks[:-1]])
        dev = np.abs(vs - med[gid])
        order2 = np.lexsort((dev, ks))
        mad = dev[order2][starts + (cnt - 1) // 2]
        return pa.table({
            "l_partkey": pa.array(ks[starts].astype(np.int64)),
            "n_items": pa.array(cnt.astype(np.int64)),
            "median_cents": pa.array(med.astype(np.int64)),
            "mad_cents": pa.array(mad.astype(np.int64)),
        })

    return bucketed_reduce(li.map_batches(cents, batch_format="pyarrow"),
                           "l_partkey", mad_bucket)


SQL_PART_PRICE_MAD = """
WITH c AS (
  SELECT l_partkey::BIGINT AS pk,
         round(l_extendedprice * 100)::BIGINT AS cents
  FROM lineitem
), m AS (
  SELECT pk, count(*)::BIGINT AS n_items,
         quantile_disc(cents, 0.5) AS med
  FROM c GROUP BY pk
)
SELECT c.pk AS l_partkey,
       any_value(m.n_items) AS n_items,
       any_value(m.med) AS median_cents,
       quantile_disc(abs(c.cents - m.med), 0.5) AS mad_cents
FROM c JOIN m ON c.pk = m.pk
GROUP BY c.pk
"""


def q_price_correlation(sf_dir: str):
    """Grouped PEARSON CORRELATION via integer sufficient statistics —
    the bivariate member of the `price_regression`/`priority_variance`
    family: per returnflag, corr(quantity, price) needs only the six
    LINEAR partials (n, Σx, Σy, Σxy, Σx², Σy²), folded per batch with a
    C-level arrow group_by, O(blocks x groups) rows to the driver.
    corr itself needs a sqrt, so the EXACT contract is corr² in ppm —
    corr2_ppm = (nΣxy−ΣxΣy)²·10⁶ // ((nΣx²−Σx²)(nΣy²−Σy²)) in Python
    big-ints — plus the covariance sign, both HUGEINT-restatable
    bit-for-bit (y in whole dollars keeps the oracle inside 128 bits
    with 8 orders of magnitude headroom at the gate's sf)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.round(t["l_quantity"]).cast(pa.int64())
        y = pc.round(t["l_extendedprice"]).cast(pa.int64())
        tmp = pa.table({
            "flag": t["l_returnflag"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "sx": x, "sy": y,
            "sxy": pc.multiply(x, y),
            "sxx": pc.multiply(x, x),
            "syy": pc.multiply(y, y),
        })
        return tmp.group_by(["flag"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["flag"], [0] * 6)
        for i, c in enumerate(("n", "sx", "sy", "sxy", "sxx", "syy")):
            a[i] += int(r[f"{c}_sum"])
    keys = sorted(acc)
    sign, corr2 = [], []
    for k in keys:
        n, sx, sy, sxy, sxx, syy = acc[k]
        num = n * sxy - sx * sy
        sign.append(0 if num == 0 else (1 if num > 0 else -1))
        corr2.append(num * num * 1_000_000
                     // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return pa.table({
        "flag": pa.array(keys, pa.string()),
        "n": pa.array([acc[k][0] for k in keys], pa.int64()),
        "cov_sign": pa.array(sign, pa.int64()),
        "corr2_ppm": pa.array(corr2, pa.int64()),
    })


SQL_PRICE_CORRELATION = """
WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT flag, count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         sum(x * y)::HUGEINT AS sxy,
         sum(x * x)::HUGEINT AS sxx,
         sum(y * y)::HUGEINT AS syy
  FROM b GROUP BY flag
)
SELECT flag, n::BIGINT AS n,
       CASE WHEN n*sxy - sx*sy > 0 THEN 1
            WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 0 END::BIGINT AS cov_sign,
       ((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000
        // ((n*sxx - sx*sx) * (n*syy - sy*sy)))::BIGINT AS corr2_ppm
FROM s
"""


def q_dedup_spans(sf_dir: str):
    """Exact substring dedup as a TRANSFORM (Lee et al. 2022): every
    token span covered by a word-5-gram occurring in >= 2 distinct docs
    is REMOVED and the document rewritten. Gram strings never shuffle —
    each batch hashes grams to the md5-upper-8 61-bit domain locally, so
    the two exchanges carry only fixed-width (doc_id, pos, h) rows, and
    the payload text moves exactly once (a left join straight into its
    rewrite task). Complements ``shared_ngrams`` (the per-doc STAT form)
    with the removal semantics a training-data pipeline actually runs."""
    from .pipelines.dedup import dedup_spans

    return dedup_spans(_read(sf_dir, "documents", ["doc_id", "text"]), n=5)


SQL_DEDUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text)='' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
), grams AS (
  SELECT doc_id, i,
         (md5_number_upper('dupspan:' || array_to_string(ts[i:i+4], ' '))::HUGEINT
          % 2305843009213693951)::BIGINT AS h
  FROM toks, unnest(range(1, len(ts) - 3)) AS r(i)
), dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, i FROM grams JOIN dup USING (h)),
covered AS (SELECT DISTINCT doc_id, i + o AS j
            FROM hits, unnest(range(0, 5)) AS r2(o)),
tok_rows AS (SELECT doc_id, j, ts[j] AS tok
             FROM toks, unnest(range(1, len(ts) + 1)) AS r3(j))
SELECT t.doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN c.j IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN c.j IS NULL THEN t.tok END,
                           ' ' ORDER BY t.j), '') AS clean_text
FROM tok_rows t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.j = c.j
GROUP BY t.doc_id
"""


def q_chi_square(sf_dir: str):
    """Chi-square INDEPENDENCE statistic over the lang x source
    contingency of documents — the corpus-drift / dependence check a
    training-data pipeline runs before mixing sources. Only per-batch
    (lang, source) COUNT partials leave the workers (a C-level arrow
    group_by, O(blocks x cells) tiny rows); margins, expectations and
    the per-cell statistic are exact Python big-int math on the driver.
    The EXACT contract (chi2 needs a division per cell, so floats are
    banned): per cell of the FULL observed-margins cross product,
    expected_milli = R*C*1000 // N and
    chi2_ppm = (N*O - R*C)^2 * 10^6 // (N*R*C) — both HUGEINT-restatable
    bit-for-bit (N <= ~1e6 keeps the numerator under 1e30 << 2^127)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["lang", "source"]).aggregate([([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    obs: dict[tuple[str, str], int] = {}
    for r in parts:
        k = (r["lang"], r["source"])
        obs[k] = obs.get(k, 0) + int(r["count_all"])
    row_m: dict[str, int] = {}
    col_m: dict[str, int] = {}
    for (lg, src), c in obs.items():
        row_m[lg] = row_m.get(lg, 0) + c
        col_m[src] = col_m.get(src, 0) + c
    n = sum(obs.values())
    cols: dict[str, list] = {k: [] for k in (
        "lang", "source", "observed", "expected_milli", "chi2_ppm")}
    for lg in sorted(row_m):
        for src in sorted(col_m):
            o = obs.get((lg, src), 0)
            rc = row_m[lg] * col_m[src]
            d = n * o - rc
            cols["lang"].append(lg)
            cols["source"].append(src)
            cols["observed"].append(o)
            cols["expected_milli"].append(rc * 1000 // n)
            cols["chi2_ppm"].append(d * d * 1_000_000 // (n * rc))
    return pa.table({
        "lang": pa.array(cols["lang"], pa.string()),
        "source": pa.array(cols["source"], pa.string()),
        "observed": pa.array(cols["observed"], pa.int64()),
        "expected_milli": pa.array(cols["expected_milli"], pa.int64()),
        "chi2_ppm": pa.array(cols["chi2_ppm"], pa.int64()),
    })


SQL_CHI_SQUARE = """
WITH o AS (
  SELECT lang, source, count(*)::HUGEINT AS c
  FROM documents GROUP BY lang, source
), r AS (SELECT lang, sum(c)::HUGEINT AS rc FROM o GROUP BY lang),
   s AS (SELECT source, sum(c)::HUGEINT AS cc FROM o GROUP BY source),
   n AS (SELECT sum(c)::HUGEINT AS n FROM o)
SELECT r.lang, s.source,
       coalesce(o.c, 0)::BIGINT AS observed,
       (r.rc * s.cc * 1000 // n.n)::BIGINT AS expected_milli,
       ((n.n * coalesce(o.c, 0) - r.rc * s.cc)
        * (n.n * coalesce(o.c, 0) - r.rc * s.cc) * 1000000
        // (n.n * r.rc * s.cc))::BIGINT AS chi2_ppm
FROM r CROSS JOIN s CROSS JOIN n
LEFT JOIN o ON o.lang = r.lang AND o.source = s.source
"""


def q_value_outliers(sf_dir: str):
    """Grouped z-score OUTLIER detection without a sqrt or a float in
    the contract: per event type, flag rows whose squared z exceeds 9
    (|z| > 3) via the all-integer dominance form
    (n*x - Σx)² > 9·(n*Σx² - (Σx)²). Two streaming passes: (1) per-batch
    moment partials (n, Σx, Σx²) via a C-level arrow group_by, folded to
    exact big-int moments on the driver (O(blocks x types) tiny rows);
    (2) the moments broadcast back into a vectorized filter — float64
    prefilter at 8.999 (the exact statistic is within 1e-12 relative of
    the float one, so no true z>3 row can fall below it), then the EXACT
    big-int inequality confirmed per surviving candidate (outliers are
    rare, so the Python confirm touches O(outliers) rows). The quadratic
    forms reach ~1e24 at 1000x scale — beyond int64, inside HUGEINT."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = _cents(t["value"])
        tmp = pa.table({
            "event_type": t["event_type"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "sx": x, "sxx": pc.multiply(x, x),
        })
        return tmp.group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sxx")])

    acc: dict[str, list[int]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["event_type"], [0, 0, 0])
        a[0] += int(r["n_sum"]); a[1] += int(r["sx_sum"]); a[2] += int(r["sxx_sum"])
    moments = {k: (n, sx, n * sxx - sx * sx) for k, (n, sx, sxx) in acc.items()}

    def flag(t: pa.Table) -> pa.Table:
        x = _cents(t["value"]).to_numpy(zero_copy_only=False)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        n = np.array([moments[k][0] for k in types], np.float64)
        sx = np.array([moments[k][1] for k in types], np.float64)
        den = np.array([moments[k][2] for k in types], np.float64)
        num = n * x.astype(np.float64) - sx
        cand = np.nonzero(num * num > 8.999 * den)[0]
        keep = [int(i) for i in cand
                if ((d := moments[types[i]])[0] * int(x[i]) - d[1]) ** 2
                > 9 * d[2]]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table({
            "event_type": sub["event_type"],
            "event_id": sub["event_id"],
            "cents": _cents(sub["value"]),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


SQL_VALUE_OUTLIERS = """
WITH b AS (
  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT event_type, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(x::HUGEINT * x)::HUGEINT AS sxx
  FROM b GROUP BY event_type
)
SELECT b.event_type, b.event_id, b.x AS cents
FROM b JOIN s USING (event_type)
WHERE (s.n * b.x - s.sx) * (s.n * b.x - s.sx)
      > 9 * (s.n * s.sxx - s.sx * s.sx)
"""


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D Pareto frontier (min price, max size;
    dominance needs one STRICT inequality, so exact duplicates co-survive).
    Fully vectorized: one lexsort, per-price-group maxima via reduceat,
    and a shifted running max of cheaper groups."""
    if len(price) == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-size, price))          # price asc, size desc
    p, s = price[order], size[order]
    starts = np.nonzero(np.r_[True, p[1:] != p[:-1]])[0]
    gmax = np.maximum.reduceat(s, starts)       # max size per price group
    best_prev = np.r_[np.iinfo(np.int64).min,
                      np.maximum.accumulate(gmax)[:-1]]
    gid = np.cumsum(np.r_[False, p[1:] != p[:-1]])
    keep_sorted = (s == gmax[gid]) & (gmax[gid] > best_prev[gid])
    mask = np.zeros(len(price), bool)
    mask[order] = keep_sorted
    return mask


def q_part_skyline(sf_dir: str):
    """2-D SKYLINE (Pareto frontier) over parts — min retail price, max
    size, the multi-objective shortlist query (Borzsony et al., ICDE'01).
    The global frontier is a subset of the union of per-batch frontiers,
    so each batch emits only its LOCAL skyline (vectorized lexsort +
    reduceat running-max scan, O(batch log batch)) and the driver
    re-runs the identical kernel over the tiny candidate union —
    O(batches x local-frontier) rows funnel, never the table (with 50
    distinct sizes the frontier is <= 50 rows at ANY scale). Exact
    integer cents domain; duplicates on the frontier both survive
    (dominance requires one strict inequality), matching NOT EXISTS."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local(t: pa.Table) -> pa.Table:
        cents = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _skyline_mask(cents, size)
        idx = np.nonzero(m)[0]
        return pa.table({
            "p_partkey": t["p_partkey"].take(pa.array(idx, pa.int64())),
            "price_cents": pa.array(cents[idx], pa.int64()),
            "size": pa.array(size[idx], pa.int64()),
        })

    cand = pa.Table.from_pylist(
        ds.map_batches(local, batch_format="pyarrow").take_all(),
        schema=pa.schema([("p_partkey", pa.int64()),
                          ("price_cents", pa.int64()),
                          ("size", pa.int64())]))
    m = _skyline_mask(cand["price_cents"].to_numpy(),
                      cand["size"].to_numpy())
    return cand.take(pa.array(np.nonzero(m)[0], pa.int64()))


SQL_PART_SKYLINE = """
WITH b AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS pc,
         p_size::BIGINT AS sz
  FROM part
)
SELECT b.p_partkey, b.pc AS price_cents, b.sz AS size
FROM b
WHERE NOT EXISTS (
  SELECT 1 FROM b o
  WHERE o.pc <= b.pc AND o.sz >= b.sz AND (o.pc < b.pc OR o.sz > b.sz)
)
"""


def q_lm_score(sf_dir: str):
    """Bigram LM fluency scoring per document (the CCNet-style model
    filter with corpus counts as the LM) — see
    :func:`crawlray.pipelines.textops.lm_score_ds` for the two-exchange
    plan. Exact contract: per-occurrence P(w2|w1) in floored ppm over
    the md5-61-bit hash domain, doc score = floored mean; no float, no
    log, DuckDB-restatable bit-for-bit."""
    from .pipelines.textops import lm_score_ds

    return lm_score_ds(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_LM_SCORE = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text)='' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
), bg AS (
  SELECT doc_id,
         (md5_number_upper('lmuni:' || ts[i])::HUGEINT
          % 2305843009213693951)::BIGINT AS h1,
         (md5_number_upper('lmbi:' || ts[i] || ' ' || ts[i+1])::HUGEINT
          % 2305843009213693951)::BIGINT AS h2
  FROM toks, unnest(range(1, len(ts))) AS r(i)
), c1 AS (SELECT h1, count(*)::BIGINT AS c FROM bg GROUP BY h1),
   c2 AS (SELECT h1, h2, count(*)::BIGINT AS c FROM bg GROUP BY h1, h2)
SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
       (sum(c2.c * 1000000 // c1.c) // count(*))::BIGINT AS score_ppm
FROM bg JOIN c1 USING (h1) JOIN c2 USING (h1, h2)
GROUP BY bg.doc_id
"""


def q_wealthy_idle(sf_dir: str):
    """TPC-H Q22 shape — 'global customer relationship' analysis: per
    nation, the count and total balance of above-average-balance
    customers who never placed a 2-HIGH order. Three classic decorrelated
    pieces, each in its scale-honest form: (1) the scalar AVG subquery
    becomes per-batch (n_pos, sum_cents) partials folded to TWO ints on
    the driver, and the avg comparison is the exact integer
    cross-multiplication cents*n > sum (no division, no float); (2) the
    NOT EXISTS is `bucketed_anti_join` with the priority filter pushed
    into the read batches; (3) the final 25-group rollup is per-batch
    partials folded on the driver."""
    from .pipelines.relational import bucketed_anti_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        pos = pc.greater(cents, 0)
        return pa.table({
            "n": pa.array([int(pc.sum(pos.cast(pa.int64())).as_py() or 0)]),
            "s": pa.array([int(pc.sum(
                pc.if_else(pos, cents, pa.scalar(0, pa.int64()))
            ).as_py() or 0)]),
        })

    n_pos = s_pos = 0
    for r in cust.map_batches(pos_partial, batch_format="pyarrow").take_all():
        n_pos += r["n"]; s_pos += r["s"]

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        keep = pc.greater(pc.multiply(cents, n_pos), s_pos)
        sub = t.filter(keep)
        return pa.table({"c_custkey": sub["c_custkey"],
                         "c_nationkey": sub["c_nationkey"],
                         "cents": _cents(sub["c_acctbal"])})

    def high(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"], "2-HIGH")
        return (t.filter(keep).select(["o_custkey"])
                .rename_columns(["c_custkey"]))

    idle = bucketed_anti_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(high, batch_format="pyarrow"),
        key="c_custkey")

    def nation_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["c_nationkey"]).aggregate(
            [([], "count_all"), ("cents", "sum")])

    acc: dict[int, list[int]] = {}
    for r in idle.map_batches(nation_partial,
                              batch_format="pyarrow").take_all():
        a = acc.setdefault(int(r["c_nationkey"]), [0, 0])
        a[0] += int(r["count_all"]); a[1] += int(r["cents_sum"])
    names = {int(r["n_nationkey"]): r["n_name"] for r in
             _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}
    keys = sorted(acc)
    return pa.table({
        "n_name": pa.array([names[k] for k in keys], pa.string()),
        "numcust": pa.array([acc[k][0] for k in keys], pa.int64()),
        "totacctbal_cents": pa.array([acc[k][1] for k in keys], pa.int64()),
    })


SQL_WEALTHY_IDLE = """
WITH s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(CAST(round(c_acctbal * 100) AS BIGINT))::HUGEINT AS sc
  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
)
SELECT n.n_name,
       count(*)::BIGINT AS numcust,
       sum(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT
         AS totacctbal_cents
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey, s
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * s.n > s.sc
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '2-HIGH')
GROUP BY n.n_name
"""


def q_error_bursts(sf_dir: str):
    """Error-burst detection: every ordered pair of 'error' events
    within 60 s of each other — a KEYLESS self band-join (no equi-key
    for a hash join), lowered via `relational.band_self_pairs`' 1-D
    spatial tiling (each event owns its 60 s tile and shadows the
    previous one; one vectorized searchsorted per worker bucket,
    output-bounded pair enumeration). The type filter is pushed into
    the read batches before the exchange."""
    from .pipelines.relational import band_self_pairs

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def errors(t: pa.Table) -> pa.Table:
        return (t.filter(pc.equal(t["event_type"], "error"))
                .select(["event_id", "ts"]))

    return band_self_pairs(ev.map_batches(errors, batch_format="pyarrow"),
                           "ts", "event_id", band_us=60_000_000)


SQL_ERROR_BURSTS = """
WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
SELECT a.event_id AS first_id, b.event_id AS second_id,
       date_diff('microseconds', a.ts, b.ts)::BIGINT AS gap_us
FROM e a JOIN e b
ON (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
AND b.ts <= a.ts + INTERVAL 60 SECOND
"""


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``v`` into the even bit positions
    (Morton/Z-order interleave half, the standard magic-mask ladder)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def q_zorder_layout(sf_dir: str):
    """Z-ORDER (Morton-curve) layout indexing over (partkey, suppkey) —
    the multi-dimensional clustering step a 100 TB table runs before
    writing so that range predicates on EITHER column prune file-level
    min/max zones (Delta/Iceberg 'OPTIMIZE ZORDER'). Pass 1 folds
    per-batch min/max partials for both columns to 4 driver ints; pass 2
    is a fully vectorized map: scale each key to a 16-bit grid with the
    exact floor form (v - min) * 65535 // (max - min), interleave bits
    with the magic-mask ladder, and take the top 6 of the 32 z-bits as
    the target partition (64 write buckets). No shuffle at all — the
    zcode IS the sort/partition key a writer would range-exchange on;
    here we emit (row id, zcode, zpart) for the oracle to audit
    bit-for-bit. The 16x16-bit grid is exactly restatable in SQL as a
    32-term bit-interleave sum."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])

    def mm_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "pmin": pa.array([pc.min(t["l_partkey"]).as_py()], pa.int64()),
            "pmax": pa.array([pc.max(t["l_partkey"]).as_py()], pa.int64()),
            "smin": pa.array([pc.min(t["l_suppkey"]).as_py()], pa.int64()),
            "smax": pa.array([pc.max(t["l_suppkey"]).as_py()], pa.int64()),
        })

    pmin = smin = None
    pmax = smax = None
    for r in ds.map_batches(mm_partial, batch_format="pyarrow").take_all():
        pmin = r["pmin"] if pmin is None else min(pmin, r["pmin"])
        pmax = r["pmax"] if pmax is None else max(pmax, r["pmax"])
        smin = r["smin"] if smin is None else min(smin, r["smin"])
        smax = r["smax"] if smax is None else max(smax, r["smax"])
    pspan = max(pmax - pmin, 1)
    sspan = max(smax - smin, 1)

    def zmap(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = (pk - pmin) * 65535 // pspan
        gy = (sk - smin) * 65535 // sspan
        z = (_part1by1(gx) | (_part1by1(gy) << np.uint64(1))).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "zcode": pa.array(z, pa.int64()),
            "zpart": pa.array(z >> 26, pa.int64()),
        })

    return ds.map_batches(zmap, batch_format="pyarrow")


def _zorder_sql() -> str:
    interleave = " + ".join(
        [f"(((gx >> {i}) & 1) << {2 * i})" for i in range(16)]
        + [f"(((gy >> {i}) & 1) << {2 * i + 1})" for i in range(16)])
    return f"""
WITH mm AS (
  SELECT min(l_partkey) AS pmin,
         greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
         min(l_suppkey) AS smin,
         greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
  FROM lineitem
), g AS (
  SELECT l_orderkey, l_linenumber,
         (l_partkey - mm.pmin) * 65535 // mm.pspan AS gx,
         (l_suppkey - mm.smin) * 65535 // mm.sspan AS gy
  FROM lineitem, mm
)
SELECT l_orderkey, l_linenumber,
       ({interleave})::BIGINT AS zcode,
       (({interleave}) >> 26)::BIGINT AS zpart
FROM g
"""


def q_sliding_distinct(sf_dir: str):
    """Sliding 24 h DISTINCT active users per hour — distinct is not
    subtractable, so this can't ride the `sliding_windows` ring buffer;
    see :func:`crawlray.pipelines.streaming.sliding_distinct_users` for
    the inverted lowering (each user announces its merged window
    intervals; only +1/-1 boundary deltas leave the buckets)."""
    from .pipelines.streaming import sliding_distinct_users

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return sliding_distinct_users(ev, "user_id", "ts", window_hours=24)


SQL_SLIDING_DISTINCT = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
), wins AS (
  SELECT DISTINCT user_id, h + to_hours(o) AS wh
  FROM uh, unnest(range(0, 24)) AS r(o)
)
SELECT wh AS window_end, count(*)::BIGINT AS n_users
FROM wins GROUP BY wh
"""


def q_trending_events(sf_dir: str):
    """Trending detection: the top event type in the sliding 6 h window
    ending at each hour (ties → lexicographically first type). Counts
    ARE subtractable, so unlike `sliding_distinct` no inversion is
    needed: per-batch (hour, type) COUNT partials via a C-level arrow
    group_by (bounded by hours x types per block, independent of row
    count) fold on the driver, where the per-type sliding sums are one
    vectorized cumsum-diff over the calendar-bounded hour axis and the
    per-window argmax a single lexsort. No shuffle anywhere — the only
    exchange is the tiny partial funnel."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    HOUR = np.int64(3_600_000_000)
    W = 6

    def partial(t: pa.Table) -> pa.Table:
        h = (t["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").view(np.int64) // HOUR)
        tmp = pa.table({"h": pa.array(h, pa.int64()),
                        "event_type": t["event_type"]})
        return tmp.group_by(["h", "event_type"]).aggregate(
            [([], "count_all")])

    acc: dict[tuple[int, str], int] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        k = (int(r["h"]), r["event_type"])
        acc[k] = acc.get(k, 0) + int(r["count_all"])
    if not acc:
        return pa.table({"window_end": pa.nulls(0, pa.timestamp("us")),
                         "top_type": pa.nulls(0, pa.string()),
                         "cnt": pa.nulls(0, pa.int64())})
    types = sorted({t for _, t in acc})
    h_lo = min(h for h, _ in acc)
    h_hi = max(h for h, _ in acc) + W - 1   # last window with any overlap
    n_h = int(h_hi - h_lo + 1)
    grid = np.zeros((len(types), n_h), np.int64)
    tidx = {t: i for i, t in enumerate(types)}
    for (h, t), c in acc.items():
        grid[tidx[t], h - h_lo] += c
    # sliding W-sum ending at each hour: cumsum diff per type row
    cs = np.cumsum(grid, axis=1)
    slid = cs - np.c_[np.zeros((len(types), W), np.int64), cs[:, :-W]]
    total = slid.sum(axis=0)
    best = slid.argmax(axis=0)          # first (lexicographic) max type
    keep = np.flatnonzero(total > 0)
    wh = (h_lo + keep.astype(np.int64)) * HOUR
    return pa.table({
        "window_end": pa.array(wh.view("datetime64[us]")),
        "top_type": pa.array([types[i] for i in best[keep]], pa.string()),
        "cnt": pa.array(slid[best[keep], keep], pa.int64()),
    })


SQL_TRENDING_EVENTS = """
WITH he AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY h, event_type
), wins AS (
  SELECT h + to_hours(o) AS wh, event_type, n
  FROM he, unnest(range(0, 6)) AS r(o)
), agg AS (
  SELECT wh, event_type, sum(n)::BIGINT AS cnt
  FROM wins GROUP BY wh, event_type
)
SELECT wh AS window_end, event_type AS top_type, cnt
FROM agg
QUALIFY row_number() OVER (PARTITION BY wh
                           ORDER BY cnt DESC, event_type) = 1
"""


def q_collocations(sf_dir: str):
    """Corpus collocations (no-log PMI lift, Manning & Schutze ch. 5) —
    adjacent token pairs occurring >= 5 times, scored
    lift_ppm = cb * N * 10^6 // (c1(w1) * c1(w2)) in exact big-int floor
    arithmetic; see :func:`crawlray.pipelines.textops.collocations_ds`
    (count partials -> one exchange each, HAVING filter BEFORE the two
    vocab joins)."""
    from .pipelines.textops import collocations_ds

    return collocations_ds(_read(sf_dir, "documents", ["doc_id", "text"]),
                           min_count=5)


SQL_COLLOCATIONS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text)='' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
), tok AS (
  SELECT ts[i] AS w FROM toks, unnest(range(1, len(ts) + 1)) AS r(i)
), c1 AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
pr AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM toks, unnest(range(1, len(ts))) AS r(i)
), cb AS (
  SELECT w1, w2, count(*)::HUGEINT AS c FROM pr GROUP BY w1, w2
  HAVING count(*) >= 5
), n AS (SELECT count(*)::HUGEINT AS n FROM pr)
SELECT cb.w1, cb.w2, cb.c::BIGINT AS pair_count,
       (cb.c * n.n * 1000000
        // (a.c::HUGEINT * b.c::HUGEINT))::BIGINT AS lift_ppm
FROM cb
CROSS JOIN n
JOIN c1 a ON a.w = cb.w1
JOIN c1 b ON b.w = cb.w2
"""


def q_event_trigrams(sf_dir: str):
    """Behavioral path mining: global counts of per-user consecutive
    event-type TRIPLES (the LEAD(1)/LEAD(2) window shape — extends the
    pairwise `event_transitions` to 3-step paths). One hash exchange by
    user co-locates each user's history; inside a bucket one lexsort by
    (user, ts, event_id) + two shifted comparisons yield every triple,
    counted by a C-level arrow group_by — the driver folds only
    O(buckets x |types|^3) bounded partials (<= 125 triple keys here)."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def triples(t: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.nulls(0, pa.string()),
                          "t2": pa.nulls(0, pa.string()),
                          "t3": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows < 3:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        ok = (us[:-2] == us[1:-1]) & (us[:-2] == us[2:])
        if not ok.any():
            return empty
        et = t["event_type"].take(pa.array(order, pa.int64()))
        idx = np.flatnonzero(ok)
        tmp = pa.table({
            "t1": et.take(pa.array(idx, pa.int64())),
            "t2": et.take(pa.array(idx + 1, pa.int64())),
            "t3": et.take(pa.array(idx + 2, pa.int64())),
        })
        return (tmp.group_by(["t1", "t2", "t3"])
                .aggregate([([], "count_all")])
                .rename_columns(["t1", "t2", "t3", "n"]))

    acc: dict[tuple, int] = {}
    for r in bucketed_reduce(ev, "user_id", triples,
                             n_buckets=32).take_all():
        k = (r["t1"], r["t2"], r["t3"])
        acc[k] = acc.get(k, 0) + int(r["n"])
    keys = sorted(acc)
    return pa.table({
        "t1": pa.array([k[0] for k in keys], pa.string()),
        "t2": pa.array([k[1] for k in keys], pa.string()),
        "t3": pa.array([k[2] for k in keys], pa.string()),
        "n": pa.array([acc[k] for k in keys], pa.int64()),
    })


SQL_EVENT_TRIGRAMS = """
WITH s AS (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, count(*)::BIGINT AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
"""


def q_preferred_supplier(sf_dir: str):
    """TPC-H Q2-shape argmax join: for every part, the supplier that
    shipped it the most (ties → smallest suppkey), enriched with the
    supplier name. ONE hash exchange by part key co-locates everything:
    inside a bucket a C-level arrow group_by folds (part, supp) quantity
    sums and one lexsort picks each part's winner — the per-group argmax
    never leaves the bucket, so no second shuffle and no window sort.
    Supplier names attach via a broadcast map (the classic small
    dimension side)."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "pk": t["l_partkey"], "sk": t["l_suppkey"],
            "q": pc.round(t["l_quantity"]).cast(pa.int64()),
        }).group_by(["pk", "sk"]).aggregate([("q", "sum")])

    def winner(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_partkey": pa.nulls(0, pa.int64()),
                          "s_suppkey": pa.nulls(0, pa.int64()),
                          "total_qty": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        agg = t.group_by(["pk", "sk"]).aggregate([("q_sum", "sum")])
        pk = agg["pk"].to_numpy(zero_copy_only=False)
        sk = agg["sk"].to_numpy(zero_copy_only=False)
        q = agg["q_sum_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, -q, pk))    # pk asc, q desc, sk asc
        pks = pk[order]
        first = np.r_[True, pks[1:] != pks[:-1]]
        idx = order[first]
        return pa.table({
            "l_partkey": pa.array(pk[idx], pa.int64()),
            "s_suppkey": pa.array(sk[idx], pa.int64()),
            "total_qty": pa.array(q[idx], pa.int64()),
        })

    parts = li.map_batches(partial, batch_format="pyarrow")
    won = bucketed_reduce(parts, "pk", winner, n_buckets=32)
    names = {int(r["s_suppkey"]): r["s_name"] for r in
             _read(sf_dir, "supplier",
                   ["s_suppkey", "s_name"]).take_all()}

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column(
            "s_name", pa.array([names[int(s)] for s in
                                t["s_suppkey"].to_pylist()], pa.string()))

    return won.map_batches(attach, batch_format="pyarrow")


SQL_PREFERRED_SUPPLIER = """
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
), top AS (
  SELECT l_partkey, l_suppkey, q FROM pq
  QUALIFY row_number() OVER (PARTITION BY l_partkey
                             ORDER BY q DESC, l_suppkey) = 1
)
SELECT t.l_partkey, t.l_suppkey AS s_suppkey, t.q AS total_qty, s.s_name
FROM top t JOIN supplier s ON s.s_suppkey = t.l_suppkey
"""


def q_embedding_top_dims(sf_dir: str):
    """Per-vector top-3 dimensions by value (ties → smaller index) —
    the sparse feature-selection view of an embedding column (list<float>
    layout kept zero-copy; the per-batch kernel is one numpy argpartition
    + in-slice sort over the stacked 2-D view, never a Python loop over
    rows). Purely map-side: no shuffle. Values pass through bit-exact
    (float32 → float64 widening is exact), so the oracle compares
    equal."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def top3(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(t["embedding"].to_pandas().to_numpy())
        n, d = emb.shape
        k = 3
        emb64 = emb.astype(np.float64)
        # one flat lexsort (row, val desc, dim asc) — exact under ties,
        # where an argpartition could pick arbitrary boundary dims
        rows = np.repeat(np.arange(n, dtype=np.int64), d)
        cols = np.tile(np.arange(d, dtype=np.int64), n)
        o = np.lexsort((cols, -emb64.ravel(), rows))
        sel = o.reshape(n, d)[:, :k].ravel()
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
            "dim": pa.array(sel % d, pa.int64()),
            "val": pa.array(emb64.ravel()[sel], pa.float64()),
        })

    return ds.map_batches(top3, batch_format="pyarrow")


SQL_EMBEDDING_TOP_DIMS = """
SELECT vec_id, (i - 1)::BIGINT AS dim, embedding[i]::DOUBLE AS val
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY embedding[i] DESC, i) <= 3
"""


def q_benford_prices(sf_dir: str):
    """Benford first-digit audit of order totals per priority — the
    fraud/synthetic-data smell test. First digit extracted WITHOUT
    log10 or string formatting in the hot path: a vectorized
    divide-by-10 loop (<= 19 iterations for int64, loop over DIGITS not
    rows). Per-batch (priority, digit) COUNT partials via arrow
    group_by fold to <= 45 driver cells."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.round(t["o_totalprice"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).copy()
        while (x >= 10).any():
            np.floor_divide(x, 10, out=x, where=x >= 10)
        tmp = pa.table({"o_orderpriority": t["o_orderpriority"],
                        "digit": pa.array(x, pa.int64())})
        return tmp.group_by(["o_orderpriority", "digit"]).aggregate(
            [([], "count_all")])

    acc: dict[tuple[str, int], int] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        k = (r["o_orderpriority"], int(r["digit"]))
        acc[k] = acc.get(k, 0) + int(r["count_all"])
    keys = sorted(acc)
    return pa.table({
        "o_orderpriority": pa.array([k[0] for k in keys], pa.string()),
        "digit": pa.array([k[1] for k in keys], pa.int64()),
        "n": pa.array([acc[k] for k in keys], pa.int64()),
    })


SQL_BENFORD_PRICES = """
SELECT o_orderpriority,
       CAST(substr(CAST(CAST(round(o_totalprice) AS BIGINT) AS VARCHAR),
                   1, 1) AS BIGINT) AS digit,
       count(*)::BIGINT AS n
FROM orders
GROUP BY o_orderpriority, digit
"""


def q_trailing_hour_sum(sf_dir: str):
    """Time-based RANGE-frame window at scale: for every event, the sum
    of that user's cents over the trailing hour — ``SUM() OVER
    (PARTITION BY user ORDER BY ts RANGE INTERVAL 1 HOUR PRECEDING)``,
    the frame `rolling_sum` (ROWS) and `sliding_windows` (fixed grid)
    do NOT cover. One hash exchange by user; inside a bucket the frame
    bound is ONE global searchsorted: per-user segments are shifted onto
    disjoint ranges (zts = rel_ts + seg_id * (range + 2h), monotone
    across the bucket), so the window start is searchsorted(zts,
    zts - 1h) and a prefix-sum diff finishes — no per-user loop, no
    window sort. RANGE peer semantics (equal-ts rows all in frame) fall
    out of the side='right' upper bound."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    HOUR = np.int64(3_600_000_000)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "trail_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        us, tss, cs, es = u[order], ts[order], cents[order], eid[order]
        rel = tss - tss.min()
        seg = np.cumsum(np.r_[0, us[1:] != us[:-1]])
        offset = rel.max() + 2 * HOUR + 1 if len(rel) else 1
        zts = rel + seg * offset
        lo = np.searchsorted(zts, zts - HOUR, side="right")
        hi = np.searchsorted(zts, zts, side="right")
        pref = np.r_[np.int64(0), np.cumsum(cs)]
        return pa.table({
            "event_id": pa.array(es, pa.int64()),
            "trail_cents": pa.array(pref[hi] - pref[lo], pa.int64()),
        })

    prepped = ev.map_batches(prep, batch_format="pyarrow")
    return bucketed_reduce(prepped, "user_id", bucket_fn, n_buckets=32)


SQL_TRAILING_HOUR_SUM = """
SELECT event_id,
       sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       )::BIGINT AS trail_cents
FROM events
"""


def q_iqr_outliers(sf_dir: str):
    """Robust (Tukey-fence) outlier detection per event type — the
    quartile complement of `value_outliers`' z-score form: flag rows
    outside [q1 - 1.5 IQR, q3 + 1.5 IQR], exact via the doubled integer
    fences 2x < 2 q1 - 3 IQR / 2x > 2 q3 + 3 IQR (no 1.5 float).
    Quartiles come from `stats.grouped_quantiles` (value-histogram
    partials, never a sort of the input; the repo-wide exact contract
    'smallest value with cum count >= ceil(q n / 1000)'), fold to
    2 ints per type on the driver, and broadcast into one vectorized
    filter pass."""
    from .pipelines.stats import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "event_id": t["event_id"],
                         "cents": _cents(t["value"])})

    prepped = ev.map_batches(prep, batch_format="pyarrow")
    qs: dict[str, dict[int, int]] = {}
    for r in grouped_quantiles(prepped, "event_type", "cents",
                               [250, 750]).take_all():
        qs.setdefault(r["event_type"], {})[int(r["q_pm"])] = int(r["cents"])

    def flag(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_numpy(zero_copy_only=False)
        x = t["cents"].to_numpy(zero_copy_only=False)
        q1 = np.array([qs[k][250] for k in types], np.int64)
        q3 = np.array([qs[k][750] for k in types], np.int64)
        iqr = q3 - q1
        keep = (2 * x < 2 * q1 - 3 * iqr) | (2 * x > 2 * q3 + 3 * iqr)
        sub = t.filter(pa.array(keep))
        return pa.table({"event_type": sub["event_type"],
                         "event_id": sub["event_id"],
                         "cents": sub["cents"]})

    return prepped.map_batches(flag, batch_format="pyarrow")


SQL_IQR_OUTLIERS = """
WITH t AS (
  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), c AS (
  SELECT event_type, cents, count(*)::BIGINT AS n FROM t GROUP BY 1, 2
), w AS (
  SELECT event_type, cents,
         sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM c
), q1 AS (SELECT event_type, min(cents) AS v FROM w
          WHERE cum >= (250 * tot + 999) // 1000 GROUP BY 1),
   q3 AS (SELECT event_type, min(cents) AS v FROM w
          WHERE cum >= (750 * tot + 999) // 1000 GROUP BY 1)
SELECT t.event_type, t.event_id, t.cents
FROM t JOIN q1 USING (event_type) JOIN q3 USING (event_type)
WHERE 2 * t.cents < 2 * q1.v - 3 * (q3.v - q1.v)
   OR 2 * t.cents > 2 * q3.v + 3 * (q3.v - q1.v)
"""


def q_sole_suppliers(sf_dir: str):
    """TPC-H Q21 shape adapted to this schema — 'sole supplier'
    analysis: orders served by EXACTLY ONE distinct supplier, rolled up
    per supplier (how many orders they alone fulfilled, and the revenue
    at stake). The classic Q21 EXISTS/NOT-EXISTS self-join pair on
    lineitem decorrelates into ONE partition-by-order pass:
    `bucketed_reduce` on the order key sees every line of an order in
    one bucket, so the per-order distinct-supplier count, the
    sole-order filter, and the per-supplier re-aggregation all happen
    inside the bucket with zero joins. Per-batch (order, supplier)
    pre-aggregation bounds exchange volume at one row per (order,
    supplier) pair; a second tiny exchange on the supplier key folds
    the per-bucket partials (suppliers span buckets — never a driver
    dict at 100 TB supplier cardinality)."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_suppkey": t["l_suppkey"], "rev": rev})
                .group_by(["l_orderkey", "l_suppkey"])
                .aggregate([("rev", "sum")])
                .rename_columns(["l_orderkey", "l_suppkey", "rev"]))

    def per_order(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s_suppkey": pa.nulls(0, pa.int64()),
                             "sole_orders": pa.nulls(0, pa.int64()),
                             "rev_centicents": pa.nulls(0, pa.int64())})
        df = (t.to_pandas().groupby(["l_orderkey", "l_suppkey"],
                                    as_index=False)["rev"].sum())
        nsupp = df.groupby("l_orderkey")["l_orderkey"].transform("size")
        sole = df[nsupp.to_numpy() == 1]
        out = sole.groupby("l_suppkey", as_index=False).agg(
            sole_orders=("l_orderkey", "size"), rev_centicents=("rev", "sum"))
        return pa.table({
            "s_suppkey": pa.array(out["l_suppkey"], pa.int64()),
            "sole_orders": pa.array(out["sole_orders"], pa.int64()),
            "rev_centicents": pa.array(out["rev_centicents"], pa.int64()),
        })

    partials = bucketed_reduce(
        li.map_batches(prep, batch_format="pyarrow"),
        "l_orderkey", per_order, n_buckets=16)

    def fold(t: pa.Table) -> pa.Table:
        return (t.group_by(["s_suppkey"])
                .aggregate([("sole_orders", "sum"), ("rev_centicents", "sum")])
                .rename_columns(["s_suppkey", "sole_orders",
                                 "rev_centicents"]))

    return bucketed_reduce(partials, "s_suppkey", fold, n_buckets=8)


SQL_SOLE_SUPPLIERS = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem
), sole AS (
  SELECT l_orderkey FROM l GROUP BY 1 HAVING count(DISTINCT l_suppkey) = 1
)
SELECT l.l_suppkey AS s_suppkey,
       count(DISTINCT l.l_orderkey)::BIGINT AS sole_orders,
       sum(l.rev)::BIGINT AS rev_centicents
FROM l JOIN sole USING (l_orderkey)
GROUP BY 1
"""


def q_nation_trade(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume: revenue shipped
    between every (supplier nation, customer nation) pair per ship
    year, CROSS-nation pairs only (the Q7 twist regional_revenue's Q5
    doesn't have: Q5 keeps same-nation revenue, Q7 keeps the
    complement, keyed by BOTH nations and the year). Same scale plan as
    the Q5 star: customer/supplier/nation are broadcast dimensions
    probed per batch, the one real exchange is orders x lineitem
    bucketed on the order key, and per-block partials bound what leaves
    each bucket at <= |nations|^2 x years rows before an O(625 x years)
    driver fold."""
    import ray

    from .pipelines.relational import bucketed_hash_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    ref = ray.put((dict(zip(cust["c_custkey"], cust["c_nationkey"])),
                   dict(zip(supp["s_suppkey"], supp["s_nationkey"]))))

    def orders_prep(t: pa.Table) -> pa.Table:
        c2n, _ = ray.get(ref)
        df = t.to_pandas()
        return pa.table({
            "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
            "c_nat": pa.array(df["o_custkey"].map(c2n).astype("int64"),
                              pa.int64()),
        })

    def items_prep(t: pa.Table) -> pa.Table:
        _, s2n = ray.get(ref)
        df = t.to_pandas()
        rev = ((df["l_extendedprice"] * 100).round().astype("int64")
               * (100 - (df["l_discount"] * 100).round().astype("int64")))
        return pa.table({
            "o_orderkey": pa.array(df["l_orderkey"], pa.int64()),
            "s_nat": pa.array(df["l_suppkey"].map(s2n).astype("int64"),
                              pa.int64()),
            "l_year": pa.array(df["l_shipdate"].dt.year.astype("int64"),
                               pa.int64()),
            "rev_centicents": pa.array(rev, pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_suppkey", "l_shipdate",
                   "l_extendedprice", "l_discount"])
    joined = bucketed_hash_join(
        orders.map_batches(orders_prep, batch_format="pyarrow").materialize(),
        items.map_batches(items_prep, batch_format="pyarrow").materialize(),
        "o_orderkey", n_buckets=16)

    def block_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["s_nat"], t["c_nat"]))
        return (t.select(["s_nat", "c_nat", "l_year", "rev_centicents"])
                .group_by(["s_nat", "c_nat", "l_year"])
                .aggregate([("rev_centicents", "sum")]))

    acc: dict[tuple[int, int, int], int] = {}
    for r in joined.map_batches(block_partial,
                                batch_format="pyarrow").take_all():
        k = (int(r["s_nat"]), int(r["c_nat"]), int(r["l_year"]))
        acc[k] = acc.get(k, 0) + int(r["rev_centicents_sum"])
    keys = sorted(acc)
    return pa.table({
        "supp_nation": pa.array([n2name[k[0]] for k in keys], pa.string()),
        "cust_nation": pa.array([n2name[k[1]] for k in keys], pa.string()),
        "l_year": pa.array([k[2] for k in keys], pa.int64()),
        "rev_centicents": pa.array([acc[k] for k in keys], pa.int64()),
    })


SQL_NATION_TRADE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS l_year,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
         AS rev_centicents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_nationkey <> cn.n_nationkey
GROUP BY 1, 2, 3
"""


def q_promo_share(sf_dir: str):
    """TPC-H Q14 shape — promotion effect: per ship month, the share of
    revenue from PROMO-type parts, as the exact floored ppm of two
    centicent sums (the Q14 '100.00 * sum(case)/sum' ratio without a
    float division). part is a broadcast dimension reduced to the SET
    of promo part keys (one frozenset in the object store, probed
    vectorized per batch); partials are <= |months| x 3 ints per block,
    folded on the driver with Python big ints (1e6 x centicents
    overflows int64 at warehouse scale — the fold is arbitrary
    precision, and the oracle's HUGEINT arithmetic matches it
    exactly)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = frozenset(
        part.loc[part["p_type"].str.startswith("PROMO"), "p_partkey"])
    ref = ray.put(promo)

    def partial(t: pa.Table) -> pa.Table:
        pk = ray.get(ref)
        month = pc.strftime(t["l_shipdate"], format="%Y-%m")
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        is_promo = pa.array(
            np.isin(t["l_partkey"].to_numpy(zero_copy_only=False),
                    np.fromiter(pk, np.int64)))
        prom = pc.if_else(is_promo, rev, pa.scalar(0, pa.int64()))
        return (pa.table({"month": month, "promo": prom, "total": rev})
                .group_by(["month"])
                .aggregate([("promo", "sum"), ("total", "sum")]))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
    acc: dict[str, list[int]] = {}
    for r in li.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["month"], [0, 0])
        a[0] += int(r["promo_sum"]); a[1] += int(r["total_sum"])
    months = sorted(acc)
    return pa.table({
        "month": pa.array(months, pa.string()),
        "promo_ppm": pa.array(
            [10**6 * acc[m][0] // acc[m][1] for m in months], pa.int64()),
        "promo_centicents": pa.array([acc[m][0] for m in months], pa.int64()),
        "total_centicents": pa.array([acc[m][1] for m in months], pa.int64()),
    })


SQL_PROMO_SHARE = """
WITH l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0
         END AS promo,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS total
  FROM lineitem JOIN part p ON p.p_partkey = lineitem.l_partkey
)
SELECT month,
       CAST(1000000::HUGEINT * sum(promo)::HUGEINT
            // sum(total)::HUGEINT AS BIGINT) AS promo_ppm,
       sum(promo)::BIGINT AS promo_centicents,
       sum(total)::BIGINT AS total_centicents
FROM l GROUP BY 1
"""


def q_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive bracket pricing: revenue and line
    count for three (brand, size range, quantity range) brackets OR-ed
    together (the shape that defeats naive predicate pushdown because
    no single conjunct prunes). part collapses to a broadcast
    partkey -> (brand, size) map; the bracket test is one vectorized
    numpy pass per batch (quantities compared in exact rounded
    integers, never float equality); partials are <= 3 rows per block
    folded on the driver."""
    import ray

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).to_pandas()
    ref = ray.put((dict(zip(part["p_partkey"], part["p_brand"])),
                   dict(zip(part["p_partkey"], part["p_size"]))))
    brackets = [("b1", "Brand#23", 1, 5, 1, 11),
                ("b2", "Brand#13", 1, 10, 10, 20),
                ("b3", "Brand#3", 1, 15, 20, 30)]

    def partial(t: pa.Table) -> pa.Table:
        p2b, p2s = ray.get(ref)
        df = t.to_pandas()
        brand = df["l_partkey"].map(p2b).to_numpy()
        size = df["l_partkey"].map(p2s).to_numpy(dtype=np.int64)
        qty = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        rev = ((df["l_extendedprice"] * 100).round().astype("int64")
               * (100 - (df["l_discount"] * 100).round().astype("int64"))
               ).to_numpy()
        names, counts, sums = [], [], []
        for nm, b, slo, shi, qlo, qhi in brackets:
            m = ((brand == b) & (size >= slo) & (size <= shi)
                 & (qty >= qlo) & (qty <= qhi))
            names.append(nm)
            counts.append(int(m.sum()))
            sums.append(int(rev[m].sum()))
        return pa.table({"bracket": pa.array(names, pa.string()),
                         "n": pa.array(counts, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    acc: dict[str, list[int]] = {}
    for r in li.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["bracket"], [0, 0])
        a[0] += int(r["n"]); a[1] += int(r["rev"])
    names = sorted(k for k in acc if acc[k][0] > 0)
    return pa.table({
        "bracket": pa.array(names, pa.string()),
        "n_lines": pa.array([acc[k][0] for k in names], pa.int64()),
        "rev_centicents": pa.array([acc[k][1] for k in names], pa.int64()),
    })


SQL_BRACKET_REVENUE = """
WITH l AS (
  SELECT CASE
           WHEN p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 5
                AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11
             THEN 'b1'
           WHEN p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
                AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20
             THEN 'b2'
           WHEN p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30
             THEN 'b3'
         END AS bracket,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem JOIN part p ON p.p_partkey = lineitem.l_partkey
)
SELECT bracket, count(*)::BIGINT AS n_lines, sum(rev)::BIGINT AS rev_centicents
FROM l WHERE bracket IS NOT NULL GROUP BY 1
"""


KMV_K = 64
KMV_M = 2305843009213693951  # 2^61 - 1, the repo-wide md5 hash space


def q_kmv_distinct(sf_dir: str):
    """K-minimum-values distinct sketch over event users — the
    order-statistics alternative to the HLL register sketch
    (`approx_distinct`): keep the K smallest DISTINCT md5 hashes of the
    key; the KMV estimator (K-1) * M / h_K is then a pure function of
    the Kth order statistic, so unlike HLL the WHOLE sketch state is
    restatable in SQL as ORDER BY hash LIMIT K. Per-batch partials are
    each block's K smallest distinct hashes (the K-min merge is
    associative), the driver fold is O(blocks x K) ints, and the
    estimate uses exact integer division — when global distinct < K the
    union of partials IS the distinct set and the sketch returns the
    exact count, same CASE the oracle states. Hash = the repo-wide
    md5-upper-8 little-endian contract (`util.md5_id_bucket`)."""
    from .util import md5_id_bucket

    ev = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        h = np.unique(md5_id_bucket("kmv-v1", ids, KMV_M))
        return pa.table({"h": pa.array(h[:KMV_K], pa.int64())})

    merged = np.array([], np.int64)
    for r in ev.map_batches(partial, batch_format="pyarrow").take_all():
        merged = np.append(merged, r["h"])
    merged = np.unique(merged)[:KMV_K]
    k_used = len(merged)
    h_k = int(merged[-1])
    est = k_used if k_used < KMV_K else (KMV_K - 1) * KMV_M // h_k
    return pa.table({"k_used": pa.array([k_used], pa.int64()),
                     "h_k": pa.array([h_k], pa.int64()),
                     "est_distinct": pa.array([est], pa.int64())})


SQL_KMV_DISTINCT = """
WITH h AS (
  SELECT DISTINCT (md5_number_upper('kmv-v1:' || user_id::VARCHAR)::HUGEINT
                   % 2305843009213693951::HUGEINT)::BIGINT AS h
  FROM events
), topk AS (SELECT h FROM h ORDER BY h LIMIT 64)
SELECT count(*)::BIGINT AS k_used, max(h)::BIGINT AS h_k,
       CASE WHEN count(*) < 64 THEN count(*)::BIGINT
            ELSE CAST((64 - 1)::HUGEINT * 2305843009213693951::HUGEINT
                      // max(h)::HUGEINT AS BIGINT)
       END AS est_distinct
FROM topk
"""


def q_source_divergence(sf_dir: str):
    """Per-source corpus drift: the TOTAL VARIATION distance between
    each source's language distribution and the global corpus mix, in
    exact floored ppm — the distribution-shift audit a 100 TB ingest
    runs per feed (KL needs logs and floats; TV = 1/2 sum |p - q| stays
    in integers: |c_sl * N - C_l * n_s| over the common denominator
    n_s * N). One pass of per-batch (source, lang) count partials (<=
    |sources| x |langs| rows per block), a driver fold over the same
    tiny grid with Python big ints (c * N products overflow int64 at
    warehouse scale; the oracle's HUGEINT arithmetic matches exactly),
    zeros included for languages a source never emits."""
    docs = _read(sf_dir, "documents", ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        return (t.group_by(["source", "lang"]).aggregate([([], "count_all")]))

    counts: dict[tuple[str, str], int] = {}
    for r in docs.map_batches(partial, batch_format="pyarrow").take_all():
        k = (r["source"], r["lang"])
        counts[k] = counts.get(k, 0) + int(r["count_all"])
    n_s: dict[str, int] = {}
    c_l: dict[str, int] = {}
    for (s, l), c in counts.items():
        n_s[s] = n_s.get(s, 0) + c
        c_l[l] = c_l.get(l, 0) + c
    n = sum(n_s.values())
    sources = sorted(n_s)
    tv = [10**6 * sum(abs(counts.get((s, l), 0) * n - c_l[l] * n_s[s])
                      for l in c_l) // (2 * n_s[s] * n)
          for s in sources]
    return pa.table({
        "source": pa.array(sources, pa.string()),
        "n_docs": pa.array([n_s[s] for s in sources], pa.int64()),
        "tv_ppm": pa.array(tv, pa.int64()),
    })


SQL_SOURCE_DIVERGENCE = """
WITH c AS (
  SELECT source, lang, count(*)::HUGEINT AS c FROM documents GROUP BY 1, 2
), ns AS (SELECT source, sum(c) AS n_s FROM c GROUP BY 1),
   cl AS (SELECT lang, sum(c) AS c_l FROM c GROUP BY 1),
   tot AS (SELECT sum(c) AS n FROM c),
   grid AS (
     SELECT ns.source, ns.n_s, cl.c_l, coalesce(c.c, 0::HUGEINT) AS c_sl
     FROM ns CROSS JOIN cl
     LEFT JOIN c ON c.source = ns.source AND c.lang = cl.lang
   )
SELECT g.source, CAST(max(g.n_s) AS BIGINT) AS n_docs,
       CAST(1000000::HUGEINT * sum(abs(g.c_sl * t.n - g.c_l * g.n_s))
            // (2::HUGEINT * max(g.n_s) * t.n) AS BIGINT) AS tv_ppm
FROM grid g, tot t GROUP BY g.source, t.n
"""


def q_purchase_attribution(sf_dir: str):
    """Stream-stream INTERVAL JOIN with aggregation: for every purchase,
    the count and cents sum of that user's 'view' events in the
    trailing 30 minutes — the ad-attribution shape (probe stream joined
    to a window of a second stream, LEFT semantics: purchases with no
    views keep zeros). Not an asof join (wants ALL rows in the window,
    not the latest) and not a self band-join (two DIFFERENT filtered
    streams, keyed by user). Lowered via the generalized
    `relational.interval_agg_join` operator: ONE tagged-union exchange
    by user, then the `trailing_hour_sum` disjoint-segment-shift idiom
    (view segments on non-overlapping zts ranges, two global
    searchsorteds + a prefix-sum diff per probe). Purchases whose user
    has no views resolve via the unique-key lookup miss, never a
    join."""
    from .pipelines.relational import interval_agg_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        is_v = pc.equal(t["event_type"], "view")
        is_p = pc.equal(t["event_type"], "purchase")
        t = t.filter(pc.or_(is_v, is_p))
        side = pc.equal(t["event_type"], "purchase").cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "user_id": t["user_id"], "side": side,
                         "cents": _cents(t["value"])})

    out = interval_agg_join(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", ts="ts", side="side", id_col="event_id",
        value="cents", window_us=30 * 60 * 1_000_000, n_buckets=32)
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "n_views", "view_cents"]),
        batch_format="pyarrow")


SQL_PURCHASE_ATTRIBUTION = """
WITH v AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, count(v.ts)::BIGINT AS n_views,
       coalesce(sum(v.cents), 0)::BIGINT AS view_cents
FROM p LEFT JOIN v ON v.user_id = p.user_id
  AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts < p.ts
GROUP BY 1
"""


def q_user_drawdown(sf_dir: str):
    """Running-peak window: each user's MAXIMUM DRAWDOWN — the largest
    peak-to-current drop of event value over the user's timeline
    (cummax(v) - v maximized; the financial risk metric, and the
    running-MAX accumulator `running_sum`/`trailing_hour_sum` don't
    cover — max doesn't invert, so no prefix-diff trick: it needs the
    segmented scan). One exchange by user; inside a bucket the rows
    lexsort by (user, ts, event_id) — the oracle's deterministic tie
    order — and pandas' C-level grouped cummax + grouped max finish
    with no Python loop. Output is one row per user (bounded by
    distinct users per bucket)."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "ts": t["ts"],
                         "user_id": t["user_id"],
                         "cents": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "max_drawdown_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        import pandas as pd
        df = pd.DataFrame({"u": u[order], "c": c[order]})
        dd = df.groupby("u")["c"].cummax() - df["c"]
        out = (pd.DataFrame({"u": df["u"], "dd": dd})
               .groupby("u", as_index=False)["dd"].max())
        return pa.table({
            "user_id": pa.array(out["u"], pa.int64()),
            "max_drawdown_cents": pa.array(out["dd"], pa.int64()),
        })

    prepped = ev.map_batches(prep, batch_format="pyarrow")
    return bucketed_reduce(prepped, "user_id", bucket_fn, n_buckets=32)


SQL_USER_DRAWDOWN = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT user_id,
         max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - cents AS dd
  FROM c
)
SELECT user_id, max(dd)::BIGINT AS max_drawdown_cents
FROM w GROUP BY 1
"""


def q_source_vocab_overlap(sf_dir: str):
    """Pairwise SET SIMILARITY between sources: exact Jaccard (floored
    ppm) of the distinct-vocabulary sets of every source pair — the
    corpus-level cousin of the per-doc `ngram_jaccard`. Scale plan:
    per-batch distinct (term, source) pairs, ONE exchange by term
    (`bucketed_reduce`), and inside each bucket a C-level self-merge on
    term emits per-pair intersection partials plus per-source vocab
    partials — terms are partitioned by the exchange, so both counts
    add across buckets; nothing wider than |sources|^2 rows ever leaves
    a bucket, and the term strings never cross twice. Driver fold is
    O(pairs) with exact integer division."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["text", "source"])

    def prep(t: pa.Table) -> pa.Table:
        terms, srcs = [], []
        for txt, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            for w in set((txt or "").split()):
                terms.append(w); srcs.append(src)
        out = pa.table({"term": pa.array(terms, pa.string()),
                        "source": pa.array(srcs, pa.string())})
        return (out.group_by(["term", "source"]).aggregate([])
                if out.num_rows else out)

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"sa": pa.nulls(0, pa.string()),
                          "sb": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().drop_duplicates(["term", "source"]))
        vocab = df.groupby("source", as_index=False).size()
        pairs = df.merge(df, on="term")
        pairs = pairs[pairs["source_x"] < pairs["source_y"]]
        inter = (pairs.groupby(["source_x", "source_y"], as_index=False)
                 .size())
        return pa.table({
            "sa": pa.array(list(inter["source_x"]) + list(vocab["source"]),
                           pa.string()),
            "sb": pa.array(list(inter["source_y"]) + [""] * len(vocab),
                           pa.string()),
            "n": pa.array(list(inter["size"]) + list(vocab["size"]),
                          pa.int64()),
        })

    partials = bucketed_reduce(
        docs.map_batches(prep, batch_format="pyarrow"),
        "term", bucket_fn, n_buckets=32)
    inter: dict[tuple[str, str], int] = {}
    vocab: dict[str, int] = {}
    for r in partials.take_all():
        if r["sb"]:
            k = (r["sa"], r["sb"])
            inter[k] = inter.get(k, 0) + int(r["n"])
        else:
            vocab[r["sa"]] = vocab.get(r["sa"], 0) + int(r["n"])
    keys = sorted(inter)
    return pa.table({
        "source_a": pa.array([k[0] for k in keys], pa.string()),
        "source_b": pa.array([k[1] for k in keys], pa.string()),
        "inter": pa.array([inter[k] for k in keys], pa.int64()),
        "jaccard_ppm": pa.array(
            [10**6 * inter[k] // (vocab[k[0]] + vocab[k[1]] - inter[k])
             for k in keys], pa.int64()),
    })


SQL_SOURCE_VOCAB_OVERLAP = """
WITH t AS (
  SELECT DISTINCT source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), v AS (SELECT source, count(*)::BIGINT AS nv FROM t GROUP BY 1),
   i AS (SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS inter
         FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
         GROUP BY 1, 2)
SELECT i.sa AS source_a, i.sb AS source_b, i.inter,
       CAST(1000000::HUGEINT * i.inter
            // (va.nv + vb.nv - i.inter) AS BIGINT) AS jaccard_ppm
FROM i JOIN v va ON va.source = i.sa JOIN v vb ON vb.source = i.sb
"""


def q_source_simpson(sf_dir: str):
    """Per-source language DIVERSITY as the exact Gini-Simpson index in
    floored ppm: 1 - sum p^2 = (n^2 - sum c^2) / n^2 — the log-free
    diversity measure (entropy needs floats; this stays in integers all
    the way, HUGEINT in the oracle). Same one-pass (source, lang)
    count-partial plan as `source_divergence`; O(sources) driver fold
    with Python big ints."""
    docs = _read(sf_dir, "documents", ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["source", "lang"]).aggregate([([], "count_all")])

    counts: dict[tuple[str, str], int] = {}
    for r in docs.map_batches(partial, batch_format="pyarrow").take_all():
        k = (r["source"], r["lang"])
        counts[k] = counts.get(k, 0) + int(r["count_all"])
    n_s: dict[str, int] = {}
    s2: dict[str, int] = {}
    for (s, _), c in counts.items():
        n_s[s] = n_s.get(s, 0) + c
        s2[s] = s2.get(s, 0) + c * c
    sources = sorted(n_s)
    return pa.table({
        "source": pa.array(sources, pa.string()),
        "n_docs": pa.array([n_s[s] for s in sources], pa.int64()),
        "simpson_ppm": pa.array(
            [10**6 * (n_s[s] ** 2 - s2[s]) // n_s[s] ** 2 for s in sources],
            pa.int64()),
    })


SQL_SOURCE_SIMPSON = """
WITH c AS (
  SELECT source, lang, count(*)::HUGEINT AS c FROM documents GROUP BY 1, 2
), s AS (SELECT source, sum(c) AS n, sum(c * c) AS s2 FROM c GROUP BY 1)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(1000000::HUGEINT * (n * n - s2) // (n * n) AS BIGINT)
         AS simpson_ppm
FROM s
"""


def q_dow_hour_heatmap(sf_dir: str):
    """Calendar heatmap rollup: event count + cents by (ISO weekday,
    hour) — the date-part extraction pair (§2.8 date/time) the hourly /
    daily windows don't exercise. Per-batch partials are <= 168 rows
    per block (Arrow day_of_week is 0-based Monday; +1 == DuckDB
    isodow), folded O(168) on the driver."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["ts"]), 1).cast(pa.int64())
        hour = pc.hour(t["ts"]).cast(pa.int64())
        return (pa.table({"dow": dow, "hour": hour,
                          "cents": _cents(t["value"])})
                .group_by(["dow", "hour"])
                .aggregate([([], "count_all"), ("cents", "sum")]))

    acc: dict[tuple[int, int], list[int]] = {}
    for r in ev.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault((int(r["dow"]), int(r["hour"])), [0, 0])
        a[0] += int(r["count_all"]); a[1] += int(r["cents_sum"])
    keys = sorted(acc)
    return pa.table({
        "dow": pa.array([k[0] for k in keys], pa.int64()),
        "hour": pa.array([k[1] for k in keys], pa.int64()),
        "n_events": pa.array([acc[k][0] for k in keys], pa.int64()),
        "cents": pa.array([acc[k][1] for k in keys], pa.int64()),
    })


SQL_DOW_HOUR_HEATMAP = """
SELECT isodow(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hour,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
FROM events GROUP BY 1, 2
"""


ZONE_PRED_LO, ZONE_PRED_HI = 100, 199   # the audited l_partkey range


def q_zone_map_prune(sf_dir: str):
    """Zone-map pruning audit over the Z-order layout: per write
    partition (`q_zorder_layout`'s 64 zparts), the row count and the
    (partkey, suppkey) min/max zone stats a lake writer would persist —
    plus the boolean a scan planner actually tests: can this zone be
    SKIPPED for `l_partkey BETWEEN 100 AND 199`? This is the
    measurement that justifies Z-ordering at 100 TB (file-level pruning
    ratio on a non-leading column). Two passes, both O(1) driver state:
    the same 4-int global min/max fold zorder uses, then per-batch
    zone partials (<= 64 rows per block) folded to the 64-zone table.
    The zcode is the identical magic-mask interleave, so the oracle
    reuses the exact 32-term SQL restatement."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def mm_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "pmin": pa.array([pc.min(t["l_partkey"]).as_py()], pa.int64()),
            "pmax": pa.array([pc.max(t["l_partkey"]).as_py()], pa.int64()),
            "smin": pa.array([pc.min(t["l_suppkey"]).as_py()], pa.int64()),
            "smax": pa.array([pc.max(t["l_suppkey"]).as_py()], pa.int64()),
        })

    pmin = pmax = smin = smax = None
    for r in ds.map_batches(mm_partial, batch_format="pyarrow").take_all():
        pmin = r["pmin"] if pmin is None else min(pmin, r["pmin"])
        pmax = r["pmax"] if pmax is None else max(pmax, r["pmax"])
        smin = r["smin"] if smin is None else min(smin, r["smin"])
        smax = r["smax"] if smax is None else max(smax, r["smax"])
    pspan = max(pmax - pmin, 1)
    sspan = max(smax - smin, 1)

    def zone_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        gx = (pk - pmin) * 65535 // pspan
        gy = (sk - smin) * 65535 // sspan
        z = (_part1by1(gx) | (_part1by1(gy) << np.uint64(1))).astype(np.int64)
        return (pa.table({"zpart": pa.array(z >> 26, pa.int64()),
                          "pk": pa.array(pk, pa.int64()),
                          "sk": pa.array(sk, pa.int64())})
                .group_by(["zpart"])
                .aggregate([([], "count_all"), ("pk", "min"), ("pk", "max"),
                            ("sk", "min"), ("sk", "max")]))

    acc: dict[int, list[int]] = {}
    for r in ds.map_batches(zone_partial, batch_format="pyarrow").take_all():
        z = int(r["zpart"])
        a = acc.get(z)
        if a is None:
            acc[z] = [int(r["count_all"]), int(r["pk_min"]), int(r["pk_max"]),
                      int(r["sk_min"]), int(r["sk_max"])]
        else:
            a[0] += int(r["count_all"])
            a[1] = min(a[1], int(r["pk_min"])); a[2] = max(a[2], int(r["pk_max"]))
            a[3] = min(a[3], int(r["sk_min"])); a[4] = max(a[4], int(r["sk_max"]))
    keys = sorted(acc)
    return pa.table({
        "zpart": pa.array(keys, pa.int64()),
        "n_rows": pa.array([acc[k][0] for k in keys], pa.int64()),
        "pk_min": pa.array([acc[k][1] for k in keys], pa.int64()),
        "pk_max": pa.array([acc[k][2] for k in keys], pa.int64()),
        "sk_min": pa.array([acc[k][3] for k in keys], pa.int64()),
        "sk_max": pa.array([acc[k][4] for k in keys], pa.int64()),
        "skippable": pa.array(
            [int(acc[k][2] < ZONE_PRED_LO or acc[k][1] > ZONE_PRED_HI)
             for k in keys], pa.int64()),
    })


def _zone_map_sql() -> str:
    interleave = " + ".join(
        [f"(((gx >> {i}) & 1) << {2 * i})" for i in range(16)]
        + [f"(((gy >> {i}) & 1) << {2 * i + 1})" for i in range(16)])
    return f"""
WITH mm AS (
  SELECT min(l_partkey) AS pmin,
         greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
         min(l_suppkey) AS smin,
         greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
  FROM lineitem
), g AS (
  SELECT l_partkey, l_suppkey,
         (l_partkey - mm.pmin) * 65535 // mm.pspan AS gx,
         (l_suppkey - mm.smin) * 65535 // mm.sspan AS gy
  FROM lineitem, mm
), z AS (
  SELECT l_partkey, l_suppkey, (({interleave}) >> 26)::BIGINT AS zpart
  FROM g
)
SELECT zpart, count(*)::BIGINT AS n_rows,
       min(l_partkey)::BIGINT AS pk_min, max(l_partkey)::BIGINT AS pk_max,
       min(l_suppkey)::BIGINT AS sk_min, max(l_suppkey)::BIGINT AS sk_max,
       (CASE WHEN max(l_partkey) < {ZONE_PRED_LO}
              OR min(l_partkey) > {ZONE_PRED_HI}
         THEN 1 ELSE 0 END)::BIGINT AS skippable
FROM z GROUP BY 1
"""


SQL_ZONE_MAP_PRUNE = _zone_map_sql()


def q_median_cont(sf_dir: str):
    """Interpolated (percentile_cont-style) median per event type, kept
    EXACT by working in doubled units: median_2x = 2 x middle for odd
    n, lower + upper middle for even n — the interpolation
    `value_quantiles`' discrete contract can't express, with no float
    midpoint. Histogram partials per (type, cents) — never a sort of
    the input — fold on the driver, and the two order statistics come
    from one cumsum over each type's value histogram (O(types x
    distinct values) driver work, the `grouped_quantiles` bound)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({"event_type": t["event_type"],
                          "cents": _cents(t["value"])})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")]))

    hist: dict[str, dict[int, int]] = {}
    for r in ev.map_batches(partial, batch_format="pyarrow").take_all():
        h = hist.setdefault(r["event_type"], {})
        c = int(r["cents"])
        h[c] = h.get(c, 0) + int(r["count_all"])
    types = sorted(hist)
    med2x = []
    for ty in types:
        vals = sorted(hist[ty])
        n = sum(hist[ty].values())
        r1, r2 = (n + 1) // 2, n // 2 + 1
        cum = 0
        v1 = v2 = None
        for v in vals:
            cum += hist[ty][v]
            if v1 is None and cum >= r1:
                v1 = v
            if v2 is None and cum >= r2:
                v2 = v
                break
        med2x.append(v1 + v2)
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "median_2x": pa.array(med2x, pa.int64())})


SQL_MEDIAN_CONT = """
WITH t AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), o AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM t
)
SELECT event_type,
       (sum(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
        + sum(CASE WHEN rn = n // 2 + 1 THEN cents ELSE 0 END))::BIGINT
         AS median_2x
FROM o GROUP BY 1
"""


def q_host_reciprocity(sf_dir: str):
    """Graph RECIPROCITY over the coarsened host graph: the fraction of
    directed cross-host edges whose reverse edge also exists (mutual
    linking — the link-spam / link-exchange signal), in exact floored
    ppm. The check 'does (b, a) exist?' is a self-join the engine lowers
    with ONE exchange on the UNORDERED pair key min(src,dst) |
    max(src,dst): both directions of a pair land in the same bucket, so
    a C-level merge against the swapped columns decides reciprocity
    locally and only (n_edges, n_recip) int pairs leave the buckets.
    Edge discovery + global dedup are the same distributed coarsening
    as `host_pagerank` (never a driver edge set); the oracle restates
    the identical edge list as VALUES literals with an EXISTS probe."""
    from .canon import host_of
    from .htmlx import parse_document
    from .pipelines.relational import bucketed_reduce
    from .synth import World
    from .util import keep_first_sorted

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def host_edges(t: pa.Table) -> pa.Table:
        pairs = set()
        for u in t["url"].to_pylist():
            hs = host_of(u)
            for link in parse_document(world.gen_page(u), u).links:
                hd = host_of(link.url)
                if hs != hd:
                    pairs.add((hs, hd))
        pairs = sorted(pairs)
        return pa.table({"src": pa.array([p[0] for p in pairs], pa.string()),
                         "dst": pa.array([p[1] for p in pairs], pa.string())})

    e = seeds.map_batches(host_edges, batch_format="pyarrow")
    e = keep_first_sorted(e.sort(["src", "dst"]), ["src", "dst"])

    def add_pair_key(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return t.append_column(
            "pk", pc.binary_join_element_wise(lo, hi, "|"))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"n_edges": pa.nulls(0, pa.int64()),
                             "n_recip": pa.nulls(0, pa.int64())})
        df = t.select(["src", "dst"]).to_pandas()
        rev = df.rename(columns={"src": "dst", "dst": "src"})
        hit = df.merge(rev, on=["src", "dst"], how="inner")
        return pa.table({"n_edges": pa.array([len(df)], pa.int64()),
                         "n_recip": pa.array([len(hit)], pa.int64())})

    partials = bucketed_reduce(
        e.map_batches(add_pair_key, batch_format="pyarrow"),
        "pk", bucket_fn, n_buckets=8)
    n_edges = n_recip = 0
    for r in partials.take_all():
        n_edges += int(r["n_edges"]); n_recip += int(r["n_recip"])
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_recip": pa.array([n_recip], pa.int64()),
        "reciprocity_ppm": pa.array(
            [10**6 * n_recip // max(n_edges, 1)], pa.int64()),
    })


@functools.lru_cache(maxsize=1)
def _host_reciprocity_sql() -> str:
    src, dst = _host_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(f"({_sql_str(s)}, {_sql_str(t)})"
                      for s, t in zip(src, dst))
    return f"""
WITH e(src, dst) AS (VALUES {rows})
SELECT count(*)::BIGINT AS n_edges,
       sum(CASE WHEN EXISTS (SELECT 1 FROM e r
                             WHERE r.src = e.dst AND r.dst = e.src)
           THEN 1 ELSE 0 END)::BIGINT AS n_recip,
       CAST(1000000::HUGEINT
            * sum(CASE WHEN EXISTS (SELECT 1 FROM e r
                                    WHERE r.src = e.dst AND r.dst = e.src)
                  THEN 1 ELSE 0 END)::HUGEINT
            // count(*)::HUGEINT AS BIGINT) AS reciprocity_ppm
FROM e
"""


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over non-negative int64 (numpy < 2 has
    no bitwise_count)."""
    v = x.astype(np.uint64)
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = ((v & np.uint64(0x3333333333333333))
         + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64)


def q_user_active_bitmap(sf_dir: str):
    """Bitmap-index activity summary: per user, the int64 BITMASK of
    active days-of-month (bit d-1 set iff the user has an event on day
    d), its popcount, and the event count — the roaring-bitmap shape a
    100 TB engine keeps per entity because OR-merge partials are 8
    bytes and associative. Per-batch (user, mask, n) partials via a
    C-level grouped bitwise-OR, one exchange by user to OR/sum-merge,
    and a SWAR popcount ladder (no per-row Python). DuckDB's bit_or /
    bit_count aggregate pair restates the whole thing."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        day = pc.day(t["ts"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": np.left_shift(np.int64(1), day - 1),
        })
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())),
            n=("bit", "size"))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "day_mask": pa.nulls(0, pa.int64()),
                          "n_active_days": pa.nulls(0, pa.int64()),
                          "n_events": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(
            day_mask=("mask", lambda s: np.bitwise_or.reduce(s.to_numpy())),
            n_events=("n", "sum"))
        return pa.table({
            "user_id": pa.array(g["user_id"], pa.int64()),
            "day_mask": pa.array(g["day_mask"], pa.int64()),
            "n_active_days": pa.array(
                _popcount64(g["day_mask"].to_numpy()), pa.int64()),
            "n_events": pa.array(g["n_events"], pa.int64()),
        })

    partials = ev.map_batches(partial, batch_format="pyarrow")
    return bucketed_reduce(partials, "user_id", bucket_fn, n_buckets=16)


SQL_USER_ACTIVE_BITMAP = """
SELECT user_id,
       bit_or(1::BIGINT << (day(ts) - 1))::BIGINT AS day_mask,
       bit_count(bit_or(1::BIGINT << (day(ts) - 1)))::BIGINT
         AS n_active_days,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1
"""


def _copurchase_items(sf_dir: str):
    """The co-purchase graph's item stream (the `triangle_counts`
    predicate), shared by every whole-graph metric."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")


_COPURCHASE_PAIRS_CTE = f"""
li AS (SELECT l_orderkey, l_partkey FROM lineitem
       WHERE l_partkey % {TRIANGLE_PART_MOD} = 0),
pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
)"""


def q_clustering_coeff(sf_dir: str):
    """GLOBAL CLUSTERING COEFFICIENT (transitivity) of the co-purchase
    graph: 3 x triangles / wedges in exact floored ppm — the one-number
    'how cliquey is this graph' metric. Triangles reuse the full
    node-iterator plan (`graph.triangle_counts`, whose per-node counts
    sum to exactly 3T); wedges need only degrees: one exchange of the
    shared `cooccurrence_edges` by node (both endpoints emitted), each
    bucket folding sum d(d-1)/2 plus node/edge counts to three ints.
    Nothing but O(buckets) int rows reach the driver."""
    from .pipelines.graph import cooccurrence_edges, triangle_counts
    from .pipelines.relational import bucketed_reduce

    items = _copurchase_items(sf_dir)
    edges = cooccurrence_edges(items, "l_orderkey", "l_partkey")

    closed = 0
    for r in triangle_counts(items, "l_orderkey", "l_partkey").take_all():
        closed += int(r["n_triangles"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})

    def deg_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_nodes": pa.nulls(0, pa.int64()),
                             "n_half_edges": pa.nulls(0, pa.int64()),
                             "wedges": pa.nulls(0, pa.int64())})
        _, d = np.unique(t["node"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({
            "n_nodes": pa.array([len(d)], pa.int64()),
            "n_half_edges": pa.array([int(d.sum())], pa.int64()),
            "wedges": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
        })

    n_nodes = half = wedges = 0
    for r in bucketed_reduce(
            edges.map_batches(both_dirs, batch_format="pyarrow"),
            "node", deg_fold, n_buckets=8).take_all():
        n_nodes += int(r["n_nodes"]); half += int(r["n_half_edges"])
        wedges += int(r["wedges"])
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([half // 2], pa.int64()),
        "wedges": pa.array([wedges], pa.int64()),
        "closed": pa.array([closed], pa.int64()),
        "global_cc_ppm": pa.array(
            [10**6 * closed // max(wedges, 1)], pa.int64()),
    })


SQL_CLUSTERING_COEFF = f"""
WITH {_COPURCHASE_PAIRS_CTE},
wedges AS (SELECT e1.a AS p, e1.b AS x, e2.b AS y
           FROM pairs e1 JOIN pairs e2 ON e1.a = e2.a AND e1.b < e2.b),
tris AS (SELECT w.p FROM wedges w
         JOIN pairs e ON e.a = w.x AND e.b = w.y),
deg AS (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs),
d AS (SELECT node, count(*)::HUGEINT AS dg FROM deg GROUP BY 1),
s AS (SELECT count(*)::BIGINT AS n_nodes,
             sum(dg)::BIGINT AS half,
             sum(dg * (dg - 1) // 2)::BIGINT AS wedges
      FROM d),
t AS (SELECT 3 * count(*)::BIGINT AS closed FROM tris)
SELECT s.n_nodes, (s.half // 2)::BIGINT AS n_edges, s.wedges, t.closed,
       CAST(1000000::HUGEINT * t.closed
            // greatest(s.wedges, 1)::HUGEINT AS BIGINT) AS global_cc_ppm
FROM s, t
"""


def q_degree_assortativity(sf_dir: str):
    """DEGREE ASSORTATIVITY of the co-purchase graph: Pearson
    correlation of endpoint degrees over every edge (both orientations
    — do hubs link to hubs?), in the repo's exact corr contract
    (`price_correlation`): covariance sign + corr-squared in floored
    ppm from the six integer sufficient statistics, no sqrt. Degrees
    come from one exchange of the shared `cooccurrence_edges` by node;
    attaching them to both endpoints is TWO `bucketed_hash_join`s (a
    then b — degree is a 2-column table, never a driver dict); the
    symmetrized sufficient stats fold per batch to 6 ints."""
    from .pipelines.graph import cooccurrence_edges
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce
    from .util import drop_empty_blocks

    edges = cooccurrence_edges(
        _copurchase_items(sf_dir), "l_orderkey", "l_partkey")

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})

    def deg_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.nulls(0, pa.int64()),
                             "dg": pa.nulls(0, pa.int64())})
        u, d = np.unique(t["node"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "dg": pa.array(d.astype(np.int64))})

    deg = drop_empty_blocks(bucketed_reduce(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        "node", deg_of, n_buckets=8)).materialize()

    ea = edges.map_batches(
        lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow")
    j1 = drop_empty_blocks(bucketed_hash_join(ea, deg, "node", n_buckets=8))
    j1 = j1.map_batches(
        lambda t: pa.table({"node": t["b"], "da": t["dg"]}),
        batch_format="pyarrow")
    db = deg.map_batches(
        lambda t: t.rename_columns(["node", "db"]), batch_format="pyarrow")
    j2 = drop_empty_blocks(bucketed_hash_join(j1, db, "node", n_buckets=8))

    def stat_partial(t: pa.Table) -> pa.Table:
        da = t["da"].to_numpy(zero_copy_only=False)
        db_ = t["db"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([2 * len(da)], pa.int64()),
            "sx": pa.array([int(da.sum() + db_.sum())], pa.int64()),
            "sxy": pa.array([int(2 * (da * db_).sum())], pa.int64()),
            "sxx": pa.array([int((da * da).sum() + (db_ * db_).sum())],
                            pa.int64()),
        })

    n = sx = sxy = sxx = 0
    for r in j2.map_batches(stat_partial, batch_format="pyarrow").take_all():
        n += int(r["n"]); sx += int(r["sx"])
        sxy += int(r["sxy"]); sxx += int(r["sxx"])
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "cov_sign": pa.array([0 if num == 0 else (1 if num > 0 else -1)],
                             pa.int64()),
        "corr2_ppm": pa.array([num * num * 10**6 // (den * den)], pa.int64()),
    })


SQL_DEGREE_ASSORTATIVITY = f"""
WITH {_COPURCHASE_PAIRS_CTE},
deg AS (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs),
d AS (SELECT node, count(*)::BIGINT AS dg FROM deg GROUP BY 1),
e AS (SELECT d1.dg AS x, d2.dg AS y
      FROM pairs p JOIN d d1 ON d1.node = p.a JOIN d d2 ON d2.node = p.b),
b AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
s AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
             sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx
      FROM b)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxy - sx * sx = 0 THEN 0
            WHEN n * sxy - sx * sx > 0 THEN 1 ELSE -1 END::BIGINT
         AS cov_sign,
       CAST((n * sxy - sx * sx) * (n * sxy - sx * sx) * 1000000::HUGEINT
            // ((n * sxx - sx * sx) * (n * sxx - sx * sx)) AS BIGINT)
         AS corr2_ppm
FROM s
"""


def q_cohort_ltv(sf_dir: str):
    """Cohort LIFETIME VALUE: purchase revenue by (signup-day cohort,
    days since signup) — the growth-analytics matrix behind retention
    curves, and a correlated two-stream computation (each purchase needs
    ITS user's first signup day) lowered with ZERO joins: one exchange
    of the raw events by user co-locates a user's signups and purchases,
    the per-bucket kernel takes min signup day per user (C-level
    groupby), maps it onto that bucket's purchases, and emits
    (cohort, age_days, cents) partials — <= 31 x 31 rows per bucket —
    folded O(grid) on the driver. Users who never signed up (or
    purchased before signing up) drop out exactly as the oracle's
    JOIN + WHERE does."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(t["event_type"], "signup"),
                      pc.equal(t["event_type"], "purchase"))
        t = t.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.day(t["ts"]).cast(pa.int64()),
            "is_purchase": pc.equal(t["event_type"],
                                    "purchase").cast(pa.int64()),
            "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"cohort": pa.nulls(0, pa.int64()),
                          "age_days": pa.nulls(0, pa.int64()),
                          "cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        s = (df[df["is_purchase"] == 0].groupby("user_id")["day"].min())
        p = df[df["is_purchase"] == 1].copy()
        p["cohort"] = p["user_id"].map(s)
        p = p[p["cohort"].notna() & (p["day"] >= p["user_id"].map(s))]
        if p.empty:
            return empty
        p["age_days"] = p["day"] - p["cohort"].astype("int64")
        g = p.groupby(["cohort", "age_days"], as_index=False)["cents"].sum()
        return pa.table({
            "cohort": pa.array(g["cohort"].astype("int64"), pa.int64()),
            "age_days": pa.array(g["age_days"].astype("int64"), pa.int64()),
            "cents": pa.array(g["cents"], pa.int64()),
        })

    partials = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)
    acc: dict[tuple[int, int], int] = {}
    for r in partials.take_all():
        k = (int(r["cohort"]), int(r["age_days"]))
        acc[k] = acc.get(k, 0) + int(r["cents"])
    keys = sorted(acc)
    return pa.table({
        "cohort": pa.array([k[0] for k in keys], pa.int64()),
        "age_days": pa.array([k[1] for k in keys], pa.int64()),
        "cents": pa.array([acc[k] for k in keys], pa.int64()),
    })


SQL_COHORT_LTV = """
WITH s AS (
  SELECT user_id, min(day(ts))::BIGINT AS cohort
  FROM events WHERE event_type = 'signup' GROUP BY 1
), p AS (
  SELECT user_id, day(ts)::BIGINT AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT s.cohort, (p.d - s.cohort)::BIGINT AS age_days,
       sum(p.cents)::BIGINT AS cents
FROM p JOIN s USING (user_id)
WHERE p.d >= s.cohort
GROUP BY 1, 2
"""


def q_ri_audit(sf_dir: str):
    """Referential-integrity audit across the orders <-> lineitem
    foreign key, both directions at once: total counts, ORPHAN
    lineitems (no parent order) and CHILDLESS orders (no lineitem) —
    the data-quality gate a 100 TB ingest runs before publishing a
    snapshot. Each direction is a bloom-gated `bucketed_anti_join`
    (the bloom proves absence, so clean data — the common case — rides
    the bypass and almost nothing enters the exchange); only counts
    fold on the driver."""
    from .pipelines.relational import bucketed_anti_join

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def count_of(ds) -> int:
        return int(ds.count())

    n_orders = count_of(orders)
    n_lineitems = count_of(li)
    li_keys = li.map_batches(
        lambda t: t.rename_columns(["o_orderkey"]), batch_format="pyarrow")
    orphans = bucketed_anti_join(li_keys, orders, "o_orderkey",
                                 n_buckets=8, bloom_bits=1 << 20)
    childless = bucketed_anti_join(orders, li_keys, "o_orderkey",
                                   n_buckets=8, bloom_bits=1 << 20)
    return pa.table({
        "n_orders": pa.array([n_orders], pa.int64()),
        "n_lineitems": pa.array([n_lineitems], pa.int64()),
        "orphan_lineitems": pa.array([int(orphans.count())], pa.int64()),
        "childless_orders": pa.array([int(childless.count())], pa.int64()),
    })


SQL_RI_AUDIT = """
SELECT (SELECT count(*) FROM orders)::BIGINT AS n_orders,
       (SELECT count(*) FROM lineitem)::BIGINT AS n_lineitems,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
         AS orphan_lineitems,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey))::BIGINT
         AS childless_orders
"""


def q_pareto_share(sf_dir: str):
    """Revenue CONCENTRATION (Pareto 80/20 audit): the exact share of
    total order revenue held by the top-k customers, k = n - ceil(0.8n)
    — a global ORDER-STATISTIC-plus-sum query with no full sort: the
    80th-percentile revenue threshold comes from
    `stats.exact_quantiles_hist` (iterative histogram refinement, no
    value stream to the driver), then ONE more streaming pass with the
    broadcast threshold folds (count, sum) below it; the top-set sum is
    total - bottom, with threshold ties resolved by VALUE (equal-valued
    ties contribute the same cents whichever rows the rank cut picks,
    so the engine and the oracle's row_number cut agree exactly).
    Customer revenues come from one per-batch-partial + bucketed
    exchange, the repo's standard two-step aggregate."""
    from .pipelines.relational import bucketed_reduce
    from .pipelines.stats import exact_quantiles_hist
    from .util import drop_empty_blocks

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({"o_custkey": t["o_custkey"],
                          "r": _cents(t["o_totalprice"])})
                .group_by(["o_custkey"]).aggregate([("r", "sum")])
                .rename_columns(["o_custkey", "r"]))

    def per_cust(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.nulls(0, pa.int64()),
                             "r": pa.nulls(0, pa.int64())})
        return (t.group_by(["o_custkey"]).aggregate([("r", "sum")])
                .rename_columns(["o_custkey", "r"]))

    rev = drop_empty_blocks(bucketed_reduce(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey", per_cust, n_buckets=16)).materialize()

    qt = exact_quantiles_hist(rev, "r", [800])
    v = int(qt.column("r")[0].as_py())

    def fold(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        lt = r < v
        return pa.table({
            "n": pa.array([len(r)], pa.int64()),
            "tot": pa.array([int(r.sum())], pa.int64()),
            "n_lt": pa.array([int(lt.sum())], pa.int64()),
            "s_lt": pa.array([int(r[lt].sum())], pa.int64()),
        })

    n = tot = n_lt = s_lt = 0
    for row in rev.map_batches(fold, batch_format="pyarrow").take_all():
        n += int(row["n"]); tot += int(row["tot"])
        n_lt += int(row["n_lt"]); s_lt += int(row["s_lt"])
    r_rank = (800 * n + 999) // 1000
    k = n - r_rank
    bottom = s_lt + (r_rank - n_lt) * v
    top = tot - bottom
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "top_cents": pa.array([top], pa.int64()),
        "total_cents": pa.array([tot], pa.int64()),
        "share_ppm": pa.array([10**6 * top // tot], pa.int64()),
    })


SQL_PARETO_SHARE = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS r
  FROM orders GROUP BY 1
), o AS (
  SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS rn,
         count(*) OVER () AS n, sum(r) OVER () AS tot
  FROM rev
)
SELECT max(n)::BIGINT AS n_customers,
       (max(n) - (800 * max(n) + 999) // 1000)::BIGINT AS k,
       (max(tot) - sum(CASE WHEN rn <= (800 * n + 999) // 1000
                       THEN r ELSE 0 END))::BIGINT AS top_cents,
       max(tot)::BIGINT AS total_cents,
       CAST(1000000::HUGEINT
            * (max(tot) - sum(CASE WHEN rn <= (800 * n + 999) // 1000
                              THEN r ELSE 0 END))::HUGEINT
            // max(tot)::HUGEINT AS BIGINT) AS share_ppm
FROM o
"""


def q_charset_histogram(sf_dir: str):
    """Character-class profile per language: ppm of ASCII digits,
    ASCII letters, spaces, and everything else over each language's
    total characters — the byte-level corpus audit (mojibake / boiler-
    plate detection) done with C-level vectorized regex counts per
    batch (pandas str.count, compiled once), <= |langs| x 5 int
    partials per block, exact floored-ppm driver fold. ASCII classes
    on purpose: both engines' regex semantics agree exactly there."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        s = pd.Series(t["text"].to_pylist()).fillna("")
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "chars": s.str.len().to_numpy(np.int64),
            "digits": s.str.count(r"[0-9]").to_numpy(np.int64),
            "letters": s.str.count(r"[A-Za-z]").to_numpy(np.int64),
            "spaces": s.str.count(r" ").to_numpy(np.int64),
        })
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    acc: dict[str, list[int]] = {}
    for r in docs.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["lang"], [0, 0, 0, 0])
        a[0] += int(r["chars"]); a[1] += int(r["digits"])
        a[2] += int(r["letters"]); a[3] += int(r["spaces"])
    langs = sorted(acc)

    def ppm(i: int) -> list[int]:
        return [10**6 * acc[l][i] // max(acc[l][0], 1) for l in langs]

    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_chars": pa.array([acc[l][0] for l in langs], pa.int64()),
        "digit_ppm": pa.array(ppm(1), pa.int64()),
        "letter_ppm": pa.array(ppm(2), pa.int64()),
        "space_ppm": pa.array(ppm(3), pa.int64()),
        "other_ppm": pa.array(
            [10**6 * (acc[l][0] - acc[l][1] - acc[l][2] - acc[l][3])
             // max(acc[l][0], 1) for l in langs], pa.int64()),
    })


SQL_CHARSET_HISTOGRAM = """
WITH c AS (
  SELECT lang, length(text)::BIGINT AS chars,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS digits,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT
           AS letters,
         (length(text) - length(replace(text, ' ', '')))::BIGINT AS spaces
  FROM documents
), s AS (
  SELECT lang, sum(chars)::HUGEINT AS chars, sum(digits)::HUGEINT AS digits,
         sum(letters)::HUGEINT AS letters, sum(spaces)::HUGEINT AS spaces
  FROM c GROUP BY 1
)
SELECT lang, CAST(chars AS BIGINT) AS n_chars,
       CAST(1000000::HUGEINT * digits // greatest(chars, 1) AS BIGINT)
         AS digit_ppm,
       CAST(1000000::HUGEINT * letters // greatest(chars, 1) AS BIGINT)
         AS letter_ppm,
       CAST(1000000::HUGEINT * spaces // greatest(chars, 1) AS BIGINT)
         AS space_ppm,
       CAST(1000000::HUGEINT * (chars - digits - letters - spaces)
            // greatest(chars, 1) AS BIGINT) AS other_ppm
FROM s
"""


def q_table_diff(sf_dir: str):
    """SNAPSHOT DIFF (the CDC shape): compare each user's aggregate
    state between two dataset versions — v1 = events of days 1-15, v2 =
    days 16-31 — and classify every key as added / removed / changed /
    unchanged, with per-category user counts and both versions' cents.
    Semantically a FULL OUTER JOIN of the two versions, but lowered
    with ZERO joins: one pass of per-batch (user, n1, c1, n2, c2)
    masked partials, one exchange by user to merge them (presence =
    n > 0, so a genuine 0-sum user differs from an absent one exactly
    as the outer join's NULLs do), and a <= 4-row classify fold per
    bucket. The diff a 100 TB pipeline runs between publishes."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.day(t["ts"]).cast(pa.int64())
        is1 = pc.less_equal(day, 15).cast(pa.int64())
        cents = _cents(t["value"])
        z = pa.scalar(0, pa.int64())
        tmp = pa.table({
            "user_id": t["user_id"],
            "n1": is1,
            "c1": pc.if_else(pc.equal(is1, 1), cents, z),
            "n2": pc.subtract(pa.scalar(1, pa.int64()), is1),
            "c2": pc.if_else(pc.equal(is1, 0), cents, z),
        })
        return (tmp.group_by(["user_id"])
                .aggregate([(c, "sum") for c in ("n1", "c1", "n2", "c2")])
                .rename_columns(["user_id", "n1", "c1", "n2", "c2"]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"category": pa.nulls(0, pa.string()),
                          "n_users": pa.nulls(0, pa.int64()),
                          "cents_v1": pa.nulls(0, pa.int64()),
                          "cents_v2": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.to_pandas().groupby("user_id", as_index=False)
             [["n1", "c1", "n2", "c2"]].sum())
        cat = np.where(g["n1"] == 0, "added",
                       np.where(g["n2"] == 0, "removed",
                                np.where(g["c1"] == g["c2"],
                                         "unchanged", "changed")))
        out = (pd.DataFrame({"category": cat, "c1": g["c1"], "c2": g["c2"]})
               .groupby("category", as_index=False)
               .agg(n_users=("c1", "size"), cents_v1=("c1", "sum"),
                    cents_v2=("c2", "sum")))
        return pa.table({
            "category": pa.array(out["category"], pa.string()),
            "n_users": pa.array(out["n_users"], pa.int64()),
            "cents_v1": pa.array(out["cents_v1"], pa.int64()),
            "cents_v2": pa.array(out["cents_v2"], pa.int64()),
        })

    partials = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)
    acc: dict[str, list[int]] = {}
    for r in partials.take_all():
        a = acc.setdefault(r["category"], [0, 0, 0])
        a[0] += int(r["n_users"])
        a[1] += int(r["cents_v1"]); a[2] += int(r["cents_v2"])
    cats = sorted(acc)
    return pa.table({
        "category": pa.array(cats, pa.string()),
        "n_users": pa.array([acc[c][0] for c in cats], pa.int64()),
        "cents_v1": pa.array([acc[c][1] for c in cats], pa.int64()),
        "cents_v2": pa.array([acc[c][2] for c in cats], pa.int64()),
    })


SQL_TABLE_DIFF = """
WITH v1 AS (
  SELECT user_id, sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
  FROM events WHERE day(ts) <= 15 GROUP BY 1
), v2 AS (
  SELECT user_id, sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
  FROM events WHERE day(ts) >= 16 GROUP BY 1
), j AS (
  SELECT CASE WHEN v1.user_id IS NULL THEN 'added'
              WHEN v2.user_id IS NULL THEN 'removed'
              WHEN v1.c = v2.c THEN 'unchanged'
              ELSE 'changed' END AS category,
         coalesce(v1.c, 0) AS c1, coalesce(v2.c, 0) AS c2
  FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
)
SELECT category, count(*)::BIGINT AS n_users,
       sum(c1)::BIGINT AS cents_v1, sum(c2)::BIGINT AS cents_v2
FROM j GROUP BY 1
"""


RANGE_PART_PMS = [125, 250, 375, 500, 625, 750, 875]


def q_range_partition_bounds(sf_dir: str):
    """RANGE-PARTITION PLANNING: the 7 boundary values that split order
    totals into 8 equal-count ranges — the boundaries a 100 TB range
    exchange (sort, range-partitioned write) computes before moving any
    data. Pure `stats.exact_quantiles_hist` (iterative histogram
    refinement: O(blocks x q x bins) int partials per pass, never a
    value stream to the driver), surfaced as its own catalog entry
    because the planning step IS the operator at warehouse scale."""
    from .pipelines.stats import exact_quantiles_hist

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    prepped = orders.map_batches(
        lambda t: pa.table({"cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    qt = exact_quantiles_hist(prepped, "cents", RANGE_PART_PMS)
    return pa.table({"q_pm": qt["q_pm"], "cents": qt["cents"]})


SQL_RANGE_PARTITION_BOUNDS = """
WITH t AS (SELECT round(o_totalprice * 100)::BIGINT AS cents FROM orders),
c AS (SELECT cents, count(*)::BIGINT AS n FROM t GROUP BY 1),
w AS (SELECT cents, sum(n) OVER (ORDER BY cents) AS cum,
             sum(n) OVER () AS tot
      FROM c),
q AS (SELECT unnest([125, 250, 375, 500, 625, 750, 875]) AS q_pm)
SELECT q.q_pm::BIGINT AS q_pm, min(w.cents) AS cents
FROM w CROSS JOIN q
WHERE w.cum >= (q.q_pm * w.tot + 999) // 1000
GROUP BY 1
"""


def q_latest_state(sf_dir: str):
    """KEEP-LATEST compaction (the upsert / log-compaction operator of
    every log-structured table): per (user, event_type), the value of
    the LATEST event — argmax by (ts, event_id), the deterministic tie
    the oracle's row_number ORDER BY states. `exact_dedup` keeps the
    FIRST by content hash; this is its dual, keyed and time-ordered.
    One exchange on the user key (both key columns agree in one bucket
    — composite grouping inside), a C-level sort + keep-last per
    bucket, output bounded by |user x type|."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts": t["ts"], "event_id": t["event_id"],
                         "cents": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "event_type": pa.nulls(0, pa.string()),
                          "last_event_id": pa.nulls(0, pa.int64()),
                          "last_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        df = t.to_pandas()
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        df = df.assign(_ts=ts).sort_values(
            ["user_id", "event_type", "_ts", "event_id"])
        last = df.groupby(["user_id", "event_type"], as_index=False).last()
        return pa.table({
            "user_id": pa.array(last["user_id"], pa.int64()),
            "event_type": pa.array(last["event_type"], pa.string()),
            "last_event_id": pa.array(last["event_id"], pa.int64()),
            "last_cents": pa.array(last["cents"], pa.int64()),
        })

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)


SQL_LATEST_STATE = """
SELECT user_id, event_type, event_id AS last_event_id,
       CAST(round(value * 100) AS BIGINT) AS last_cents
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def q_bounce_rate(sf_dir: str):
    """Sessionized BOUNCE RATE: per calendar day (of session start),
    the ppm of sessions containing exactly one event — the composed
    form of `sessions` (same `streaming.sessionize` kernel, same 30-min
    gap rule) with a <= 31 x 3-int partial rollup on top; proof the
    windowed operators compose into downstream aggregates without a
    second shuffle."""
    from .pipelines.streaming import sessionize

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "ts": t["ts"],
                         "user_id": t["user_id"],
                         "cents": _cents(t["value"])})

    sess = sessionize(ds.map_batches(prep, batch_format="pyarrow"),
                      "user_id", "ts", "cents", "event_id",
                      gap_seconds=SESSION_GAP_SECONDS)

    def partial(t: pa.Table) -> pa.Table:
        day = pc.day(t["session_start"]).cast(pa.int64())
        one = pc.equal(t["n_events"], 1).cast(pa.int64())
        return (pa.table({"day": day, "one": one})
                .group_by(["day"])
                .aggregate([([], "count_all"), ("one", "sum")]))

    acc: dict[int, list[int]] = {}
    for r in sess.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(int(r["day"]), [0, 0])
        a[0] += int(r["count_all"]); a[1] += int(r["one_sum"])
    days = sorted(acc)
    return pa.table({
        "day": pa.array(days, pa.int64()),
        "n_sessions": pa.array([acc[d][0] for d in days], pa.int64()),
        "n_bounces": pa.array([acc[d][1] for d in days], pa.int64()),
        "bounce_ppm": pa.array(
            [10**6 * acc[d][1] // acc[d][0] for d in days], pa.int64()),
    })


SQL_BOUNCE_RATE = f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_SECONDS} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
), g AS (
  SELECT user_id, session_id, min(ts) AS session_start,
         count(*)::BIGINT AS n_events
  FROM s GROUP BY 1, 2
)
SELECT day(session_start)::BIGINT AS day,
       count(*)::BIGINT AS n_sessions,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
       CAST(1000000::HUGEINT
            * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::HUGEINT
            // count(*)::HUGEINT AS BIGINT) AS bounce_ppm
FROM g GROUP BY 1
"""


def q_longest_streak(sf_dir: str):
    """GAPS-AND-ISLANDS on the calendar grid: each user's longest run
    of CONSECUTIVE active days plus their active-day count — the streak
    feature (the islands come from day - rank being constant within a
    run, the classic lowering the oracle states verbatim). One exchange
    by user; per bucket the distinct (user, day) grid sorts once and a
    single vectorized diff/cumsum pass labels runs for EVERY user at
    once (new run where user changes or day gap > 1), then a C-level
    run-length groupby takes each user's max. Output is one row per
    user."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return (pa.table({"user_id": t["user_id"],
                          "day": pc.day(t["ts"]).cast(pa.int64())})
                .group_by(["user_id", "day"]).aggregate([]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_active_days": pa.nulls(0, pa.int64()),
                          "longest_streak": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().drop_duplicates(["user_id", "day"])
              .sort_values(["user_id", "day"]))
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        new_run = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        run_id = np.cumsum(new_run)
        runs = (pd.DataFrame({"u": u, "run": run_id})
                .groupby(["u", "run"]).size().reset_index(name="len"))
        out = runs.groupby("u", as_index=False).agg(
            longest_streak=("len", "max"), n_runs=("len", "size"))
        days = (pd.DataFrame({"u": u}).groupby("u").size()
                .reset_index(name="n_active_days"))
        out = out.merge(days, on="u")
        return pa.table({
            "user_id": pa.array(out["u"], pa.int64()),
            "n_active_days": pa.array(out["n_active_days"], pa.int64()),
            "longest_streak": pa.array(out["longest_streak"], pa.int64()),
        })

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)


SQL_LONGEST_STREAK = """
WITH d AS (
  SELECT DISTINCT user_id, day(ts)::BIGINT AS day FROM events
), r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
), runs AS (
  SELECT user_id, island, count(*)::BIGINT AS len
  FROM r GROUP BY 1, 2
)
SELECT user_id, sum(len)::BIGINT AS n_active_days,
       max(len)::BIGINT AS longest_streak
FROM runs GROUP BY 1
"""


THIRD_K = 3


def q_third_largest(sf_dir: str):
    """K-th largest DISTINCT value per group (k=3): the order statistic
    whose partial is a mergeable top-k-distinct set — each block emits
    its 3 largest distinct cents per event type (8 B each), the driver
    merges O(blocks x k x groups) ints and takes the 3rd largest of the
    union, exact because a value in the global top-3 distinct is in
    some block's local top-3 distinct. Groups with < 3 distinct values
    drop out, as the oracle's dense_rank predicate does."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "cents": _cents(t["value"]).to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        top = (df.sort_values(["event_type", "cents"],
                              ascending=[True, False])
               .groupby("event_type").head(THIRD_K))
        return pa.Table.from_pandas(top, preserve_index=False)

    tops: dict[str, set[int]] = {}
    for r in ev.map_batches(partial, batch_format="pyarrow").take_all():
        tops.setdefault(r["event_type"], set()).add(int(r["cents"]))
    types, vals = [], []
    for ty in sorted(tops):
        s = sorted(tops[ty], reverse=True)
        if len(s) >= THIRD_K:
            types.append(ty)
            vals.append(s[THIRD_K - 1])
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "third_cents": pa.array(vals, pa.int64())})


SQL_THIRD_LARGEST = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
         dense_rank() OVER (PARTITION BY event_type
                            ORDER BY cents DESC) AS rk
  FROM d
)
SELECT event_type, cents AS third_cents
FROM r WHERE rk = {THIRD_K}
"""


def q_weighted_median(sf_dir: str):
    """WEIGHTED median per group: the quantity-weighted median price
    per returnflag — the order statistic where each row counts `weight`
    times (inventory-weighted pricing). Same histogram-partial plan as
    `grouped_quantiles` but the per-(group, value) partial carries a
    WEIGHT SUM instead of a count; the driver walks each group's value
    histogram to the smallest value whose cumulative weight reaches
    ceil(W/2) — the exact rank contract restated in the oracle's
    window CTE. Never a sort of the input; quantities in exact rounded
    integers."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({
            "flag": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
            "w": pc.round(t["l_quantity"]).cast(pa.int64()),
        }).group_by(["flag", "cents"]).aggregate([("w", "sum")]))

    hist: dict[str, dict[int, int]] = {}
    for r in li.map_batches(partial, batch_format="pyarrow").take_all():
        h = hist.setdefault(r["flag"], {})
        c = int(r["cents"])
        h[c] = h.get(c, 0) + int(r["w_sum"])
    flags = sorted(hist)
    meds = []
    for f in flags:
        wtot = sum(hist[f].values())
        rank = (wtot + 1) // 2
        cum = 0
        for v in sorted(hist[f]):
            cum += hist[f][v]
            if cum >= rank:
                meds.append(v)
                break
    return pa.table({"flag": pa.array(flags, pa.string()),
                     "wmedian_cents": pa.array(meds, pa.int64())})


SQL_WEIGHTED_MEDIAN = """
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
), c AS (SELECT flag, cents, sum(w)::BIGINT AS w FROM t GROUP BY 1, 2),
w AS (SELECT flag, cents,
             sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             sum(w) OVER (PARTITION BY flag) AS tot
      FROM c)
SELECT flag, min(cents) AS wmedian_cents
FROM w WHERE cum >= (tot + 1) // 2 GROUP BY 1
"""


def q_quartile_label(sf_dir: str):
    """Broadcast-threshold ENRICHMENT: label every order with its
    global total-price quartile (1-4) and roll the labels up per order
    priority — the two-phase pattern a 100 TB feature pipeline uses for
    any rank feature: compute the 3 quartile bounds once
    (`exact_quantiles_hist`, histogram refinement, no sort), broadcast
    3 ints, then one vectorized searchsorted labels every row on its
    way into a <= 5 x 4 partial rollup. Tie contract: label = smallest
    quartile whose bound >= the value (values above the 750-bound get
    4), exactly the CASE the oracle states."""
    from .pipelines.stats import exact_quantiles_hist

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    prepped = orders.map_batches(
        lambda t: pa.table({"priority": t["o_orderpriority"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow").materialize()
    qt = exact_quantiles_hist(prepped, "cents", [250, 500, 750])
    bounds = {int(q): int(v) for q, v in
              zip(qt["q_pm"].to_pylist(), qt["cents"].to_pylist())}
    b = np.array([bounds[250], bounds[500], bounds[750]], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        lab = 1 + np.searchsorted(b, cents, side="left")
        return (pa.table({"priority": t["priority"],
                          "quartile": pa.array(lab, pa.int64())})
                .group_by(["priority", "quartile"])
                .aggregate([([], "count_all")]))

    acc: dict[tuple[str, int], int] = {}
    for r in prepped.map_batches(partial, batch_format="pyarrow").take_all():
        k = (r["priority"], int(r["quartile"]))
        acc[k] = acc.get(k, 0) + int(r["count_all"])
    keys = sorted(acc)
    return pa.table({
        "priority": pa.array([k[0] for k in keys], pa.string()),
        "quartile": pa.array([k[1] for k in keys], pa.int64()),
        "n_orders": pa.array([acc[k] for k in keys], pa.int64()),
    })


SQL_QUARTILE_LABEL = """
WITH t AS (
  SELECT o_orderpriority AS priority,
         round(o_totalprice * 100)::BIGINT AS cents
  FROM orders
), c AS (SELECT cents, count(*)::BIGINT AS n FROM t GROUP BY 1),
w AS (SELECT cents, sum(n) OVER (ORDER BY cents) AS cum,
             sum(n) OVER () AS tot FROM c),
q AS (SELECT
        (SELECT min(cents) FROM w WHERE cum >= (250 * tot + 999) // 1000)
          AS b1,
        (SELECT min(cents) FROM w WHERE cum >= (500 * tot + 999) // 1000)
          AS b2,
        (SELECT min(cents) FROM w WHERE cum >= (750 * tot + 999) // 1000)
          AS b3)
SELECT t.priority,
       (CASE WHEN t.cents <= q.b1 THEN 1
             WHEN t.cents <= q.b2 THEN 2
             WHEN t.cents <= q.b3 THEN 3
             ELSE 4 END)::BIGINT AS quartile,
       count(*)::BIGINT AS n_orders
FROM t, q GROUP BY 1, 2
"""


def q_forward_fill(sf_dir: str):
    """Time-series GAP FILL: materialize every user's dense 31-day grid
    with the value carried forward from their latest event at or before
    each day (LAST_VALUE IGNORE NULLS / the densify-then-ffill step
    before any daily-grid model feature). One exchange by user; inside
    a bucket the per-(user, day) latest collapses with a C-level sort +
    keep-last, the grid is one np.repeat/tile, and the carry-forward is
    ONE searchsorted over the composite (user * 64 + day) key — no
    per-user loop, no 31-way self-join. Days before a user's first
    event stay NULL, exactly as the oracle's window does."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.day(t["ts"]).cast(pa.int64()),
            "ts": t["ts"], "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "day": pa.nulls(0, pa.int64()),
                          "filled_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        df = (df.assign(_ts=ts)
              .sort_values(["user_id", "day", "_ts", "event_id"])
              .groupby(["user_id", "day"], as_index=False).last())
        du = df["user_id"].to_numpy()
        dd = df["day"].to_numpy()
        dc = df["cents"].to_numpy()
        users = np.unique(du)
        gu = np.repeat(users, 31)
        gd = np.tile(np.arange(1, 32, dtype=np.int64), len(users))
        comp_d = du * 64 + dd
        comp_g = gu * 64 + gd
        idx = np.searchsorted(comp_d, comp_g, side="right") - 1
        ok = (idx >= 0) & (du[np.maximum(idx, 0)] == gu)
        vals = np.where(ok, dc[np.maximum(idx, 0)], 0)
        return pa.table({
            "user_id": pa.array(gu, pa.int64()),
            "day": pa.array(gd, pa.int64()),
            "filled_cents": pa.array(
                np.ma.masked_array(vals, mask=~ok), pa.int64(),
            ),
        })

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)


SQL_FORWARD_FILL = """
WITH last AS (
  SELECT user_id, day(ts)::BIGINT AS day,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id, day(ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (SELECT user_id, day, cents FROM last WHERE rn = 1),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(1, 31))::BIGINT AS day) g
)
SELECT g.user_id, g.day,
       last_value(d.cents IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.day) AS filled_cents
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
"""


def q_week_mask_histogram(sf_dir: str):
    """Audience-overlap HISTOGRAM over activity bitmasks: users bucketed
    by their 5-bit week-of-month activity mask (bit w = any event in
    week w) — the one table every pairwise 'active in week i AND week
    j' overlap reads off for free, and the natural companion of
    `user_active_bitmap` at coarser grain. Per-batch grouped OR
    partials, one exchange by user to finish the ORs, <= 32-row count
    partials to the driver."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        day = pc.day(t["ts"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": np.left_shift(np.int64(1), (day - 1) // 7),
        })
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"week_mask": pa.nulls(0, pa.int64()),
                             "n_users": pa.nulls(0, pa.int64())})
        g = (t.to_pandas().groupby("user_id", as_index=False)
             .agg(mask=("mask",
                        lambda s: np.bitwise_or.reduce(s.to_numpy()))))
        h = g.groupby("mask", as_index=False).size()
        return pa.table({"week_mask": pa.array(h["mask"], pa.int64()),
                         "n_users": pa.array(h["size"], pa.int64())})

    partials = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)
    acc: dict[int, int] = {}
    for r in partials.take_all():
        m = int(r["week_mask"])
        acc[m] = acc.get(m, 0) + int(r["n_users"])
    masks = sorted(acc)
    return pa.table({"week_mask": pa.array(masks, pa.int64()),
                     "n_users": pa.array([acc[m] for m in masks],
                                         pa.int64())})


SQL_WEEK_MASK_HISTOGRAM = """
WITH m AS (
  SELECT user_id,
         bit_or(1::BIGINT << ((day(ts) - 1) // 7))::BIGINT AS week_mask
  FROM events GROUP BY 1
)
SELECT week_mask, count(*)::BIGINT AS n_users
FROM m GROUP BY 1
"""


def q_customer_rfm(sf_dir: str):
    """RFM SEGMENTATION (recency / frequency / monetary), the classic
    feature-engineering pipeline: per customer compute days-since-last-
    order, order count, and total cents (one exchange by customer);
    resolve each metric's quartile bounds with `exact_quantiles_hist`
    (three histogram refinements over the per-customer table, never a
    sort); broadcast 9 ints; label every customer with one vectorized
    searchsorted per metric; roll up counts per 3-digit RFM code
    (<= 64 partial rows per block). The full feature loop — aggregate,
    rank, label, segment — with nothing but ints crossing stages."""
    from .pipelines.relational import bucketed_reduce
    from .pipelines.stats import exact_quantiles_hist
    from .util import drop_empty_blocks

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    DAY_US = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        DAY_US).cast(pa.int64())
        return (pa.table({
            "o_custkey": t["o_custkey"], "last_day": day,
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "cents": _cents(t["o_totalprice"]),
        }).group_by(["o_custkey"])
          .aggregate([("last_day", "max"), ("n", "sum"), ("cents", "sum")])
          .rename_columns(["o_custkey", "last_day", "n", "cents"]))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.nulls(0, pa.int64()),
                             "last_day": pa.nulls(0, pa.int64()),
                             "n": pa.nulls(0, pa.int64()),
                             "cents": pa.nulls(0, pa.int64())})
        return (t.group_by(["o_custkey"])
                .aggregate([("last_day", "max"), ("n", "sum"),
                            ("cents", "sum")])
                .rename_columns(["o_custkey", "last_day", "n", "cents"]))

    cust = drop_empty_blocks(bucketed_reduce(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey", merge, n_buckets=16)).materialize()

    gmax = 0
    for r in cust.map_batches(
            lambda t: pa.table({"m": pa.array(
                [pc.max(t["last_day"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow").take_all():
        gmax = max(gmax, int(r["m"]))

    rec = cust.map_batches(
        lambda t: pa.table({"v": pc.subtract(pa.scalar(gmax, pa.int64()),
                                             t["last_day"])}),
        batch_format="pyarrow").materialize()
    qr = exact_quantiles_hist(rec, "v", [250, 500, 750])
    qf = exact_quantiles_hist(
        cust.map_batches(lambda t: pa.table({"v": t["n"]}),
                         batch_format="pyarrow"), "v", [250, 500, 750])
    qm = exact_quantiles_hist(
        cust.map_batches(lambda t: pa.table({"v": t["cents"]}),
                         batch_format="pyarrow"), "v", [250, 500, 750])

    def b_of(qt: pa.Table) -> np.ndarray:
        d = {int(q): int(v) for q, v in
             zip(qt["q_pm"].to_pylist(), qt["v"].to_pylist())}
        return np.array([d[250], d[500], d[750]], np.int64)

    br, bf, bm = b_of(qr), b_of(qf), b_of(qm)

    def label(t: pa.Table) -> pa.Table:
        r = 1 + np.searchsorted(
            br, gmax - t["last_day"].to_numpy(zero_copy_only=False),
            side="left")
        f = 1 + np.searchsorted(
            bf, t["n"].to_numpy(zero_copy_only=False), side="left")
        m = 1 + np.searchsorted(
            bm, t["cents"].to_numpy(zero_copy_only=False), side="left")
        return (pa.table({"rfm": pa.array(100 * r + 10 * f + m, pa.int64())})
                .group_by(["rfm"]).aggregate([([], "count_all")]))

    acc: dict[int, int] = {}
    for row in cust.map_batches(label, batch_format="pyarrow").take_all():
        k = int(row["rfm"])
        acc[k] = acc.get(k, 0) + int(row["count_all"])
    codes = sorted(acc)
    return pa.table({"rfm": pa.array(codes, pa.int64()),
                     "n_customers": pa.array([acc[c] for c in codes],
                                             pa.int64())})


SQL_CUSTOMER_RFM = """
WITH cust AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000)::BIGINT AS last_day,
         count(*)::BIGINT AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
), g AS (SELECT max(last_day) AS gmax FROM cust),
rv AS (SELECT (g.gmax - c.last_day)::BIGINT AS v FROM cust c, g),
qb AS (
  SELECT q,
    (SELECT min(v) FROM (
       SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
       FROM (SELECT v, count(*)::BIGINT AS cnt FROM rv GROUP BY 1))
     WHERE cum >= (q * tot + 999) // 1000) AS b
  FROM (SELECT unnest([250, 500, 750]) AS q)
), fb AS (
  SELECT q,
    (SELECT min(v) FROM (
       SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
       FROM (SELECT n AS v, count(*)::BIGINT AS cnt FROM cust GROUP BY 1))
     WHERE cum >= (q * tot + 999) // 1000) AS b
  FROM (SELECT unnest([250, 500, 750]) AS q)
), mb AS (
  SELECT q,
    (SELECT min(v) FROM (
       SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
       FROM (SELECT cents AS v, count(*)::BIGINT AS cnt FROM cust
             GROUP BY 1))
     WHERE cum >= (q * tot + 999) // 1000) AS b
  FROM (SELECT unnest([250, 500, 750]) AS q)
), lab AS (
  SELECT
    (1 + (CASE WHEN g.gmax - c.last_day
                    > (SELECT b FROM qb WHERE q = 250) THEN 1 ELSE 0 END)
       + (CASE WHEN g.gmax - c.last_day
                    > (SELECT b FROM qb WHERE q = 500) THEN 1 ELSE 0 END)
       + (CASE WHEN g.gmax - c.last_day
                    > (SELECT b FROM qb WHERE q = 750) THEN 1 ELSE 0 END))
      AS r,
    (1 + (CASE WHEN c.n > (SELECT b FROM fb WHERE q = 250)
           THEN 1 ELSE 0 END)
       + (CASE WHEN c.n > (SELECT b FROM fb WHERE q = 500)
           THEN 1 ELSE 0 END)
       + (CASE WHEN c.n > (SELECT b FROM fb WHERE q = 750)
           THEN 1 ELSE 0 END)) AS f,
    (1 + (CASE WHEN c.cents > (SELECT b FROM mb WHERE q = 250)
           THEN 1 ELSE 0 END)
       + (CASE WHEN c.cents > (SELECT b FROM mb WHERE q = 500)
           THEN 1 ELSE 0 END)
       + (CASE WHEN c.cents > (SELECT b FROM mb WHERE q = 750)
           THEN 1 ELSE 0 END)) AS m
  FROM cust c, g
)
SELECT (100 * r + 10 * f + m)::BIGINT AS rfm,
       count(*)::BIGINT AS n_customers
FROM lab GROUP BY 1
"""


def q_hapax_ratio(sf_dir: str):
    """Lexical richness per source: the ppm of each source's vocabulary
    that are HAPAX LEGOMENA (terms used exactly once in that source) —
    the classic small-corpus / template-spam discriminator. Per-batch
    (term, source, n) count partials, ONE exchange by term so each
    (source, term) total finishes in exactly one bucket, per-bucket
    fold to (source, vocab_partial, hapax_partial) int pairs, O(sources)
    driver fold. Term strings cross the wire once."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["text", "source"])

    def prep(t: pa.Table) -> pa.Table:
        terms, srcs = [], []
        for txt, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            for w in (txt or "").split():
                terms.append(w); srcs.append(src)
        out = pa.table({"term": pa.array(terms, pa.string()),
                        "source": pa.array(srcs, pa.string())})
        if out.num_rows == 0:
            return pa.table({"term": pa.nulls(0, pa.string()),
                             "source": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        return (out.group_by(["term", "source"])
                .aggregate([([], "count_all")])
                .rename_columns(["term", "source", "n"]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"source": pa.nulls(0, pa.string()),
                             "vocab": pa.nulls(0, pa.int64()),
                             "hapax": pa.nulls(0, pa.int64())})
        g = (t.to_pandas().groupby(["source", "term"], as_index=False)
             ["n"].sum())
        out = g.groupby("source", as_index=False).agg(
            vocab=("n", "size"), total=("n", "sum"),
            hapax=("n", lambda s: int((s == 1).sum())))
        return pa.table({"source": pa.array(out["source"], pa.string()),
                         "vocab": pa.array(out["vocab"], pa.int64()),
                         "total": pa.array(out["total"], pa.int64()),
                         "hapax": pa.array(out["hapax"], pa.int64())})

    partials = bucketed_reduce(
        docs.map_batches(prep, batch_format="pyarrow"),
        "term", bucket_fn, n_buckets=32)
    acc: dict[str, list[int]] = {}
    for r in partials.take_all():
        a = acc.setdefault(r["source"], [0, 0, 0])
        a[0] += int(r["vocab"]); a[1] += int(r["total"])
        a[2] += int(r["hapax"])
    srcs = sorted(acc)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "vocab": pa.array([acc[s][0] for s in srcs], pa.int64()),
        "total": pa.array([acc[s][1] for s in srcs], pa.int64()),
        "hapax": pa.array([acc[s][2] for s in srcs], pa.int64()),
        "ttr_ppm": pa.array(
            [10**6 * acc[s][0] // max(acc[s][1], 1) for s in srcs],
            pa.int64()),
        "hapax_ppm": pa.array(
            [10**6 * acc[s][2] // max(acc[s][0], 1) for s in srcs],
            pa.int64()),
    })


SQL_HAPAX_RATIO = """
WITH t AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), c AS (SELECT source, term, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
s AS (SELECT source, count(*)::BIGINT AS vocab, sum(n)::BIGINT AS total,
             sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
      FROM c GROUP BY 1)
SELECT source, vocab, total, hapax,
       CAST(1000000::HUGEINT * vocab::HUGEINT
            // greatest(total, 1)::HUGEINT AS BIGINT) AS ttr_ppm,
       CAST(1000000::HUGEINT * hapax::HUGEINT
            // greatest(vocab, 1)::HUGEINT AS BIGINT) AS hapax_ppm
FROM s
"""


def q_part_hhi(sf_dir: str):
    """Supply-concentration audit: the HERFINDAHL-HIRSCHMAN index of
    each part's supplier mix, exact in floored ppm (sum of squared
    line-count shares = sum c_s^2 x 1e6 // n^2 — the anti-trust
    concentration measure, and the single-supplier-risk flag a supply
    chain runs at catalog scale). Per-batch (part, supplier, n)
    partials, one exchange by part (all of a part's suppliers meet in
    one bucket), per-bucket integer HHI — one row per part leaves."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def prep(t: pa.Table) -> pa.Table:
        return (pa.table({"l_partkey": t["l_partkey"],
                          "l_suppkey": t["l_suppkey"]})
                .group_by(["l_partkey", "l_suppkey"])
                .aggregate([([], "count_all")])
                .rename_columns(["l_partkey", "l_suppkey", "n"]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"l_partkey": pa.nulls(0, pa.int64()),
                             "n_lines": pa.nulls(0, pa.int64()),
                             "n_suppliers": pa.nulls(0, pa.int64()),
                             "hhi_ppm": pa.nulls(0, pa.int64())})
        g = (t.to_pandas().groupby(["l_partkey", "l_suppkey"],
                                   as_index=False)["n"].sum())
        g["n2"] = g["n"] * g["n"]
        out = g.groupby("l_partkey", as_index=False).agg(
            n_lines=("n", "sum"), n_suppliers=("n", "size"),
            s2=("n2", "sum"))
        hhi = (10**6 * out["s2"].astype(object)
               // (out["n_lines"].astype(object) ** 2)).astype("int64")
        return pa.table({
            "l_partkey": pa.array(out["l_partkey"], pa.int64()),
            "n_lines": pa.array(out["n_lines"], pa.int64()),
            "n_suppliers": pa.array(out["n_suppliers"], pa.int64()),
            "hhi_ppm": pa.array(hhi, pa.int64()),
        })

    return bucketed_reduce(
        li.map_batches(prep, batch_format="pyarrow"),
        "l_partkey", bucket_fn, n_buckets=16)


SQL_PART_HHI = """
WITH c AS (
  SELECT l_partkey, l_suppkey, count(*)::HUGEINT AS n
  FROM lineitem GROUP BY 1, 2
), s AS (
  SELECT l_partkey, sum(n) AS n_lines, count(*)::BIGINT AS n_suppliers,
         sum(n * n) AS s2
  FROM c GROUP BY 1
)
SELECT l_partkey, CAST(n_lines AS BIGINT) AS n_lines, n_suppliers,
       CAST(1000000::HUGEINT * s2 // (n_lines * n_lines) AS BIGINT)
         AS hhi_ppm
FROM s
"""


def q_join_size_estimate(sf_dir: str):
    """JOIN-SIZE statistic, computed exactly WITHOUT running the join:
    |orders x lineitem on orderkey| = sum over keys of a_k x b_k — the
    cardinality a cost-based planner needs before choosing broadcast vs
    shuffle vs salted plans, and the one number that predicts a blow-up
    before it happens. Per-batch per-key count partials on BOTH sides
    ride one tagged-union exchange on the key; each bucket finishes its
    keys' counts and dots them locally (sum a_k b_k, plus max-key
    contribution for the skew numerator); 3 ints per bucket reach the
    driver."""
    from .pipelines.relational import bucketed_reduce

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            col = t.column(0)
            g = (pa.table({"k": col}).group_by(["k"])
                 .aggregate([([], "count_all")]))
            return pa.table({"k": g["k"],
                             "side": pa.array(
                                 np.full(g.num_rows, side, np.int64)),
                             "n": g["count_all"]})
        return fn

    both = orders.map_batches(prep(0), batch_format="pyarrow").union(
        li.map_batches(prep(1), batch_format="pyarrow"))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"pairs": pa.nulls(0, pa.int64()),
                          "max_pairs": pa.nulls(0, pa.int64()),
                          "n_keys": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().groupby(["k", "side"], as_index=False)
              ["n"].sum()
              .pivot(index="k", columns="side", values="n")
              .reindex(columns=[0, 1]).fillna(0).astype("int64"))
        prod = df[0].to_numpy() * df[1].to_numpy()
        return pa.table({
            "pairs": pa.array([int(prod.sum())], pa.int64()),
            "max_pairs": pa.array([int(prod.max()) if len(prod) else 0],
                                  pa.int64()),
            "n_keys": pa.array([int((prod > 0).sum())], pa.int64()),
        })

    pairs = max_pairs = n_keys = 0
    for r in bucketed_reduce(both, "k", bucket_fn, n_buckets=16).take_all():
        pairs += int(r["pairs"])
        max_pairs = max(max_pairs, int(r["max_pairs"]))
        n_keys += int(r["n_keys"])
    return pa.table({
        "join_rows": pa.array([pairs], pa.int64()),
        "max_key_rows": pa.array([max_pairs], pa.int64()),
        "n_matching_keys": pa.array([n_keys], pa.int64()),
    })


SQL_JOIN_SIZE_ESTIMATE = """
WITH a AS (SELECT o_orderkey AS k, count(*)::BIGINT AS n
           FROM orders GROUP BY 1),
     b AS (SELECT l_orderkey AS k, count(*)::BIGINT AS n
           FROM lineitem GROUP BY 1),
     j AS (SELECT a.n * b.n AS p FROM a JOIN b USING (k))
SELECT sum(p)::BIGINT AS join_rows,
       max(p)::BIGINT AS max_key_rows,
       count(*)::BIGINT AS n_matching_keys
FROM j
"""


SKEW_TOP_K = 10


def q_key_skew_profile(sf_dir: str):
    """KEY-SKEW diagnostic for the lineitem order key: the 10 hottest
    keys with their row counts — what a planner inspects before
    choosing plain vs salted exchanges (`q_grouped_distinct`'s salting
    exists because of exactly this table). One exchange by key finishes
    exact per-key counts; each bucket emits only its local top-10
    (count desc, key asc — the oracle's deterministic tie order), and
    the driver merges B x 10 rows: a global top-10 key is some bucket's
    local top-10, so the merge is exact."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def prep(t: pa.Table) -> pa.Table:
        return (t.group_by(["l_orderkey"]).aggregate([([], "count_all")])
                .rename_columns(["l_orderkey", "n"]))

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.nulls(0, pa.int64()),
                             "n": pa.nulls(0, pa.int64())})
        g = (t.to_pandas().groupby("l_orderkey", as_index=False)["n"].sum()
             .sort_values(["n", "l_orderkey"], ascending=[False, True])
             .head(SKEW_TOP_K))
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    rows = []
    for r in bucketed_reduce(
            li.map_batches(prep, batch_format="pyarrow"),
            "l_orderkey", bucket_fn, n_buckets=16).take_all():
        rows.append((int(r["l_orderkey"]), int(r["n"])))
    rows.sort(key=lambda x: (-x[1], x[0]))
    rows = rows[:SKEW_TOP_K]
    return pa.table({
        "l_orderkey": pa.array([x[0] for x in rows], pa.int64()),
        "n": pa.array([x[1] for x in rows], pa.int64()),
    })


SQL_KEY_SKEW_PROFILE = f"""
SELECT l_orderkey, count(*)::BIGINT AS n
FROM lineitem GROUP BY 1
ORDER BY n DESC, l_orderkey ASC
LIMIT {SKEW_TOP_K}
"""


def q_order_day_share(sf_dir: str):
    """RATIO-TO-REPORT window without an exchange: every order's share
    of its order-day's total revenue in exact floored ppm — `sum() OVER
    (PARTITION BY day)` decomposed the `rank_normalize` way: per-batch
    (day, cents) partials fold into a day-total table (bounded by
    |days|, independent of row count), broadcast once, and a second
    streaming pass labels every order. No row ever moves for a window
    whose partition count is small."""
    import ray

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_totalprice"])

    def day_partial(t: pa.Table) -> pa.Table:
        return (pa.table({
            "day": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
            "cents": _cents(t["o_totalprice"]),
        }).group_by(["day"]).aggregate([("cents", "sum")]))

    totals: dict[str, int] = {}
    for r in orders.map_batches(day_partial,
                                batch_format="pyarrow").take_all():
        totals[r["day"]] = totals.get(r["day"], 0) + int(r["cents_sum"])
    ref = ray.put(totals)

    def label(t: pa.Table) -> pa.Table:
        import pandas as pd
        tot = ray.get(ref)
        day = pc.strftime(t["o_orderdate"], format="%Y-%m-%d")
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        dtot = pd.Series(day.to_pylist()).map(tot).to_numpy(np.int64)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "day": day,
            "cents": pa.array(cents, pa.int64()),
            "day_share_ppm": pa.array(10**6 * cents // dtot, pa.int64()),
        })

    return orders.map_batches(label, batch_format="pyarrow")


SQL_ORDER_DAY_SHARE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(1000000::HUGEINT
            * CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT
            // sum(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY strftime(o_orderdate, '%Y-%m-%d'))::HUGEINT
         AS BIGINT) AS day_share_ppm
FROM orders
"""


DIVISION_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_relational_division(sf_dir: str):
    """RELATIONAL DIVISION (the 'for all' join): users whose event
    history covers EVERY event type — suppliers-who-supply-all-parts in
    its streaming form. Lowered as a per-user distinct-type BITMASK
    (each type a bit, per-batch grouped OR partials, one exchange by
    user to finish the ORs) filtered against the full mask — division
    as one integer compare instead of a double NOT EXISTS. Returns the
    qualifying user ids."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    type_bit = {ty: 1 << i for i, ty in enumerate(DIVISION_TYPES)}
    full = (1 << len(DIVISION_TYPES)) - 1

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": pd.Series(t["event_type"].to_pylist())
                     .map(type_bit).to_numpy(np.int64),
        })
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.table({"user_id": pa.nulls(0, pa.int64())})
        g = (t.to_pandas().groupby("user_id", as_index=False)
             .agg(mask=("mask",
                        lambda s: np.bitwise_or.reduce(s.to_numpy()))))
        keep = g[g["mask"] == full]
        return pa.table({"user_id": pa.array(keep["user_id"], pa.int64())})

    return bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)


SQL_RELATIONAL_DIVISION = """
SELECT user_id
FROM events
GROUP BY user_id
HAVING count(DISTINCT event_type) = 5
"""


def q_weekday_index(sf_dir: str):
    """SEASONALITY INDEX per weekday: each ISO weekday's average order
    value as a ppm ratio to the overall average — exact with zero
    divisions of rationals by rationals via cross-multiplication:
    index = 1e6 * (rev_d * n_total) // (n_d * rev_total). Per-batch
    <= 7 x 2-int partials, O(7) big-int driver fold (the cross products
    overflow int64 at warehouse scale; the oracle's HUGEINT matches
    exactly)."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({
            "dow": pc.add(pc.day_of_week(t["o_orderdate"]),
                          1).cast(pa.int64()),
            "cents": _cents(t["o_totalprice"]),
        }).group_by(["dow"]).aggregate([([], "count_all"),
                                        ("cents", "sum")]))

    acc: dict[int, list[int]] = {}
    for r in orders.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(int(r["dow"]), [0, 0])
        a[0] += int(r["count_all"]); a[1] += int(r["cents_sum"])
    n_tot = sum(a[0] for a in acc.values())
    rev_tot = sum(a[1] for a in acc.values())
    days = sorted(acc)
    return pa.table({
        "dow": pa.array(days, pa.int64()),
        "n_orders": pa.array([acc[d][0] for d in days], pa.int64()),
        "cents": pa.array([acc[d][1] for d in days], pa.int64()),
        "index_ppm": pa.array(
            [10**6 * acc[d][1] * n_tot // (acc[d][0] * rev_tot)
             for d in days], pa.int64()),
    })


SQL_WEEKDAY_INDEX = """
WITH d AS (
  SELECT isodow(o_orderdate)::BIGINT AS dow, count(*)::HUGEINT AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::HUGEINT AS cents
  FROM orders GROUP BY 1
), t AS (SELECT sum(n) AS n_tot, sum(cents) AS rev_tot FROM d)
SELECT d.dow, CAST(d.n AS BIGINT) AS n_orders,
       CAST(d.cents AS BIGINT) AS cents,
       CAST(1000000::HUGEINT * d.cents * t.n_tot
            // (d.n * t.rev_tot) AS BIGINT) AS index_ppm
FROM d, t
"""


def q_biggest_jump(sf_dir: str):
    """CHANGE-POINT flag on the daily revenue series: the day with the
    largest absolute day-over-day revenue delta (ties -> earliest day)
    — the alert a revenue monitor fires. Daily partials are the only
    distributed work (<= |days| x 2 ints per block); the lag/diff/argmax
    over the ~2500-day series is an O(days) driver fold, exactly like
    `monthly_growth`'s lag. Days with no previous calendar day present
    in the data still diff against the last PRESENT day, matching the
    oracle's lag-over-ordered-series (not calendar-gap) semantics."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({
            "day": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
            "cents": _cents(t["o_totalprice"]),
        }).group_by(["day"]).aggregate([("cents", "sum")]))

    acc: dict[str, int] = {}
    for r in orders.map_batches(partial, batch_format="pyarrow").take_all():
        acc[r["day"]] = acc.get(r["day"], 0) + int(r["cents_sum"])
    days = sorted(acc)
    best_day, best_delta, best_prev = None, None, 0
    for prev, cur in zip(days, days[1:]):
        delta = acc[cur] - acc[prev]
        if best_delta is None or abs(delta) > abs(best_delta):
            best_day, best_delta, best_prev = cur, delta, acc[prev]
    return pa.table({
        "day": pa.array([best_day], pa.string()),
        "prev_cents": pa.array([best_prev], pa.int64()),
        "cents": pa.array([acc[best_day]], pa.int64()),
        "delta_cents": pa.array([best_delta], pa.int64()),
    })


SQL_BIGGEST_JUMP = """
WITH d AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
), l AS (
  SELECT day, cents, lag(cents) OVER (ORDER BY day) AS prev_cents
  FROM d
)
SELECT day, prev_cents, cents, (cents - prev_cents)::BIGINT AS delta_cents
FROM l WHERE prev_cents IS NOT NULL
ORDER BY abs(cents - prev_cents) DESC, day ASC
LIMIT 1
"""


def q_error_pressure(sf_dir: str):
    """Second instantiation of `relational.interval_agg_join`, proving
    the operator generalizes: for every ERROR event, the count and
    cents of ALL the same user's activity in the preceding 5 minutes
    (what was the user doing when it broke — the incident-context
    join). Here the side stream is the WHOLE event log and errors are
    also probes, so the prep emits error rows twice (once per tag) —
    the documented both-roles pattern; window end is exclusive, so a
    probe never counts itself."""
    from .pipelines.relational import interval_agg_join

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        base = pa.table({"event_id": t["event_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "user_id": t["user_id"],
                         "side": pa.array(np.zeros(t.num_rows, np.int64)),
                         "cents": _cents(t["value"])})
        err = t.filter(pc.equal(t["event_type"], "error"))
        probes = pa.table({"event_id": err["event_id"],
                           "ts": err["ts"].cast(pa.int64()),
                           "user_id": err["user_id"],
                           "side": pa.array(np.ones(err.num_rows, np.int64)),
                           "cents": _cents(err["value"])})
        return pa.concat_tables([base, probes])

    out = interval_agg_join(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", ts="ts", side="side", id_col="event_id",
        value="cents", window_us=5 * 60 * 1_000_000, n_buckets=32)
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "n_prior", "prior_cents"]),
        batch_format="pyarrow")


SQL_ERROR_PRESSURE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT p.event_id, count(e.ts)::BIGINT AS n_prior,
       coalesce(sum(CAST(round(e.value * 100) AS BIGINT)), 0)::BIGINT
         AS prior_cents
FROM p LEFT JOIN events e ON e.user_id = p.user_id
  AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts < p.ts
GROUP BY 1
"""


def q_max_concurrency(sf_dir: str):
    """PEAK-LOAD sweep line: the maximum number of simultaneously
    active intervals (each event holds a worker for 10 minutes) and the
    earliest instant it is reached — the capacity-planning query. The
    classic answer is a global sort of +1/-1 deltas and a running sum,
    which serializes 2N rows through one reducer. Here the prefix scan
    is DISTRIBUTED: the time axis is cut into NT grid cells from an
    O(blocks) min/max partial fold, each event emits its two deltas
    tagged with a cell, one exchange co-locates each cell, and every
    cell independently computes (net_total, local_peak, earliest
    peak instant). The driver then folds <= NT rows: entering offsets
    are the prefix sums of net totals (the carry of a two-pass scan),
    and the global peak is max(offset + local_peak) with the earliest
    cell/instant winning ties — cells partition TIME, so cell order is
    instant order and the tie-break is exact. No sort, no single-reducer
    stream; the only driver state is O(NT)."""
    from .pipelines.relational import bucketed_reduce

    W = np.int64(10 * 60 * 1_000_000)  # 10 min hold, in us
    NT = 64                            # time-grid cells
    ev = _read(sf_dir, "events", ["ts"])

    def minmax(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        return pa.table({"lo": [pc.min(ts).as_py()], "hi": [pc.max(ts).as_py()]})

    mm = [r for r in ev.map_batches(minmax, batch_format="pyarrow").take_all()
          if r["lo"] is not None]
    if not mm:
        return pa.table({"peak": pa.nulls(0, pa.int64()),
                         "at_us": pa.nulls(0, pa.int64())})
    t0 = min(r["lo"] for r in mm)
    span = max(r["hi"] for r in mm) + int(W) - t0 + 1

    def deltas(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tt = np.concatenate([ts, ts + W])
        dd = np.concatenate([np.ones(len(ts), np.int64),
                             np.full(len(ts), -1, np.int64)])
        tb = (tt - t0) * NT // span
        return pa.table({"tb": pa.array(tb, pa.int64()),
                         "t": pa.array(tt, pa.int64()),
                         "d": pa.array(dd, pa.int64())})

    def cell_scan(t: pa.Table) -> pa.Table:
        empty = pa.table({"tb": pa.nulls(0, pa.int64()),
                          "total": pa.nulls(0, pa.int64()),
                          "local_peak": pa.nulls(0, pa.int64()),
                          "at_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        tb = t["tb"].to_numpy(zero_copy_only=False)
        tt = t["t"].to_numpy(zero_copy_only=False)
        dd = t["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tt, tb))
        tb, tt, dd = tb[order], tt[order], dd[order]
        out_tb, out_tot, out_pk, out_at = [], [], [], []
        for s in np.flatnonzero(np.r_[True, tb[1:] != tb[:-1]]):
            e = s
            while e < len(tb) and tb[e] == tb[s]:
                e += 1
            ct, cd = tt[s:e], dd[s:e]
            # net delta per distinct instant (ends at t exclude t itself)
            starts = np.flatnonzero(np.r_[True, ct[1:] != ct[:-1]])
            net = np.add.reduceat(cd, starts)
            conc = np.cumsum(net)
            k = int(np.argmax(conc))
            out_tb.append(int(tb[s])); out_tot.append(int(net.sum()))
            out_pk.append(int(conc[k])); out_at.append(int(ct[starts[k]]))
        return pa.table({"tb": pa.array(out_tb, pa.int64()),
                         "total": pa.array(out_tot, pa.int64()),
                         "local_peak": pa.array(out_pk, pa.int64()),
                         "at_us": pa.array(out_at, pa.int64())})

    cells = sorted(
        (r for r in bucketed_reduce(
            ev.map_batches(deltas, batch_format="pyarrow"),
            "tb", cell_scan, n_buckets=16).take_all()),
        key=lambda r: r["tb"])
    best, best_at, off = None, None, 0
    for r in cells:                     # O(NT) carry fold, time order
        v = off + r["local_peak"]
        if best is None or v > best:
            best, best_at = v, r["at_us"]
        off += r["total"]
    return pa.table({"peak": pa.array([best], pa.int64()),
                     "at_us": pa.array([best_at], pa.int64())})


SQL_MAX_CONCURRENCY = """
WITH d AS (
  SELECT ts AS t, 1 AS dd FROM events
  UNION ALL
  SELECT ts + INTERVAL 10 MINUTE AS t, -1 AS dd FROM events
), g AS (
  SELECT t, sum(dd) AS dd FROM d GROUP BY 1
), s AS (
  SELECT t, sum(dd) OVER (ORDER BY t) AS conc FROM g
)
SELECT conc::BIGINT AS peak, epoch_us(t)::BIGINT AS at_us
FROM s ORDER BY conc DESC, t ASC LIMIT 1
"""


def q_interval_coverage(sf_dir: str):
    """MERGE-OVERLAPPING-INTERVALS per user (gaps-and-islands on
    ranges): each event opens a 10-minute activity interval; report,
    per user, how many merged activity islands exist and the total
    covered microseconds — the classic uptime/coverage rollup that SQL
    spells as a cummax window + island grouping. One exchange by
    user_id co-locates each user's intervals; inside a bucket the whole
    computation is vectorized over ALL users at once: lexsort by
    (user, start), a segment-reset running max of interval ends via the
    offset trick (end + seg * LARGE keeps segments' cummaxes from
    bleeding), island starts where start > prev hull end, then
    `np.maximum.reduceat` per island and `np.add.reduceat` per user.
    No per-user loop, no pair join; output is O(users)."""
    from .pipelines.relational import bucketed_reduce

    W = np.int64(10 * 60 * 1_000_000)
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        s = t["ts"].cast(pa.int64())
        return pa.table({"user_id": t["user_id"], "s": s,
                         "e": pc.add(s, W)})

    def islands(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_islands": pa.nulls(0, pa.int64()),
                          "covered_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s, e = u[order], s[order], e[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        seg = np.cumsum(new_user) - 1
        # segment-reset cummax of e: offsets dominate the value range
        big = np.int64(e.max() - s.min() + 1)
        hull = np.maximum.accumulate(e + seg * big) - seg * big
        prev_hull = np.r_[np.int64(0), hull[:-1]]
        flag = new_user | (s > prev_hull)
        isl = np.flatnonzero(flag)
        isl_end = np.maximum.reduceat(e, isl)
        isl_cov = isl_end - s[isl]
        isl_user = u[isl]
        us = np.flatnonzero(np.r_[True, isl_user[1:] != isl_user[:-1]])
        n_isl = np.diff(np.r_[us, len(isl)])
        cov = np.add.reduceat(isl_cov, us)
        return pa.table({"user_id": pa.array(isl_user[us], pa.int64()),
                         "n_islands": pa.array(n_isl, pa.int64()),
                         "covered_us": pa.array(cov, pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", islands, n_buckets=32)


SQL_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e FROM events
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_e
  FROM iv
), g AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM m
), i AS (
  SELECT user_id, grp, min(s) AS s, max(e) AS e
  FROM g GROUP BY 1, 2
)
SELECT user_id, count(*)::BIGINT AS n_islands,
       sum(epoch_us(e) - epoch_us(s))::BIGINT AS covered_us
FROM i GROUP BY 1
"""


def q_twap(sf_dir: str):
    """TIME-WEIGHTED AVERAGE value per user (the SCD2 / validity-
    interval aggregate): each event's value is "held" until the user's
    next event — LEAD builds the validity interval [ts, next_ts), and
    the average weights each value by how long it was held. One
    exchange by user co-locates sequences; the bucket kernel lexsorts
    by (user, ts, event_id), diffs timestamps within user segments, and
    folds numerators EXACTLY despite cents x duration_us overflowing
    int64: each duration splits as dur = q * 2^20 + r, the two partial
    product sums stay in int64, and the per-USER recombination
    ((sq << 20) + sr) runs in O(users) arbitrary-precision ints — the
    same integer-exactness discipline as `price_regression`, matching
    the oracle's HUGEINT fold bit-for-bit. Users with a single event
    have no held interval and drop out, mirroring LEAD's NULL."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "cents": _cents(t["value"])})

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "held_us": pa.nulls(0, pa.int64()),
                          "twap_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, c = u[order], ts[order], c[order]
        same = u[1:] == u[:-1]              # row i holds until row i+1
        if not same.any():
            return empty
        dur = (ts[1:] - ts[:-1])[same]
        uu, cc = u[:-1][same], c[:-1][same]
        q, r = dur >> 20, dur & ((1 << 20) - 1)
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        held = np.add.reduceat(dur, starts)
        sq = np.add.reduceat(cc * q, starts).astype(object)
        sr = np.add.reduceat(cc * r, starts).astype(object)
        num = (sq << 20) + sr               # O(users) big-int recombine
        twap = num // held.astype(object)
        return pa.table({"user_id": pa.array(uu[starts], pa.int64()),
                         "held_us": pa.array(held, pa.int64()),
                         "twap_cents": pa.array([int(x) for x in twap],
                                                pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", fold, n_buckets=32)


SQL_TWAP = """
WITH l AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id,
       sum(epoch_us(nxt) - epoch_us(ts))::BIGINT AS held_us,
       CAST(sum(cents::HUGEINT * (epoch_us(nxt) - epoch_us(ts)))
            // sum(epoch_us(nxt) - epoch_us(ts))::HUGEINT AS BIGINT)
         AS twap_cents
FROM l WHERE nxt IS NOT NULL
GROUP BY 1
"""


def q_spend_drop(sf_dir: str):
    """REVENUE-DROP alert per customer: months where a customer's spend
    fell by more than half vs their previous ACTIVE month (lag over the
    present series, like `biggest_jump`) — the churn-risk screen.
    Unlike `monthly_growth` (a global O(months) driver fold), the
    partition key here is the CUSTOMER, so the series count is
    unbounded and the lag must run distributed: per-batch
    (cust, month, cents) partials bound the exchange at
    O(blocks x active cust-months), one exchange by custkey, and the
    bucket kernel combines partials, lags within customer segments,
    and filters 2*cents < prev_cents in pure integers (no 0.5 float)."""
    from .pipelines.relational import bucketed_reduce

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({
            "custkey": t["o_custkey"],
            "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
            "cents": _cents(t["o_totalprice"]),
        }).group_by(["custkey", "month"]).aggregate([("cents", "sum")])
          .rename_columns(["custkey", "month", "cents"]))

    def lag_filter(t: pa.Table) -> pa.Table:
        empty = pa.table({"custkey": pa.nulls(0, pa.int64()),
                          "month": pa.nulls(0, pa.string()),
                          "prev_cents": pa.nulls(0, pa.int64()),
                          "cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        # combine cross-block partials for the same (cust, month)
        t = (t.group_by(["custkey", "month"]).aggregate([("cents", "sum")])
              .rename_columns(["custkey", "month", "cents"]))
        k = t["custkey"].to_numpy(zero_copy_only=False)
        m = np.asarray(t["month"].to_pylist(), dtype=object)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((m, k))
        k, m, c = k[order], m[order], c[order]
        same = np.r_[False, k[1:] == k[:-1]]
        prev = np.r_[np.int64(0), c[:-1]]
        hit = same & (2 * c < prev)
        return pa.table({"custkey": pa.array(k[hit], pa.int64()),
                         "month": pa.array(list(m[hit]), pa.string()),
                         "prev_cents": pa.array(prev[hit], pa.int64()),
                         "cents": pa.array(c[hit], pa.int64())})

    parts = orders.map_batches(partial, batch_format="pyarrow")
    return bucketed_reduce(parts, "custkey", lag_filter, n_buckets=32)


SQL_SPEND_DROP = """
WITH m AS (
  SELECT o_custkey AS custkey, strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1, 2
), l AS (
  SELECT custkey, month, cents,
         lag(cents) OVER (PARTITION BY custkey ORDER BY month)
           AS prev_cents
  FROM m
)
SELECT custkey, month, prev_cents, cents
FROM l WHERE prev_cents IS NOT NULL AND 2 * cents < prev_cents
"""


def q_returned_customers(sf_dir: str):
    """TPC-H Q10 shape — lost-revenue ranking: per customer, the
    revenue of their RETURNED lineitems ('R' flag) on orders placed in
    one quarter, top 20 customers enriched with name/nation/balance.
    Plan: both fact sides pre-shrink BEFORE the one real exchange —
    orders by the date window, lineitems by return flag plus a
    per-batch partial sum by orderkey — then bucketed join on orderkey,
    per-block partials by custkey, and ONE exchange by custkey whose
    bucket kernel emits only its local top 20 (rev desc, custkey asc),
    so the driver merges B x 20 rows, never |customers|. The dimension
    lookup INVERTS the broadcast direction: the 20 winning custkeys
    broadcast into a filtered customer scan (never the customer table
    into the fact side), which is the only direction that survives a
    customer dimension too big to ship."""
    import ray

    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    lo = pa.scalar(np.datetime64("1997-07-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-10-01", "us"), pa.timestamp("us"))

    def orders_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({"o_orderkey": t["o_orderkey"].cast(pa.int64()),
                         "custkey": t["o_custkey"].cast(pa.int64())})

    def items_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        g = (pa.table({"o_orderkey": t["l_orderkey"].cast(pa.int64()),
                       "rev_centicents": rev})
             .group_by(["o_orderkey"]).aggregate([("rev_centicents", "sum")]))
        return g.rename_columns(["o_orderkey", "rev_centicents"])

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(orders_prep, batch_format="pyarrow"))
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount",
                    "l_returnflag"])
             .map_batches(items_prep, batch_format="pyarrow"))
    joined = bucketed_hash_join(orders.materialize(), items.materialize(),
                                "o_orderkey", n_buckets=16)

    def cust_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["custkey", "rev_centicents"])
             .group_by(["custkey"]).aggregate([("rev_centicents", "sum")]))
        return g.rename_columns(["custkey", "rev_centicents"])

    def bucket_top(t: pa.Table) -> pa.Table:
        t = cust_partial(t)  # combine cross-block partials
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("rev_centicents", "descending"),
                          ("custkey", "ascending")])
        return t.take(order[:20])

    per_cust = joined.map_batches(cust_partial, batch_format="pyarrow")
    top = (bucketed_reduce(per_cust, "custkey", bucket_top, n_buckets=16)
           .to_pandas()
           .sort_values(["rev_centicents", "custkey"],
                        ascending=[False, True], kind="stable")
           .head(20))

    keys = set(int(k) for k in top["custkey"])
    cust = (_read(sf_dir, "customer",
                  ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
            .map_batches(
                lambda t: t.filter(
                    pc.is_in(t["c_custkey"].cast(pa.int64()),
                             value_set=pa.array(sorted(keys), pa.int64()))),
                batch_format="pyarrow")
            .to_pandas())
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = cust.set_index("c_custkey")
    ck = top["custkey"].to_numpy()
    return pa.table({
        "custkey": pa.array(ck, pa.int64()),
        "c_name": pa.array([cust.at[k, "c_name"] for k in ck], pa.string()),
        "n_name": pa.array([n2name[cust.at[k, "c_nationkey"]] for k in ck],
                           pa.string()),
        "bal_cents": pa.array(
            [int(round(float(cust.at[k, "c_acctbal"]) * 100)) for k in ck],
            pa.int64()),
        "rev_centicents": pa.array(top["rev_centicents"].to_numpy(),
                                   pa.int64()),
    })


SQL_RETURNED_CUSTOMERS = """
WITH r AS (
  SELECT o.o_custkey AS custkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
           AS rev_centicents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= DATE '1997-07-01'
    AND o.o_orderdate <  DATE '1997-10-01'
    AND l.l_returnflag = 'R'
  GROUP BY 1
)
SELECT c.c_custkey AS custkey, c.c_name, n.n_name,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
       r.rev_centicents
FROM r
JOIN customer c ON c.c_custkey = r.custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
ORDER BY r.rev_centicents DESC, custkey
LIMIT 20
"""


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — the global argmax WITH TIES (the revenue view
    + scalar MAX subquery): the supplier(s) whose shipped revenue over
    one quarter equals the global maximum. Every supplier's rows land
    in exactly one bucket of the ONE exchange (per-batch partials by
    suppkey bound it at O(blocks x suppliers-per-block)), so each
    bucket can resolve its OWN max-with-ties locally and emit only
    those rows; the driver folds B tiny tables and keeps the global
    max — |suppliers| never reaches any single task or the driver.
    Name enrichment inverts the broadcast (winner keys into a filtered
    supplier scan), as in `returned_customers`."""
    from .pipelines.relational import bucketed_reduce

    lo = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        g = (pa.table({"s_suppkey": t["l_suppkey"].cast(pa.int64()),
                       "total_centicents": rev})
             .group_by(["s_suppkey"])
             .aggregate([("total_centicents", "sum")]))
        return g.rename_columns(["s_suppkey", "total_centicents"])

    items = (_read(sf_dir, "lineitem",
                   ["l_suppkey", "l_extendedprice", "l_discount",
                    "l_shipdate"])
             .map_batches(partial, batch_format="pyarrow"))

    def bucket_max(t: pa.Table) -> pa.Table:
        g = (t.group_by(["s_suppkey"]).aggregate([("total_centicents", "sum")])
             .rename_columns(["s_suppkey", "total_centicents"]))
        if g.num_rows == 0:
            return g
        m = pc.max(g["total_centicents"])
        return g.filter(pc.equal(g["total_centicents"], m))

    cand = (bucketed_reduce(items, "s_suppkey", bucket_max, n_buckets=16)
            .to_pandas())
    best = int(cand["total_centicents"].max())
    win = cand[cand["total_centicents"] == best].sort_values("s_suppkey")

    keys = pa.array(sorted(int(k) for k in win["s_suppkey"]), pa.int64())
    supp = (_read(sf_dir, "supplier", ["s_suppkey", "s_name"])
            .map_batches(
                lambda t: t.filter(
                    pc.is_in(t["s_suppkey"].cast(pa.int64()),
                             value_set=keys)),
                batch_format="pyarrow")
            .to_pandas().set_index("s_suppkey"))
    sk = win["s_suppkey"].to_numpy()
    return pa.table({
        "s_suppkey": pa.array(sk, pa.int64()),
        "s_name": pa.array([supp.at[k, "s_name"] for k in sk], pa.string()),
        "total_centicents": pa.array(win["total_centicents"].to_numpy(),
                                     pa.int64()),
    })


SQL_TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
           AS total_centicents
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01'
    AND l_shipdate <  DATE '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_centicents
FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_centicents = (SELECT max(total_centicents) FROM r)
"""


def q_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape — supplier variety per part profile: for parts
    outside one brand/type and in a size list, how many DISTINCT
    suppliers have shipped them (lineitem supplies the part-supplier
    pairs; this schema has no partsupp), excluding negative-balance
    suppliers (the NOT IN complaint list). Plan: the filtered part
    dimension ships as a dense partkey -> profile-id LUT inside a
    task closure (tiny, so no actor pool); the exclusion set rides
    the same closure; the COUNT(DISTINCT supplier) GROUP BY profile
    runs on the salted distinct-count exchange over INT pairs
    (`relational.salted_distinct_count`) — per-block pair dedup,
    value-salted buckets so the 6 x 25 x 8 hot profile groups spread
    over all reducers, exact cross-bucket sum; profile strings decode
    on the 900-row result only."""
    from .pipelines.relational import salted_distinct_count

    sizes = {1, 4, 9, 14, 19, 24, 29, 34}
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    maxk = int(part["p_partkey"].max())
    keep = (~(part["p_brand"] == "Brand#2")
            & ~(part["p_type"] == "ECONOMY")
            & part["p_size"].isin(sizes))
    part = part[keep]
    # dense partkey -> profile-id LUT (one vectorized gather per batch;
    # a dict .map here was a per-row Python lookup over all of lineitem)
    codes, profiles = pd.factorize(
        part["p_brand"] + "|" + part["p_type"] + "|"
        + part["p_size"].astype(str))
    lut = np.full(maxk + 2, -1, np.int32)
    lut[part["p_partkey"].to_numpy()] = codes.astype(np.int32)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(supp.loc[supp["s_acctbal"] < 0,
                           "s_suppkey"].to_numpy(dtype=np.int64))

    # the LUT is tiny (~80 KB), so a plain task-pool closure beats an
    # actor pool: no pool spin-up, and no second spin for schema probes
    def pair_prep(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        pid = lut[np.minimum(pk, len(lut) - 1)]
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = (pid >= 0) & ~np.isin(sk, bad)
        return pa.table({
            "profile": pa.array(pid[m].astype(np.int64)),
            "l_suppkey": pa.array(sk[m], pa.int64()),
        })

    pairs = (_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
             .map_batches(pair_prep, batch_format="pyarrow"))
    # the exchange dedups (profile-id, suppkey) int pairs; the profile
    # STRINGS never shuffle — they decode from the 900-row driver map
    counts = salted_distinct_count(
        pairs, "profile", "l_suppkey", n_buckets=16,
        count_name="supplier_cnt",
        schema=pa.schema([("profile", pa.int64()),
                          ("l_suppkey", pa.int64())]))
    prof = np.asarray(profiles, object)

    def decode(t: pa.Table) -> pa.Table:
        names = prof[t["profile"].to_numpy(zero_copy_only=False)]
        split = [s.split("|") for s in names]
        return pa.table({
            "p_brand": pa.array([s[0] for s in split], pa.string()),
            "p_type": pa.array([s[1] for s in split], pa.string()),
            "p_size": pa.array([int(s[2]) for s in split], pa.int64()),
            "supplier_cnt": t["supplier_cnt"],
        })

    return counts.map_batches(decode, batch_format="pyarrow")


SQL_SUPPLIER_VARIETY = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#2' AND p.p_type <> 'ECONOMY'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q_nation_profit(sf_dir: str):
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year, for one part family (p_name prefix; unit cost proxied
    by p_retailprice since this schema has no partsupp): profit =
    line revenue minus cost, all in exact centicents. Plan: part
    (filtered to the family) and supplier->nation broadcast once; the
    ONE exchange is orders x lineitem on orderkey (the Q5/Q10 regime);
    per-block partials by (nation, year) bound the driver fold at
    O(blocks x nations x years)."""
    import ray

    from .pipelines.relational import bucketed_hash_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name",
                                  "p_retailprice"]).to_pandas()
    part = part[part["p_name"].str.startswith("red")]
    p2cost = dict(zip(part["p_partkey"],
                      (part["p_retailprice"] * 100).round().astype("int64")))
    suppn = _read(sf_dir, "supplier",
                  ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    s2n = dict(zip(suppn["s_suppkey"], suppn["s_nationkey"]))
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put((p2cost, s2n, n2name))

    def orders_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "l_year": pc.year(t["o_orderdate"]).cast(pa.int64()),
        })

    def items_prep(t: pa.Table) -> pa.Table:
        p2cost, s2n, _ = ray.get(ref)
        df = t.to_pandas()
        cost = df["l_partkey"].map(p2cost)
        keep = cost.notna().to_numpy()
        df = df[keep]
        price = (df["l_extendedprice"] * 100).round().astype("int64")
        disc = (df["l_discount"] * 100).round().astype("int64")
        qty = df["l_quantity"].round().astype("int64")
        amount = price * (100 - disc) - cost[keep].astype("int64") * qty * 100
        return pa.table({
            "o_orderkey": pa.array(df["l_orderkey"], pa.int64()),
            "nat": pa.array(df["l_suppkey"].map(s2n).astype("int64"),
                            pa.int64()),
            "amount": pa.array(amount, pa.int64()),
        })

    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(orders_prep, batch_format="pyarrow"))
    items = (_read(sf_dir, "lineitem",
                   ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                    "l_extendedprice", "l_discount"])
             .map_batches(items_prep, batch_format="pyarrow"))
    joined = bucketed_hash_join(orders.materialize(), items.materialize(),
                                "o_orderkey", n_buckets=16)

    def block_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["nat", "l_year", "amount"])
             .group_by(["nat", "l_year"]).aggregate([("amount", "sum")]))
        return g.rename_columns(["nat", "l_year", "amount"])

    parts_df = (joined.map_batches(block_partial, batch_format="pyarrow")
                .to_pandas())
    out = (parts_df.groupby(["nat", "l_year"], as_index=False)["amount"]
           .sum())
    return pa.table({
        "nation": pa.array([n2name[k] for k in out["nat"]], pa.string()),
        "l_year": pa.array(out["l_year"], pa.int64()),
        "profit_centicents": pa.array(out["amount"], pa.int64()),
    })


SQL_NATION_PROFIT = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
           - CAST(round(p.p_retailprice * 100) AS BIGINT)
             * CAST(round(l.l_quantity) AS BIGINT) * 100)::BIGINT
         AS profit_centicents
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE 'red%'
GROUP BY 1, 2
"""


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape — filter a grouped aggregate by a GLOBAL scalar
    of itself: parts whose shipped value exceeds 1.5x the
    average part's value (scale-free, unlike Q11's fixed 0.0001/SF
    fraction, so the selectivity is stable at any SF; the synthetic
    per-part values are flat, max/avg ~1.8). The test never touches a
    float: 2 * value * n_parts > 3 * total in integers (Python ints on
    the Ray side, HUGEINT in the oracle). Plan: per-batch partials by
    partkey, ONE exchange by partkey to finalize per-part values, an
    O(blocks) driver fold for the global (total, n_parts) pair, then a
    broadcast-scalar filter over the per-part dataset."""
    from .pipelines.relational import bucketed_reduce

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        g = (pa.table({"p_partkey": t["l_partkey"].cast(pa.int64()),
                       "value_centicents": rev})
             .group_by(["p_partkey"])
             .aggregate([("value_centicents", "sum")]))
        return g.rename_columns(["p_partkey", "value_centicents"])

    items = (_read(sf_dir, "lineitem",
                   ["l_partkey", "l_extendedprice", "l_discount"])
             .map_batches(partial, batch_format="pyarrow"))

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = (t.group_by(["p_partkey"]).aggregate([("value_centicents", "sum")])
             .rename_columns(["p_partkey", "value_centicents"]))
        return g

    per_part = bucketed_reduce(items, "p_partkey", bucket_fn, n_buckets=16)

    # O(blocks) scalar fold for the global (total, n_parts) pair
    totals = per_part.map_batches(
        lambda t: pa.table({
            "s": pa.array([pc.sum(t["value_centicents"]).as_py() or 0],
                          pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    total, n_parts = int(totals["s"].sum()), int(totals["n"].sum())

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_centicents"].to_numpy(zero_copy_only=False)
        mask = (2 * v.astype(object) * n_parts) > 3 * total  # exact big ints
        return t.filter(pa.array(mask.astype(bool)))

    return per_part.map_batches(keep, batch_format="pyarrow")


SQL_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
           AS value_centicents
  FROM lineitem GROUP BY 1
)
SELECT p_partkey, value_centicents
FROM v
WHERE 2 * value_centicents::HUGEINT * (SELECT count(*) FROM v) >
      3 * (SELECT sum(value_centicents::HUGEINT) FROM v)
"""


CHEAPEST_MAX_HOPS = 6


def q_cheapest_path(sf_dir: str):
    """WEIGHTED hop-bounded shortest path (min-plus / bounded
    Bellman-Ford) from the BFS seed set over the mini-web's outlink
    graph — `bfs_depths` counts hops; this costs them (edge weight =
    1 + (|src| + |dst|) % 5, a deterministic function both engines
    restate identically). `graph.cheapest_paths`: costs owned by
    hash(node) % K shards, edges by hash(src) % K (same hash, so
    relaxation is shard-local), per-round vectorized relax + per-dst
    min combine, improvements-only exchange; after r rounds each cost
    is exactly min over <= r-edge paths, matching the recursive
    oracle's hop cap."""
    from .htmlx import parse_document
    from .pipelines.graph import cheapest_paths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        w = [1 + (len(s) + len(d)) % 5 for s, d in zip(src, dst)]
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string()),
                         "w": pa.array(w, pa.int64())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    return cheapest_paths(edges, urls[:BFS_N_SEEDS], n_shards=8,
                          max_hops=CHEAPEST_MAX_HOPS)


@functools.lru_cache(maxsize=1)
def _cheapest_path_sql() -> str:
    """The same bounded min-cost walk as a recursive CTE over a VALUES
    edge list (weights restated as 1 + (length(src)+length(dst)) % 5);
    min(cost) per node over every <= cap-hop path."""
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    seed_urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
                 for i in range(BFS_N_SEEDS)]
    seed_rows = ", ".join(f"({_sql_str(u)})" for u in seed_urls)
    return f"""
WITH RECURSIVE e0(src, dst) AS (VALUES
{rows}
),
edges(src, dst, w) AS (
  SELECT src, dst, 1 + (length(src) + length(dst)) % 5 FROM e0
),
seeds(u) AS (
  SELECT u FROM (VALUES {seed_rows}) s(u)
  WHERE u IN (SELECT src FROM edges UNION SELECT dst FROM edges)
),
walk(u, c, h) AS (
  SELECT u, 0, 0 FROM seeds
  UNION
  SELECT e.dst, w.c + e.w, w.h + 1
  FROM walk w JOIN edges e ON e.src = w.u
  WHERE w.h < {CHEAPEST_MAX_HOPS}
)
SELECT u AS url, min(c)::BIGINT AS cost FROM walk GROUP BY u
"""


def q_debounce_events(sf_dir: str):
    """STREAM DEBOUNCE audit — rapid-fire duplicate suppression, the
    first cleaning pass of any event pipeline: flag events whose
    previous event of the SAME (user, type) lies within one hour (the
    lag-based contract, so the oracle is a plain window function; the
    throttle variant that measures from the last KEPT event is
    deliberately not this operator — it is not expressible as a
    window). One exchange by user co-locates all of a user's types;
    the bucket kernel lexsorts (user, type, ts, event_id) once and
    diffs within segments — flagged rows only leave the bucket."""
    from .pipelines.relational import bucketed_reduce

    thresh_us = 3_600_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "at_us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "user_id": pa.nulls(0, pa.int64()),
                          "event_type": pa.nulls(0, pa.string()),
                          "gap_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, et, u))
        u, ts, eid, et = u[order], ts[order], eid[order], et[order]
        same = np.r_[False, (u[1:] == u[:-1]) & (et[1:] == et[:-1])]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        hit = same & (gap <= thresh_us)
        return pa.table({
            "event_id": pa.array(eid[hit], pa.int64()),
            "user_id": pa.array(u[hit], pa.int64()),
            "event_type": pa.array(list(et[hit]), pa.string()),
            "gap_us": pa.array(gap[hit], pa.int64()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_DEBOUNCE_EVENTS = """
WITH g AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id, event_type ORDER BY ts, event_id))
           AS gap_us
  FROM events
)
SELECT event_id, user_id, event_type, gap_us::BIGINT AS gap_us
FROM g WHERE gap_us IS NOT NULL AND gap_us <= 3600000000
"""


def q_first_touch(sf_dir: str):
    """FIRST-TOUCH attribution — for every purchase, the EARLIEST view
    by the same user in the trailing 7 days (the complement of
    `asof_last_view`'s last-touch): the marketing question 'what
    started the journey'. Both filtered streams ride ONE tagged-union
    exchange by user (the `interval_agg_join` regime), each user's
    view segment shifts onto a disjoint encoded range, and every
    purchase resolves its window's FIRST element with two global
    searchsorteds — the answer is literally index `lo` (views sort by
    (ts, event_id), so equal-ts ties pick the smallest event id,
    matching the oracle's min-then-min). Inner semantics: untouched
    purchases drop."""
    from .pipelines.relational import bucketed_reduce

    W = np.int64(7 * 24 * 3600 * 1_000_000)
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        is_v = pc.equal(t["event_type"], "view")
        is_p = pc.equal(t["event_type"], "purchase")
        t = t.filter(pc.or_(is_v, is_p))
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "side": pc.equal(t["event_type"], "purchase").cast(pa.int8()),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "view_event_id": pa.nulls(0, pa.int64()),
                          "lag_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        sd = t["side"].to_numpy(zero_copy_only=False)
        rel = ts - ts.min()
        offset = rel.max() + 2 * W + 2
        v, p = sd == 0, sd == 1
        if not p.any() or not v.any():
            return empty
        vu, vrel, ve = u[v], rel[v], eid[v]
        order = np.lexsort((ve, vrel, vu))
        vu, vrel, ve = vu[order], vrel[order], ve[order]
        uniq = np.unique(vu)
        vseg = np.cumsum(np.r_[0, vu[1:] != vu[:-1]])
        vz = vrel + vseg * offset
        pu, prel, pe = u[p], rel[p], eid[p]
        idx = np.searchsorted(uniq, pu)
        hit = idx < len(uniq)
        idx_c = np.minimum(idx, max(len(uniq) - 1, 0))
        hit &= uniq[idx_c] == pu
        pz = prel + idx_c * offset
        lo = np.searchsorted(vz, pz - W, side="left")
        hi = np.searchsorted(vz, pz, side="left")
        hit &= lo < hi
        lo_c = np.minimum(lo, len(vz) - 1)
        return pa.table({
            "event_id": pa.array(pe[hit], pa.int64()),
            "view_event_id": pa.array(ve[lo_c][hit], pa.int64()),
            "lag_us": pa.array((prel - vrel[lo_c])[hit], pa.int64()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_FIRST_TOUCH = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), j AS (
  SELECT p.event_id AS pe, p.ts AS pts, v.ts AS vts, v.event_id AS ve
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 7 DAY
), m AS (
  SELECT pe, min(vts) AS fv FROM j GROUP BY 1
)
SELECT j.pe AS event_id, min(j.ve)::BIGINT AS view_event_id,
       (epoch_us(min(j.pts)) - epoch_us(m.fv))::BIGINT AS lag_us
FROM j JOIN m ON m.pe = j.pe AND j.vts = m.fv
GROUP BY j.pe, m.fv
"""


K_FOLDS = 5


def q_kfold_assignment(sf_dir: str):
    """STRATIFIED K-FOLD assignment — distributed ROW_NUMBER over giant
    partitions WITHOUT a global sort: fold(doc) = rank of doc within
    its lang (by doc_id) mod K, the train/eval split every corpus
    pipeline needs, balanced per stratum by construction. The rank
    never ships rows: pass 1 counts (block, lang) in parallel over the
    ORDERED block list (Ray preserves read order; the parquet is
    doc_id-sorted — the ordered-combine contract from SURVEY §2 S10),
    the driver exclusive-prefixes O(blocks x langs) counts, pass 2
    re-reads each block with its broadcast offset dict and labels
    locally. Output is the per-(lang, fold) count + char mass — the
    audit a split job publishes."""
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    refs = docs.to_arrow_refs()

    @ray.remote
    def lang_counts(t) -> dict:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        g = t.group_by(["lang"]).aggregate([("lang", "count")])
        return dict(zip(g["lang"].to_pylist(),
                        [int(x) for x in g["lang_count"].to_pylist()]))

    per_block = ray.get([lang_counts.remote(r) for r in refs])
    offsets = []
    running: dict = {}
    for d in per_block:
        offsets.append(dict(running))
        for lang, n in d.items():
            running[lang] = running.get(lang, 0) + n

    @ray.remote
    def assign(t, off: dict) -> pa.Table:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        t = t.sort_by([("doc_id", "ascending")])  # in-block order
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        chars = t["n_chars"].to_numpy(zero_copy_only=False)
        order = np.argsort(lang, kind="stable")
        lang_s = lang[order]
        starts = np.flatnonzero(np.r_[True, lang_s[1:] != lang_s[:-1]])
        local = np.arange(len(lang_s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(lang_s)]))
        base = np.array([off.get(str(v), 0) for v in lang_s[starts]],
                        np.int64)
        rank = local + np.repeat(base, np.diff(np.r_[starts, len(lang_s)]))
        fold = rank % K_FOLDS
        out = pa.table({"lang": pa.array(list(lang_s), pa.string()),
                        "fold": pa.array(fold, pa.int64()),
                        "n": pa.array(np.ones(len(lang_s), np.int64)),
                        "chars": pa.array(chars[order], pa.int64())})
        g = out.group_by(["lang", "fold"]).aggregate(
            [("n", "sum"), ("chars", "sum")])
        return g.rename_columns(["lang", "fold", "n_docs", "sum_chars"])

    parts = rd.from_arrow_refs(
        [assign.remote(r, o) for r, o in zip(refs, offsets)]).to_pandas()
    out = (parts.groupby(["lang", "fold"], as_index=False)
           [["n_docs", "sum_chars"]].sum()
           .sort_values(["lang", "fold"]))
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "fold": pa.array(out["fold"], pa.int64()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "sum_chars": pa.array(out["sum_chars"], pa.int64()),
    })


SQL_KFOLD_ASSIGNMENT = f"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rn
  FROM documents
)
SELECT lang, (rn % {K_FOLDS})::BIGINT AS fold, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM r GROUP BY 1, 2
"""


def q_order_part_list(sf_dir: str):
    """ORDERED GROUPED STRING_AGG — the list-valued aggregate SQL
    spells string_agg(x, ',' ORDER BY x): per order, its part keys
    as one comma-joined ascending string (plus the item count). Rows
    genuinely have to move (the concat needs every element of a key
    together and IN ORDER), so the plan is ONE exchange by orderkey;
    the bucket kernel is zero-Python-per-row: one table sort by
    (orderkey, partkey), Arrow's order-preserving hash_list
    aggregation, then the vectorized pc.binary_join — no per-group
    join loop. Output stays one row per order, so what leaves each
    bucket is bounded by its distinct keys."""
    from .pipelines.relational import bucketed_reduce

    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"].cast(pa.int64()),
                         "pk": t["l_partkey"].cast(pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.nulls(0, pa.int64()),
                             "parts": pa.nulls(0, pa.string()),
                             "n_items": pa.nulls(0, pa.int64())})
        t = t.sort_by([("l_orderkey", "ascending"), ("pk", "ascending")])
        t = pa.table({"l_orderkey": t["l_orderkey"],
                      "pk": t["pk"].cast(pa.string())})
        g = (t.group_by("l_orderkey", use_threads=False)
             .aggregate([("pk", "list"), ("pk", "count")]))
        return pa.table({
            "l_orderkey": g["l_orderkey"],
            "parts": pc.binary_join(g["pk_list"], ","),
            "n_items": g["pk_count"].cast(pa.int64()),
        })

    return bucketed_reduce(items.map_batches(prep, batch_format="pyarrow"),
                           "l_orderkey", bucket_fn, n_buckets=32)


SQL_ORDER_PART_LIST = """
SELECT l_orderkey,
       string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey)
         AS parts,
       count(*)::BIGINT AS n_items
FROM lineitem GROUP BY 1
"""


def q_scd2_intervals(sf_dir: str):
    """SCD TYPE-2 BUILD — turn an event stream into a validity-interval
    dimension: per user, consecutive runs of the same event_type
    collapse into one row [valid_from, valid_to) with the run's event
    count; the OPEN current interval gets valid_to_us = -1 (sentinel
    instead of NULL so both engines agree on an int64 column). One
    exchange by user; the bucket kernel lexsorts (user, ts, event_id)
    once, flags run starts where the user or state changes, and reads
    every interval of every user off the start indices (valid_to is
    the NEXT run's first ts when that run belongs to the same user) —
    no per-user loop, O(runs) rows out."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "at_us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "state": t["event_type"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "state": pa.nulls(0, pa.string()),
                          "valid_from_us": pa.nulls(0, pa.int64()),
                          "valid_to_us": pa.nulls(0, pa.int64()),
                          "n_events": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        st = np.asarray(t["state"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, st = u[order], ts[order], st[order]
        new = np.r_[True, (u[1:] != u[:-1]) | (st[1:] != st[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(u)])
        nxt = np.r_[starts[1:], len(u)]          # next run's first row
        same_user = nxt < len(u)
        same_user[same_user] &= u[nxt[same_user]] == u[starts[same_user]]
        vto = np.where(same_user, ts[np.minimum(nxt, len(u) - 1)], -1)
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "state": pa.array(list(st[starts]), pa.string()),
            "valid_from_us": pa.array(ts[starts], pa.int64()),
            "valid_to_us": pa.array(vto, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_SCD2_INTERVALS = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
), g AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM e
), r AS (
  SELECT user_id, min(event_type) AS state,
         min(epoch_us(ts))::BIGINT AS valid_from_us,
         count(*)::BIGINT AS n_events
  FROM g GROUP BY user_id, run
)
SELECT user_id, state, valid_from_us,
       COALESCE(lead(valid_from_us) OVER
                (PARTITION BY user_id ORDER BY valid_from_us), -1)
         AS valid_to_us,
       n_events
FROM r
"""


def q_merge_upsert(sf_dir: str):
    """MERGE INTO (upsert + delete) — apply a CDC batch to a snapshot:
    the target is each user's last value BEFORE the cutover, the
    source is each user's last event AT/AFTER it; MERGE semantics are
    WHEN MATCHED AND source is an 'error' THEN DELETE / WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED THEN INSERT (an 'error' source with
    no target row inserts nothing). Never a join: both sides ride ONE
    tagged-union exchange by user (the `table_diff` regime), the
    bucket kernel takes each (user, side)'s last row by (ts, event_id)
    with one lexsort + group-boundary mask, and resolves the op
    vectorized. Output: the merged rows plus the op that produced
    them ('keep' rows are the unmatched target)."""
    from .pipelines.relational import bucketed_reduce

    cut = pa.scalar(np.datetime64("2024-01-20", "us"), pa.timestamp("us"))
    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        side = pc.greater_equal(t["ts"], cut).cast(pa.int8())
        return pa.table({"user_id": t["user_id"],
                         "side": side,
                         "at_us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "etype": t["event_type"],
                         "cents": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "cents": pa.nulls(0, pa.int64()),
                          "op": pa.nulls(0, pa.string())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["etype"].to_pylist(), dtype=object)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, side, u))
        u, side, et, c = u[order], side[order], et[order], c[order]
        # last row of each (user, side) group
        last = np.r_[(u[1:] != u[:-1]) | (side[1:] != side[:-1]), True]
        lu, lside, let, lc = u[last], side[last], et[last], c[last]
        # per-user target/source slots (users sorted; <=2 rows each)
        uu = np.unique(lu)
        pos = np.searchsorted(uu, lu)
        has_t = np.zeros(len(uu), bool)
        has_s = np.zeros(len(uu), bool)
        tc = np.zeros(len(uu), np.int64)
        sc = np.zeros(len(uu), np.int64)
        s_err = np.zeros(len(uu), bool)
        m0, m1 = lside == 0, lside == 1
        has_t[pos[m0]] = True
        tc[pos[m0]] = lc[m0]
        has_s[pos[m1]] = True
        sc[pos[m1]] = lc[m1]
        s_err[pos[m1]] = et[last][m1] == "error"
        keep = has_t & ~has_s
        upd = has_t & has_s & ~s_err
        ins = ~has_t & has_s & ~s_err
        mask = keep | upd | ins
        cents = np.where(has_s & ~s_err, sc, tc)
        op = np.where(keep, "keep", np.where(upd, "update", "insert"))
        return pa.table({
            "user_id": pa.array(uu[mask], pa.int64()),
            "cents": pa.array(cents[mask], pa.int64()),
            "op": pa.array(list(op[mask]), pa.string()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_MERGE_UPSERT = """
WITH tgt AS (
  SELECT user_id, cents FROM (
    SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1
), src AS (
  SELECT user_id, cents, event_type FROM (
    SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
           event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1
)
SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.cents ELSE t.cents END
         AS cents,
       CASE WHEN s.user_id IS NULL THEN 'keep'
            WHEN t.user_id IS NULL THEN 'insert'
            ELSE 'update' END AS op
FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
WHERE s.user_id IS NULL OR s.event_type <> 'error'
"""


def q_price_kurtosis(sf_dir: str):
    """GROUPED KURTOSIS, exact — per order priority, the 4th
    standardized moment of the order value (thousand-dollar bins so
    every power sum stays in int64) in floored ppm. Higher moments are
    still PARTIAL FOLDS: each block contributes (n, S1..S4) integer
    power sums per group — five ints, O(blocks x groups) to the driver
    — and the central-moment algebra runs ONCE per group in
    arbitrary-precision ints: n^3*sum(d^4) = n^3*S4 - 4n^2*S1*S3 +
    6n*S1^2*S2 - 3*S1^4 and n*sum(d^2) = n*S2 - S1^2, so kurt =
    n*sum(d^4)/sum(d^2)^2 = A/B^2 exactly, with no mean ever
    materialized as a float (the oracle's HUGEINT restatement is
    bit-identical)."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(_cents(t["o_totalprice"]),
                      pa.scalar(100000, pa.int64()))
        h2 = pc.multiply(h, h)
        g = (pa.table({"priority": t["o_orderpriority"],
                       "n": pa.array(np.ones(t.num_rows, np.int64)),
                       "s1": h, "s2": h2,
                       "s3": pc.multiply(h2, h),
                       "s4": pc.multiply(h2, h2)})
             .group_by(["priority"])
             .aggregate([("n", "sum"), ("s1", "sum"), ("s2", "sum"),
                         ("s3", "sum"), ("s4", "sum")]))
        return g.rename_columns(["priority", "n", "s1", "s2", "s3", "s4"])

    parts = (orders.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    out = parts.groupby("priority", as_index=False).sum()
    rows = []
    for _, r in out.iterrows():
        n, s1, s2, s3, s4 = (int(r["n"]), int(r["s1"]), int(r["s2"]),
                             int(r["s3"]), int(r["s4"]))
        a = n**3 * s4 - 4 * n**2 * s1 * s3 + 6 * n * s1**2 * s2 - 3 * s1**4
        b = n * s2 - s1 * s1
        rows.append((r["priority"], n, 10**6 * a // (b * b)))
    rows.sort()
    return pa.table({
        "priority": pa.array([x[0] for x in rows], pa.string()),
        "n": pa.array([x[1] for x in rows], pa.int64()),
        "kurt_ppm": pa.array([x[2] for x in rows], pa.int64()),
    })


SQL_PRICE_KURTOSIS = """
WITH h AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS v
  FROM orders
), s AS (
  SELECT priority, count(*)::HUGEINT AS n,
         sum(v::HUGEINT) AS s1, sum(v::HUGEINT * v) AS s2,
         sum(v::HUGEINT * v * v) AS s3,
         sum(v::HUGEINT * v * v * v) AS s4
  FROM h GROUP BY 1
)
SELECT priority, n::BIGINT AS n,
       CAST(1000000 * (n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1)
            // ((n*s2 - s1*s1) * (n*s2 - s1*s1)) AS BIGINT) AS kurt_ppm
FROM s
"""


def q_session_patterns(sf_dir: str):
    """SEQUENCE PATTERN MATCH over sessions (the MATCH_RECOGNIZE
    shape): sessions (30-min idle gap, the `sessions` definition)
    whose ordered event-type sequence contains a view IMMEDIATELY
    followed by a purchase ('vp' in the initial-letter encoding —
    every event type here starts with a distinct letter; adjacency is
    what a mere co-occurrence groupby cannot express). One exchange
    by user; the bucket kernel lexsorts once, flags session starts
    (user change or gap), numbers sessions per user by a cumsum diff,
    and builds EVERY session's sequence string with the
    order-preserving hash_list + binary_join idiom from
    `order_part_list` — then one vectorized substring match. Only
    matching sessions leave the bucket."""
    from .pipelines.relational import bucketed_reduce

    gap_us = SESSION_GAP_SECONDS * 1_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "letter": pc.utf8_slice_codeunits(t["event_type"], 0, 1),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "session_id": pa.nulls(0, pa.int64()),
                          "seq": pa.nulls(0, pa.string())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        letters = t["letter"].take(pa.array(order))
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_s = new_user | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        sess = np.cumsum(new_s)                       # bucket-global id
        ustart = np.flatnonzero(new_user)
        ucnt = np.diff(np.r_[ustart, len(u)])
        session_id = sess - np.repeat(sess[ustart], ucnt) + 1
        g = (pa.table({"sess": pa.array(sess, pa.int64()),
                       "letter": pa.chunked_array([letters]).combine_chunks()})
             .group_by("sess", use_threads=False)
             .aggregate([("letter", "list")]))
        seq = pc.binary_join(g["letter_list"], "")
        starts = np.flatnonzero(new_s)
        out = pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "session_id": pa.array(session_id[starts], pa.int64()),
            "seq": seq,
        })
        return out.filter(pc.match_substring(out["seq"], "vp"))

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_SESSION_PATTERNS = f"""
WITH e AS (
  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS letter,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_SECONDS} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
), q AS (
  SELECT user_id, session_id::BIGINT AS session_id,
         string_agg(letter, '' ORDER BY ts, event_id) AS seq
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, session_id, seq FROM q WHERE seq LIKE '%vp%'
"""


def q_q6_revenue(sf_dir: str):
    """TPC-H Q6 shape — the canonical 'promotion revenue delta' scan:
    one filtered pass over lineitem, zero joins, zero shuffles. Each
    batch folds to a single (count, sum) partial in the exact integer
    domain cents(extendedprice) x hundredths(discount) (product unit =
    1e-4 dollars), so the commutative driver fold over O(blocks) rows
    is bit-exact regardless of block order — the same rationale as
    `pricing_summary`. The predicate prunes at the batch level with
    Arrow compute kernels; the read itself projects only the four
    touched columns."""
    ship_lo = pa.scalar(np.datetime64("1995-01-01", "us"),
                        pa.timestamp("us"))
    ship_hi = pa.scalar(np.datetime64("1996-01-01", "us"),
                        pa.timestamp("us"))

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(sd, ship_lo), pc.less(sd, ship_hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                        pc.less_equal(t["l_discount"], 0.07)),
                pc.less(t["l_quantity"], 24.0)))
        f = t.filter(keep)
        ep = _cents(f["l_extendedprice"]).to_numpy(zero_copy_only=False)
        dh = pc.round(pc.multiply(f["l_discount"], 100)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "n_items": pa.array([np.int64(f.num_rows)], pa.int64()),
            "revenue_e4": pa.array([np.int64((ep * dh).sum())], pa.int64()),
        })

    parts = li.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_items": pa.array([sum(r["n_items"] for r in parts)], pa.int64()),
        "revenue_e4": pa.array([sum(r["revenue_e4"] for r in parts)],
                               pa.int64()),
    })


SQL_Q6_REVENUE = """
SELECT count(*)::BIGINT AS n_items,
       coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)), 0)::BIGINT
         AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_nearest_view(sf_dir: str):
    """NEAREST-event join, BOTH directions — for every purchase, the
    temporally closest view by the same user (before OR after), the
    general form of the asof family (`asof_last_view` looks only
    backward, `first_touch` only at a trailing window). One tagged
    exchange by user; inside a bucket the views sort once by
    (user, ts, event_id) onto disjoint encoded segments and every
    purchase resolves BOTH neighbours with a single searchsorted:
    index i-1 is the latest view <= t, index i the earliest view >= t,
    and the winner is the smaller |gap| with ties broken by the
    smaller view id across both sides (run heads are id-minimal
    because ids are the innermost lexsort key). No per-user loop, no
    |P| x |V| pair blowup — the oracle's quadratic join is exactly
    what this plan avoids."""
    from .pipelines.relational import bucketed_reduce

    BIG = np.int64(2**62)
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        is_v = pc.equal(t["event_type"], "view")
        is_p = pc.equal(t["event_type"], "purchase")
        t = t.filter(pc.or_(is_v, is_p))
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "side": pc.equal(t["event_type"], "purchase").cast(pa.int8()),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "nearest_view_id": pa.nulls(0, pa.int64()),
                          "gap_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        sd = t["side"].to_numpy(zero_copy_only=False)
        rel = ts - ts.min()
        # segment stride: no |gap| can reach into a neighbouring user
        offset = 3 * (rel.max() + np.int64(2))
        v, p = sd == 0, sd == 1
        if not p.any() or not v.any():
            return empty
        vu, vrel, ve = u[v], rel[v], eid[v]
        order = np.lexsort((ve, vrel, vu))
        vu, vrel, ve = vu[order], vrel[order], ve[order]
        uniq = np.unique(vu)
        vseg = np.cumsum(np.r_[0, vu[1:] != vu[:-1]])
        vz = vrel + vseg * offset
        pu, prel, pe = u[p], rel[p], eid[p]
        idx = np.searchsorted(uniq, pu)
        hit = idx < len(uniq)
        idx_c = np.minimum(idx, max(len(uniq) - 1, 0))
        hit &= uniq[idx_c] == pu
        pz = prel + idx_c * offset
        i = np.searchsorted(vz, pz, side="left")
        lo_seg = idx_c * offset
        hi_seg = lo_seg + offset
        ib = np.maximum(i - 1, 0)
        ok_b = (i - 1 >= 0) & (vz[ib] >= lo_seg)
        ia = np.minimum(i, len(vz) - 1)
        ok_a = (i < len(vz)) & (vz[ia] < hi_seg)
        gap_b = np.where(ok_b, pz - vz[ib], BIG)
        gap_a = np.where(ok_a, vz[ia] - pz, BIG)
        d = np.minimum(gap_b, gap_a)
        hit &= d < BIG
        # run heads at exactly distance d on each side are id-minimal
        hb = np.minimum(np.searchsorted(vz, pz - d, side="left"),
                        len(vz) - 1)
        ha = np.minimum(np.searchsorted(vz, pz + d, side="left"),
                        len(vz) - 1)
        cand_b = np.where(gap_b == d, ve[hb], BIG)
        cand_a = np.where(gap_a == d, ve[ha], BIG)
        nearest = np.minimum(cand_b, cand_a)
        return pa.table({
            "event_id": pa.array(pe[hit], pa.int64()),
            "nearest_view_id": pa.array(nearest[hit], pa.int64()),
            "gap_us": pa.array(d[hit], pa.int64()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_NEAREST_VIEW = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts
  FROM events WHERE event_type = 'view'
), j AS (
  SELECT p.event_id AS pe, v.event_id AS ve, abs(p.ts - v.ts)::BIGINT AS d
  FROM p JOIN v ON v.user_id = p.user_id
), m AS (
  SELECT pe, min(d) AS d FROM j GROUP BY 1
)
SELECT m.pe AS event_id, min(j.ve)::BIGINT AS nearest_view_id,
       m.d AS gap_us
FROM m JOIN j ON j.pe = m.pe AND j.d = m.d
GROUP BY m.pe, m.d
"""


def q_linear_interp(sf_dir: str):
    """Time-series LINEAR-INTERPOLATION gap fill — the companion of
    `forward_fill` for model features that want a smooth daily signal:
    each user's 31-day grid, missing days filled by interpolating
    between the bracketing anchor days (per-(user, day) LATEST event
    value). The interpolated value is emitted as an EXACT RATIONAL
    (numerator = prev*(next_d - d) + next*(d - prev_d) in cents,
    denominator = next_d - prev_d), so both engines compare bit-exact
    integers and no IEEE rounding contract is needed. Days outside a
    user's anchor hull stay NULL. One exchange by user; inside a
    bucket BOTH brackets come from two searchsorteds over a composite
    (user * 64 + day) key — no per-user loop, no self-join."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.day(t["ts"]).cast(pa.int64()),
            "ts": t["ts"], "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "day": pa.nulls(0, pa.int64()),
                          "interp_num": pa.nulls(0, pa.int64()),
                          "interp_den": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        df = (df.assign(_ts=ts)
              .sort_values(["user_id", "day", "_ts", "event_id"])
              .groupby(["user_id", "day"], as_index=False).last())
        du = df["user_id"].to_numpy()
        dd = df["day"].to_numpy()
        dc = df["cents"].to_numpy()
        users = np.unique(du)
        gu = np.repeat(users, 31)
        gd = np.tile(np.arange(1, 32, dtype=np.int64), len(users))
        comp_d = du * 64 + dd
        comp_g = gu * 64 + gd
        pi = np.searchsorted(comp_d, comp_g, side="right") - 1
        pic = np.maximum(pi, 0)
        ok_p = (pi >= 0) & (du[pic] == gu)
        ni = np.searchsorted(comp_d, comp_g, side="left")
        nic = np.minimum(ni, len(comp_d) - 1)
        ok_n = (ni < len(comp_d)) & (du[nic] == gu)
        ok = ok_p & ok_n
        pd_, pv = dd[pic], dc[pic]
        nd_, nv = dd[nic], dc[nic]
        anchor = pd_ == nd_          # grid day IS an anchor day
        num = np.where(anchor, pv,
                       pv * (nd_ - gd) + nv * (gd - pd_))
        den = np.where(anchor, np.int64(1), nd_ - pd_)
        return pa.table({
            "user_id": pa.array(gu, pa.int64()),
            "day": pa.array(gd, pa.int64()),
            "interp_num": pa.array(
                np.ma.masked_array(num, mask=~ok), pa.int64()),
            "interp_den": pa.array(
                np.ma.masked_array(den, mask=~ok), pa.int64()),
        })

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16)


SQL_LINEAR_INTERP = """
WITH last AS (
  SELECT user_id, day(ts)::BIGINT AS day,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id, day(ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), daily AS (SELECT user_id, day, cents FROM last WHERE rn = 1),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT unnest(generate_series(1, 31))::BIGINT AS day) g
), w AS (
  SELECT g.user_id, g.day,
         last_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
                    IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.day
                 ROWS UNBOUNDED PRECEDING) AS pd,
         last_value(d.cents IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.day
                 ROWS UNBOUNDED PRECEDING) AS pv,
         first_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
                     IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
         first_value(d.cents IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM grid g LEFT JOIN daily d
    ON d.user_id = g.user_id AND d.day = g.day
)
SELECT user_id, day,
       CASE WHEN pd IS NULL OR nd IS NULL THEN NULL
            WHEN pd = nd THEN pv
            ELSE pv * (nd - day) + nv * (day - pd) END::BIGINT
         AS interp_num,
       CASE WHEN pd IS NULL OR nd IS NULL THEN NULL
            WHEN pd = nd THEN 1 ELSE nd - pd END::BIGINT AS interp_den
FROM w
"""


def q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape — the order-count HISTOGRAM over customers,
    INCLUDING zero-order customers (the left-outer-join-then-double-
    groupby every 'engagement distribution' dashboard runs). No row-
    level join ever happens: orders collapse to per-batch (custkey,
    partial count) rows, the customer side rides the SAME tagged
    exchange as (custkey, 0) sentinel rows, and each bucket finishes
    the per-customer count and ALREADY folds it into a <= |distinct
    counts| histogram partial — so the driver merges O(buckets x
    counts) tiny rows. Shuffle volume is O(blocks x customers-per-
    block) partials, never a row per order."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def o_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({
            "k": g["o_custkey"],
            "cnt": g["o_custkey_count"].cast(pa.int64()),
            "is_cust": pa.array(np.zeros(g.num_rows, np.int8)),
        })

    def c_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["c_custkey"],
            "cnt": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_cust": pa.array(np.ones(t.num_rows, np.int8)),
        })

    tagged = orders.map_batches(o_partial, batch_format="pyarrow").union(
        cust.map_batches(c_partial, batch_format="pyarrow"))

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_count": pa.nulls(0, pa.int64()),
                          "custdist": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by("k").aggregate(
            [("cnt", "sum"), ("is_cust", "max")])
        g = g.filter(pc.equal(g["is_cust_max"], 1))
        h = (pa.table({"c_count": g["cnt_sum"]})
             .group_by("c_count")
             .aggregate([("c_count", "count")]))
        return pa.table({"c_count": h["c_count"],
                         "custdist": h["c_count_count"].cast(pa.int64())})

    from .pipelines.relational import bucketed_reduce
    parts = bucketed_reduce(tagged, "k", bucket_fn,
                            n_buckets=32).to_pandas()
    out = (parts.groupby("c_count", as_index=False)["custdist"].sum()
           .sort_values("c_count"))
    return pa.table({
        "c_count": pa.array(out["c_count"], pa.int64()),
        "custdist": pa.array(out["custdist"], pa.int64()),
    })


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
GROUP BY 1
"""


Q18_QTY_THRESHOLD = 300


def q_big_qty_orders(sf_dir: str):
    """TPC-H Q18 shape — large-volume orders: orders whose lineitem
    quantity total exceeds the threshold, joined back to the order
    header and the (broadcast) customer name. The HAVING side never
    ships rows: lineitem folds to per-batch (orderkey, qty partial)
    in the exact integer quantity domain, ONE exchange by orderkey
    finishes the sums and filters, and the surviving handful joins the
    header via the bucketed hash exchange (both sides large at real
    scale); the 1-column customer name map broadcasts once. Output
    money stays in cents."""
    import ray

    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    def li_partial(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"]).cast(pa.int64())
        g = (pa.table({"o_orderkey": t["l_orderkey"], "q": q})
             .group_by("o_orderkey").aggregate([("q", "sum")]))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "q": g["q_sum"]})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.nulls(0, pa.int64()),
                             "sum_qty": pa.nulls(0, pa.int64())})
        g = t.group_by("o_orderkey").aggregate([("q", "sum")])
        g = g.filter(pc.greater(g["q_sum"], Q18_QTY_THRESHOLD))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "sum_qty": g["q_sum"]})

    big = bucketed_reduce(
        li.map_batches(li_partial, batch_format="pyarrow"),
        "o_orderkey", finish, n_buckets=32)
    joined = bucketed_hash_join(orders, big, "o_orderkey", n_buckets=16)

    def enrich(t: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_name": pa.array([names[int(k)] for k in ck], pa.string()),
            "o_custkey": t["o_custkey"],
            "o_orderkey": t["o_orderkey"],
            "totalprice_cents": _cents(t["o_totalprice"]),
            "sum_qty": t["sum_qty"],
        })

    return joined.map_batches(enrich, batch_format="pyarrow")


SQL_BIG_QTY_ORDERS = f"""
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       sum(CAST(round(l.l_quantity) AS BIGINT))::BIGINT AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
HAVING sum(CAST(round(l.l_quantity) AS BIGINT)) > {Q18_QTY_THRESHOLD}
"""


ROLLING_WINDOW_ROWS = 5


def q_rolling_moments(sf_dir: str):
    """Grouped ROLLING MOMENTS (the Bollinger-band primitive): for
    every event, the trailing-5-row (count, sum, sum-of-squares) of
    the cents value within its user's (ts, event_id) order — mean and
    variance read off exactly downstream, published as integers so no
    IEEE summation contract is needed. One exchange by user; inside a
    bucket one lexsort + TWO prefix sums answer every window by
    subtraction (cs[i+1] - cs[start]), with the window start clamped
    to the user-segment head — no per-row loop, no 5-way self-join."""
    from .pipelines.relational import bucketed_reduce

    W = ROLLING_WINDOW_ROWS
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "w_n": pa.nulls(0, pa.int64()),
                          "w_sum": pa.nulls(0, pa.int64()),
                          "w_sumsq": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, c = u[order], eid[order], c[order]
        n = len(u)
        seg = np.cumsum(np.r_[0, u[1:] != u[:-1]])
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        w_n = np.minimum(pos + 1, W)
        lo = np.arange(n) - w_n + 1
        cs = np.r_[np.int64(0), np.cumsum(c)]
        cs2 = np.r_[np.int64(0), np.cumsum(c * c)]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "w_n": pa.array(w_n, pa.int64()),
            "w_sum": pa.array(cs[np.arange(n) + 1] - cs[lo], pa.int64()),
            "w_sumsq": pa.array(cs2[np.arange(n) + 1] - cs2[lo],
                                pa.int64()),
        })

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_ROLLING_MOMENTS = f"""
SELECT event_id,
       count(*) OVER w::BIGINT AS w_n,
       sum(cents) OVER w::BIGINT AS w_sum,
       sum(cents * cents) OVER w::BIGINT AS w_sumsq
FROM (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_WINDOW_ROWS - 1} PRECEDING
             AND CURRENT ROW)
"""


KCORE_K = 16
KCORE_ROUNDS = 4


def q_kcore(sf_dir: str):
    """Bounded K-CORE of the co-purchase graph (same graph as
    `triangle_counts`: parts sharing an order, ``l_partkey % 5 == 0``):
    4 peel rounds at k=20, then the surviving degrees — the density
    backbone every graph-cleaning pipeline extracts before community
    work. All rounds distributed (`graph.kcore_peel`): degree partials
    + one exchange per round, survivor set applied through
    `bucketed_semi_join`, never a driver membership set. The oracle
    unrolls the SAME fixed rounds, so equality does not depend on
    convergence."""
    from .pipelines.graph import cooccurrence_edges, kcore_peel

    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, group="l_orderkey", node="l_partkey")
    out = kcore_peel(edges, k=KCORE_K, rounds=KCORE_ROUNDS)
    return out.map_batches(
        lambda t: t.rename_columns(["l_partkey", "core_degree"]),
        batch_format="pyarrow")


def _kcore_sql() -> str:
    parts = [f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % {TRIANGLE_PART_MOD} = 0),
e0 AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
)"""]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f""",
d{r} AS (SELECT n, count(*) AS c
         FROM (SELECT a AS n FROM e{r - 1}
               UNION ALL SELECT b FROM e{r - 1}) GROUP BY 1),
a{r} AS (SELECT n FROM d{r} WHERE c >= {KCORE_K}),
e{r} AS (SELECT a, b FROM e{r - 1}
         WHERE a IN (SELECT n FROM a{r})
           AND b IN (SELECT n FROM a{r}))""")
    parts.append(f"""
SELECT n AS l_partkey, count(*)::BIGINT AS core_degree
FROM (SELECT a AS n FROM e{KCORE_ROUNDS}
      UNION ALL SELECT b FROM e{KCORE_ROUNDS})
GROUP BY 1
""")
    return "".join(parts)


SNM_KEY_CHARS = 12
SNM_WINDOW = 3


def q_snm_candidates(sf_dir: str):
    """SORTED-NEIGHBORHOOD dedup candidates — the classic SNM
    alternative to LSH banding: docs sort globally by a normalized
    blocking key (first 12 chars of lowercased text, then doc_id) and
    every pair within a 3-row window is a candidate. The global sort
    is Ray Data's range-partitioned `sort`; the window pass is
    `dedup.sorted_window_pairs` — per-block pair emission where the
    only cross-block state is each block's (w-1)-row tail, O(blocks x
    w) rows through the driver, never the data. At 10^10 docs the
    window pass stays embarrassingly parallel because a pair never
    spans more than w-1 ranks."""
    from .pipelines.dedup import sorted_window_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.utf8_lower(t["text"]), 0, SNM_KEY_CHARS)
        return pa.table({"key": key, "doc_id": t["doc_id"]})

    ordered = docs.map_batches(keyed, batch_format="pyarrow").sort(
        ["key", "doc_id"])
    return sorted_window_pairs(ordered, "doc_id", SNM_WINDOW)


SQL_SNM_CANDIDATES = f"""
WITH k AS (
  SELECT doc_id, substr(lower(text), 1, {SNM_KEY_CHARS}) AS key
  FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rn FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW - 1}
"""


def q_word_length_histogram(sf_dir: str):
    """WORD-LENGTH histogram per language — the tokenizer-sizing audit
    (how long are this corpus's tokens?) and a pure map-side shape:
    each batch explodes whitespace tokens and folds straight to
    (lang, len) partial counts, so only O(langs x max_len) tiny rows
    ever leave a task; the driver merge is bounded by the same product.
    Lengths are codepoints in both engines (Python len == DuckDB
    len)."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ex = (df.assign(w=df["text"].fillna("").str.split())
              .explode("w").dropna(subset=["w"]))
        ex["word_len"] = ex["w"].str.len().astype("int64")
        g = ex.groupby(["lang", "word_len"], as_index=False).size()
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "word_len": pa.array(g["word_len"], pa.int64()),
            "n_words": pa.array(g["size"], pa.int64()),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby(["lang", "word_len"], as_index=False)
           ["n_words"].sum().sort_values(["lang", "word_len"]))
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "word_len": pa.array(out["word_len"], pa.int64()),
        "n_words": pa.array(out["n_words"], pa.int64()),
    })


SQL_WORD_LENGTH_HISTOGRAM = r"""
SELECT lang, len(w)::BIGINT AS word_len, count(*)::BIGINT AS n_words
FROM (
  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
)
WHERE w <> ''
GROUP BY 1, 2
"""


KMVJ_K = 64
KMVJ_M = 2305843009213693951
KMVJ_SRC_A = "src0"
KMVJ_SRC_B = "src1"


def q_kmv_jaccard(sf_dir: str):
    """KMV-sketch JACCARD between two sources' vocabularies — the
    sketch-space companion of `source_vocab_overlap` (which is exact):
    keep each side's K smallest distinct word hashes, take the K
    smallest of their union, and the fraction of those present in BOTH
    side sketches estimates J(A, B). Like `kmv_distinct`, the whole
    sketch state is ORDER BY hash LIMIT K, so the SQL oracle restates
    it bit-for-bit (same md5-upper-8 contract). Per-batch partials are
    K-min merges (associative); the driver folds O(blocks x K) ints
    and never sees a word list."""
    from .util import md5_id_bucket

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        txt = t["text"].to_numpy(zero_copy_only=False)
        out_side, out_h = [], []
        for side, name in ((0, KMVJ_SRC_A), (1, KMVJ_SRC_B)):
            rows = txt[src == name]
            if not len(rows):
                continue
            words = np.unique(np.concatenate(
                [np.array(s.split(), dtype=object) for s in rows]
                or [np.array([], object)]))
            h = np.unique(md5_id_bucket("kmvj-v1", words, KMVJ_M))[:KMVJ_K]
            out_side.append(np.full(len(h), side, np.int8))
            out_h.append(h)
        if not out_h:
            return pa.table({"side": pa.nulls(0, pa.int8()),
                             "h": pa.nulls(0, pa.int64())})
        return pa.table({"side": pa.array(np.concatenate(out_side)),
                         "h": pa.array(np.concatenate(out_h), pa.int64())})

    ka = np.array([], np.int64)
    kb = np.array([], np.int64)
    for r in docs.map_batches(partial, batch_format="pyarrow").take_all():
        if r["side"] == 0:
            ka = np.append(ka, r["h"])
        else:
            kb = np.append(kb, r["h"])
    ka = np.unique(ka)[:KMVJ_K]
    kb = np.unique(kb)[:KMVJ_K]
    u = np.unique(np.concatenate([ka, kb]))[:KMVJ_K]
    k_used = len(u)
    n_both = int(np.sum(np.isin(u, ka) & np.isin(u, kb)))
    jac_ppm = n_both * 1_000_000 // k_used if k_used else 0
    return pa.table({"k_used": pa.array([k_used], pa.int64()),
                     "n_both": pa.array([n_both], pa.int64()),
                     "jaccard_ppm": pa.array([jac_ppm], pa.int64())})


SQL_KMV_JACCARD = rf"""
WITH wa AS (
  SELECT DISTINCT unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents WHERE source = '{KMVJ_SRC_A}'
), ka AS (
  SELECT DISTINCT (md5_number_upper('kmvj-v1:' || w)::HUGEINT
                   % {KMVJ_M}::HUGEINT)::BIGINT AS h
  FROM wa WHERE w <> '' ORDER BY h LIMIT {KMVJ_K}
), wb AS (
  SELECT DISTINCT unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents WHERE source = '{KMVJ_SRC_B}'
), kb AS (
  SELECT DISTINCT (md5_number_upper('kmvj-v1:' || w)::HUGEINT
                   % {KMVJ_M}::HUGEINT)::BIGINT AS h
  FROM wb WHERE w <> '' ORDER BY h LIMIT {KMVJ_K}
), u AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ORDER BY h LIMIT {KMVJ_K}
)
SELECT count(*)::BIGINT AS k_used,
       count(*) FILTER (h IN (SELECT h FROM ka)
                        AND h IN (SELECT h FROM kb))::BIGINT AS n_both,
       CASE WHEN count(*) = 0 THEN 0
            ELSE count(*) FILTER (h IN (SELECT h FROM ka)
                                  AND h IN (SELECT h FROM kb))
                 * 1000000 // count(*) END::BIGINT AS jaccard_ppm
FROM u
"""


AUTOCOV_MAX_LAG = 7


def q_daily_autocov(sf_dir: str):
    """Time-series AUTOCOVARIANCE sufficient statistics of the global
    daily value series at lags 1..7 — the seasonality probe behind
    every 'is there a weekly cycle' question, published as the exact
    integer partials (n_pairs, Σx·y, Σx, Σy) per lag so downstream
    computes cov/corr at any precision with no IEEE contract. The
    daily series folds from per-batch (day, cents) partials
    (O(blocks x 31) driver rows); the lag products are a trivial
    driver pass over the 31-point series — the data itself is never
    shuffled at all."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64()),
                       "c": _cents(t["value"])})
             .group_by("day").aggregate([("c", "sum")]))
        return pa.table({"day": g["day"], "c": g["c_sum"]})

    import pandas as pd
    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    daily = (parts.groupby("day", as_index=False)["c"].sum()
             .sort_values("day"))
    d = daily["day"].to_numpy()
    c = daily["c"].to_numpy()
    pos = {int(dv): i for i, dv in enumerate(d)}
    lags, n_p, cross, s_a, s_b = [], [], [], [], []
    for lag in range(1, AUTOCOV_MAX_LAG + 1):
        ia = [pos[dv] for dv in d if dv + lag in pos]
        ib = [pos[dv + lag] for dv in d if dv + lag in pos]
        a, b = c[ia], c[ib]
        lags.append(lag)
        n_p.append(len(a))
        cross.append(int((a * b).sum()))
        s_a.append(int(a.sum()))
        s_b.append(int(b.sum()))
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "n_pairs": pa.array(n_p, pa.int64()),
                     "cross_sum": pa.array(cross, pa.int64()),
                     "sum_a": pa.array(s_a, pa.int64()),
                     "sum_b": pa.array(s_b, pa.int64())})


SQL_DAILY_AUTOCOV = f"""
WITH daily AS (
  SELECT day(ts)::BIGINT AS d,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
  FROM events GROUP BY 1
)
SELECT l.lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
       sum(a.c * b.c)::BIGINT AS cross_sum,
       sum(a.c)::BIGINT AS sum_a, sum(b.c)::BIGINT AS sum_b
FROM (SELECT unnest(generate_series(1, {AUTOCOV_MAX_LAG})) AS lag) l
JOIN daily a ON TRUE
JOIN daily b ON b.d = a.d + l.lag
GROUP BY 1
"""


CHECKSUM_BUCKETS = 16
CHECKSUM_MOD = 2305843009213693951


def q_partition_checksums(sf_dir: str):
    """Per-partition MERKLE-style table digest — the replica/sync audit
    a 100 TB mirror job runs instead of diffing rows: bucket by
    ``doc_id % 16`` and publish each bucket's row count + the mod-P sum
    of a keyed md5 over the row's content columns. Comparing two
    tables' digests localizes a divergence to a bucket at O(buckets)
    cost. Commutative mod-sum partials fold per batch (Python-int
    accumulation, immune to int64 overflow), O(blocks x buckets) rows
    to the driver, data never shuffles."""
    from .util import md5_id_bucket

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        rows = np.array([f"{i}|{n}|{s}"
                         for i, n, s in zip(ids, nch, lang)], object)
        h = md5_id_bucket("cks-v1", rows, CHECKSUM_MOD)
        bucket = ids % CHECKSUM_BUCKETS
        bs, ns, ds_ = [], [], []
        for b in np.unique(bucket):
            m = bucket == b
            bs.append(int(b))
            ns.append(int(m.sum()))
            ds_.append(int(h[m].astype(object).sum()) % CHECKSUM_MOD)
        return pa.table({"bucket": pa.array(bs, pa.int64()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "digest": pa.array(ds_, pa.int64())})

    import pandas as pd
    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("bucket", as_index=False)
           .agg(n_rows=("n_rows", "sum"),
                digest=("digest",
                        lambda s: int(sum(int(x) for x in s))
                        % CHECKSUM_MOD))
           .sort_values("bucket"))
    return pa.table({"bucket": pa.array(out["bucket"], pa.int64()),
                     "n_rows": pa.array(out["n_rows"], pa.int64()),
                     "digest": pa.array(out["digest"], pa.int64())})


SQL_PARTITION_CHECKSUMS = f"""
SELECT (doc_id % {CHECKSUM_BUCKETS})::BIGINT AS bucket,
       count(*)::BIGINT AS n_rows,
       (sum((md5_number_upper('cks-v1:' || doc_id::VARCHAR || '|'
                              || n_chars::VARCHAR || '|' || lang)::HUGEINT
             % {CHECKSUM_MOD}::HUGEINT))
        % {CHECKSUM_MOD}::HUGEINT)::BIGINT AS digest
FROM documents
GROUP BY 1
"""


MUTUAL_K = 5


def q_mutual_knn(sf_dir: str):
    """Reciprocal k-NN pairs over the embedding table — vectors that
    are in EACH OTHER's cosine top-5 (self excluded), the
    mutual-neighbor graph agglomerative near-dup clustering seeds.
    `ann.mutual_topk_pairs`: brute regime (matrix broadcast once, the
    IVF path is the scale story), distributed per-query re-rank, one
    exchange on the normalized pair key for the reciprocity check."""
    from .pipelines.ann import mutual_topk_pairs

    return mutual_topk_pairs(_read(sf_dir, "embeddings"), k=MUTUAL_K)


SQL_MUTUAL_KNN = f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rank
  FROM sims
), topk AS (
  SELECT query_id, vec_id FROM ranked WHERE rank <= {MUTUAL_K}
)
SELECT a.query_id AS vec_a, a.vec_id AS vec_b
FROM topk a JOIN topk b
  ON b.query_id = a.vec_id AND b.vec_id = a.query_id
WHERE a.query_id < a.vec_id
"""


def _edit1(a: str, b: str) -> bool:
    """Exact LD == 1 for FastSS candidate verification."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _ld1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact LD == 1 over object-dtype string arrays.

    Equal-length pairs reduce to byte-hamming == 1, computed as one
    (n, width) uint8 matrix comparison; unequal-length (diff 1) pairs
    fall back to the scalar ``_edit1`` (none occur for fixed-width
    vocabularies like customer names). Non-ascii batches fall back
    entirely — a multi-byte substitution is 1 char edit but >1 byte
    diff, so the byte path would be wrong there."""
    try:
        A = a.astype("S")
        B = b.astype("S")
    except UnicodeEncodeError:
        return np.fromiter((_edit1(x, y) for x, y in zip(a, b)),
                           bool, len(a))
    w = max(A.dtype.itemsize, B.dtype.itemsize)
    Au = A.astype(f"S{w}").view("u1").reshape(len(A), w)
    Bu = B.astype(f"S{w}").view("u1").reshape(len(B), w)
    # NUL-padded, so equal-length rows only differ on content bytes
    diff = (Au != Bu).sum(axis=1)
    la = np.char.str_len(A)
    lb = np.char.str_len(B)
    out = np.zeros(len(A), bool)
    eq = la == lb
    out[eq] = diff[eq] == 1
    ne = np.flatnonzero(~eq & (np.abs(la - lb) == 1))
    for i in ne:
        out[i] = _edit1(a[i], b[i])
    return out


def q_name_edit_pairs(sf_dir: str):
    """Edit-distance-1 string pairs via the FastSS
    DELETION-NEIGHBORHOOD join — the typo/variant detector that scales
    where a quadratic string self-join cannot: every name maps to
    itself plus its 1-deletion variants, two strings at LD <= 1 MUST
    share a variant key, so ONE exchange by variant co-locates every
    candidate; sharing a key is not sufficient (transpositions slip
    in), so a vectorized exact LD == 1 verify finishes (byte-matrix
    hamming for the equal-length/ascii fast path, per-pair fallback
    otherwise). Cross-key duplicate candidates dedup inside a second
    hash exchange keyed on word_a — a pair always lands in one bucket,
    so no global sort is needed. Runs over customer names (19.5k true
    pairs at the gate sf — the document vocab has none)."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    cust = _read(sf_dir, "customer", ["c_name"])

    def vocab_partial(t: pa.Table) -> pa.Table:
        return pa.table({"w": pc.unique(t["c_name"])})

    def distinct_words(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w": pa.nulls(0, pa.string())})
        return pa.table({"w": pc.unique(t["w"])})

    str_schema = pa.schema([("w", pa.string())])
    vocab = drop_empty_blocks(bucketed_reduce(
        cust.map_batches(vocab_partial, batch_format="pyarrow"),
        "w", distinct_words, n_buckets=16, schema=str_schema))

    def variants(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        keys, words = [], []
        for w in ws:
            keys.append(w)
            words.append(w)
            for i in range(len(w)):
                keys.append(w[:i] + w[i + 1:])
                words.append(w)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "w": pa.array(words, pa.string())})

    def cand_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"word_a": pa.nulls(0, pa.string()),
                          "word_b": pa.nulls(0, pa.string())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().drop_duplicates()
              .sort_values(["key", "w"], kind="stable"))
        k = df["key"].to_numpy()
        w = df["w"].to_numpy()
        # all i<j index pairs inside each key segment, fully vectorized
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        cnt = np.diff(np.r_[starts, len(k)])
        csz = np.repeat(cnt, cnt)
        local = np.arange(len(k)) - np.repeat(starts, cnt)
        na = csz - 1 - local               # pairs where elt is the 'a'
        a_idx = np.repeat(np.arange(len(k)), na)
        cum = np.cumsum(na) - na
        off = np.arange(int(na.sum())) - np.repeat(cum, na)
        b_idx = a_idx + 1 + off
        return pa.table({"word_a": pa.array(w[a_idx], pa.string()),
                         "word_b": pa.array(w[b_idx], pa.string())})

    cands = drop_empty_blocks(bucketed_reduce(
        vocab.map_batches(variants, batch_format="pyarrow"),
        "key", cand_pairs, n_buckets=16,
        schema=pa.schema([("key", pa.string()), ("w", pa.string())])))

    def dedup_verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"word_a": pa.nulls(0, pa.string()),
                          "word_b": pa.nulls(0, pa.string())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().drop_duplicates()
        a = df["word_a"].to_numpy()
        b = df["word_b"].to_numpy()
        keep = _ld1_mask(a, b)
        return pa.table({"word_a": pa.array(a[keep], pa.string()),
                         "word_b": pa.array(b[keep], pa.string())})

    pair_schema = pa.schema([("word_a", pa.string()),
                             ("word_b", pa.string())])
    return drop_empty_blocks(bucketed_reduce(
        cands, "word_a", dedup_verify, n_buckets=16,
        schema=pair_schema))


SQL_NAME_EDIT_PAIRS = """
WITH v AS (SELECT DISTINCT c_name AS w FROM customer)
SELECT a.w AS word_a, b.w AS word_b
FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) = 1
"""


def q_cumulative_users(sf_dir: str):
    """CUMULATIVE DISTINCT users per day — running count-distinct, the
    window no engine computes directly at scale; the standard lowering
    is the FIRST-OCCURRENCE trick: distinct-count-to-date(d) = number
    of users whose FIRST event day <= d. One exchange by user finishes
    per-user min-day from per-batch partials, per-day first counts are
    <= 31 rows, and the prefix sum over the 31-day grid is a driver
    fold of O(days)."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t["user_id"],
                       "d": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("user_id").aggregate([("d", "min")]))
        return pa.table({"user_id": g["user_id"], "d": g["d_min"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.nulls(0, pa.int64()),
                             "n_first": pa.nulls(0, pa.int64())})
        g = (t.group_by("user_id").aggregate([("d", "min")])
             .group_by("d_min").aggregate([("d_min", "count")]))
        return pa.table({"d": g["d_min"],
                         "n_first": g["d_min_count"].cast(pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    per_day = parts.groupby("d")["n_first"].sum()
    days = np.arange(1, 32, dtype=np.int64)
    firsts = np.array([per_day.get(int(d), 0) for d in days], np.int64)
    return pa.table({"day": pa.array(days, pa.int64()),
                     "cum_users": pa.array(np.cumsum(firsts), pa.int64())})


SQL_CUMULATIVE_USERS = """
WITH f AS (
  SELECT user_id, min(day(ts))::BIGINT AS d FROM events GROUP BY 1
), g AS (SELECT unnest(generate_series(1, 31))::BIGINT AS day)
SELECT g.day, count(f.user_id)::BIGINT AS cum_users
FROM g LEFT JOIN f ON f.d <= g.day
GROUP BY 1
"""


KS_SRC_A = "src0"
KS_SRC_B = "src1"


def q_ks_statistic(sf_dir: str):
    """Two-sample KOLMOGOROV-SMIRNOV statistic between two sources'
    n_chars distributions — the drift detector every corpus-refresh
    pipeline runs before accepting a new shard. Exact integer
    contract: D = max_v |F_A(v) - F_B(v)| is published as the scaled
    numerator max|c_A(v)*n_B - c_B(v)*n_A| over denominator n_A*n_B,
    plus the smallest threshold attaining it. Per-batch (side, value)
    count partials fold on the driver at O(blocks x distinct-values);
    the cum-sum scan is O(distinct) — the data never shuffles."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        side = np.where(src == KS_SRC_A, 0, np.where(src == KS_SRC_B, 1, -1))
        keep = side >= 0
        if not keep.any():
            return pa.table({"side": pa.nulls(0, pa.int64()),
                             "v": pa.nulls(0, pa.int64()),
                             "n": pa.nulls(0, pa.int64())})
        key = np.stack([side[keep], v[keep]], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"side": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    import pandas as pd
    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["side", "v"])["n"].sum()
    a = g.get(0, pd.Series(dtype="int64"))
    b = g.get(1, pd.Series(dtype="int64"))
    vals = np.unique(np.concatenate([
        np.asarray(a.index, np.int64), np.asarray(b.index, np.int64)]))
    ca = np.cumsum([int(a.get(int(v), 0)) for v in vals])
    cb = np.cumsum([int(b.get(int(v), 0)) for v in vals])
    n1, n2 = int(ca[-1]) if len(ca) else 0, int(cb[-1]) if len(cb) else 0
    diff = np.abs(ca * n2 - cb * n1)
    d_num = int(diff.max()) if len(diff) else 0
    at_value = int(vals[np.argmax(diff)]) if len(diff) else 0
    return pa.table({"n1": pa.array([n1], pa.int64()),
                     "n2": pa.array([n2], pa.int64()),
                     "d_num": pa.array([d_num], pa.int64()),
                     "at_value": pa.array([at_value], pa.int64())})


SQL_KS_STATISTIC = f"""
WITH a AS (SELECT n_chars AS v FROM documents WHERE source = '{KS_SRC_A}'),
b AS (SELECT n_chars AS v FROM documents WHERE source = '{KS_SRC_B}'),
vals AS (SELECT DISTINCT v FROM (SELECT v FROM a UNION SELECT v FROM b)),
c AS (
  SELECT vals.v,
         (SELECT count(*) FROM a WHERE a.v <= vals.v)::BIGINT AS c1,
         (SELECT count(*) FROM b WHERE b.v <= vals.v)::BIGINT AS c2
  FROM vals
), m AS (
  SELECT max(abs(c1 * (SELECT count(*) FROM b)
               - c2 * (SELECT count(*) FROM a)))::BIGINT AS d FROM c
)
SELECT (SELECT count(*) FROM a)::BIGINT AS n1,
       (SELECT count(*) FROM b)::BIGINT AS n2,
       m.d AS d_num,
       (SELECT min(v) FROM c
        WHERE abs(c1 * (SELECT count(*) FROM b)
                - c2 * (SELECT count(*) FROM a)) = m.d)::BIGINT AS at_value
FROM m
"""


def q_linkage_features(sf_dir: str):
    """RECORD-LINKAGE feature join — the Fellegi-Sunter scoring input:
    for every edit-distance-1 customer-name pair (the FastSS candidate
    set of `name_edit_pairs`), the field-agreement features a linkage
    model consumes: same-nation flag, same-segment flag, absolute
    balance gap in cents. The pair table joins the customer dim TWICE
    through the bucketed hash exchange keyed on the name string —
    feature extraction never touches the quadratic name space."""
    from .pipelines.relational import bucketed_hash_join

    pairs = q_name_edit_pairs(sf_dir).materialize()
    cust = _read(sf_dir, "customer",
                 ["c_name", "c_nationkey", "c_mktsegment", "c_acctbal"])

    def side(tag: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                f"word_{tag}": t["c_name"],
                f"nat_{tag}": t["c_nationkey"].cast(pa.int64()),
                f"seg_{tag}": t["c_mktsegment"],
                f"bal_{tag}": _cents(t["c_acctbal"]),
            })
        return f

    ca = cust.map_batches(side("a"), batch_format="pyarrow").materialize()
    cb = cust.map_batches(side("b"), batch_format="pyarrow").materialize()
    j = bucketed_hash_join(pairs, ca, "word_a", n_buckets=16)
    j = bucketed_hash_join(j, cb, "word_b", n_buckets=16)

    def feats(t: pa.Table) -> pa.Table:
        return pa.table({
            "name_a": t["word_a"],
            "name_b": t["word_b"],
            "same_nation": pc.equal(t["nat_a"], t["nat_b"]).cast(pa.int64()),
            "same_segment": pc.equal(t["seg_a"], t["seg_b"]).cast(pa.int64()),
            "bal_diff_cents": pc.abs(pc.subtract(t["bal_a"], t["bal_b"])),
        })

    return j.map_batches(feats, batch_format="pyarrow")


SQL_LINKAGE_FEATURES = """
WITH v AS (SELECT DISTINCT c_name AS w FROM customer),
p AS (
  SELECT a.w AS word_a, b.w AS word_b
  FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) = 1
)
SELECT p.word_a AS name_a, p.word_b AS name_b,
       (ca.c_nationkey = cb.c_nationkey)::BIGINT AS same_nation,
       (ca.c_mktsegment = cb.c_mktsegment)::BIGINT AS same_segment,
       abs(CAST(round(ca.c_acctbal * 100) AS BIGINT)
           - CAST(round(cb.c_acctbal * 100) AS BIGINT))::BIGINT
         AS bal_diff_cents
FROM p JOIN customer ca ON ca.c_name = p.word_a
       JOIN customer cb ON cb.c_name = p.word_b
"""


def q_acctbal_gini(sf_dir: str):
    """Per-nation GINI COEFFICIENT of customer balances as an EXACT
    RATIONAL — the inequality audit, via the rank formula
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over the (balance, custkey)-
    sorted sequence; numerator and denominator publish as integers so
    no division order matters. ONE exchange by nation; inside a bucket
    a single lexsort + segment-local ranks compute every nation's sums
    vectorized — no per-nation loop, no window shuffle."""
    from .pipelines.relational import bucketed_reduce

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_custkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "nat": t["c_nationkey"].cast(pa.int64()),
            "ck": t["c_custkey"],
            "bal": _cents(t["c_acctbal"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.nulls(0, pa.int64()),
                          "gini_num": pa.nulls(0, pa.int64()),
                          "gini_den": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        nat = t["nat"].to_numpy(zero_copy_only=False)
        ck = t["ck"].to_numpy(zero_copy_only=False)
        bal = t["bal"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, bal, nat))
        nat, bal = nat[order], bal[order]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        cnt = np.diff(np.r_[starts, len(nat)])
        rank = (np.arange(len(nat))
                - np.repeat(starts, cnt) + 1)          # 1-based in-group
        sx = np.add.reduceat(bal, starts)
        six = np.add.reduceat(rank * bal, starts)
        num = 2 * six - (cnt + 1) * sx
        den = cnt * sx
        return pa.table({"c_nationkey": pa.array(nat[starts], pa.int64()),
                         "gini_num": pa.array(num, pa.int64()),
                         "gini_den": pa.array(den, pa.int64())})

    return bucketed_reduce(cust.map_batches(prep, batch_format="pyarrow"),
                           "nat", bucket_fn, n_buckets=16)


SQL_ACCTBAL_GINI = """
WITH r AS (
  SELECT c_nationkey::BIGINT AS c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY round(c_acctbal * 100), c_custkey)
           AS i
  FROM customer
)
SELECT c_nationkey,
       (2 * sum(i * bal) - (count(*) + 1) * sum(bal))::BIGINT AS gini_num,
       (count(*) * sum(bal))::BIGINT AS gini_den
FROM r GROUP BY 1
"""


BLOOM_FP_M = 4096
BLOOM_FP_K = 3


def q_bloom_fp_audit(sf_dir: str):
    """BLOOM-FILTER false-positive audit — the calibration every
    membership stage (the crawl's URL-seen pre-filter, `ri_audit`'s
    gate) should publish: build an m=4096-bit / k=3 double-hashed
    bloom over the member keys (orderkey % 3 == 0), probe with the
    DISJOINT key set (% 3 == 1), and report bits set + false-positive
    count. Deterministic end to end via the repo-wide md5 contract, so
    the SQL oracle rebuilds the SAME filter bit-for-bit. Member
    position partials OR into a 4096-bit driver bitmap (O(blocks x m)
    bits); the broadcast bitmap probes map-side — nothing shuffles."""
    import ray

    from .util import md5_id_bucket

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def positions(keys: np.ndarray) -> np.ndarray:
        h1 = md5_id_bucket("bf1", keys, BLOOM_FP_M)
        h2 = md5_id_bucket("bf2", keys, BLOOM_FP_M - 1) + 1
        return np.concatenate([(h1 + i * h2) % BLOOM_FP_M
                               for i in range(BLOOM_FP_K)])

    def member_partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        k = k[k % 3 == 0]
        bits = np.zeros(BLOOM_FP_M, bool)
        if len(k):
            bits[positions(k)] = True
        # bit = -1 row carries this batch's member count (aligned cols)
        pos = np.r_[np.flatnonzero(bits).astype(np.int64), np.int64(-1)]
        cnt = np.zeros(len(pos), np.int64)
        cnt[-1] = len(k)
        return pa.table({"bit": pa.array(pos, pa.int64()),
                         "n_members": pa.array(cnt, pa.int64())})

    import pandas as pd
    parts = orders.map_batches(member_partial,
                               batch_format="pyarrow").to_pandas()
    bits = np.zeros(BLOOM_FP_M, bool)
    real = parts[parts["bit"] >= 0] if len(parts) else parts
    if len(real):
        bits[real["bit"].to_numpy()] = True
    n_members = int(parts["n_members"].sum()) if len(parts) else 0
    bits_ref = ray.put(bits)

    class Prober:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False)
            k = k[k % 3 == 1]
            if not len(k):
                return pa.table({"n_probes": pa.array([0], pa.int64()),
                                 "n_fp": pa.array([0], pa.int64())})
            h1 = md5_id_bucket("bf1", k, BLOOM_FP_M)
            h2 = md5_id_bucket("bf2", k, BLOOM_FP_M - 1) + 1
            hit = np.ones(len(k), bool)
            for i in range(BLOOM_FP_K):
                hit &= self.bits[(h1 + i * h2) % BLOOM_FP_M]
            return pa.table({
                "n_probes": pa.array([np.int64(len(k))], pa.int64()),
                "n_fp": pa.array([np.int64(hit.sum())], pa.int64())})

    probe = orders.map_batches(Prober, batch_format="pyarrow",
                               concurrency=2).to_pandas()
    return pa.table({
        "n_members": pa.array([n_members], pa.int64()),
        "n_probes": pa.array([int(probe["n_probes"].sum())], pa.int64()),
        "bits_set": pa.array([int(bits.sum())], pa.int64()),
        "n_fp": pa.array([int(probe["n_fp"].sum())], pa.int64()),
    })


SQL_BLOOM_FP_AUDIT = f"""
WITH members AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 3 = 0
), probes AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 3 = 1
), hm AS (
  SELECT k,
    (md5_number_upper('bf1:' || k::VARCHAR)::HUGEINT
     % {BLOOM_FP_M}::HUGEINT)::BIGINT AS h1,
    (md5_number_upper('bf2:' || k::VARCHAR)::HUGEINT
     % {BLOOM_FP_M - 1}::HUGEINT)::BIGINT + 1 AS h2
  FROM members
), mbits AS (
  SELECT DISTINCT (h1 + i.i * h2) % {BLOOM_FP_M} AS p
  FROM hm CROSS JOIN
       (SELECT unnest(generate_series(0, {BLOOM_FP_K - 1})) AS i) i
), hp AS (
  SELECT k,
    (md5_number_upper('bf1:' || k::VARCHAR)::HUGEINT
     % {BLOOM_FP_M}::HUGEINT)::BIGINT AS h1,
    (md5_number_upper('bf2:' || k::VARCHAR)::HUGEINT
     % {BLOOM_FP_M - 1}::HUGEINT)::BIGINT + 1 AS h2
  FROM probes
), pp AS (
  SELECT k, (h1 + i.i * h2) % {BLOOM_FP_M} AS p
  FROM hp CROSS JOIN
       (SELECT unnest(generate_series(0, {BLOOM_FP_K - 1})) AS i) i
), fp AS (
  SELECT k FROM pp GROUP BY k
  HAVING count(*) FILTER (p IN (SELECT p FROM mbits)) = {BLOOM_FP_K}
)
SELECT (SELECT count(*) FROM members)::BIGINT AS n_members,
       (SELECT count(*) FROM probes)::BIGINT AS n_probes,
       (SELECT count(*) FROM mbits)::BIGINT AS bits_set,
       (SELECT count(*) FROM fp)::BIGINT AS n_fp
"""


def q_rolling_median(sf_dir: str):
    """Grouped ROLLING MEDIAN (trailing 5 rows) of cents per event —
    the robust companion of `rolling_moments`, published as 2x the
    median so partial (even-count) windows stay exact integers. One
    exchange by user; inside a bucket the five shifted columns (with
    a segment-guard sentinel) sort ROW-WISE in one np.sort over an
    (n, 5) matrix, and the median reads off by window count — no
    per-row loop, no window shuffle."""
    from .pipelines.relational import bucketed_reduce

    W = ROLLING_WINDOW_ROWS
    SENT = np.int64(2**62)
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.nulls(0, pa.int64()),
                          "w_n": pa.nulls(0, pa.int64()),
                          "med2": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, eid, c = u[order], eid[order], c[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        w_n = np.minimum(pos + 1, W)
        M = np.full((n, W), SENT, np.int64)
        for d in range(W):
            src = np.arange(n) - d
            ok = pos >= d
            M[ok, d] = c[src[ok]]
        M.sort(axis=1)
        odd = w_n % 2 == 1
        mid = (w_n - 1) // 2
        rows = np.arange(n)
        med2 = np.where(odd, 2 * M[rows, mid],
                        M[rows, np.maximum(w_n // 2 - 1, 0)]
                        + M[rows, w_n // 2])
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "w_n": pa.array(w_n, pa.int64()),
                         "med2": pa.array(med2, pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_ROLLING_MEDIAN = f"""
SELECT event_id,
       count(*) OVER w::BIGINT AS w_n,
       (2 * median(cents) OVER w)::BIGINT AS med2
FROM (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_WINDOW_ROWS - 1} PRECEDING
             AND CURRENT ROW)
"""


DIVERSIFIED_PER_GROUP = 2
DIVERSIFIED_TOTAL = 10


def q_diversified_topk(sf_dir: str):
    """DIVERSIFIED top-k — the leaderboard with a fairness quota:
    global top-10 customers by balance, at most 2 per nation. The
    quota makes it distributable in two bounded stages: per-nation
    top-2 via `grouped_topk` (<= 2 rows per (batch, nation) shuffle),
    then a global sort + limit over <= 2*|nations| survivors — the
    quota guarantees the global answer lives in the survivor set."""
    from .pipelines.relational import grouped_topk

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "bal_cents": _cents(t["c_acctbal"]),
        })

    per_nation = grouped_topk(
        cust.map_batches(prep, batch_format="pyarrow"),
        ["c_nationkey"], "bal_cents", "c_custkey",
        DIVERSIFIED_PER_GROUP)
    top = (per_nation.to_pandas()
           .sort_values(["bal_cents", "c_custkey"],
                        ascending=[False, True], kind="stable")
           .head(DIVERSIFIED_TOTAL))
    return pa.table({
        "c_custkey": pa.array(top["c_custkey"].to_numpy(), pa.int64()),
        "c_nationkey": pa.array(top["c_nationkey"].to_numpy(), pa.int64()),
        "bal_cents": pa.array(top["bal_cents"].to_numpy(), pa.int64()),
    })


SQL_DIVERSIFIED_TOPK = f"""
WITH r AS (
  SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY round(c_acctbal * 100) DESC,
                                     c_custkey) AS rn
  FROM customer
)
SELECT c_custkey, c_nationkey, bal_cents
FROM r WHERE rn <= {DIVERSIFIED_PER_GROUP}
ORDER BY bal_cents DESC, c_custkey
LIMIT {DIVERSIFIED_TOTAL}
"""


def q_above_p90_counts(sf_dir: str):
    """Per-user ABOVE-OWN-P90 alert counts — the decorrelated
    'value > the same user's 90th percentile' subquery every anomaly
    alerter runs: because every user's rows land in exactly one bucket
    of the exchange, the per-user order statistic (rank ceil(0.9 n),
    integer rank math — float ceil(0.9*n) is a cross-engine trap) and
    the count above it resolve in the SAME pass, no join-back. One
    lexsort + reduceat per bucket, vectorized across users."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "c": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_events": pa.nulls(0, pa.int64()),
                          "p90_cents": pa.nulls(0, pa.int64()),
                          "n_above": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, u))
        u, c = u[order], c[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, len(u)])
        rank90 = (9 * cnt + 9) // 10                    # ceil(0.9 n)
        p90 = c[starts + rank90 - 1]
        # all users' "rows above own p90" via ONE searchsorted over the
        # segment-encoded value domain (no per-user loop)
        rel = c - c.min()
        offset = rel.max() + np.int64(2)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        z = rel + seg * offset
        pz = (p90 - c.min()) + np.arange(len(starts),
                                         dtype=np.int64) * offset
        above = (starts + cnt) - np.searchsorted(z, pz, side="right")
        return pa.table({"user_id": pa.array(u[starts], pa.int64()),
                         "n_events": pa.array(cnt, pa.int64()),
                         "p90_cents": pa.array(p90, pa.int64()),
                         "n_above": pa.array(above, pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=16)


SQL_ABOVE_P90_COUNTS = """
WITH e AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM e
), p AS (
  SELECT user_id, max(n)::BIGINT AS n_events,
         max(CASE WHEN rn = (9 * n + 9) // 10 THEN c END)::BIGINT AS p90
  FROM r GROUP BY 1
)
SELECT p.user_id, p.n_events, p.p90 AS p90_cents,
       count(*) FILTER (e.c > p.p90)::BIGINT AS n_above
FROM p JOIN e ON e.user_id = p.user_id
GROUP BY 1, 2, 3
"""


SHIP_DELAY_BIN_US = 30 * 86_400 * 1_000_000
SHIP_DELAY_SHIFT = 100


def q_ship_delay_histogram(sf_dir: str):
    """ORDER-TO-FIRST-SHIP delay histogram in 30-day bins — the
    fulfillment-latency SLA curve: per order, min lineitem shipdate
    minus orderdate, binned. Lineitem folds to per-batch (orderkey,
    min-ship) partials, ONE exchange by orderkey finishes the min, the
    order header attaches through the bucketed hash exchange (both
    sides large at scale), and each batch emits only O(bins) histogram
    partials. Negative delays (the synthetic dates are independent)
    bin correctly because the shift-then-floor-divide keeps the
    numerator non-negative — '//' truncation vs floor never
    diverges."""
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"o_orderkey": t["l_orderkey"],
                       "s": t["l_shipdate"].cast(pa.int64())})
             .group_by("o_orderkey").aggregate([("s", "min")]))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "min_ship_us": g["s_min"]})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.nulls(0, pa.int64()),
                             "min_ship_us": pa.nulls(0, pa.int64())})
        g = t.group_by("o_orderkey").aggregate([("min_ship_us", "min")])
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "min_ship_us": g["min_ship_us_min"]})

    first_ship = bucketed_reduce(
        li.map_batches(li_partial, batch_format="pyarrow"),
        "o_orderkey", finish, n_buckets=32)
    joined = bucketed_hash_join(orders, first_ship, "o_orderkey",
                                n_buckets=16)

    def hist_partial(t: pa.Table) -> pa.Table:
        d = (t["min_ship_us"].to_numpy(zero_copy_only=False)
             - t["o_orderdate"].cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        b = ((d + SHIP_DELAY_BIN_US * SHIP_DELAY_SHIFT)
             // SHIP_DELAY_BIN_US) - SHIP_DELAY_SHIFT
        u, c = np.unique(b, return_counts=True)
        return pa.table({"delay_bucket": pa.array(u, pa.int64()),
                         "n_orders": pa.array(c.astype(np.int64))})

    import pandas as pd
    parts = joined.map_batches(hist_partial,
                               batch_format="pyarrow").to_pandas()
    out = (parts.groupby("delay_bucket", as_index=False)["n_orders"].sum()
           .sort_values("delay_bucket"))
    return pa.table({
        "delay_bucket": pa.array(out["delay_bucket"], pa.int64()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
    })


SQL_SHIP_DELAY_HISTOGRAM = f"""
WITH f AS (
  SELECT l_orderkey, min(epoch_us(l_shipdate))::BIGINT AS ship_us
  FROM lineitem GROUP BY 1
), d AS (
  SELECT ((f.ship_us - epoch_us(o.o_orderdate)
           + {SHIP_DELAY_BIN_US}::BIGINT * {SHIP_DELAY_SHIFT})
          // {SHIP_DELAY_BIN_US}::BIGINT) - {SHIP_DELAY_SHIFT}
           AS delay_bucket
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
)
SELECT delay_bucket::BIGINT AS delay_bucket,
       count(*)::BIGINT AS n_orders
FROM d GROUP BY 1
"""


def q_name_clusters(sf_dir: str):
    """ENTITY-RESOLUTION clusters with survivorship — the golden-record
    builder: connected components over the edit-distance-1 name pair
    graph (`name_edit_pairs` -> custkey pairs via two bucketed hash
    joins), then per-cluster survivorship rules (min custkey as the
    surviving id, member count, max balance) in ONE exchange by
    cluster label. CC is the distributed min-label propagation of
    `dedup.connected_components_ds` (pointer jumping, sharded state);
    the oracle restates the closure as a recursive CTE over the same
    LD = 1 pair set."""
    from .pipelines.dedup import connected_components_ds
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    pairs = q_name_edit_pairs(sf_dir).materialize()
    cust = _read(sf_dir, "customer",
                 ["c_name", "c_custkey", "c_acctbal"])

    def side(tag: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({f"word_{tag}": t["c_name"],
                             f"ck_{tag}": t["c_custkey"]})
        return f

    ca = cust.map_batches(side("a"), batch_format="pyarrow").materialize()
    cb = cust.map_batches(side("b"), batch_format="pyarrow").materialize()
    j = bucketed_hash_join(pairs, ca, "word_a", n_buckets=16)
    j = bucketed_hash_join(j, cb, "word_b", n_buckets=16)
    edge_ids = j.map_batches(
        lambda t: pa.table({"a": t["ck_a"].cast(pa.int64()),
                            "b": t["ck_b"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    cc = connected_components_ds(edge_ids)     # (doc_id, cluster)

    balmap = cust.map_batches(
        lambda t: pa.table({"doc_id": t["c_custkey"].cast(pa.int64()),
                            "bal": _cents(t["c_acctbal"])}),
        batch_format="pyarrow").materialize()
    withbal = bucketed_hash_join(cc, balmap, "doc_id", n_buckets=16)

    def survive(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cluster": pa.nulls(0, pa.int64()),
                             "n_members": pa.nulls(0, pa.int64()),
                             "max_bal_cents": pa.nulls(0, pa.int64())})
        g = t.group_by("cluster").aggregate(
            [("doc_id", "count"), ("bal", "max")])
        return pa.table({
            "cluster": g["cluster"],
            "n_members": g["doc_id_count"].cast(pa.int64()),
            "max_bal_cents": g["bal_max"],
        })

    return bucketed_reduce(withbal, "cluster", survive, n_buckets=16)


SQL_NAME_CLUSTERS = """
WITH RECURSIVE v AS (SELECT DISTINCT c_name AS w FROM customer),
p AS (
  SELECT ca.c_custkey AS a, cb.c_custkey AS b
  FROM v x JOIN v y ON x.w < y.w AND levenshtein(x.w, y.w) = 1
  JOIN customer ca ON ca.c_name = x.w
  JOIN customer cb ON cb.c_name = y.w
),
nodes AS (SELECT a AS x FROM p UNION SELECT b FROM p),
edges AS (SELECT a AS s, b AS d FROM p UNION SELECT b, a FROM p),
reach(x, y) AS (
  SELECT x, x FROM nodes
  UNION
  SELECT r.x, e.d FROM reach r JOIN edges e ON r.y = e.s
),
lab AS (SELECT x AS ck, min(y) AS cluster FROM reach GROUP BY x)
SELECT lab.cluster::BIGINT AS cluster,
       count(*)::BIGINT AS n_members,
       max(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT
         AS max_bal_cents
FROM lab JOIN customer c ON c.c_custkey = lab.ck
GROUP BY 1
"""


def q_ab_lift(sf_dir: str):
    """A/B EXPERIMENT readout over a deterministic hash split — arm =
    md5(user) parity (the same salt-keyed assignment `split` uses, so
    assignment is reproducible and SQL-restatable), metric = purchase
    conversion. Publishes per-arm users / converters and the lift in
    ppm by exact integer division — the experimentation harness's
    primitive readout. Per-user flags fold in ONE exchange by user
    (per-batch partials first); arms then collapse to two rows."""
    from .pipelines.relational import bucketed_reduce
    from .util import md5_id_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({
            "user_id": t["user_id"],
            "p": pc.equal(t["event_type"], "purchase").cast(pa.int64()),
        }).group_by("user_id").aggregate([("p", "max")]))
        return pa.table({"user_id": g["user_id"], "p": g["p_max"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"arm": pa.nulls(0, pa.int64()),
                          "n_users": pa.nulls(0, pa.int64()),
                          "n_converted": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by("user_id").aggregate([("p", "max")])
        ids = g["user_id"].to_numpy(zero_copy_only=False)
        conv = g["p_max"].to_numpy(zero_copy_only=False)
        arm = md5_id_bucket("ab-v1", ids, 2)
        out_arm, out_n, out_c = [], [], []
        for a in (0, 1):
            m = arm == a
            out_arm.append(a)
            out_n.append(int(m.sum()))
            out_c.append(int(conv[m].sum()))
        return pa.table({"arm": pa.array(out_arm, pa.int64()),
                         "n_users": pa.array(out_n, pa.int64()),
                         "n_converted": pa.array(out_c, pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    g = (parts.groupby("arm", as_index=False)
         [["n_users", "n_converted"]].sum().sort_values("arm"))
    na, nb = int(g["n_users"].iloc[0]), int(g["n_users"].iloc[1])
    ca, cb = int(g["n_converted"].iloc[0]), int(g["n_converted"].iloc[1])
    lift = (cb * na * 1_000_000 // (ca * nb)) if ca and nb else 0
    return pa.table({
        "arm": pa.array([0, 1], pa.int64()),
        "n_users": pa.array([na, nb], pa.int64()),
        "n_converted": pa.array([ca, cb], pa.int64()),
        "lift_vs_control_ppm": pa.array([1_000_000, lift], pa.int64()),
    })


SQL_AB_LIFT = """
WITH u AS (
  SELECT user_id,
         (md5_number_upper('ab-v1:' || user_id::VARCHAR)::HUGEINT
          % 2::HUGEINT)::BIGINT AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY 1
), g AS (
  SELECT arm, count(*)::BIGINT AS n_users,
         sum(conv)::BIGINT AS n_converted
  FROM u GROUP BY 1
), w AS (
  SELECT
    (SELECT n_users FROM g WHERE arm = 0) AS na,
    (SELECT n_converted FROM g WHERE arm = 0) AS ca,
    (SELECT n_users FROM g WHERE arm = 1) AS nb,
    (SELECT n_converted FROM g WHERE arm = 1) AS cb
)
SELECT g.arm, g.n_users, g.n_converted,
       CASE WHEN g.arm = 0 THEN 1000000
            ELSE (w.cb * w.na * 1000000 // (w.ca * w.nb)) END::BIGINT
         AS lift_vs_control_ppm
FROM g, w
"""


KM_CENSOR_DAY = 25


def q_km_survival(sf_dir: str):
    """KAPLAN-MEIER survival TABLE for user lifetime — the churn curve
    input: lifetime = last-active day − first-active day, an event
    (churn) if the user's last activity is before the censor day, else
    censored. Publishes the exact KM ingredients per lifetime t:
    n_at_risk (users with lifetime >= t still under observation) and
    d_churned — the estimator multiplies these rationals downstream.
    Per-user (min, max) day folds in ONE exchange; the life table is a
    driver scan of <= 31 rows."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t["user_id"],
                       "d": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("user_id")
             .aggregate([("d", "min"), ("d", "max")]))
        return pa.table({"user_id": g["user_id"],
                         "dmin": g["d_min"], "dmax": g["d_max"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"life": pa.nulls(0, pa.int64()),
                             "churn": pa.nulls(0, pa.int64()),
                             "n": pa.nulls(0, pa.int64())})
        g = (t.group_by("user_id")
             .aggregate([("dmin", "min"), ("dmax", "max")]))
        life = (g["dmax_max"].to_numpy(zero_copy_only=False)
                - g["dmin_min"].to_numpy(zero_copy_only=False))
        churn = (g["dmax_max"].to_numpy(zero_copy_only=False)
                 < KM_CENSOR_DAY).astype(np.int64)
        key = np.stack([life, churn], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"life": pa.array(uniq[:, 0], pa.int64()),
                         "churn": pa.array(uniq[:, 1], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    g = parts.groupby(["life", "churn"])["n"].sum()
    lives = np.array(sorted({int(k[0]) for k in g.index}), np.int64)
    total = int(g.sum())
    # n_at_risk(t) = users with lifetime >= t; d(t) = churned at t
    below = {int(t): int(sum(v for (lf, _), v in g.items() if lf < t))
             for t in lives}
    rows_t, rows_r, rows_d = [], [], []
    for t in lives:
        d = int(g.get((int(t), 1), 0))
        rows_t.append(int(t))
        rows_r.append(total - below[int(t)])
        rows_d.append(d)
    return pa.table({"life_days": pa.array(rows_t, pa.int64()),
                     "n_at_risk": pa.array(rows_r, pa.int64()),
                     "d_churned": pa.array(rows_d, pa.int64())})


SQL_KM_SURVIVAL = f"""
WITH u AS (
  SELECT user_id,
         (max(day(ts)) - min(day(ts)))::BIGINT AS life,
         (max(day(ts)) < {KM_CENSOR_DAY})::BIGINT AS churn
  FROM events GROUP BY 1
), lives AS (SELECT DISTINCT life FROM u)
SELECT l.life AS life_days,
       (SELECT count(*) FROM u WHERE u.life >= l.life)::BIGINT
         AS n_at_risk,
       (SELECT count(*) FROM u
        WHERE u.life = l.life AND u.churn = 1)::BIGINT AS d_churned
FROM lives l
"""


def q_order_total_reconcile(sf_dir: str):
    """ORDER-TOTAL RECONCILIATION audit — the financial-close check:
    recompute every order's total from its lineitems
    (round(extprice x (1-disc) x (1+tax) x 100), fixed IEEE op order
    both engines share) and compare against the header's totalprice
    cents. Publishes order count, mismatch count, and the max absolute
    gap. Lineitem folds to per-batch (orderkey, cents) partials, ONE
    exchange finishes sums, the header attaches via the bucketed hash
    exchange, and only O(1) audit rows reach the driver."""
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def li_partial(t: pa.Table) -> pa.Table:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        di = t["l_discount"].to_numpy(zero_copy_only=False)
        tx = t["l_tax"].to_numpy(zero_copy_only=False)
        cents = np.round(ep * (1 - di) * (1 + tx) * 100).astype(np.int64)
        g = (pa.table({"o_orderkey": t["l_orderkey"],
                       "c": pa.array(cents)})
             .group_by("o_orderkey").aggregate([("c", "sum")]))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "computed_cents": g["c_sum"]})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.nulls(0, pa.int64()),
                             "computed_cents": pa.nulls(0, pa.int64())})
        g = t.group_by("o_orderkey").aggregate([("computed_cents", "sum")])
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "computed_cents": g["computed_cents_sum"]})

    comp = bucketed_reduce(
        li.map_batches(li_partial, batch_format="pyarrow"),
        "o_orderkey", finish, n_buckets=32)
    j = bucketed_hash_join(orders, comp, "o_orderkey", n_buckets=16)

    def audit(t: pa.Table) -> pa.Table:
        diff = np.abs(_cents(t["o_totalprice"])
                      .to_numpy(zero_copy_only=False)
                      - t["computed_cents"].to_numpy(zero_copy_only=False))
        return pa.table({
            "n_orders": pa.array([np.int64(len(diff))], pa.int64()),
            "n_mismatch": pa.array([np.int64((diff != 0).sum())],
                                   pa.int64()),
            "max_abs_diff_cents": pa.array(
                [np.int64(diff.max()) if len(diff) else np.int64(0)],
                pa.int64()),
        })

    import pandas as pd
    parts = j.map_batches(audit, batch_format="pyarrow").to_pandas()
    return pa.table({
        "n_orders": pa.array([int(parts["n_orders"].sum())], pa.int64()),
        "n_mismatch": pa.array([int(parts["n_mismatch"].sum())],
                               pa.int64()),
        "max_abs_diff_cents": pa.array(
            [int(parts["max_abs_diff_cents"].max()) if len(parts) else 0],
            pa.int64()),
    })


SQL_ORDER_TOTAL_RECONCILE = """
WITH c AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount)
                        * (1 + l_tax) * 100) AS BIGINT))::BIGINT
           AS computed_cents
  FROM lineitem GROUP BY 1
), d AS (
  SELECT abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
             - c.computed_cents) AS diff
  FROM orders o JOIN c ON c.l_orderkey = o.o_orderkey
)
SELECT count(*)::BIGINT AS n_orders,
       count(*) FILTER (diff <> 0)::BIGINT AS n_mismatch,
       coalesce(max(diff), 0)::BIGINT AS max_abs_diff_cents
FROM d
"""


BEST_RUN_BASELINE_CENTS = 500


def q_best_run(sf_dir: str):
    """Per-user MAX-SUBARRAY (Kadane) — the most profitable contiguous
    run of events, net of a fixed per-event baseline: the 'best streak'
    primitive behind engagement scoring. The sequential Kadane scan
    vectorizes exactly via prefix sums: best-ending-at-i = P_i -
    min(0, min_{j<i} P_j), with the running minimum computed across ALL
    users in one np.minimum.accumulate over a segment-OFFSET domain
    (each user's prefixes shifted onto a disjoint band, so the
    accumulate never leaks across users — no per-user loop). One
    exchange by user."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "net": pc.subtract(_cents(t["value"]),
                               BEST_RUN_BASELINE_CENTS),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "best_sum": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        net = t["net"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, net = u[order], net[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        P = np.cumsum(net)
        base = np.r_[np.int64(0), P[starts[1:] - 1]]
        relP = P - base[seg]                       # per-user prefix sums
        # running min of (0, relP[j<i]) via ONE accumulate on a banded
        # domain. Bands must DECREASE along the scan so an earlier
        # user's (higher-band, larger) values can never win the min for
        # a later user; the stride dominates any prefix magnitude
        # (bound: segs-per-bucket x 4Σ|net| must fit int64).
        BIG = (np.abs(net).sum() + np.int64(1)) * 4
        band = (np.int64(len(starts)) - seg) * BIG
        shifted = np.empty(n, np.int64)
        shifted[0] = band[0]                        # empty prefix = 0
        shifted[1:] = np.where(seg[1:] != seg[:-1], band[1:],
                               relP[:-1] + band[1:])
        runmin = np.minimum.accumulate(shifted) - band
        best_at = relP - runmin
        best = np.maximum.reduceat(best_at, starts)
        return pa.table({"user_id": pa.array(u[starts], pa.int64()),
                         "best_sum": pa.array(best, pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_BEST_RUN = f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT)
           - {BEST_RUN_BASELINE_CENTS} AS net
  FROM events
), p0 AS (
  SELECT user_id, ts, event_id,
         sum(net) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS pre
  FROM e
), p AS (
  SELECT user_id, pre,
         min(pre) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS min_before
  FROM p0
)
SELECT user_id,
       max(pre - least(coalesce(min_before, 0), 0))::BIGINT AS best_sum
FROM p GROUP BY 1
"""


def q_dau_overlap(sf_dir: str):
    """Day-over-day ACTIVE-USER JACCARD — the retention pulse: for each
    consecutive day pair (d, d+1), |active(d) ∩ active(d+1)| and
    |active(d) ∪ active(d+1)| as exact integers. Per-user 31-bit
    activity bitmaps fold in ONE exchange by user (per-batch OR
    partials first); each bucket then emits O(30) popcount partials —
    the day-pair self-join the oracle runs never materializes."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        day = pc.day(t["ts"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": np.left_shift(np.int64(1), day - 1),
        })
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.nulls(0, pa.int64()),
                          "n_inter": pa.nulls(0, pa.int64()),
                          "n_union": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        g = (t.to_pandas().groupby("user_id")["mask"]
             .agg(lambda s: np.bitwise_or.reduce(s.to_numpy())))
        masks = g.to_numpy()
        days, inter, union = [], [], []
        for d in range(1, 31):
            a = (masks >> (d - 1)) & 1
            b = (masks >> d) & 1
            days.append(d)
            inter.append(int((a & b).sum()))
            union.append(int((a | b).sum()))
        return pa.table({"day": pa.array(days, pa.int64()),
                         "n_inter": pa.array(inter, pa.int64()),
                         "n_union": pa.array(union, pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    out = (parts.groupby("day", as_index=False)
           [["n_inter", "n_union"]].sum().sort_values("day"))
    return pa.table({"day": pa.array(out["day"], pa.int64()),
                     "n_inter": pa.array(out["n_inter"], pa.int64()),
                     "n_union": pa.array(out["n_union"], pa.int64())})


SQL_DAU_OVERLAP = """
WITH a AS (SELECT DISTINCT day(ts)::BIGINT AS d, user_id FROM events),
g AS (SELECT unnest(generate_series(1, 30))::BIGINT AS day)
SELECT g.day,
       (SELECT count(*) FROM a x JOIN a y
        ON x.user_id = y.user_id AND x.d = g.day
        AND y.d = g.day + 1)::BIGINT AS n_inter,
       (SELECT count(DISTINCT user_id) FROM a
        WHERE d = g.day OR d = g.day + 1)::BIGINT AS n_union
FROM g
"""


def q_linenumber_gap_audit(sf_dir: str):
    """LINENUMBER completeness audit — the sequence-integrity check a
    CDC/ingest pipeline runs: per order, linenumbers must be exactly
    1..n with no gaps or duplicates (min = 1, max = count = distinct
    count). Publishes total orders, gap orders, dup orders. Per-batch
    (orderkey, min, max, count) partials; duplicates across batch
    splits are caught by a distinct-count pass inside the single
    exchange by orderkey."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "ln": t["l_linenumber"].cast(pa.int64()),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_orders": pa.nulls(0, pa.int64()),
                          "n_gap": pa.nulls(0, pa.int64()),
                          "n_dup": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.group_by("o_orderkey")
             .aggregate([("ln", "min"), ("ln", "max"),
                         ("ln", "count"), ("ln", "count_distinct")]))
        mn = g["ln_min"].to_numpy(zero_copy_only=False)
        mx = g["ln_max"].to_numpy(zero_copy_only=False)
        n = g["ln_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = (g["ln_count_distinct"].to_numpy(zero_copy_only=False)
              .astype(np.int64))
        dup = nd != n
        gap = (mn != 1) | (mx != nd)
        return pa.table({
            "n_orders": pa.array([np.int64(len(mn))], pa.int64()),
            "n_gap": pa.array([np.int64(gap.sum())], pa.int64()),
            "n_dup": pa.array([np.int64(dup.sum())], pa.int64()),
        })

    import pandas as pd
    parts = bucketed_reduce(
        li.map_batches(prep, batch_format="pyarrow"),
        "o_orderkey", bucket_fn, n_buckets=32).to_pandas()
    return pa.table({
        "n_orders": pa.array([int(parts["n_orders"].sum())], pa.int64()),
        "n_gap": pa.array([int(parts["n_gap"].sum())], pa.int64()),
        "n_dup": pa.array([int(parts["n_dup"].sum())], pa.int64()),
    })


SQL_LINENUMBER_GAP_AUDIT = """
WITH g AS (
  SELECT l_orderkey, min(l_linenumber) AS mn, max(l_linenumber) AS mx,
         count(*) AS n, count(DISTINCT l_linenumber) AS nd
  FROM lineitem GROUP BY 1
)
SELECT count(*)::BIGINT AS n_orders,
       count(*) FILTER (mn <> 1 OR mx <> nd)::BIGINT AS n_gap,
       count(*) FILTER (nd <> n)::BIGINT AS n_dup
FROM g
"""


def q_nation_median_spend(sf_dir: str):
    """Per-nation MEDIAN of per-customer total spend — the nested
    aggregate (aggregate of an aggregate) that defeats one-pass
    engines: spend folds per customer in one exchange by custkey
    (per-batch partials first), the nation attaches via the broadcast
    customer map, and the per-nation median (published as 2x to stay
    integer on even counts) comes from a second exchange by nation
    with one lexsort + order-statistic pick per bucket. Customers with
    no orders count at spend 0, exactly like the oracle's left
    join."""
    import ray

    from .pipelines.relational import bucketed_reduce

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    nat_ref = ray.put(dict(zip(cust["c_custkey"],
                               cust["c_nationkey"].astype("int64"))))

    def o_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"c_custkey": t["o_custkey"],
                       "c": _cents(t["o_totalprice"])})
             .group_by("c_custkey").aggregate([("c", "sum")]))
        return pa.table({"c_custkey": g["c_custkey"],
                         "spend": g["c_sum"], "is_cust": pa.array(
                             np.zeros(g.num_rows, np.int8))})

    def c_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "spend": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_cust": pa.array(np.ones(t.num_rows, np.int8)),
        })

    cust_ds = _read(sf_dir, "customer", ["c_custkey"])
    tagged = orders.map_batches(o_partial, batch_format="pyarrow").union(
        cust_ds.map_batches(c_partial, batch_format="pyarrow"))

    def spend_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"nat": pa.nulls(0, pa.int64()),
                          "spend": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by("c_custkey").aggregate(
            [("spend", "sum"), ("is_cust", "max")])
        g = g.filter(pc.equal(g["is_cust_max"], 1))
        nat = ray.get(nat_ref)
        ck = g["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nat": pa.array([nat[int(k)] for k in ck], pa.int64()),
            "spend": g["spend_sum"],
        })

    spends = bucketed_reduce(tagged, "c_custkey", spend_fn, n_buckets=32)

    def median_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.nulls(0, pa.int64()),
                          "n_cust": pa.nulls(0, pa.int64()),
                          "median_spend_x2": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        nat = t["nat"].to_numpy(zero_copy_only=False)
        sp = t["spend"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sp, nat))
        nat, sp = nat[order], sp[order]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        cnt = np.diff(np.r_[starts, len(nat)])
        lo = starts + (cnt - 1) // 2
        hi = starts + cnt // 2
        return pa.table({
            "c_nationkey": pa.array(nat[starts], pa.int64()),
            "n_cust": pa.array(cnt, pa.int64()),
            "median_spend_x2": pa.array(sp[lo] + sp[hi], pa.int64()),
        })

    return bucketed_reduce(spends, "nat", median_fn, n_buckets=8)


SQL_NATION_MEDIAN_SPEND = """
WITH s AS (
  SELECT c.c_custkey, c.c_nationkey::BIGINT AS c_nationkey,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                  0)::BIGINT AS spend
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_nationkey, spend,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY spend) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM s
)
SELECT c_nationkey, max(n)::BIGINT AS n_cust,
       (max(CASE WHEN rn = (n + 1) // 2 THEN spend END)
        + max(CASE WHEN rn = n // 2 + 1 THEN spend END))::BIGINT
         AS median_spend_x2
FROM r GROUP BY 1
"""


def q_daily_concentration(sf_dir: str):
    """DAILY value CONCENTRATION — per day, how much of the total came
    from that day's TOP-DECILE (by per-user daily value) users: the
    whale-dependence drift metric. Needs a per-(day, user) rollup, a
    per-day order statistic, and a conditional sum — all inside ONE
    exchange by day after per-batch (day, user) partials; the integer
    ceil-rank picks the decile cut exactly like `above_p90_counts`.
    Users tied with the cut value all count (>= cut), matching the
    oracle's rank filter."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64()),
                       "user_id": t["user_id"],
                       "c": _cents(t["value"])})
             .group_by(["day", "user_id"]).aggregate([("c", "sum")]))
        return pa.table({"day": g["day"], "user_id": g["user_id"],
                         "c": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.nulls(0, pa.int64()),
                          "n_users": pa.nulls(0, pa.int64()),
                          "total_cents": pa.nulls(0, pa.int64()),
                          "top_decile_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["day", "user_id"]).aggregate([("c", "sum")])
        d = g["day"].to_numpy(zero_copy_only=False)
        c = g["c_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, d))
        d, c = d[order], c[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        cnt = np.diff(np.r_[starts, len(d)])
        # decile cut = value at ascending rank n - ceil(n/10) + 1
        k_top = (cnt + 9) // 10                    # ceil(n/10) users
        cut = c[starts + cnt - k_top]
        P = np.r_[np.int64(0), np.cumsum(c)]
        total = P[starts + cnt] - P[starts]
        # sum of values >= cut: one banded searchsorted like above_p90
        rel = c - c.min()
        offset = rel.max() + np.int64(2)
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        z = rel + seg * offset
        cz = (cut - c.min()) + np.arange(len(starts),
                                         dtype=np.int64) * offset
        first_ge = np.searchsorted(z, cz, side="left")
        top = P[starts + cnt] - P[first_ge]
        return pa.table({
            "day": pa.array(d[starts], pa.int64()),
            "n_users": pa.array(cnt, pa.int64()),
            "total_cents": pa.array(total, pa.int64()),
            "top_decile_cents": pa.array(top, pa.int64()),
        })

    return bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "day", bucket_fn, n_buckets=8)


SQL_DAILY_CONCENTRATION = """
WITH du AS (
  SELECT day(ts)::BIGINT AS day, user_id,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT day, c,
         row_number() OVER (PARTITION BY day ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY day) AS n
  FROM du
), cu AS (
  SELECT day, max(CASE WHEN rn = n - (n + 9) // 10 + 1 THEN c END)
           AS cut
  FROM r GROUP BY 1
)
SELECT r.day, max(r.n)::BIGINT AS n_users,
       sum(r.c)::BIGINT AS total_cents,
       sum(r.c) FILTER (r.c >= cu.cut)::BIGINT AS top_decile_cents
FROM r JOIN cu ON cu.day = r.day
GROUP BY 1
"""


JSONL_SNAPSHOT = "/tmp/crawlray_jsonl/documents.jsonl"


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL source-format PARITY — the cross-format ingest audit: a
    deterministic JSONL snapshot of the documents table (written once,
    driver-side, keyed to the sf dir) is read back through
    ``ray.data.read_json`` and aggregated; the oracle reads the SAME
    file through DuckDB's ``read_json_auto``. Proves the engine's JSON
    line ingestion (schema inference, unicode round-trip) matches the
    parquet path bit-for-bit — the per-lang char sums would diverge on
    any escaping or type drift."""
    import json
    import os

    os.makedirs(os.path.dirname(JSONL_SNAPSHOT), exist_ok=True)
    marker = JSONL_SNAPSHOT + ".src"
    want = sf_dir.rstrip("/")
    if (not os.path.exists(marker)
            or open(marker).read() != want):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "lang", "n_chars", "text"])
        with open(JSONL_SNAPSHOT, "w") as f:
            for row in t.to_pylist():
                f.write(json.dumps(row, ensure_ascii=False,
                                   sort_keys=True) + "\n")
        with open(marker, "w") as f:
            f.write(want)

    ds = rd.read_json(JSONL_SNAPSHOT)

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t["lang"],
                       "n_chars": t["n_chars"].cast(pa.int64()),
                       "text_len": pc.utf8_length(t["text"])
                       .cast(pa.int64())})
             .group_by("lang")
             .aggregate([("n_chars", "sum"), ("text_len", "sum"),
                         ("n_chars", "count")]))
        return pa.table({"lang": g["lang"],
                         "n_docs": g["n_chars_count"].cast(pa.int64()),
                         "sum_chars": g["n_chars_sum"],
                         "sum_text_len": g["text_len_sum"]})

    import pandas as pd
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("lang", as_index=False)
           .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"),
                sum_text_len=("sum_text_len", "sum"))
           .sort_values("lang"))
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "sum_chars": pa.array(out["sum_chars"], pa.int64()),
        "sum_text_len": pa.array(out["sum_text_len"], pa.int64()),
    })


SQL_JSONL_ROUNDTRIP = f"""
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(length(text))::BIGINT AS sum_text_len
FROM read_json_auto('{JSONL_SNAPSHOT}')
GROUP BY 1
"""


BRAND_TOPK = 3


def q_brand_topk_others(sf_dir: str):
    """TOP-K PLUS OTHERS rollup — the dashboard staple: per
    returnflag, the top-3 brands by revenue plus ONE aggregated
    'OTHER' row so the panel always sums to the total. Revenue folds
    to per-batch (flag, brand-id) partials in cents (brand via a
    dense partkey LUT in the task closure), ONE exchange by flag
    finishes the sums, and the per-flag sort + split happens inside
    the bucket — the OTHER row is born aggregated, never a row per
    part."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_returnflag", "l_extendedprice"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    # dense partkey -> brand-id LUT + tiny brand vocab (a dict lookup
    # per row was the hot spot; the gather + int groupby is all C)
    codes, brands = pd.factorize(part["p_brand"])
    lut = np.full(int(part["p_partkey"].max()) + 2, -1, np.int32)
    lut[part["p_partkey"].to_numpy()] = codes.astype(np.int32)
    brand_vocab = np.asarray(brands, object)

    # tiny LUT -> plain task-pool closure (no actor pool to spin twice)
    def brand_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        bid = lut[np.minimum(pk, len(lut) - 1)]
        g = (pa.table({"flag": t["l_returnflag"],
                       "bid": pa.array(bid.astype(np.int64)),
                       "c": _cents(t["l_extendedprice"])})
             .group_by(["flag", "bid"]).aggregate([("c", "sum")]))
        names = brand_vocab[g["bid"].to_numpy(zero_copy_only=False)]
        return pa.table({"flag": g["flag"],
                         "brand": pa.array(list(names), pa.string()),
                         "c": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_returnflag": pa.nulls(0, pa.string()),
                          "brand": pa.nulls(0, pa.string()),
                          "revenue_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        df = (t.to_pandas().groupby(["flag", "brand"], as_index=False)
              ["c"].sum())
        out = []
        for flag, g in df.groupby("flag"):
            g = g.sort_values(["c", "brand"],
                              ascending=[False, True], kind="stable")
            top = g.head(BRAND_TOPK)
            rest = g.iloc[BRAND_TOPK:]["c"].sum()
            for _, r in top.iterrows():
                out.append((flag, r["brand"], int(r["c"])))
            if len(g) > BRAND_TOPK:
                out.append((flag, "OTHER", int(rest)))
        return pa.table({
            "l_returnflag": pa.array([o[0] for o in out], pa.string()),
            "brand": pa.array([o[1] for o in out], pa.string()),
            "revenue_cents": pa.array([o[2] for o in out], pa.int64()),
        })

    return bucketed_reduce(
        li.map_batches(brand_partial, batch_format="pyarrow"),
        "flag", bucket_fn, n_buckets=4,
        schema=pa.schema([("flag", pa.string()), ("brand", pa.string()),
                          ("c", pa.int64())]))


SQL_BRAND_TOPK_OTHERS = f"""
WITH rev AS (
  SELECT l.l_returnflag, p.p_brand AS brand,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
           AS c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY c DESC, brand) AS rn
  FROM rev
)
SELECT l_returnflag, brand, c AS revenue_cents
FROM r WHERE rn <= {BRAND_TOPK}
UNION ALL
SELECT l_returnflag, 'OTHER', sum(c)::BIGINT
FROM r WHERE rn > {BRAND_TOPK}
GROUP BY 1
"""


LEADERBOARD_K = 10


def q_leaderboard_churn(sf_dir: str):
    """LEADERBOARD CHURN — how stable is the daily top-10: for each
    consecutive day pair, how many of day d's top-10 users (by daily
    cents, ties to the smaller user id) survive into day d+1's top-10.
    Per-(day, user) partials fold in ONE exchange by day; each bucket
    emits only its days' top-10 id lists (<= 31 x 10 rows), and the
    day-pair overlap is an O(days x k) driver fold — the oracle's
    rank-self-join never materializes."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64()),
                       "user_id": t["user_id"],
                       "c": _cents(t["value"])})
             .group_by(["day", "user_id"]).aggregate([("c", "sum")]))
        return pa.table({"day": g["day"], "user_id": g["user_id"],
                         "c": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.nulls(0, pa.int64()),
                          "rank": pa.nulls(0, pa.int64()),
                          "user_id": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["day", "user_id"]).aggregate([("c", "sum")])
        d = g["day"].to_numpy(zero_copy_only=False)
        u = g["user_id"].to_numpy(zero_copy_only=False)
        c = g["c_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -c, d))
        d, u = d[order], u[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        pos = (np.arange(len(d))
               - np.repeat(starts, np.diff(np.r_[starts, len(d)])))
        keep = pos < LEADERBOARD_K
        return pa.table({"day": pa.array(d[keep], pa.int64()),
                         "rank": pa.array(pos[keep] + 1, pa.int64()),
                         "user_id": pa.array(u[keep], pa.int64())})

    import pandas as pd
    tops = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "day", bucket_fn, n_buckets=8).to_pandas()
    byday = {int(d): set(g["user_id"]) for d, g in tops.groupby("day")}
    days = sorted(byday)
    rows = [(d, len(byday[d] & byday.get(d + 1, set())))
            for d in days if d + 1 in byday]
    return pa.table({
        "day": pa.array([r[0] for r in rows], pa.int64()),
        "n_retained": pa.array([r[1] for r in rows], pa.int64()),
    })


SQL_LEADERBOARD_CHURN = f"""
WITH du AS (
  SELECT day(ts)::BIGINT AS day, user_id,
         sum(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT day, user_id,
         row_number() OVER (PARTITION BY day
                            ORDER BY c DESC, user_id) AS rn
  FROM du
), t AS (SELECT day, user_id FROM r WHERE rn <= {LEADERBOARD_K})
SELECT a.day, count(b.user_id)::BIGINT AS n_retained
FROM t a LEFT JOIN t b ON b.day = a.day + 1 AND b.user_id = a.user_id
WHERE a.day + 1 IN (SELECT DISTINCT day FROM t)
GROUP BY 1
"""


def q_multi_nation_orders(sf_dir: str):
    """SUPPLY-CHAIN complexity histogram — orders by how many DISTINCT
    supplier nations their lineitems span (the multi-sourcing audit).
    Supplier -> nation is the broadcast small side; per-batch (order,
    nation) distinct partials collapse before the ONE exchange by
    orderkey, where the per-order distinct count finishes and folds
    straight into a <= |nations| histogram partial."""
    import ray

    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    nat_ref = ray.put(dict(zip(supp["s_suppkey"],
                               supp["s_nationkey"].astype("int64"))))

    class Partial:
        def __init__(self):
            self.nat = ray.get(nat_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            nat = np.array([self.nat[int(k)] for k in sk], np.int64)
            key = np.unique(np.stack([ok, nat], axis=1), axis=0)
            return pa.table({
                "o_orderkey": pa.array(key[:, 0], pa.int64()),
                "nat": pa.array(key[:, 1], pa.int64()),
            })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_nations": pa.nulls(0, pa.int64()),
                          "n_orders": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.group_by("o_orderkey")
             .aggregate([("nat", "count_distinct")]))
        h = (pa.table({"n_nations": g["nat_count_distinct"]
                       .cast(pa.int64())})
             .group_by("n_nations")
             .aggregate([("n_nations", "count")]))
        return pa.table({"n_nations": h["n_nations"],
                         "n_orders": h["n_nations_count"]
                         .cast(pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        li.map_batches(Partial, batch_format="pyarrow", concurrency=2),
        "o_orderkey", bucket_fn, n_buckets=32).to_pandas()
    out = (parts.groupby("n_nations", as_index=False)["n_orders"].sum()
           .sort_values("n_nations"))
    return pa.table({
        "n_nations": pa.array(out["n_nations"], pa.int64()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
    })


SQL_MULTI_NATION_ORDERS = """
WITH g AS (
  SELECT l.l_orderkey,
         count(DISTINCT s.s_nationkey)::BIGINT AS n_nations
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
)
SELECT n_nations, count(*)::BIGINT AS n_orders
FROM g GROUP BY 1
"""


EVENT_TYPES_ORDERED = ["click", "error", "purchase", "signup", "view"]


def q_event_type_phi(sf_dir: str):
    """Pairwise event-type CONTINGENCY table over users — the exact
    (n11, n10, n01, n00) every phi-coefficient / lift matrix needs:
    which behaviors co-occur in the same users. The trick that makes
    it one cheap pass: each user folds to a 5-BIT TYPE MASK (one
    exchange by user), buckets emit only the <= 32-row mask HISTOGRAM,
    and every pair's contingency reads off the histogram on the driver
    — the |users| x |types| matrix never materializes, let alone the
    pair join."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    idx = {t: i for i, t in enumerate(EVENT_TYPES_ORDERED)}

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        bit = np.array([1 << idx[x] for x in ty], np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": bit})
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"mask": pa.nulls(0, pa.int64()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        g = (t.to_pandas().groupby("user_id")["mask"]
             .agg(lambda s: np.bitwise_or.reduce(s.to_numpy())))
        u, c = np.unique(g.to_numpy(), return_counts=True)
        return pa.table({"mask": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    hist = parts.groupby("mask")["n"].sum()
    masks = np.asarray(hist.index, np.int64)
    counts = hist.to_numpy()
    rows = []
    for i, a in enumerate(EVENT_TYPES_ORDERED):
        for j in range(i + 1, len(EVENT_TYPES_ORDERED)):
            b = EVENT_TYPES_ORDERED[j]
            ha = (masks >> i) & 1
            hb = (masks >> j) & 1
            n11 = int(counts[(ha == 1) & (hb == 1)].sum())
            n10 = int(counts[(ha == 1) & (hb == 0)].sum())
            n01 = int(counts[(ha == 0) & (hb == 1)].sum())
            n00 = int(counts[(ha == 0) & (hb == 0)].sum())
            rows.append((a, b, n11, n10, n01, n00))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "n11": pa.array([r[2] for r in rows], pa.int64()),
        "n10": pa.array([r[3] for r in rows], pa.int64()),
        "n01": pa.array([r[4] for r in rows], pa.int64()),
        "n00": pa.array([r[5] for r in rows], pa.int64()),
    })


SQL_EVENT_TYPE_PHI = """
WITH types AS (
  SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS t
), pairs AS (
  SELECT a.t AS type_a, b.t AS type_b
  FROM types a JOIN types b ON a.t < b.t
), u AS (SELECT DISTINCT user_id FROM events),
h AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT p.type_a, p.type_b,
  (SELECT count(*) FROM u
   WHERE EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                 AND h.event_type = p.type_a)
     AND EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                 AND h.event_type = p.type_b))::BIGINT AS n11,
  (SELECT count(*) FROM u
   WHERE EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                 AND h.event_type = p.type_a)
     AND NOT EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                     AND h.event_type = p.type_b))::BIGINT AS n10,
  (SELECT count(*) FROM u
   WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                     AND h.event_type = p.type_a)
     AND EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                 AND h.event_type = p.type_b))::BIGINT AS n01,
  (SELECT count(*) FROM u
   WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                     AND h.event_type = p.type_a)
     AND NOT EXISTS (SELECT 1 FROM h WHERE h.user_id = u.user_id
                     AND h.event_type = p.type_b))::BIGINT AS n00
FROM pairs p
"""


def q_record_highs(sf_dir: str):
    """Per-user RECORD-HIGH count — how many events set a new personal
    value maximum (the first event always does): the engagement
    'personal best' counter and another sequential scan vectorized via
    the BANDED accumulate (this time np.maximum with bands INCREASING
    along the scan, the mirror of `best_run`'s minimum): one exchange
    by user, zero per-user Python."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "c": _cents(t["value"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_records": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, c = u[order], c[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        # prefix max of values BEFORE i, banded (bands increase so an
        # earlier user's larger band value never wins a later user's max)
        BIG = (np.abs(c).max() + np.int64(1)) * 4 if n else np.int64(1)
        band = seg * BIG
        LOW = np.int64(-2**62)
        shifted = np.empty(n, np.int64)
        shifted[0] = LOW
        shifted[1:] = np.where(seg[1:] != seg[:-1], LOW,
                               c[:-1] + band[1:])
        runmax = np.maximum.accumulate(shifted) - band
        heads = np.zeros(n, bool)
        heads[starts] = True                 # first event: always a record
        is_rec = heads | (c > runmax)
        n_rec = np.add.reduceat(is_rec.astype(np.int64), starts)
        return pa.table({"user_id": pa.array(u[starts], pa.int64()),
                         "n_records": pa.array(n_rec, pa.int64())})

    return bucketed_reduce(ev.map_batches(prep, batch_format="pyarrow"),
                           "user_id", bucket_fn, n_buckets=32)


SQL_RECORD_HIGHS = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), m AS (
  SELECT user_id, c,
         max(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS max_before
  FROM e
)
SELECT user_id,
       count(*) FILTER (max_before IS NULL OR c > max_before)::BIGINT
         AS n_records
FROM m GROUP BY 1
"""


TRIPLE_MIN_SUPPORT = 3


def q_frequent_triples(sf_dir: str):
    """FREQUENT ITEMSETS of size 3 — the market-basket step past
    `association_rules`' pairs, over (user, day) behavior baskets:
    which event-type TRIPLES co-occur in the same user-day at least 3
    times. Per-batch distinct (basket, type) partials collapse before
    the ONE exchange by basket; per-basket sorted combinations are
    bounded by C(5,3) and fold straight into a <= 10-row histogram
    partial per bucket — the oracle's 3-way self-join never runs."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    idx = {t: i for i, t in enumerate(EVENT_TYPES_ORDERED)}

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        day = pc.day(t["ts"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        ti = np.array([idx[x] for x in ty], np.int64)
        basket = u * 64 + day
        kv = np.unique(np.stack([basket, ti], axis=1), axis=0)
        return pa.table({"basket": pa.array(kv[:, 0], pa.int64()),
                         "ti": pa.array(kv[:, 1], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"pack": pa.nulls(0, pa.int64()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        from itertools import combinations
        kv = np.unique(np.stack(
            [t["basket"].to_numpy(zero_copy_only=False),
             t["ti"].to_numpy(zero_copy_only=False)], axis=1), axis=0)
        starts = np.flatnonzero(np.r_[True, kv[1:, 0] != kv[:-1, 0]])
        bounds = np.r_[starts, len(kv)]
        counts: dict = {}
        for s, e in zip(bounds[:-1], bounds[1:]):
            items = kv[s:e, 1]
            if len(items) < 3:
                continue
            for a, b, c in combinations(items.tolist(), 3):
                p = a * 49 + b * 7 + c
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            return empty
        ks = sorted(counts)
        return pa.table({"pack": pa.array(ks, pa.int64()),
                         "n": pa.array([counts[k] for k in ks],
                                       pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "basket", bucket_fn, n_buckets=16).to_pandas()
    g = parts.groupby("pack")["n"].sum()
    g = g[g >= TRIPLE_MIN_SUPPORT].sort_index()
    names = EVENT_TYPES_ORDERED
    return pa.table({
        "type_a": pa.array([names[int(p) // 49] for p in g.index],
                           pa.string()),
        "type_b": pa.array([names[(int(p) // 7) % 7] for p in g.index],
                           pa.string()),
        "type_c": pa.array([names[int(p) % 7] for p in g.index],
                           pa.string()),
        "support": pa.array([int(v) for v in g.to_numpy()], pa.int64()),
    })


SQL_FREQUENT_TRIPLES = f"""
WITH li AS (
  SELECT DISTINCT user_id, day(ts) AS day, event_type FROM events
), t AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         c.event_type AS type_c, count(*)::BIGINT AS support
  FROM li a
  JOIN li b ON b.user_id = a.user_id AND b.day = a.day
           AND b.event_type > a.event_type
  JOIN li c ON c.user_id = a.user_id AND c.day = a.day
           AND c.event_type > b.event_type
  GROUP BY 1, 2, 3
)
SELECT * FROM t WHERE support >= {TRIPLE_MIN_SUPPORT}
"""


def q_priority_linestatus(sf_dir: str):
    """TPC-H Q12 shape — conditional counts over the orders⋈lineitem
    join: per linestatus, how many lineitems belong to HIGH-priority
    orders (1-URGENT / 2-HIGH) vs not. The join is the bucketed hash
    exchange by orderkey (both sides large at scale — no broadcast),
    but only (orderkey, status-count partials) enter it: lineitem
    pre-folds per batch, so the exchange carries O(orders) tiny rows
    and the CASE split happens against the joined priority flag."""
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"o_orderkey": t["l_orderkey"],
                       "l_linestatus": t["l_linestatus"]})
             .group_by(["o_orderkey", "l_linestatus"])
             .aggregate([("o_orderkey", "count")]))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "l_linestatus": g["l_linestatus"],
                         "n": g["o_orderkey_count"].cast(pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.nulls(0, pa.int64()),
                             "l_linestatus": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        g = (t.group_by(["o_orderkey", "l_linestatus"])
             .aggregate([("n", "sum")]))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "l_linestatus": g["l_linestatus"],
                         "n": g["n_sum"]})

    per_order = bucketed_reduce(
        li.map_batches(li_partial, batch_format="pyarrow"),
        "o_orderkey", finish, n_buckets=32)
    j = bucketed_hash_join(per_order, orders, "o_orderkey", n_buckets=16)

    def split(t: pa.Table) -> pa.Table:
        hi = pc.or_(pc.equal(t["o_orderpriority"], "1-URGENT"),
                    pc.equal(t["o_orderpriority"], "2-HIGH"))
        n = t["n"].to_numpy(zero_copy_only=False)
        him = hi.to_numpy(zero_copy_only=False)
        import pandas as pd
        df = pd.DataFrame({
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "high": np.where(him, n, 0),
            "low": np.where(him, 0, n),
        })
        g = df.groupby("l_linestatus", as_index=False).sum()
        return pa.table({
            "l_linestatus": pa.array(g["l_linestatus"], pa.string()),
            "high_line_count": pa.array(g["high"].astype("int64")),
            "low_line_count": pa.array(g["low"].astype("int64")),
        })

    import pandas as pd
    parts = j.map_batches(split, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("l_linestatus", as_index=False)
           [["high_line_count", "low_line_count"]].sum()
           .sort_values("l_linestatus"))
    return pa.table({
        "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
        "high_line_count": pa.array(out["high_line_count"], pa.int64()),
        "low_line_count": pa.array(out["low_line_count"], pa.int64()),
    })


SQL_PRIORITY_LINESTATUS = """
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


def q_first_event_breakdown(sf_dir: str):
    """ONBOARDING integrity — what each user's FIRST event was: the
    histogram of first-event types (ties at the first timestamp break
    to the smaller event id). Per-batch (user, min-(ts, event_id))
    argmin partials carry the type along; ONE exchange by user
    finishes the argmin, buckets emit <= |types| histogram rows."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        pick = order[starts]
        return pa.table({
            "user_id": pa.array(u[pick], pa.int64()),
            "at_us": pa.array(ts[pick], pa.int64()),
            "event_id": pa.array(eid[pick], pa.int64()),
            "event_type": t["event_type"].take(pa.array(pick)),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.nulls(0, pa.string()),
                          "n_users": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        first = t["event_type"].take(pa.array(order[starts]))
        h = (pa.table({"event_type": first})
             .group_by("event_type")
             .aggregate([("event_type", "count")]))
        return pa.table({"event_type": h["event_type"],
                         "n_users": h["event_type_count"]
                         .cast(pa.int64())})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    out = (parts.groupby("event_type", as_index=False)["n_users"].sum()
           .sort_values("event_type"))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_users": pa.array(out["n_users"], pa.int64()),
    })


SQL_FIRST_EVENT_BREAKDOWN = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_users
FROM r WHERE rn = 1 GROUP BY 1
"""


def q_type_breadth_histogram(sf_dir: str):
    """BEHAVIOR BREADTH histogram — users bucketed by how many
    DISTINCT event types they used (1..5): the engagement-depth
    distribution, and the popcount projection of `event_type_phi`'s
    mask space. Same plan: per-user type mask in one exchange,
    <= 5-row popcount histogram partials out."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    idx = {t: i for i, t in enumerate(EVENT_TYPES_ORDERED)}

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        bit = np.array([1 << idx[x] for x in ty], np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "bit": bit})
        g = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy())))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "mask": pa.array(g["mask"], pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_types": pa.nulls(0, pa.int64()),
                          "n_users": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        g = (t.to_pandas().groupby("user_id")["mask"]
             .agg(lambda s: np.bitwise_or.reduce(s.to_numpy())))
        m = g.to_numpy().astype(np.int64)
        pop = np.zeros(len(m), np.int64)
        for b in range(len(EVENT_TYPES_ORDERED)):
            pop += (m >> b) & 1
        u, c = np.unique(pop, return_counts=True)
        return pa.table({"n_types": pa.array(u, pa.int64()),
                         "n_users": pa.array(c.astype(np.int64))})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    out = (parts.groupby("n_types", as_index=False)["n_users"].sum()
           .sort_values("n_types"))
    return pa.table({
        "n_types": pa.array(out["n_types"], pa.int64()),
        "n_users": pa.array(out["n_users"], pa.int64()),
    })


SQL_TYPE_BREADTH_HISTOGRAM = """
WITH u AS (
  SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_types
  FROM events GROUP BY 1
)
SELECT n_types, count(*)::BIGINT AS n_users
FROM u GROUP BY 1
"""


def q_weekday_residuals(sf_dir: str):
    """WEEKDAY-SEASONAL residuals of the daily value series — the
    'which day broke its own weekday's pattern' detector, kept exact
    by publishing the residual as a CROSS-MULTIPLIED numerator:
    resid_num(day) = daily*n_w − weekday_total (denominator n_w rides
    along), so no per-weekday float mean exists anywhere. One pass of
    per-batch (day, cents) partials; the weekday fold is O(31) on the
    driver. Weekday = the same epoch-day mod 7 both engines compute
    from integers."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64()),
                       "epoch_d": pc.divide(t["ts"].cast(pa.int64()),
                                            np.int64(86_400_000_000)),
                       "c": _cents(t["value"])})
             .group_by(["day", "epoch_d"]).aggregate([("c", "sum")]))
        return pa.table({"day": g["day"], "epoch_d": g["epoch_d"],
                         "c": g["c_sum"]})

    import pandas as pd
    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    daily = (parts.groupby(["day", "epoch_d"], as_index=False)["c"].sum()
             .sort_values("day"))
    daily["w"] = daily["epoch_d"].to_numpy() % 7
    wk = daily.groupby("w")["c"].agg(["sum", "count"])
    n_w = daily["w"].map(wk["count"]).to_numpy().astype(np.int64)
    sum_w = daily["w"].map(wk["sum"]).to_numpy().astype(np.int64)
    c = daily["c"].to_numpy().astype(np.int64)
    return pa.table({
        "day": pa.array(daily["day"].to_numpy(), pa.int64()),
        "daily_cents": pa.array(c, pa.int64()),
        "n_weekday_days": pa.array(n_w, pa.int64()),
        "resid_num": pa.array(c * n_w - sum_w, pa.int64()),
    })


SQL_WEEKDAY_RESIDUALS = """
WITH daily AS (
  SELECT day(ts)::BIGINT AS day,
         (epoch_us(ts) // 86400000000)::BIGINT AS epoch_d,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
  FROM events GROUP BY 1, 2
), w AS (
  SELECT *, epoch_d % 7 AS wd,
         sum(c) OVER (PARTITION BY epoch_d % 7) AS sum_w,
         count(*) OVER (PARTITION BY epoch_d % 7) AS n_w
  FROM daily
)
SELECT day, c AS daily_cents, n_w::BIGINT AS n_weekday_days,
       (c * n_w - sum_w)::BIGINT AS resid_num
FROM w
"""


def q_premium_parts_by_brand(sf_dir: str):
    """PREMIUM-share per brand — how many of each brand's parts price
    above the GLOBAL p75 retail price: a global order statistic feeding
    grouped conditional counts, with NO shuffle at all. Pass 1 folds
    per-batch (price, count) partials into the exact global p75 (the
    integer ceil-rank over the O(distinct)-bounded cents histogram);
    pass 2 re-scans with the broadcast cut and emits per-brand
    (total, premium) partials."""
    part = _read(sf_dir, "part", ["p_brand", "p_retailprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    import pandas as pd
    hist = (part.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby("c")["n"].sum().sort_index())
    total = int(hist.sum())
    rank = (3 * total + 3) // 4                  # ceil(0.75 n)
    cut = int(hist.index[np.searchsorted(np.cumsum(hist.to_numpy()),
                                         rank)])

    def brand_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        import pandas as pd
        df = pd.DataFrame({
            "p_brand": t["p_brand"].to_pandas(),
            "n": np.ones(len(c), np.int64),
            "prem": (c > cut).astype(np.int64),
        })
        g = df.groupby("p_brand", as_index=False).sum()
        return pa.table({"p_brand": pa.array(g["p_brand"], pa.string()),
                         "n_parts": pa.array(g["n"].astype("int64")),
                         "n_premium": pa.array(g["prem"]
                                               .astype("int64"))})

    parts = (part.map_batches(brand_partial, batch_format="pyarrow")
             .to_pandas().groupby("p_brand", as_index=False)
             [["n_parts", "n_premium"]].sum().sort_values("p_brand"))
    return pa.table({
        "p_brand": pa.array(parts["p_brand"], pa.string()),
        "n_parts": pa.array(parts["n_parts"], pa.int64()),
        "n_premium": pa.array(parts["n_premium"], pa.int64()),
    })


SQL_PREMIUM_PARTS_BY_BRAND = """
WITH c AS (
  SELECT p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
), r AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         count(*) OVER () AS n
  FROM c
), cut AS (
  SELECT max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS v
  FROM r
)
SELECT c.p_brand, count(*)::BIGINT AS n_parts,
       count(*) FILTER (c.cents > cut.v)::BIGINT AS n_premium
FROM c, cut GROUP BY 1
"""


def q_halflife_histogram(sf_dir: str):
    """ACTIVITY HALF-LIFE histogram — for each user, the day offset (from
    their first active day) by which HALF their total events had
    happened; bucketed into a histogram. The per-user scan is the
    standard cumulative trick inside ONE exchange by user: per-(user,
    day) counts, per-user day-ordered cumsum, first index where
    2*cum >= total — all reduceat/searchsorted-vectorized across
    users."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t["user_id"],
                       "day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by(["user_id", "day"])
             .aggregate([("day", "count")]))
        return pa.table({"user_id": g["user_id"], "day": g["day"],
                         "n": g["day_count"].cast(pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"half_life_days": pa.nulls(0, pa.int64()),
                          "n_users": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        df = (t.to_pandas().groupby(["user_id", "day"], as_index=False)
              ["n"].sum().sort_values(["user_id", "day"]))
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        n = df["n"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, len(u)])
        P = np.cumsum(n)
        base = np.r_[np.int64(0), P[starts[1:] - 1]]
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        cum = P - base[seg]
        total = np.repeat(cum[starts + cnt - 1], cnt)
        hit = 2 * cum >= total
        # first hit per user (init above any in-segment offset)
        fh = np.full(len(starts), np.int64(2**31), np.int64)
        np.minimum.at(fh, seg[hit],
                      np.arange(len(u))[hit] - starts[seg[hit]])
        hl = d[starts + fh] - d[starts]
        uq, cts = np.unique(hl, return_counts=True)
        return pa.table({"half_life_days": pa.array(uq, pa.int64()),
                         "n_users": pa.array(cts.astype(np.int64))})

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    out = (parts.groupby("half_life_days", as_index=False)
           ["n_users"].sum().sort_values("half_life_days"))
    return pa.table({
        "half_life_days": pa.array(out["half_life_days"], pa.int64()),
        "n_users": pa.array(out["n_users"], pa.int64()),
    })


SQL_HALFLIFE_HISTOGRAM = """
WITH ud AS (
  SELECT user_id, day(ts)::BIGINT AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), c AS (
  SELECT user_id, day,
         sum(n) OVER (PARTITION BY user_id ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY user_id) AS total,
         min(day) OVER (PARTITION BY user_id) AS first_day
  FROM ud
), h AS (
  SELECT user_id, min(day - first_day)::BIGINT AS hl
  FROM c WHERE 2 * cum >= total GROUP BY 1
)
SELECT hl AS half_life_days, count(*)::BIGINT AS n_users
FROM h GROUP BY 1
"""


def q_order_upgrades(sf_dir: str):
    """ORDER-UPGRADE pair counts — per customer, how many order pairs
    are strict upgrades (a later order date AND a strictly larger
    total): the concordant-pair half of Kendall's tau, the
    'customers trading up' signal. All pairs live inside one exchange
    by custkey; the pairwise scan vectorizes as a LAG-DISTANCE loop
    bounded by the largest per-customer order count (orders per
    customer is small and bounded by construction at any scale — the
    documented partitioning assumption), never a Python loop over
    customers."""
    from .pipelines.relational import bucketed_reduce

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "o_orderkey": t["o_orderkey"],
            "d": t["o_orderdate"].cast(pa.int64()),
            "c": _cents(t["o_totalprice"]),
        })

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.nulls(0, pa.int64()),
                          "n_upgrades": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, u))
        u, d, c = u[order], d[order], c[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, cnt)
        ups = np.zeros(n, np.int64)       # upgrades ending at j
        for dist in range(1, int(cnt.max())):
            j = np.flatnonzero(pos >= dist)
            i = j - dist
            hit = (d[i] < d[j]) & (c[i] < c[j])
            ups[j[hit]] += 1
        n_up = np.add.reduceat(ups, starts)
        keep = n_up > 0
        return pa.table({
            "o_custkey": pa.array(u[starts][keep], pa.int64()),
            "n_upgrades": pa.array(n_up[keep], pa.int64()),
        })

    return bucketed_reduce(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey", bucket_fn, n_buckets=32)


SQL_ORDER_UPGRADES = """
SELECT o1.o_custkey, count(*)::BIGINT AS n_upgrades
FROM orders o1 JOIN orders o2
  ON o2.o_custkey = o1.o_custkey
 AND o2.o_orderdate > o1.o_orderdate
 AND round(o2.o_totalprice * 100) > round(o1.o_totalprice * 100)
GROUP BY 1
"""


def q_repurchase_gap_quantiles(sf_dir: str):
    """REPURCHASE-CYCLE quantiles — exact p50/p90 of the microsecond
    gap between a user's consecutive purchases: a DERIVED stream (one
    exchange by user builds the lag gaps) feeding the scalable global
    order statistic (`stats.exact_quantiles_hist`: iterative histogram
    refinement, O(blocks x bins) partials, nothing row-shaped on the
    driver) — the composition a real pipeline runs when the quantile
    input doesn't exist as a column."""
    from .pipelines.relational import bucketed_reduce
    from .pipelines.stats import exact_quantiles_hist
    from .util import drop_empty_blocks

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "at_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
        })

    def gaps_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"gap_us": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["at_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        return pa.table({"gap_us": pa.array((ts[1:] - ts[:-1])[same],
                                            pa.int64())})

    gaps = drop_empty_blocks(bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", gaps_fn, n_buckets=16))
    out = exact_quantiles_hist(gaps, "gap_us", q_pms=[500, 900])
    return pa.table({"q_pm": out["q_pm"], "value": out["gap_us"]})


SQL_REPURCHASE_GAP_QUANTILES = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase'
), g AS (
  SELECT epoch_us(ts)
         - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS gap_us
  FROM p
), t AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
c AS (SELECT gap_us, count(*)::BIGINT AS n FROM t GROUP BY 1),
w AS (SELECT gap_us, sum(n) OVER (ORDER BY gap_us) AS cum,
             sum(n) OVER () AS tot
      FROM c),
q AS (SELECT unnest([500, 900]) AS q_pm)
SELECT q.q_pm::BIGINT AS q_pm, min(w.gap_us)::BIGINT AS value
FROM w CROSS JOIN q
WHERE w.cum >= (q.q_pm * w.tot + 999) // 1000
GROUP BY 1
"""


AUTOCOMPLETE_MIN_COUNT = 20


def q_autocomplete_table(sf_dir: str):
    """AUTOCOMPLETE table — for every word with enough signal, its most
    frequent FOLLOWER (the unigram language model's argmax): per-batch
    adjacent-bigram count partials, one exchange by first word where
    the counts finish, the min-support filter applies, and the
    per-word argmax (ties to the lexicographically smaller follower)
    resolves with one lexsort — the classic grouped-argmax over a
    derived pair stream."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        txt = t["text"].to_numpy(zero_copy_only=False)
        firsts, seconds = [], []
        for s in txt:
            w = s.split()
            firsts.extend(w[:-1])
            seconds.extend(w[1:])
        if not firsts:
            return pa.table({"w1": pa.nulls(0, pa.string()),
                             "w2": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        df = pd.DataFrame({"w1": firsts, "w2": seconds})
        g = df.groupby(["w1", "w2"], as_index=False).size()
        return pa.table({"w1": pa.array(g["w1"], pa.string()),
                         "w2": pa.array(g["w2"], pa.string()),
                         "n": pa.array(g["size"].astype("int64"))})

    def argmax_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.nulls(0, pa.string()),
                          "next_word": pa.nulls(0, pa.string()),
                          "n_pairs": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        import pandas as pd
        df = (t.to_pandas().groupby(["w1", "w2"], as_index=False)
              ["n"].sum())
        df = (df.sort_values(["w1", "n", "w2"],
                             ascending=[True, False, True],
                             kind="stable")
              .groupby("w1", as_index=False).first())
        df = df[df["n"] >= AUTOCOMPLETE_MIN_COUNT]
        return pa.table({"word": pa.array(df["w1"], pa.string()),
                         "next_word": pa.array(df["w2"], pa.string()),
                         "n_pairs": pa.array(df["n"].astype("int64"))})

    return drop_empty_blocks(bucketed_reduce(
        docs.map_batches(bigram_partial, batch_format="pyarrow"),
        "w1", argmax_fn, n_buckets=16))


SQL_AUTOCOMPLETE_TABLE = rf"""
WITH words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '\s+')) AS w,
         generate_subscripts(regexp_split_to_array(text, '\s+'), 1)
           AS pos
  FROM documents
), bi AS (
  SELECT a.w AS w1, b.w AS w2, count(*)::BIGINT AS n
  FROM words a JOIN words b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
), r AS (
  SELECT w1, w2, n,
         row_number() OVER (PARTITION BY w1
                            ORDER BY n DESC, w2) AS rn
  FROM bi
)
SELECT w1 AS word, w2 AS next_word, n AS n_pairs
FROM r WHERE rn = 1 AND n >= {AUTOCOMPLETE_MIN_COUNT}
"""


def q_daily_p90_median(sf_dir: str):
    """NESTED ORDER STATISTICS — the SRE latency-report shape: the
    exact p90 of event values per day (integer ceil-rank), then the
    exact median OF THOSE daily p90s (2x-scaled for even counts). The
    inner statistic resolves per day inside ONE exchange by day; the
    outer one is a driver fold over <= 31 values. No engine computes
    this in SQL without the same two levels."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.day(t["ts"]).cast(pa.int64()),
                         "c": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.nulls(0, pa.int64()),
                          "p90_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        d = t["day"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, d))
        d, c = d[order], c[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        cnt = np.diff(np.r_[starts, len(d)])
        rank = (9 * cnt + 9) // 10
        return pa.table({"day": pa.array(d[starts], pa.int64()),
                         "p90_cents": pa.array(c[starts + rank - 1],
                                               pa.int64())})

    import pandas as pd
    daily = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "day", bucket_fn, n_buckets=8).to_pandas().sort_values("day")
    p90s = np.sort(daily["p90_cents"].to_numpy())
    n = len(p90s)
    med2 = int(p90s[(n - 1) // 2] + p90s[n // 2]) if n else 0
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "median_daily_p90_x2": pa.array([med2], pa.int64()),
    })


SQL_DAILY_P90_MEDIAN = """
WITH e AS (
  SELECT day(ts)::BIGINT AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT day, c,
         row_number() OVER (PARTITION BY day ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY day) AS n
  FROM e
), p AS (
  SELECT day, max(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) AS p90
  FROM r GROUP BY 1
), m AS (
  SELECT p90, row_number() OVER (ORDER BY p90) AS rn,
         count(*) OVER () AS n
  FROM p
)
SELECT max(n)::BIGINT AS n_days,
       (max(CASE WHEN rn = (n + 1) // 2 THEN p90 END)
        + max(CASE WHEN rn = n // 2 + 1 THEN p90 END))::BIGINT
         AS median_daily_p90_x2
FROM m
"""


def q_tenure_spend_corr(sf_dir: str):
    """TENURE-vs-SPEND correlation INGREDIENTS over DERIVED per-user
    aggregates — the 'do long-tenured users spend more' question:
    x = active-day span, y = total cents, correlated via the six
    integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²), all
    exact. The per-user (tenure, spend) pair resolves in ONE exchange
    by user from per-batch (min, max, sum) partials; each bucket then
    folds to a single 6-number partial — O(buckets) rows reach the
    driver."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t["user_id"],
                       "d": pc.day(t["ts"]).cast(pa.int64()),
                       "c": _cents(t["value"])})
             .group_by("user_id")
             .aggregate([("d", "min"), ("d", "max"), ("c", "sum")]))
        return pa.table({"user_id": g["user_id"],
                         "dmin": g["d_min"], "dmax": g["d_max"],
                         "spend": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({k: pa.nulls(0, pa.int64()) for k in
                          ("n", "sx", "sy", "sxy", "sxx", "syy")})
        if t.num_rows == 0:
            return empty
        g = (t.group_by("user_id")
             .aggregate([("dmin", "min"), ("dmax", "max"),
                         ("spend", "sum")]))
        x = (g["dmax_max"].to_numpy(zero_copy_only=False)
             - g["dmin_min"].to_numpy(zero_copy_only=False))
        y = g["spend_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([np.int64(len(x))], pa.int64()),
            "sx": pa.array([np.int64(x.sum())], pa.int64()),
            "sy": pa.array([np.int64(y.sum())], pa.int64()),
            "sxy": pa.array([np.int64((x * y).sum())], pa.int64()),
            "sxx": pa.array([np.int64((x * x).sum())], pa.int64()),
            "syy": pa.array([np.int64((y * y).sum())], pa.int64()),
        })

    import pandas as pd
    parts = bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16).to_pandas()
    return pa.table({c: pa.array([int(parts[c].sum())], pa.int64())
                     for c in ("n", "sx", "sy", "sxy", "sxx", "syy")})


SQL_TENURE_SPEND_CORR = """
WITH u AS (
  SELECT user_id,
         (max(day(ts)) - min(day(ts)))::BIGINT AS x,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1
)
SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
       sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
       sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
FROM u
"""


def q_two_hop_reach(sf_dir: str):
    """TWO-HOP REACH per node — |{w : dist(v, w) = 1 or 2}|, the
    friends-of-friends audience size on the bounded co-purchase graph
    (`l_partkey % 5`). Wedges generate through ONE exchange by the
    middle node (each middle emits its neighbor pairs, both
    directions), the distinct union with direct neighbors resolves in
    a second exchange by source — the textbook 2-step graph join with
    dedup BETWEEN the hops, never a driver set."""
    from .pipelines.graph import cooccurrence_edges
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, group="l_orderkey", node="l_partkey")

    def symm(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(np.r_[a, b], pa.int64()),
                         "n": pa.array(np.r_[b, a], pa.int64())})

    def wedge_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.nulls(0, pa.int64()),
                          "dst": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        m = t["m"].to_numpy(zero_copy_only=False)
        nb = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, m))
        m, nb = m[order], nb[order]
        starts = np.flatnonzero(np.r_[True, m[1:] != m[:-1]])
        bounds = np.r_[starts, len(m)]
        # direct neighbors (dist 1) plus neighbor-pairs through this
        # middle (dist <= 2)
        out_s, out_d = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            nbrs = nb[s:e]
            k = len(nbrs)
            if k > 1:
                out_s.append(np.repeat(nbrs, k))
                out_d.append(np.tile(nbrs, k))
        src = np.r_[m, np.concatenate(out_s) if out_s else
                    np.empty(0, np.int64)]
        dst = np.r_[nb, np.concatenate(out_d) if out_d else
                    np.empty(0, np.int64)]
        kv = np.unique(np.stack([src, dst], axis=1), axis=0)
        kv = kv[kv[:, 0] != kv[:, 1]]
        return pa.table({"src": pa.array(kv[:, 0], pa.int64()),
                         "dst": pa.array(kv[:, 1], pa.int64())})

    pairs = drop_empty_blocks(bucketed_reduce(
        edges.map_batches(symm, batch_format="pyarrow"),
        "m", wedge_fn, n_buckets=16))

    def count_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_partkey": pa.nulls(0, pa.int64()),
                          "n_reach": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        kv = np.unique(np.stack(
            [t["src"].to_numpy(zero_copy_only=False),
             t["dst"].to_numpy(zero_copy_only=False)], axis=1), axis=0)
        u, c = np.unique(kv[:, 0], return_counts=True)
        return pa.table({"l_partkey": pa.array(u, pa.int64()),
                         "n_reach": pa.array(c.astype(np.int64))})

    return drop_empty_blocks(bucketed_reduce(pairs, "src", count_fn,
                                             n_buckets=16))


SQL_TWO_HOP_REACH = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % {TRIANGLE_PART_MOD} = 0),
e0 AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM li l1 JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
),
e AS (SELECT a AS s, b AS d FROM e0 UNION SELECT b, a FROM e0),
reach AS (
  SELECT s, d FROM e
  UNION
  SELECT e1.s, e2.d FROM e e1 JOIN e e2 ON e2.s = e1.d
  WHERE e1.s <> e2.d
)
SELECT s AS l_partkey, count(*)::BIGINT AS n_reach
FROM reach GROUP BY 1
"""


K_ANON_THRESHOLD = 25


def q_k_anonymity_audit(sf_dir: str):
    """K-ANONYMITY audit over the (nation, segment) quasi-identifier —
    the privacy gate a dataset release runs: how many equivalence
    classes fall below k=25, how many customers they expose, and the
    smallest class. Per-batch (nation, segment) count partials, one
    tiny exchange (the QI domain is bounded), O(1) audit rows out."""
    from .pipelines.relational import bucketed_reduce

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"nat": t["c_nationkey"].cast(pa.int64()),
                       "seg": t["c_mktsegment"]})
             .group_by(["nat", "seg"]).aggregate([("nat", "count")]))
        return pa.table({"nat": g["nat"], "seg": g["seg"],
                         "n": g["nat_count"].cast(pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_classes": pa.nulls(0, pa.int64()),
                          "n_small_classes": pa.nulls(0, pa.int64()),
                          "n_exposed": pa.nulls(0, pa.int64()),
                          "min_class_size": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["nat", "seg"]).aggregate([("n", "sum")])
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        small = n < K_ANON_THRESHOLD
        return pa.table({
            "n_classes": pa.array([np.int64(len(n))], pa.int64()),
            "n_small_classes": pa.array([np.int64(small.sum())],
                                        pa.int64()),
            "n_exposed": pa.array([np.int64(n[small].sum())],
                                  pa.int64()),
            "min_class_size": pa.array([np.int64(n.min())], pa.int64()),
        })

    import pandas as pd
    parts = bucketed_reduce(
        cust.map_batches(partial, batch_format="pyarrow"),
        "nat", bucket_fn, n_buckets=8).to_pandas()
    return pa.table({
        "n_classes": pa.array([int(parts["n_classes"].sum())],
                              pa.int64()),
        "n_small_classes": pa.array(
            [int(parts["n_small_classes"].sum())], pa.int64()),
        "n_exposed": pa.array([int(parts["n_exposed"].sum())],
                              pa.int64()),
        "min_class_size": pa.array([int(parts["min_class_size"].min())],
                                   pa.int64()),
    })


SQL_K_ANONYMITY_AUDIT = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
  FROM customer GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_classes,
       count(*) FILTER (n < {K_ANON_THRESHOLD})::BIGINT
         AS n_small_classes,
       coalesce(sum(n) FILTER (n < {K_ANON_THRESHOLD}), 0)::BIGINT
         AS n_exposed,
       min(n)::BIGINT AS min_class_size
FROM g
"""


def q_prefix_compress_estimate(sf_dir: str):
    """SORTED-KEY PREFIX-COMPRESSIBILITY estimate — the storage-planning
    stat behind prefix/delta encoding choices: over customer names in
    sorted order, the total and max longest-common-prefix between
    consecutive keys. The global sort is Ray's range-partitioned sort;
    consecutive pairs come per block with only each block's 1-row TAIL
    crossing (the `sorted_window_pairs` discipline, carried inline here
    because the pair payload is the string, not an id); the LCP kernel
    is a vectorized per-batch column scan."""
    import ray

    cust = _read(sf_dir, "customer", ["c_name"])
    ordered = cust.map_batches(
        lambda t: pa.table({"name": t["c_name"]}),
        batch_format="pyarrow").sort("name")
    refs = ordered.to_arrow_refs()

    @ray.remote
    def tail_of(t):
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        names = t["name"].to_pylist()
        return names[-1] if names else None

    tails = ray.get([tail_of.remote(r) for r in refs])
    prev = [None]
    for tl in tails[:-1]:
        prev.append(tl if tl is not None else prev[-1])

    @ray.remote
    def lcps_of(t, carry) -> pa.Table:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        names = t["name"].to_pylist()
        if carry is not None:
            names = [carry] + names
        if len(names) < 2:
            return pa.table({"n_pairs": pa.array([0], pa.int64()),
                             "sum_lcp": pa.array([0], pa.int64()),
                             "max_lcp": pa.array([0], pa.int64())})
        a = np.array(names[:-1], dtype="U")
        b = np.array(names[1:], dtype="U")
        width = max(a.dtype.itemsize, b.dtype.itemsize) // 4
        av = np.zeros((len(a), width), np.uint32)
        bv = np.zeros((len(b), width), np.uint32)
        av[:, :a.dtype.itemsize // 4] = a.view(np.uint32).reshape(
            len(a), -1)
        bv[:, :b.dtype.itemsize // 4] = b.view(np.uint32).reshape(
            len(b), -1)
        neq = av != bv
        first_diff = np.where(neq.any(axis=1),
                              neq.argmax(axis=1), width)
        lens = np.minimum(np.char.str_len(a), np.char.str_len(b))
        lcp = np.minimum(first_diff, lens)
        return pa.table({
            "n_pairs": pa.array([np.int64(len(lcp))], pa.int64()),
            "sum_lcp": pa.array([np.int64(lcp.sum())], pa.int64()),
            "max_lcp": pa.array([np.int64(lcp.max())], pa.int64()),
        })

    import pandas as pd
    parts = rd.from_arrow_refs(
        [lcps_of.remote(r, p) for r, p in zip(refs, prev)]).to_pandas()
    return pa.table({
        "n_pairs": pa.array([int(parts["n_pairs"].sum())], pa.int64()),
        "sum_lcp": pa.array([int(parts["sum_lcp"].sum())], pa.int64()),
        "max_lcp": pa.array([int(parts["max_lcp"].max())], pa.int64()),
    })


SQL_PREFIX_COMPRESS_ESTIMATE = """
WITH s AS (
  SELECT c_name AS name,
         lag(c_name) OVER (ORDER BY c_name) AS prev
  FROM customer
), l AS (
  SELECT (SELECT coalesce(max(i), 0)
          FROM (SELECT unnest(generate_series(
                  1, least(len(name), len(prev)))) AS i)
          WHERE substr(name, 1, i) = substr(prev, 1, i)) AS lcp
  FROM s WHERE prev IS NOT NULL
)
SELECT count(*)::BIGINT AS n_pairs, sum(lcp)::BIGINT AS sum_lcp,
       max(lcp)::BIGINT AS max_lcp
FROM l
"""


def q_daily_cross_metrics(sf_dir: str):
    """CROSS-TABLE daily dashboard — events count, orders count, and
    lineitem revenue aligned on day-of-month via FULL OUTER semantics
    (a day present in any stream appears; absent metrics are 0): three
    independent partial-aggregate scans, each O(blocks x 31) rows, and
    a coalescing driver fold over the 31-day grid — no join ever
    runs."""
    ev = _read(sf_dir, "events", ["ts"])
    orders = _read(sf_dir, "orders", ["o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice"])

    def ev_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("day").aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "v": g["day_count"].cast(pa.int64())})

    def o_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["o_orderdate"]).cast(pa.int64())})
             .group_by("day").aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "v": g["day_count"].cast(pa.int64())})

    def li_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["l_shipdate"]).cast(pa.int64()),
                       "c": _cents(t["l_extendedprice"])})
             .group_by("day").aggregate([("c", "sum")]))
        return pa.table({"day": g["day"], "v": g["c_sum"]})

    import pandas as pd

    def fold(ds) -> pd.Series:
        df = ds.to_pandas()
        return df.groupby("day")["v"].sum()

    e = fold(ev.map_batches(ev_partial, batch_format="pyarrow"))
    o = fold(orders.map_batches(o_partial, batch_format="pyarrow"))
    r = fold(li.map_batches(li_partial, batch_format="pyarrow"))
    days = sorted(set(e.index) | set(o.index) | set(r.index))
    return pa.table({
        "day": pa.array([int(d) for d in days], pa.int64()),
        "n_events": pa.array([int(e.get(d, 0)) for d in days],
                             pa.int64()),
        "n_orders": pa.array([int(o.get(d, 0)) for d in days],
                             pa.int64()),
        "ship_revenue_cents": pa.array([int(r.get(d, 0)) for d in days],
                                       pa.int64()),
    })


SQL_DAILY_CROSS_METRICS = """
WITH e AS (
  SELECT day(ts)::BIGINT AS day, count(*)::BIGINT AS n FROM events
  GROUP BY 1
), o AS (
  SELECT day(o_orderdate)::BIGINT AS day, count(*)::BIGINT AS n
  FROM orders GROUP BY 1
), r AS (
  SELECT day(l_shipdate)::BIGINT AS day,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS c
  FROM lineitem GROUP BY 1
), days AS (
  SELECT day FROM e UNION SELECT day FROM o UNION SELECT day FROM r
)
SELECT d.day, coalesce(e.n, 0)::BIGINT AS n_events,
       coalesce(o.n, 0)::BIGINT AS n_orders,
       coalesce(r.c, 0)::BIGINT AS ship_revenue_cents
FROM days d
LEFT JOIN e ON e.day = d.day
LEFT JOIN o ON o.day = d.day
LEFT JOIN r ON r.day = d.day
"""


CUSUM_H_MULT = 3


def q_cusum_drift(sf_dir: str):
    """CUSUM drift detection over the daily event-count series — the
    classic 'did traffic drift above its allowance' control chart. The
    recursion S_i = max(0, S_{i-1} + x_i - k) has the closed form
    S_i = P_i - min(0, min_{j<=i} P_j) over prefix sums P of (x_i - k),
    so no sequential state survives the aggregation: per-batch
    (day, n) count partials cross (O(blocks x 31) rows), and the scan
    itself is a prefix-sum + running-min over the BOUNDED day grid on
    the driver. Everything runs in the doubled-integer domain
    (diff = 2n - k2, k2 = ceil(2*total/n_days)) so the fractional mean
    allowance needs no floats; alarm when S > CUSUM_H_MULT * k2."""
    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("day").aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "n": g["day_count"].cast(pa.int64())})

    daily = (ev.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("day")["n"].sum().sort_index())
    n = daily.to_numpy(dtype=np.int64)
    nd = len(n)
    total = int(n.sum())
    k2 = -(-2 * total // nd) if nd else 0
    p = np.cumsum(2 * n - k2)
    s = p - np.minimum(np.minimum.accumulate(p), 0)
    alarm = s > CUSUM_H_MULT * k2
    days = daily.index.to_numpy(dtype=np.int64)
    first = int(days[alarm][0]) if alarm.any() else -1
    return pa.table({
        "n_days": pa.array([nd], pa.int64()),
        "n_alarms": pa.array([int(alarm.sum())], pa.int64()),
        "max_s": pa.array([int(s.max()) if nd else 0], pa.int64()),
        "first_alarm_day": pa.array([first], pa.int64()),
    })


SQL_CUSUM_DRIFT = f"""
WITH x AS (
  SELECT day(ts)::BIGINT AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS nd FROM x
), ss AS (
  SELECT d, 2 * n - ((2 * total + nd - 1) // nd) AS diff,
         ((2 * total + nd - 1) // nd) AS k2
  FROM x, tot
), p AS (
  SELECT d, k2, sum(diff) OVER (ORDER BY d)::BIGINT AS psum FROM ss
), s AS (
  SELECT d, k2,
         (psum - least(0, min(psum) OVER (ORDER BY d)))::BIGINT AS s
  FROM p
)
SELECT count(*)::BIGINT AS n_days,
       sum(CASE WHEN s > {CUSUM_H_MULT} * k2 THEN 1 ELSE 0 END)::BIGINT
         AS n_alarms,
       max(s)::BIGINT AS max_s,
       coalesce(min(CASE WHEN s > {CUSUM_H_MULT} * k2 THEN d END),
                -1)::BIGINT AS first_alarm_day
FROM s
"""


HDR_PCTS = (50, 90, 99)


def q_hdr_quantiles(sf_dir: str):
    """HdrHistogram-style MERGEABLE log2-bucket quantile sketch over
    order totals — the constant-size structure a 100 TB pipeline uses
    when exact quantiles would shuffle every value: bucket =
    bit_length(cents), so each per-batch partial is <= 64 rows, merge
    is addition, and any quantile resolves to a [2^(b-1), 2^b - 1]
    bound from the merged histogram. O(blocks x 64) rows cross; the
    cumulative walk runs over <= 64 rows on the driver. The oracle
    restates bit_length as length(bin(c)) — exact, no floats."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        # frexp exponent == bit_length exactly for 0 < c < 2^53 (cents
        # fit float64 exactly); log2+floor would misround at powers of 2
        b = np.frexp(c.astype(np.float64))[1].astype(np.int64)
        u, n = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    hist = (orders.map_batches(partial, batch_format="pyarrow")
            .to_pandas().groupby("bucket")["n"].sum().sort_index())
    buckets = hist.index.to_numpy(dtype=np.int64)
    counts = hist.to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for pct in HDR_PCTS:
        rank = (pct * total + 99) // 100
        i = int(np.searchsorted(cum, rank))
        b = int(buckets[i])
        rows.append((pct, b, 1 << (b - 1) if b > 0 else 0,
                     (1 << b) - 1))
    return pa.table({
        "pct": pa.array([r[0] for r in rows], pa.int64()),
        "bucket": pa.array([r[1] for r in rows], pa.int64()),
        "lo_cents": pa.array([r[2] for r in rows], pa.int64()),
        "hi_cents": pa.array([r[3] for r in rows], pa.int64()),
    })


SQL_HDR_QUANTILES = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
), h AS (
  SELECT length(bin(c))::BIGINT AS b, count(*)::BIGINT AS n
  FROM c GROUP BY 1
), cum AS (
  SELECT b, sum(n) OVER (ORDER BY b)::BIGINT AS cn,
         (SELECT sum(n)::BIGINT FROM h) AS tot
  FROM h
)
SELECT q.pct::BIGINT AS pct, min(cum.b)::BIGINT AS bucket,
       (1::BIGINT << (min(cum.b)::INT - 1))::BIGINT AS lo_cents,
       ((1::BIGINT << min(cum.b)::INT) - 1)::BIGINT AS hi_cents
FROM (VALUES (50), (90), (99)) q(pct)
JOIN cum ON cum.cn >= (q.pct * cum.tot + 99) // 100
GROUP BY 1
"""


CMS_DEPTH = 4
CMS_WIDTH = 16


def q_cms_estimates(sf_dir: str):
    """COUNT-MIN SKETCH estimate-vs-exact audit over event types — the
    canonical fixed-memory frequency sketch (depth 4 x width 16,
    md5-derived rows) next to the ground truth it approximates: per
    batch, each of the 4 salted rows bins the batch's type counts into
    16 buckets (O(blocks x 64) partial rows; merge is addition because
    CMS is linear), the estimate for a type is the min over rows of its
    bucket, and the deliberately tiny width forces visible collisions
    so `overestimate` is non-trivial. Exact counts ride the same pass.
    Bucket hash = md5 upper-8-LE % width == DuckDB md5_number_upper."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_type"])

    def bucket_of(salt: int, types) -> np.ndarray:
        return np.array(
            [int.from_bytes(
                hashlib.md5(f"cms-{salt}:{t}".encode()).digest()[:8],
                "little") % CMS_WIDTH for t in types], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        types, n = np.unique(
            t["event_type"].to_numpy(zero_copy_only=False),
            return_counts=True)
        n = n.astype(np.int64)
        salts, bks, vals = [], [], []
        for s in range(CMS_DEPTH):
            b = bucket_of(s, types)
            for bk in np.unique(b):
                salts.append(s)
                bks.append(int(bk))
                vals.append(int(n[b == bk].sum()))
        return pa.table({
            "salt": pa.array(salts + [-1] * len(types), pa.int64()),
            "bucket": pa.array(bks + [0] * len(types), pa.int64()),
            "key": pa.array([""] * len(salts) + list(types)),
            "n": pa.array(vals + list(n), pa.int64()),
        })

    df = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    cms = (df[df["salt"] >= 0].groupby(["salt", "bucket"])["n"].sum())
    exact = df[df["salt"] < 0].groupby("key")["n"].sum().sort_index()
    types = list(exact.index)
    est = []
    for t in types:
        est.append(min(
            int(cms.get((s, int.from_bytes(
                hashlib.md5(f"cms-{s}:{t}".encode()).digest()[:8],
                "little") % CMS_WIDTH), 0))
            for s in range(CMS_DEPTH)))
    ex = exact.to_numpy(dtype=np.int64)
    return pa.table({
        "event_type": pa.array(types),
        "exact_n": pa.array(ex, pa.int64()),
        "cms_n": pa.array(np.array(est, np.int64)),
        "overestimate": pa.array(np.array(est, np.int64) - ex),
    })


SQL_CMS_ESTIMATES = f"""
WITH t AS (
  SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1
), b AS (
  SELECT s.salt, event_type, n,
         (md5_number_upper('cms-' || s.salt || ':' || event_type)
            ::HUGEINT % {CMS_WIDTH})::BIGINT AS bucket
  FROM t, (VALUES (0), (1), (2), (3)) s(salt)
), cms AS (
  SELECT salt, bucket, sum(n)::BIGINT AS bn FROM b GROUP BY 1, 2
), est AS (
  SELECT b.event_type, min(cms.bn)::BIGINT AS cms_n
  FROM b JOIN cms ON b.salt = cms.salt AND b.bucket = cms.bucket
  GROUP BY 1
)
SELECT t.event_type, t.n AS exact_n, est.cms_n,
       (est.cms_n - t.n)::BIGINT AS overestimate
FROM t JOIN est USING (event_type)
"""


BPE_MERGE_K = 20


def q_bpe_first_merges(sf_dir: str):
    """The FIRST BPE MERGE step, for real: adjacent character-pair
    frequencies inside whitespace words, weighted by word occurrence —
    what a byte-pair-encoding tokenizer trainer computes before its
    first merge. Pure map-side: each batch folds its tokens to a
    bounded unique-word vocab (np.unique), walks pairs over the VOCAB
    (not the token stream) and re-weights by counts, so a word seen
    10^6 times costs one pass; only O(blocks x charset^2) pair partials
    cross, and the driver fold + top-K is bounded by the pair domain.
    Ties break by pair text ascending."""
    docs = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = (df["text"].fillna("").str.split().explode().dropna())
        words, counts = np.unique(toks.to_numpy(), return_counts=True)
        agg: dict[str, int] = {}
        for w, n in zip(words, counts):
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                agg[p] = agg.get(p, 0) + int(n)
        return pa.table({
            "pair": pa.array(list(agg.keys()), pa.string()),
            "n": pa.array(list(agg.values()), pa.int64()),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("pair", as_index=False)["n"].sum()
           .sort_values(["n", "pair"], ascending=[False, True],
                        kind="stable").head(BPE_MERGE_K))
    return pa.table({
        "pair": pa.array(out["pair"], pa.string()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
    })


SQL_BPE_FIRST_MERGES = rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
), w AS (
  SELECT unnest(ws) AS w FROM t
), p AS (
  SELECT substring(w, i::INT, 2) AS pair
  FROM w, unnest(range(1, length(w)::BIGINT)) u(i)
  WHERE length(w) >= 2
)
SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY 1
ORDER BY n DESC, pair LIMIT {BPE_MERGE_K}
"""


STOPGRAM_K = 20


def q_stopgram_coverage(sf_dir: str):
    """STOP-GRAM coverage per language — what fraction of a corpus's
    tokens the global top-K unigrams absorb (the stopword-list sizing /
    compressibility question). The BROADCAST-BACK two-pass shape: pass
    1 derives the top-K words from bounded per-batch count partials
    (driver merge over the corpus's bounded pair domain, ties by word
    asc); the K-word set then rides back into pass 2 as a closure
    constant (ray.put-equivalent for a 20-string set), where each batch
    folds straight to (lang, total, covered) partials — O(langs) rows
    out, the full text never moves."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        toks = (t.to_pandas()["text"].fillna("").str.split()
                .explode().dropna())
        words, counts = np.unique(toks.to_numpy(), return_counts=True)
        return pa.table({"w": pa.array(words, pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    wc = (docs.map_batches(count_partial, batch_format="pyarrow")
          .to_pandas().groupby("w", as_index=False)["n"].sum()
          .sort_values(["n", "w"], ascending=[False, True],
                       kind="stable").head(STOPGRAM_K))
    top = frozenset(wc["w"])

    def cover_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ex = (df.assign(w=df["text"].fillna("").str.split())
              .explode("w"))
        ex["tok"] = ex["w"].notna().astype("int64")
        ex["cov"] = ex["w"].isin(top).astype("int64")
        g = (ex.groupby("lang", as_index=False)
             .agg(n_docs=("w", "size"), total_tokens=("tok", "sum"),
                  covered_tokens=("cov", "sum")))
        # n_docs: explode inflates doc rows; recount distinct docs
        nd = df.groupby("lang", as_index=False).size()
        g = g.drop(columns=["n_docs"]).merge(
            nd.rename(columns={"size": "n_docs"}), on="lang")
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "n_docs": pa.array(g["n_docs"].astype("int64"), pa.int64()),
            "total_tokens": pa.array(g["total_tokens"].astype("int64"),
                                     pa.int64()),
            "covered_tokens": pa.array(
                g["covered_tokens"].astype("int64"), pa.int64()),
        })

    parts = (docs.map_batches(cover_partial, batch_format="pyarrow")
             .to_pandas())
    out = (parts.groupby("lang", as_index=False)
           [["n_docs", "total_tokens", "covered_tokens"]].sum()
           .sort_values("lang"))
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "n_docs": pa.array(out["n_docs"].astype("int64"), pa.int64()),
        "total_tokens": pa.array(out["total_tokens"].astype("int64"),
                                 pa.int64()),
        "covered_tokens": pa.array(
            out["covered_tokens"].astype("int64"), pa.int64()),
    })


SQL_STOPGRAM_COVERAGE = rf"""
WITH w AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
), wn AS (
  SELECT lang, w FROM w WHERE w <> ''
), top AS (
  SELECT w FROM (
    SELECT w, count(*) AS n FROM wn GROUP BY 1
    ORDER BY n DESC, w LIMIT {STOPGRAM_K})
), agg AS (
  SELECT lang, count(*)::BIGINT AS total_tokens,
         sum(CASE WHEN w IN (SELECT w FROM top) THEN 1 ELSE 0
             END)::BIGINT AS covered_tokens
  FROM wn GROUP BY 1
), d AS (
  SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
)
SELECT d.lang, d.n_docs,
       coalesce(agg.total_tokens, 0)::BIGINT AS total_tokens,
       coalesce(agg.covered_tokens, 0)::BIGINT AS covered_tokens
FROM d LEFT JOIN agg ON agg.lang = d.lang
"""


def q_behavior_signatures(sf_dir: str):
    """SET-VALUED GROUP KEY: users grouped by the exact SET of event
    types they ever emitted (the behavioral-segment signature), counted
    per signature. The set itself becomes the key — canonicalized as
    the sorted comma-join, SQL's string_agg(DISTINCT ... ORDER BY) —
    so the plan is ONE exchange by user (every user's history lands in
    one bucket), a per-bucket vectorized distinct + sorted join, and a
    driver fold over the tiny signature domain (<= 2^|types|)."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"signature": pa.nulls(0, pa.string()),
                          "n_users": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().drop_duplicates()
              .sort_values(["user_id", "event_type"], kind="stable"))
        sig = (df.groupby("user_id")["event_type"]
               .agg(",".join).value_counts().sort_index())
        return pa.table({
            "signature": pa.array(sig.index, pa.string()),
            "n_users": pa.array(sig.to_numpy(dtype=np.int64)),
        })

    parts = bucketed_reduce(ev, "user_id", bucket_fn,
                            n_buckets=16).to_pandas()
    out = (parts.groupby("signature", as_index=False)["n_users"].sum()
           .sort_values("signature"))
    return pa.table({
        "signature": pa.array(out["signature"], pa.string()),
        "n_users": pa.array(out["n_users"].astype("int64"), pa.int64()),
    })


SQL_BEHAVIOR_SIGNATURES = """
WITH s AS (
  SELECT user_id,
         string_agg(DISTINCT event_type, ',' ORDER BY event_type)
           AS signature
  FROM events GROUP BY 1
)
SELECT signature, count(*)::BIGINT AS n_users
FROM s GROUP BY 1
"""


def q_theilsen_trend(sf_dir: str):
    """THEIL-SEN robust trend over the daily event-count series — the
    median of all pairwise slopes, the estimator that shrugs off the
    outlier days OLS (`price_regression`) is dragged by. Slopes are
    RATIONALS, so the median publishes as the gcd-reduced (dy, dx)
    fraction — exact, no float division crosses an engine boundary
    (double ordering is safe here: distinct small-int rationals differ
    by >= 1/dx1*dx2, far above double epsilon). Daily counts resolve
    from O(blocks x 31) partials; the <= C(31,2) pair enumeration and
    median selection are a driver fold over the bounded day grid."""
    from fractions import Fraction
    import math

    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("day").aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "n": g["day_count"].cast(pa.int64())})

    daily = (ev.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("day")["n"].sum().sort_index())
    d = daily.index.to_numpy(dtype=np.int64)
    n = daily.to_numpy(dtype=np.int64)
    slopes = []
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            slopes.append((int(n[j] - n[i]), int(d[j] - d[i])))
    slopes.sort(key=lambda s: Fraction(s[0], s[1]))
    np_pairs = len(slopes)
    dy, dx = slopes[(np_pairs + 1) // 2 - 1] if np_pairs else (0, 1)
    g = math.gcd(abs(dy), dx) or 1
    return pa.table({
        "n_pairs": pa.array([np_pairs], pa.int64()),
        "med_dy": pa.array([dy // g], pa.int64()),
        "med_dx": pa.array([dx // g], pa.int64()),
    })


SQL_THEILSEN_TREND = """
WITH x AS (
  SELECT day(ts)::BIGINT AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1
), p AS (
  SELECT b.n - a.n AS dy, b.d - a.d AS dx
  FROM x a JOIN x b ON b.d > a.d
), r AS (
  SELECT dy, dx, row_number() OVER (ORDER BY dy::DOUBLE / dx) AS rn,
         count(*) OVER () AS np FROM p
)
SELECT max(np)::BIGINT AS n_pairs,
       max(CASE WHEN rn = (np + 1) // 2
           THEN dy // greatest(gcd(abs(dy), dx), 1) END)::BIGINT
         AS med_dy,
       max(CASE WHEN rn = (np + 1) // 2
           THEN dx // greatest(gcd(abs(dy), dx), 1) END)::BIGINT
         AS med_dx
FROM r
"""


COMPACTION_TARGET_BYTES = 20_000


def q_compaction_plan(sf_dir: str):
    """COMPACTION PLANNER — the table-maintenance pass every big
    parquet corpus runs: pack variable-size segments (here (lang,
    doc_id//100) manifest entries with their byte totals) into
    target-size output bins by a deterministic cumulative-sum rule
    (bin = bytes-before // target over the (lang, seg) order), then
    report each bin's segment count and size. Segment sizes fold from
    per-batch partials; the plan itself is a prefix scan over the
    MANIFEST (bounded, O(segments)) on the driver — exactly where a
    real compactor computes it."""
    docs = _read(sf_dir, "documents", ["lang", "doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t["lang"],
                       "seg": pc.divide(t["doc_id"],
                                        100).cast(pa.int64()),
                       "b": t["n_chars"].cast(pa.int64())})
             .group_by(["lang", "seg"]).aggregate([("b", "sum")]))
        return pa.table({"lang": g["lang"], "seg": g["seg"],
                         "b": g["b_sum"]})

    seg = (docs.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["lang", "seg"], as_index=False)["b"]
           .sum().sort_values(["lang", "seg"], kind="stable"))
    b = seg["b"].to_numpy(dtype=np.int64)
    before = np.cumsum(b) - b
    bins = before // COMPACTION_TARGET_BYTES
    out = (pd.DataFrame({"bin": bins, "b": b}).groupby("bin")
           .agg(n_segments=("b", "size"), total_bytes=("b", "sum")))
    return pa.table({
        "bin": pa.array(out.index.to_numpy(dtype=np.int64)),
        "n_segments": pa.array(out["n_segments"].astype("int64"),
                               pa.int64()),
        "total_bytes": pa.array(out["total_bytes"].astype("int64"),
                                pa.int64()),
    })


SQL_COMPACTION_PLAN = f"""
WITH s AS (
  SELECT lang, doc_id // 100 AS seg, sum(n_chars)::BIGINT AS bytes
  FROM documents GROUP BY 1, 2
), c AS (
  SELECT bytes,
         coalesce(sum(bytes) OVER (
           ORDER BY lang, seg
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM s
)
SELECT (before // {COMPACTION_TARGET_BYTES})::BIGINT AS bin,
       count(*)::BIGINT AS n_segments,
       sum(bytes)::BIGINT AS total_bytes
FROM c GROUP BY 1
"""


def q_delta_encoding_estimate(sf_dir: str):
    """DELTA-ENCODING size estimate — would per-user event-id streams
    compress? Sum of bit lengths of the raw ids vs of the per-user
    deltas (first id raw, then sorted gaps) — the exact integer
    ingredients of the encoder's size decision, the int twin of
    `prefix_compress_estimate`. ONE exchange by user; inside a bucket
    a single lexsort + segmented diff computes every user's gap
    stream vectorized, and bit lengths come from the same
    frexp-exponent identity `hdr_quantiles` pins (exact below 2^53).
    Three integers out."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_id"])

    def bits(v: np.ndarray) -> np.ndarray:
        # bit_length via frexp, pinned to >= 1 so bin(0) = '0' matches
        return np.maximum(
            np.frexp(v.astype(np.float64))[1].astype(np.int64), 1)

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({k: pa.nulls(0, pa.int64()) for k in
                          ("raw_bits", "delta_bits", "n_ids")})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, u))
        u, e = u[order], e[order]
        first = np.r_[True, u[1:] != u[:-1]]
        delta = np.where(first, e, e - np.r_[np.int64(0), e[:-1]])
        return pa.table({
            "raw_bits": pa.array([int(bits(e).sum())], pa.int64()),
            "delta_bits": pa.array([int(bits(delta).sum())],
                                   pa.int64()),
            "n_ids": pa.array([len(e)], pa.int64()),
        })

    parts = bucketed_reduce(ev, "user_id", bucket_fn,
                            n_buckets=16).to_pandas()
    return pa.table({c: pa.array([int(parts[c].sum())], pa.int64())
                     for c in ("raw_bits", "delta_bits", "n_ids")})


SQL_DELTA_ENCODING_ESTIMATE = """
WITH g AS (
  SELECT event_id,
         event_id - lag(event_id) OVER (
           PARTITION BY user_id ORDER BY event_id) AS gap
  FROM events
)
SELECT sum(length(bin(event_id)))::BIGINT AS raw_bits,
       sum(length(bin(coalesce(gap, event_id))))::BIGINT AS delta_bits,
       count(*)::BIGINT AS n_ids
FROM g
"""


def q_simpson_reversal_audit(sf_dir: str):
    """SIMPSON'S-PARADOX audit — does the overall avg-order-value
    ranking between two order statuses REVERSE once stratified by
    customer nation? For every status pair (a < b): the sign of
    avg_a - avg_b overall, and how many nations individually rank a
    above / below / equal — every comparison the exact integer
    cross-multiplication sum_a*cnt_b <=> sum_b*cnt_a, so no division
    ever runs. Per-batch (nation, status) sum/count partials (nation
    via a dense custkey LUT in the task closure) bound the exchange at
    O(blocks x 75) rows; the pairwise audit is a driver fold over the
    25 x 3 grid."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    lut = np.full(int(cust["c_custkey"].max()) + 2, -1, np.int32)
    lut[cust["c_custkey"].to_numpy()] = (
        cust["c_nationkey"].to_numpy().astype(np.int32))

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        g = (pa.table({
            "nat": pa.array(lut[np.minimum(ck, len(lut) - 1)]
                            .astype(np.int64)),
            "status": t["o_orderstatus"],
            "c": _cents(t["o_totalprice"]),
        }).group_by(["nat", "status"])
          .aggregate([("c", "sum"), ("c", "count")]))
        return pa.table({"nat": g["nat"], "status": g["status"],
                         "s": g["c_sum"],
                         "n": g["c_count"].cast(pa.int64())})

    df = (orders.map_batches(partial, batch_format="pyarrow")
          .to_pandas().groupby(["nat", "status"], as_index=False)
          [["s", "n"]].sum())
    statuses = sorted(df["status"].unique())
    tot = df.groupby("status")[["s", "n"]].sum()
    rows = []
    for i, a in enumerate(statuses):
        for b in statuses[i + 1:]:
            # sign of avg_a - avg_b == sign of s_a*n_b - s_b*n_a
            x = (int(tot.loc[a, "s"]) * int(tot.loc[b, "n"])
                 - int(tot.loc[b, "s"]) * int(tot.loc[a, "n"]))
            overall = (x > 0) - (x < 0)
            pos = neg = zero = 0
            da = df[df["status"] == a].set_index("nat")
            db = df[df["status"] == b].set_index("nat")
            for nat in sorted(set(da.index) & set(db.index)):
                y = (int(da.loc[nat, "s"]) * int(db.loc[nat, "n"])
                     - int(db.loc[nat, "s"]) * int(da.loc[nat, "n"]))
                pos += y > 0
                neg += y < 0
                zero += y == 0
            rows.append((a, b, overall, pos, neg, zero))
    return pa.table({
        "status_a": pa.array([r[0] for r in rows], pa.string()),
        "status_b": pa.array([r[1] for r in rows], pa.string()),
        "overall_sign": pa.array([r[2] for r in rows], pa.int64()),
        "n_nations_a_gt_b": pa.array([r[3] for r in rows], pa.int64()),
        "n_nations_a_lt_b": pa.array([r[4] for r in rows], pa.int64()),
        "n_nations_tied": pa.array([r[5] for r in rows], pa.int64()),
    })


SQL_SIMPSON_REVERSAL_AUDIT = """
WITH g AS (
  SELECT c.c_nationkey::BIGINT AS nat, o.o_orderstatus AS status,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS s,
         count(*)::BIGINT AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), tot AS (
  SELECT status, sum(s)::BIGINT AS s, sum(n)::BIGINT AS n
  FROM g GROUP BY 1
), pairs AS (
  SELECT a.status AS status_a, b.status AS status_b,
         sign(a.s * b.n - b.s * a.n)::BIGINT AS overall_sign
  FROM tot a JOIN tot b ON a.status < b.status
), per_nat AS (
  SELECT a.status AS status_a, b.status AS status_b,
         sign(a.s * b.n - b.s * a.n)::BIGINT AS sg
  FROM g a JOIN g b ON a.nat = b.nat AND a.status < b.status
)
SELECT p.status_a, p.status_b, p.overall_sign,
       sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_nations_a_gt_b,
       sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END)::BIGINT
         AS n_nations_a_lt_b,
       sum(CASE WHEN sg = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_nations_tied
FROM pairs p
JOIN per_nat pn ON pn.status_a = p.status_a
               AND pn.status_b = p.status_b
GROUP BY 1, 2, 3
"""


SKIPGRAM_WINDOW = 2
SKIPGRAM_K = 50


def q_skipgram_pairs(sf_dir: str):
    """SKIP-GRAM pair counts — the word2vec / embedding training-data
    prep: ordered (center, context) pairs within a +/-2 token window
    inside each document, global top-50 by count. Pure map-side pair
    generation (four shifted-array comparisons per batch, no token
    self-join), partials pre-aggregated per batch, ONE exchange by
    center word; a bucket holds EVERY count for its centers, so
    per-bucket top-50 then a 16x50 driver merge is exact — the
    grouped-top-k completeness argument, not a sampled cap. Ties
    break (n desc, center, context)."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ex = (df["text"].fillna("").str.split().explode().dropna())
        w = ex.to_numpy()
        d = ex.index.to_numpy(dtype=np.int64)
        cen, ctx = [], []
        for k in (1, 2):
            if len(w) > k:
                same = d[:-k] == d[k:]
                cen.append(w[:-k][same])
                ctx.append(w[k:][same])
                cen.append(w[k:][same])
                ctx.append(w[:-k][same])
        if not cen:
            return pa.table({"center": pa.nulls(0, pa.string()),
                             "context": pa.nulls(0, pa.string()),
                             "n": pa.nulls(0, pa.int64())})
        g = (pd.DataFrame({"center": np.concatenate(cen),
                           "context": np.concatenate(ctx)})
             .groupby(["center", "context"], as_index=False).size())
        return pa.table({"center": pa.array(g["center"], pa.string()),
                         "context": pa.array(g["context"], pa.string()),
                         "n": pa.array(g["size"].astype("int64"),
                                       pa.int64())})

    def bucket_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"center": pa.nulls(0, pa.string()),
                          "context": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.to_pandas()
             .groupby(["center", "context"], as_index=False)["n"].sum()
             .sort_values(["n", "center", "context"],
                          ascending=[False, True, True], kind="stable")
             .head(SKIPGRAM_K))
        return pa.table({"center": pa.array(g["center"], pa.string()),
                         "context": pa.array(g["context"], pa.string()),
                         "n": pa.array(g["n"].astype("int64"),
                                       pa.int64())})

    parts = drop_empty_blocks(bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        "center", bucket_topk, n_buckets=16,
        schema=pa.schema([("center", pa.string()),
                          ("context", pa.string()),
                          ("n", pa.int64())]))).to_pandas()
    out = (parts.sort_values(["n", "center", "context"],
                             ascending=[False, True, True],
                             kind="stable").head(SKIPGRAM_K))
    return pa.table({
        "center": pa.array(out["center"], pa.string()),
        "context": pa.array(out["context"], pa.string()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
    })


SQL_SKIPGRAM_PAIRS = rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
), p AS (
  SELECT ws[i] AS center, ws[i + o.k] AS context
  FROM t, unnest(range(1, len(ws) + 1)) u(i),
       (VALUES (1), (2), (-1), (-2)) o(k)
  WHERE i + o.k BETWEEN 1 AND len(ws)
)
SELECT center, context, count(*)::BIGINT AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, center, context LIMIT {SKIPGRAM_K}
"""


BAND_SIZE_TOL = 1
BAND_CENTS_TOL = 100


def q_part_band_pairs(sf_dir: str):
    """TWO-DIMENSIONAL BAND SELF-JOIN — substitute-part discovery:
    pairs of parts within +/-1 size AND +/-100 cents of each other,
    reported as per-size-bucket pair counts. The 1-D partitioning +
    BOUNDARY REPLICATION plan every band join at scale uses: each part
    lands in its home size bucket and (as the higher side) in bucket
    size-1, a pair is counted once in bucket min(size_a, size_b), and
    inside a bucket a price sort + searchsorted window counts matches
    without materializing pairs. The second dimension never shuffles."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_retailprice"])

    def replicate(t: pa.Table) -> pa.Table:
        size = t["p_size"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(np.r_[size, size - BAND_SIZE_TOL]),
            "size": pa.array(np.r_[size, size]),
            "key": pa.array(np.r_[key, key]),
            "c": pa.array(np.r_[c, c]),
        })

    def count_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"size_bucket": pa.nulls(0, pa.int64()),
                          "n_pairs": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        size = t["size"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        out_b, out_n = [], []
        for b in np.unique(bkt):
            m = bkt == b
            home = m & (size == b)        # home rows of this bucket
            hi = m & (size == b + BAND_SIZE_TOL)  # replicated visitors
            n = 0
            hc = np.sort(c[home])
            # same-size pairs: price window, each unordered pair once
            lo_i = np.searchsorted(hc, hc - BAND_CENTS_TOL, "left")
            n += int((np.arange(len(hc)) - lo_i).sum())
            # cross-size pairs (home size b x visitor size b+1): all
            # ordered combinations within the price band, counted here
            # and nowhere else
            vc = np.sort(c[hi])
            if len(vc) and len(hc):
                r = np.searchsorted(vc, hc + BAND_CENTS_TOL, "right")
                l = np.searchsorted(vc, hc - BAND_CENTS_TOL, "left")
                n += int((r - l).sum())
            if n:
                out_b.append(int(b))
                out_n.append(n)
        return pa.table({"size_bucket": pa.array(out_b, pa.int64()),
                         "n_pairs": pa.array(out_n, pa.int64())})

    return drop_empty_blocks(bucketed_reduce(
        parts.map_batches(replicate, batch_format="pyarrow"),
        "bucket", count_fn, n_buckets=16,
        schema=pa.schema([("bucket", pa.int64()), ("size", pa.int64()),
                          ("key", pa.int64()), ("c", pa.int64())])))


SQL_PART_BAND_PAIRS = f"""
WITH p AS (
  SELECT p_partkey AS key, p_size::BIGINT AS size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
), pairs AS (
  SELECT least(a.size, b.size) AS size_bucket
  FROM p a JOIN p b
    ON a.key < b.key
   AND abs(a.size - b.size) <= {BAND_SIZE_TOL}
   AND abs(a.c - b.c) <= {BAND_CENTS_TOL}
)
SELECT size_bucket, count(*)::BIGINT AS n_pairs
FROM pairs GROUP BY 1
"""


def q_kendall_ingredients(sf_dir: str):
    """KENDALL-TAU INGREDIENTS between arrival order and value per
    user — 'do later events run hotter?' as exact integers: over every
    same-user event pair ordered by event_id, the concordant (later
    value higher), discordant, and tied counts, summed corpus-wide.
    ONE exchange by user; inside a bucket each user's pair triangle is
    an O(n_u^2) broadcast compare over their BOUNDED event window (the
    per-key-window regime of the rolling kernels) — cross-user pairs
    never exist, so nothing quadratic in the corpus ever runs."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "eid": t["event_id"],
                         "v": _cents(t["value"])})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({k: pa.nulls(0, pa.int64()) for k in
                          ("n_pairs", "n_concordant", "n_discordant",
                           "n_ties")})
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        e = t["eid"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(u)]
        npairs = conc = disc = ties = 0
        for s, t_ in zip(bounds[:-1], bounds[1:]):
            vv = v[s:t_]
            n = len(vv)
            if n < 2:
                continue
            d = np.sign(vv[None, :] - vv[:, None])
            iu = np.triu_indices(n, 1)
            sg = d[iu]
            npairs += len(sg)
            conc += int((sg == 1).sum())
            disc += int((sg == -1).sum())
            ties += int((sg == 0).sum())
        return pa.table({
            "n_pairs": pa.array([npairs], pa.int64()),
            "n_concordant": pa.array([conc], pa.int64()),
            "n_discordant": pa.array([disc], pa.int64()),
            "n_ties": pa.array([ties], pa.int64()),
        })

    parts = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16,
        schema=pa.schema([("user_id", pa.int64()), ("eid", pa.int64()),
                          ("v", pa.int64())])).to_pandas()
    return pa.table({c: pa.array([int(parts[c].sum())], pa.int64())
                     for c in ("n_pairs", "n_concordant",
                               "n_discordant", "n_ties")})


SQL_KENDALL_INGREDIENTS = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), p AS (
  SELECT sign(b.v - a.v) AS s
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND b.event_id > a.event_id
)
SELECT count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS n_concordant,
       sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)::BIGINT AS n_discordant,
       sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ties
FROM p
"""


MERKLE_BUCKETS = 64
MERKLE_LOSS_MOD = 101
MERKLE_HASH_MOD = 2_147_483_647


def q_merkle_diff(sf_dir: str):
    """MERKLE-STYLE REPLICA RECONCILIATION — the anti-entropy pass two
    stores run to find what diverged without shipping rows: replica A
    is the event stream, replica B deterministically lost every
    event_id % 101 == 0 row; both sides summarize each of 64 user-hash
    buckets as (row count, md5-content-sum mod p), and only buckets
    whose digests DISAGREE are reported (with the row delta). One
    map-side pass computes both replicas' partials together —
    O(blocks x 64) rows cross, rows themselves never move."""
    from .util import md5_id_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        bkt = u % MERKLE_BUCKETS
        h = md5_id_bucket("merkle-v1", e, MERKLE_HASH_MOD)
        in_b = (e % MERKLE_LOSS_MOD) != 0
        rows = []
        for b in np.unique(bkt):
            m = bkt == b
            mb = m & in_b
            rows.append((int(b), int(m.sum()), int(h[m].sum()),
                         int(mb.sum()), int(h[mb].sum())))
        return pa.table({
            "bucket": pa.array([r[0] for r in rows], pa.int64()),
            "n_a": pa.array([r[1] for r in rows], pa.int64()),
            "h_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "h_b": pa.array([r[4] for r in rows], pa.int64()),
        })

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .to_pandas().groupby("bucket", as_index=False)
          [["n_a", "h_a", "n_b", "h_b"]].sum())
    bad = df[(df["n_a"] != df["n_b"]) | (df["h_a"] != df["h_b"])]
    return pa.table({
        "bucket": pa.array(bad["bucket"].astype("int64"), pa.int64()),
        "n_a": pa.array(bad["n_a"].astype("int64"), pa.int64()),
        "n_b": pa.array(bad["n_b"].astype("int64"), pa.int64()),
        "missing_rows": pa.array(
            (bad["n_a"] - bad["n_b"]).astype("int64"), pa.int64()),
    })


SQL_MERKLE_DIFF = f"""
WITH e AS (
  SELECT event_id, (user_id % {MERKLE_BUCKETS})::BIGINT AS bucket,
         (md5_number_upper('merkle-v1:' || event_id::VARCHAR)::HUGEINT
          % {MERKLE_HASH_MOD})::BIGINT AS h,
         (event_id % {MERKLE_LOSS_MOD} <> 0) AS in_b
  FROM events
), d AS (
  SELECT bucket, count(*)::BIGINT AS n_a, sum(h)::BIGINT AS h_a,
         sum(CASE WHEN in_b THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN in_b THEN h ELSE 0 END)::BIGINT AS h_b
  FROM e GROUP BY 1
)
SELECT bucket, n_a, n_b, (n_a - n_b)::BIGINT AS missing_rows
FROM d WHERE n_a <> n_b OR h_a <> h_b
"""


def q_maxmin_fair_alloc(sf_dir: str):
    """MAX-MIN FAIR (water-filling) ALLOCATION — the crawl-budget /
    rate-limit scheduler math: given per-user demand (event counts)
    and capacity = half the total, how many users get their full
    demand, and the exact water level T for the rest, published as the
    reduced fraction (cap - sum_full) / n_capped so no division
    crosses an engine. Rank rn is full iff prefix_sum(rn) +
    (n - rn) * d_rn <= cap — a prefix-scan threshold over the SORTED
    demand distribution, the same bounded driver fold as the quantile
    kernels (demands resolve in ONE exchange by user)."""
    import math

    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("user_id", "count")])
        return pa.table({"user_id": g["user_id"],
                         "d": g["user_id_count"].cast(pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.nulls(0, pa.int64())})
        g = t.group_by("user_id").aggregate([("d", "sum")])
        return pa.table({"d": g["d_sum"]})

    dem = np.sort(bucketed_reduce(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id", bucket_fn, n_buckets=16,
        schema=pa.schema([("user_id", pa.int64()), ("d", pa.int64())]))
        .to_pandas()["d"].to_numpy(dtype=np.int64))
    n = len(dem)
    total = int(dem.sum())
    cap = total // 2
    ps = np.cumsum(dem)
    rn = np.arange(1, n + 1)
    # f(rn) = ps + (n-rn)*dem is nondecreasing in rn for sorted
    # demands, so fullness is prefix-closed and k = count of fulls
    k = int((ps + (n - rn) * dem <= cap).sum())
    if total <= cap:
        k, num, den = n, -1, 1
    else:
        sk = int(ps[k - 1]) if k else 0
        num, den = cap - sk, n - k
        g = math.gcd(num, den) or 1
        num, den = num // g, den // g
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "capacity": pa.array([cap], pa.int64()),
        "n_full": pa.array([k], pa.int64()),
        "level_num": pa.array([num], pa.int64()),
        "level_den": pa.array([den], pa.int64()),
    })


SQL_MAXMIN_FAIR_ALLOC = """
WITH d AS (
  SELECT user_id, count(*)::BIGINT AS dem FROM events GROUP BY 1
), c AS (
  SELECT (sum(dem) // 2)::BIGINT AS cap, count(*)::BIGINT AS n,
         sum(dem)::BIGINT AS total
  FROM d
), r AS (
  SELECT dem, row_number() OVER (ORDER BY dem, user_id) AS rn,
         sum(dem) OVER (ORDER BY dem, user_id)::BIGINT AS ps
  FROM d
), k AS (
  SELECT coalesce(max(rn), 0)::BIGINT AS k,
         coalesce(max(ps), 0)::BIGINT AS sk
  FROM r, c WHERE ps + (n - rn) * dem <= cap
)
SELECT c.n AS n_users, c.cap AS capacity,
       (CASE WHEN c.total <= c.cap THEN c.n ELSE k.k END)::BIGINT
         AS n_full,
       (CASE WHEN c.total <= c.cap THEN -1
             ELSE (c.cap - k.sk)
                  // greatest(gcd(c.cap - k.sk, c.n - k.k), 1)
        END)::BIGINT AS level_num,
       (CASE WHEN c.total <= c.cap THEN 1
             ELSE (c.n - k.k)
                  // greatest(gcd(c.cap - k.sk, c.n - k.k), 1)
        END)::BIGINT AS level_den
FROM c, k
"""


CSK_DEPTH = 5
CSK_WIDTH = 16


def q_countsketch_estimates(sf_dir: str):
    """COUNT-SKETCH estimate-vs-exact audit — the SIGNED companion of
    `cms_estimates`: each of 5 md5-salted rows adds sign(t) * count
    into 16 buckets, the estimate is the MEDIAN over rows of
    sign(t) * bucket (odd depth, so the integer median is exact), and
    unlike count-min the collisions cancel in expectation, so the
    error column can be NEGATIVE. Same linear-sketch plan: per-batch
    (salt, bucket) signed partials, merge by addition, O(blocks x 80)
    rows cross. Sign = md5 bit 0 of a second salt namespace."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_type"])

    def hb(salt: int, t: str) -> int:
        return int.from_bytes(
            hashlib.md5(f"csk-{salt}:{t}".encode()).digest()[:8],
            "little") % CSK_WIDTH

    def sg(salt: int, t: str) -> int:
        v = int.from_bytes(
            hashlib.md5(f"csg-{salt}:{t}".encode()).digest()[:8],
            "little")
        return 1 if v % 2 == 1 else -1

    def partial(t: pa.Table) -> pa.Table:
        types, n = np.unique(
            t["event_type"].to_numpy(zero_copy_only=False),
            return_counts=True)
        n = n.astype(np.int64)
        salts, bks, vals = [], [], []
        for s in range(CSK_DEPTH):
            acc: dict[int, int] = {}
            for ty, cnt in zip(types, n):
                b = hb(s, ty)
                acc[b] = acc.get(b, 0) + sg(s, ty) * int(cnt)
            for b, v in acc.items():
                salts.append(s)
                bks.append(b)
                vals.append(v)
        return pa.table({
            "salt": pa.array(salts + [-1] * len(types), pa.int64()),
            "bucket": pa.array(bks + [0] * len(types), pa.int64()),
            "key": pa.array([""] * len(salts) + list(types)),
            "n": pa.array(vals + list(n), pa.int64()),
        })

    df = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    sk = df[df["salt"] >= 0].groupby(["salt", "bucket"])["n"].sum()
    exact = df[df["salt"] < 0].groupby("key")["n"].sum().sort_index()
    types = list(exact.index)
    est = []
    for ty in types:
        vals = sorted(sg(s, ty) * int(sk.get((s, hb(s, ty)), 0))
                      for s in range(CSK_DEPTH))
        est.append(vals[CSK_DEPTH // 2])
    ex = exact.to_numpy(dtype=np.int64)
    est = np.array(est, np.int64)
    return pa.table({
        "event_type": pa.array(types),
        "exact_n": pa.array(ex, pa.int64()),
        "csk_n": pa.array(est),
        "err": pa.array(est - ex),
    })


SQL_COUNTSKETCH_ESTIMATES = f"""
WITH t AS (
  SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1
), b AS (
  SELECT s.salt, event_type, n,
         (md5_number_upper('csk-' || s.salt || ':' || event_type)
            ::HUGEINT % {CSK_WIDTH})::BIGINT AS bucket,
         (CASE WHEN md5_number_upper(
                 'csg-' || s.salt || ':' || event_type)::HUGEINT % 2
               = 1 THEN 1 ELSE -1 END)::BIGINT AS sg
  FROM t, (VALUES (0), (1), (2), (3), (4)) s(salt)
), sk AS (
  SELECT salt, bucket, sum(sg * n)::BIGINT AS bn FROM b GROUP BY 1, 2
), est AS (
  SELECT b.event_type,
         median(b.sg * coalesce(sk.bn, 0))::BIGINT AS csk_n
  FROM b LEFT JOIN sk ON b.salt = sk.salt AND b.bucket = sk.bucket
  GROUP BY 1
)
SELECT t.event_type, t.n AS exact_n, est.csk_n,
       (est.csk_n - t.n)::BIGINT AS err
FROM t JOIN est USING (event_type)
"""


IDRUN_BUCKET = 4096


def q_id_range_runs(sf_dir: str):
    """ID-SPACE RUN COMPRESSION with cross-partition stitching — the
    gaps-and-islands problem on a GLOBAL sorted id space (compacting
    an id allocation bitmap, auditing key-gap health): distinct
    orderkeys compress to [start, end] runs. Partitioning is by
    CONTIGUOUS id range (orderkey // 4096), so runs are local to a
    bucket EXCEPT at bucket boundaries — each bucket reports its run
    count, min/max id, id count, and its max INTERNAL gap, and the
    driver stitches the O(buckets) boundary pairs (a run crossing the
    boundary merges two runs into one; a gap spanning it may beat both
    sides' internal max). The segmented-scan carry pattern, folded
    over summaries, never over ids."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def prep(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"bkt": pa.array(k // IDRUN_BUCKET),
                         "k": pa.array(k, pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.nulls(0, pa.int64()) for c in
                          ("bkt", "n_runs", "n_ids", "kmin", "kmax",
                           "max_gap")})
        if t.num_rows == 0:
            return empty
        bk = t["bkt"].to_numpy(zero_copy_only=False)
        kk = t["k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kk, bk))
        bk, kk = bk[order], kk[order]
        rows = []
        for b in np.unique(bk):
            m = bk == b
            ks = np.unique(kk[m])
            gaps = np.diff(ks)
            rows.append((int(b), int((gaps > 1).sum()) + 1, len(ks),
                         int(ks[0]), int(ks[-1]),
                         int(gaps.max() - 1) if len(gaps) else 0))
        return pa.table({c: pa.array([r[i] for r in rows], pa.int64())
                         for i, c in enumerate(
                             ("bkt", "n_runs", "n_ids", "kmin", "kmax",
                              "max_gap"))})

    parts = (drop_empty_blocks(bucketed_reduce(
        orders.map_batches(prep, batch_format="pyarrow"),
        "bkt", bucket_fn, n_buckets=16,
        schema=pa.schema([("bkt", pa.int64()), ("k", pa.int64())])))
        .to_pandas().sort_values("bkt"))
    runs = int(parts["n_runs"].sum())
    max_gap = int(parts["max_gap"].max()) if len(parts) else 0
    prev_max = parts["kmax"].to_numpy()[:-1]
    next_min = parts["kmin"].to_numpy()[1:]
    bgap = next_min - prev_max
    runs -= int((bgap == 1).sum())           # run continues -> merge
    if len(bgap):
        max_gap = max(max_gap, int(bgap.max() - 1))
    return pa.table({
        "n_runs": pa.array([runs], pa.int64()),
        "n_ids": pa.array([int(parts["n_ids"].sum())], pa.int64()),
        "max_gap": pa.array([max_gap], pa.int64()),
    })


SQL_ID_RANGE_RUNS = """
WITH k AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
), g AS (
  SELECT k, k - lag(k) OVER (ORDER BY k) AS gap FROM k
)
SELECT (1 + sum(CASE WHEN gap > 1 THEN 1 ELSE 0 END))::BIGINT
         AS n_runs,
       count(*)::BIGINT AS n_ids,
       coalesce(max(gap - 1), 0)::BIGINT AS max_gap
FROM g
"""


def q_weighted_jaccard_sources(sf_dir: str):
    """WEIGHTED (multiset) JACCARD between two sources' word streams —
    sum(min(count_a, count_b)) / sum(max(...)), the exact quantity
    MinHash-style sketches approximate, published as the two integer
    sums. Per-batch (word, source) count partials, ONE exchange by
    word (`bucketed_reduce`: both sources' counts for a word meet in
    one bucket, hot sources spread because the WORD is the key), each
    bucket folds to a single (sum_min, sum_max) pair — O(buckets)
    rows to the driver, the vocabulary never leaves the cluster."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["source", "text"])
    src_a, src_b = KMVJ_SRC_A, KMVJ_SRC_B

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["source"].isin([src_a, src_b])]
        ex = (df.assign(w=df["text"].fillna("").str.split())
              .explode("w").dropna(subset=["w"]))
        g = (ex.groupby(["w", "source"], sort=False).size()
             .rename("n").reset_index())
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "source": pa.array(g["source"], pa.string()),
                         "n": pa.array(g["n"].astype("int64"),
                                       pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"sum_min": pa.nulls(0, pa.int64()),
                          "sum_max": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().groupby(["w", "source"])["n"].sum()
              .unstack(fill_value=0))
        a = (df[src_a] if src_a in df else pd.Series(0, df.index)
             ).to_numpy(dtype=np.int64)
        b = (df[src_b] if src_b in df else pd.Series(0, df.index)
             ).to_numpy(dtype=np.int64)
        return pa.table({
            "sum_min": pa.array([int(np.minimum(a, b).sum())],
                                pa.int64()),
            "sum_max": pa.array([int(np.maximum(a, b).sum())],
                                pa.int64()),
        })

    parts = bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        "w", bucket_fn, n_buckets=16,
        schema=pa.schema([("w", pa.string()), ("source", pa.string()),
                          ("n", pa.int64())])).to_pandas()
    return pa.table({
        "sum_min": pa.array([int(parts["sum_min"].sum())], pa.int64()),
        "sum_max": pa.array([int(parts["sum_max"].sum())], pa.int64()),
    })


SQL_WEIGHTED_JACCARD_SOURCES = rf"""
WITH w AS (
  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents WHERE source IN ('{KMVJ_SRC_A}', '{KMVJ_SRC_B}')
), c AS (
  SELECT w,
         sum(CASE WHEN source = '{KMVJ_SRC_A}' THEN 1 ELSE 0
             END)::BIGINT AS na,
         sum(CASE WHEN source = '{KMVJ_SRC_B}' THEN 1 ELSE 0
             END)::BIGINT AS nb
  FROM w WHERE w <> '' GROUP BY 1
)
SELECT sum(least(na, nb))::BIGINT AS sum_min,
       sum(greatest(na, nb))::BIGINT AS sum_max
FROM c
"""


TIES_TOPK = 2


def q_top_with_ties(sf_dir: str):
    """TOP-K **WITH TIES** — the rank()-semantics leaderboard (SQL's
    FETCH FIRST k WITH TIES / QUALIFY rank() <= k), versus the
    row_number semantics of `grouped_topk`: per returnflag the top-2
    brands by revenue, KEEPING every brand tied with the 2nd — the
    output size is data-dependent, so the plan filters by THRESHOLD
    (the k-th distinct revenue inside the flag's bucket), not by row
    count. Per-batch (flag, brand-id) cent partials via the dense part
    LUT, ONE exchange by flag, per-bucket vectorized rank filter."""
    from .pipelines.relational import bucketed_reduce

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_returnflag", "l_extendedprice"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    codes, brands = pd.factorize(part["p_brand"])
    lut = np.full(int(part["p_partkey"].max()) + 2, -1, np.int32)
    lut[part["p_partkey"].to_numpy()] = codes.astype(np.int32)
    vocab = np.asarray(brands, object)

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        bid = lut[np.minimum(pk, len(lut) - 1)]
        g = (pa.table({"flag": t["l_returnflag"],
                       "bid": pa.array(bid.astype(np.int64)),
                       "c": _cents(t["l_extendedprice"])})
             .group_by(["flag", "bid"]).aggregate([("c", "sum")]))
        return pa.table({"flag": g["flag"], "bid": g["bid"],
                         "c": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_returnflag": pa.nulls(0, pa.string()),
                          "brand": pa.nulls(0, pa.string()),
                          "revenue_cents": pa.nulls(0, pa.int64()),
                          "rnk": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().groupby(["flag", "bid"], as_index=False)
              ["c"].sum())
        out = []
        for flag, g in df.groupby("flag"):
            c = g["c"].to_numpy()
            # rank() = 1 + count of strictly greater revenues
            rnk = 1 + (c[None, :] > c[:, None]).sum(axis=1)
            keep = rnk <= TIES_TOPK
            for bid, cc, r in zip(g["bid"].to_numpy()[keep],
                                  c[keep], rnk[keep]):
                out.append((flag, vocab[bid], int(cc), int(r)))
        return pa.table({
            "l_returnflag": pa.array([o[0] for o in out], pa.string()),
            "brand": pa.array([o[1] for o in out], pa.string()),
            "revenue_cents": pa.array([o[2] for o in out], pa.int64()),
            "rnk": pa.array([o[3] for o in out], pa.int64()),
        })

    return bucketed_reduce(
        li.map_batches(partial, batch_format="pyarrow"),
        "flag", bucket_fn, n_buckets=4,
        schema=pa.schema([("flag", pa.string()), ("bid", pa.int64()),
                          ("c", pa.int64())]))


SQL_TOP_WITH_TIES = f"""
SELECT l.l_returnflag, p.p_brand AS brand,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
         AS revenue_cents,
       rank() OVER (PARTITION BY l.l_returnflag
                    ORDER BY sum(CAST(round(l.l_extendedprice * 100)
                                      AS BIGINT)) DESC)::BIGINT AS rnk
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
QUALIFY rnk <= {TIES_TOPK}
"""


def q_rank_displacement(sf_dir: str):
    """RANK DISPLACEMENT (Spearman footrule) between two nation
    rankings — 'does revenue rank track customer-count rank?': nations
    ranked by order revenue and by customer count (ties broken by
    nationkey, so both ranks are total orders), reporting the summed
    and max |rank difference|. Two independent bounded partial scans
    (per-batch (nation, cents) via the custkey LUT; per-batch nation
    counts), a 25-row driver fold, integer output."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    lut = np.full(int(cust["c_custkey"].max()) + 2, -1, np.int32)
    lut[cust["c_custkey"].to_numpy()] = (
        cust["c_nationkey"].to_numpy().astype(np.int32))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def rev_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        g = (pa.table({"nat": pa.array(
                lut[np.minimum(ck, len(lut) - 1)].astype(np.int64)),
                       "c": _cents(t["o_totalprice"])})
             .group_by("nat").aggregate([("c", "sum")]))
        return pa.table({"nat": g["nat"], "v": g["c_sum"]})

    rev = (orders.map_batches(rev_partial, batch_format="pyarrow")
           .to_pandas().groupby("nat")["v"].sum())
    ncust = cust.groupby("c_nationkey")["c_custkey"].count()

    nats = sorted(set(rev.index) | set(ncust.index))
    r = pd.Series([int(rev.get(n, 0)) for n in nats], index=nats)
    c = pd.Series([int(ncust.get(n, 0)) for n in nats], index=nats)

    def ranks(s: pd.Series) -> pd.Series:
        order = sorted(s.index, key=lambda n: (-s[n], n))
        return pd.Series({n: i + 1 for i, n in enumerate(order)})

    d = (ranks(r) - ranks(c)).abs()
    return pa.table({
        "n_nations": pa.array([len(nats)], pa.int64()),
        "total_displacement": pa.array([int(d.sum())], pa.int64()),
        "max_displacement": pa.array([int(d.max()) if len(d) else 0],
                                     pa.int64()),
    })


SQL_RANK_DISPLACEMENT = """
WITH rev AS (
  SELECT c.c_nationkey::BIGINT AS nat,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), nc AS (
  SELECT c_nationkey::BIGINT AS nat, count(*)::BIGINT AS v
  FROM customer GROUP BY 1
), nats AS (
  SELECT nat FROM rev UNION SELECT nat FROM nc
), ranked AS (
  SELECT n.nat,
         row_number() OVER (ORDER BY coalesce(rev.v, 0) DESC, n.nat)
           AS r_rev,
         row_number() OVER (ORDER BY coalesce(nc.v, 0) DESC, n.nat)
           AS r_cnt
  FROM nats n
  LEFT JOIN rev ON rev.nat = n.nat
  LEFT JOIN nc ON nc.nat = n.nat
)
SELECT count(*)::BIGINT AS n_nations,
       sum(abs(r_rev - r_cnt))::BIGINT AS total_displacement,
       max(abs(r_rev - r_cnt))::BIGINT AS max_displacement
FROM ranked
"""


def q_schema_evolution_union(sf_dir: str):
    """SCHEMA-EVOLUTION UNION (union-by-name) — ingesting two vintages
    of the same feed whose schemas drifted: v1 rows (even event_id)
    carry `value` but predate `event_type`; v2 rows (odd) carry
    `event_type` but dropped `value`. Each side reads ONLY its own
    columns (pruned at the parquet read), missing columns materialize
    as typed nulls per batch, and the union is Ray's zero-copy block
    concat — no shuffle. Output audits the merged frame: row count,
    per-column non-null counts, distinct users (exact, via per-batch
    partial dedup + a small fold)."""
    v1 = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    v2 = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])

    def as_v1(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(e % 2 == 0))
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "value": t["value"],
            "event_type": pa.nulls(t.num_rows, pa.string()),
        })

    def as_v2(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(e % 2 == 1))
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "value": pa.nulls(t.num_rows, pa.float64()),
            "event_type": t["event_type"],
        })

    merged = (v1.map_batches(as_v1, batch_format="pyarrow")
              .union(v2.map_batches(as_v2, batch_format="pyarrow")))

    def audit(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "n_value": pa.array(
                [t.num_rows - t["value"].null_count], pa.int64()),
            "n_type": pa.array(
                [t.num_rows - t["event_type"].null_count], pa.int64()),
        })

    parts = merged.map_batches(audit, batch_format="pyarrow").to_pandas()
    users = _read(sf_dir, "events", ["user_id"])

    def upartial(t: pa.Table) -> pa.Table:
        return pa.table({"u": pc.unique(t["user_id"])})

    nu = int(users.map_batches(upartial, batch_format="pyarrow")
             .to_pandas()["u"].nunique())
    return pa.table({
        "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        "n_value": pa.array([int(parts["n_value"].sum())], pa.int64()),
        "n_type": pa.array([int(parts["n_type"].sum())], pa.int64()),
        "n_users": pa.array([nu], pa.int64()),
    })


SQL_SCHEMA_EVOLUTION_UNION = """
WITH m AS (
  (SELECT event_id, user_id, value
   FROM events WHERE event_id % 2 = 0)
  UNION ALL BY NAME
  (SELECT event_id, user_id, event_type
   FROM events WHERE event_id % 2 = 1)
)
SELECT count(*)::BIGINT AS n_rows,
       count(value)::BIGINT AS n_value,
       count(event_type)::BIGINT AS n_type,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM m
"""


def _polite_cfg():
    """Fixed small world for the politeness audit — config-shape only
    (independent of sf so the audit never re-runs the flagship-scale
    crawl inside the bench)."""
    from .engine import EngineConfig
    from .synth import WorldConfig

    return EngineConfig(world=WorldConfig(n_urls=2500, n_hosts=20),
                        n_seeds=20, max_rounds=3)


def q_crawl_politeness_audit(sf_dir: str):
    """POLITENESS COMPLIANCE AUDIT over a real engine run — the
    contract the crawl data plane must never break: per round, how
    many hosts were touched, the max fetches any single host absorbed,
    and the count of hosts over the per-host round budget (which must
    be zero, and the oracle proves the number, not the assertion). The
    audit aggregates the engine's own corpus output (host, round) —
    O(hosts x rounds) rows; oracle = the sequential no-Ray crawl
    simulator's fetch log, rendered as a VALUES literal (the crawl
    family's `_crawl_sql` precedent)."""
    import shutil
    import tempfile

    from .engine import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawlpol_")
    eng = None
    try:
        cfg = _polite_cfg()
        eng = CrawlEngine(cfg, out)
        eng.run()
        from .storage import read_corpus

        docs = read_corpus(out, columns=["host", "round"])
        df = (docs.to_pandas().groupby(["round", "host"])
              .size().rename("n").reset_index())
        budget = cfg.round_budget
        g = df.groupby("round")["n"]
        agg = pd.DataFrame({
            "n_hosts": g.size(), "max_per_host": g.max(),
            "n_over_budget": g.apply(lambda s: int((s > budget).sum())),
        }).reset_index()
        return pa.table({
            "round": pa.array(agg["round"].astype("int64"), pa.int64()),
            "n_hosts": pa.array(agg["n_hosts"].astype("int64"),
                                pa.int64()),
            "max_per_host": pa.array(agg["max_per_host"].astype("int64"),
                                     pa.int64()),
            "n_over_budget": pa.array(
                agg["n_over_budget"].astype("int64"), pa.int64()),
            "budget": pa.array([int(budget)] * len(agg), pa.int64()),
        })
    finally:
        if eng is not None:
            eng.shutdown()
        shutil.rmtree(out, ignore_errors=True)


@functools.lru_cache(maxsize=1)
def _politeness_expected_table() -> pa.Table:
    """Sequential restatement: the same audit over the pure-Python
    crawl simulator's fetch log on the same fixed world."""
    from .canon import host_of
    from .oracle import simulate_crawl
    from .synth import World

    cfg = _polite_cfg()
    res = simulate_crawl(World(cfg.world), cfg.n_seeds, cfg.max_rounds)
    budget = cfg.round_budget
    counts: dict[tuple[int, str], int] = {}
    for rnd, _pri, _seq, url, _status in res.fetch_log:
        k = (rnd, host_of(url))
        counts[k] = counts.get(k, 0) + 1
    rounds = sorted({r for r, _ in counts})
    rows = []
    for r in rounds:
        ns = [n for (rr, _h), n in counts.items() if rr == r]
        rows.append((r, len(ns), max(ns),
                     sum(1 for n in ns if n > budget), budget))
    return pa.table({
        "round": pa.array([x[0] for x in rows], pa.int64()),
        "n_hosts": pa.array([x[1] for x in rows], pa.int64()),
        "max_per_host": pa.array([x[2] for x in rows], pa.int64()),
        "n_over_budget": pa.array([x[3] for x in rows], pa.int64()),
        "budget": pa.array([x[4] for x in rows], pa.int64()),
    })


def _politeness_sql() -> str:
    return _values_sql(
        _politeness_expected_table(),
        casts={"round": "BIGINT", "n_hosts": "BIGINT",
               "max_per_host": "BIGINT", "n_over_budget": "BIGINT",
               "budget": "BIGINT"},
    )


NEXT_WORD_K = 20


def q_next_word_top(sf_dir: str):
    """BIGRAM CONDITIONAL ARGMAX — the count-based language model's
    next-token table: for the top-20 words by frequency, the most
    likely FOLLOWING word (ties: higher pair count, then next word
    asc) with both count ingredients. ONE exchange by the FIRST word:
    unigram partials and bigram partials share the key, so a bucket
    holds everything needed to finish its words' totals AND argmaxes —
    the global top-20 then folds from complete per-bucket candidates
    (the grouped-completeness argument again). Words never followed by
    anything keep next_word = ''."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        ex = (t.to_pandas()["text"].fillna("").str.split()
              .explode().dropna())
        w = ex.to_numpy()
        d = ex.index.to_numpy(dtype=np.int64)
        empty = pa.table({"w": pa.nulls(0, pa.string()),
                          "nxt": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if len(w) == 0:
            return empty
        uni = pd.DataFrame({"w": w}).groupby("w", sort=False).size()
        frames = [pd.DataFrame({"w": uni.index, "nxt": "",
                                "n": uni.to_numpy(dtype=np.int64)})]
        if len(w) > 1:
            same = d[:-1] == d[1:]
            if same.any():
                big = (pd.DataFrame({"w": w[:-1][same],
                                     "nxt": w[1:][same]})
                       .groupby(["w", "nxt"], sort=False).size()
                       .rename("n").reset_index())
                frames.append(big)
        g = pd.concat(frames, ignore_index=True)
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "nxt": pa.array(g["nxt"], pa.string()),
                         "n": pa.array(g["n"].astype("int64"),
                                       pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.nulls(0, pa.string()),
                          "n_word": pa.nulls(0, pa.int64()),
                          "next_word": pa.nulls(0, pa.string()),
                          "n_pair": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().groupby(["w", "nxt"], as_index=False)
              ["n"].sum())
        uni = df[df["nxt"] == ""].set_index("w")["n"]
        big = df[df["nxt"] != ""]
        best = (big.sort_values(["n", "nxt"], ascending=[False, True],
                                kind="stable")
                .groupby("w", sort=False).head(1).set_index("w"))
        # local candidates under the SAME comparator as the global
        # fold (n desc, word asc), so the global top-k is a subset
        words = (uni.reset_index()
                 .sort_values(["n", "w"], ascending=[False, True],
                              kind="stable")
                 .head(NEXT_WORD_K)["w"])
        rows = []
        for wd in words:
            if wd in best.index:
                rows.append((wd, int(uni[wd]), best.loc[wd, "nxt"],
                             int(best.loc[wd, "n"])))
            else:
                rows.append((wd, int(uni[wd]), "", 0))
        return pa.table({
            "word": pa.array([r[0] for r in rows], pa.string()),
            "n_word": pa.array([r[1] for r in rows], pa.int64()),
            "next_word": pa.array([r[2] for r in rows], pa.string()),
            "n_pair": pa.array([r[3] for r in rows], pa.int64()),
        })

    parts = drop_empty_blocks(bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        "w", bucket_fn, n_buckets=16,
        schema=pa.schema([("w", pa.string()), ("nxt", pa.string()),
                          ("n", pa.int64())]))).to_pandas()
    out = (parts.sort_values(["n_word", "word"],
                             ascending=[False, True], kind="stable")
           .head(NEXT_WORD_K))
    return pa.table({
        "word": pa.array(out["word"], pa.string()),
        "n_word": pa.array(out["n_word"].astype("int64"), pa.int64()),
        "next_word": pa.array(out["next_word"], pa.string()),
        "n_pair": pa.array(out["n_pair"].astype("int64"), pa.int64()),
    })


SQL_NEXT_WORD_TOP = rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT ws[i] AS w,
         CASE WHEN i < len(ws) THEN ws[i + 1] END AS nxt
  FROM t, unnest(range(1, len(ws) + 1)) u(i)
), uni AS (
  SELECT w, count(*)::BIGINT AS n FROM tok GROUP BY 1
), big AS (
  SELECT w, nxt, count(*)::BIGINT AS np FROM tok
  WHERE nxt IS NOT NULL GROUP BY 1, 2
), best AS (
  SELECT w, nxt, np,
         row_number() OVER (PARTITION BY w ORDER BY np DESC, nxt) AS rn
  FROM big
), top AS (
  SELECT w, n FROM uni ORDER BY n DESC, w LIMIT {NEXT_WORD_K}
)
SELECT top.w AS word, top.n AS n_word,
       coalesce(best.nxt, '') AS next_word,
       coalesce(best.np, 0)::BIGINT AS n_pair
FROM top LEFT JOIN best ON best.w = top.w AND best.rn = 1
"""


VOCAB_COVER_PCTS = (50, 90, 99)


def q_vocab_coverage(sf_dir: str):
    """VOCABULARY COVERAGE CURVE — the tokenizer-sizing question 'how
    many word types cover 50 / 90 / 99 % of tokens?', answered WITHOUT
    ever materializing the ranked vocabulary: the curve is a pure
    function of the COUNT-OF-COUNTS histogram (every word with the
    same count contributes identically), so word counts fold to
    (count, n_words) classes per bucket — O(distinct counts) rows to
    the driver no matter how large the vocab — and each percentile
    resolves by walking classes in count-desc order with exact ceil
    arithmetic for the partial class."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = (t.to_pandas()["text"].fillna("").str.split()
                .explode().dropna())
        words, counts = np.unique(toks.to_numpy(), return_counts=True)
        return pa.table({"w": pa.array(words, pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"cnt": pa.nulls(0, pa.int64()),
                          "n_words": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by("w").aggregate([("n", "sum")])
        cnt, nw = np.unique(
            g["n_sum"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"cnt": pa.array(cnt, pa.int64()),
                         "n_words": pa.array(nw.astype(np.int64))})

    hist = (drop_empty_blocks(bucketed_reduce(
        docs.map_batches(partial, batch_format="pyarrow"),
        "w", bucket_fn, n_buckets=16,
        schema=pa.schema([("w", pa.string()), ("n", pa.int64())])))
        .to_pandas().groupby("cnt")["n_words"].sum()
        .sort_index(ascending=False))
    cnt = hist.index.to_numpy(dtype=np.int64)
    nw = hist.to_numpy(dtype=np.int64)
    toks = cnt * nw
    w0 = np.cumsum(nw) - nw
    t0 = np.cumsum(toks) - toks
    tot = int(toks.sum())
    rows = []
    for pct in VOCAB_COVER_PCTS:
        need = (pct * tot + 99) // 100
        i = int(np.searchsorted(t0 + toks, need))
        k = -(-(need - int(t0[i])) // int(cnt[i]))
        rows.append((pct, int(w0[i]) + k,
                     int(t0[i]) + k * int(cnt[i])))
    return pa.table({
        "pct": pa.array([r[0] for r in rows], pa.int64()),
        "vocab_size": pa.array([r[1] for r in rows], pa.int64()),
        "covered_tokens": pa.array([r[2] for r in rows], pa.int64()),
    })


SQL_VOCAB_COVERAGE = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
), c AS (
  SELECT w, count(*)::BIGINT AS n FROM w WHERE w <> '' GROUP BY 1
), h AS (
  SELECT n AS cnt, count(*)::BIGINT AS n_words FROM c GROUP BY 1
), cum AS (
  SELECT cnt, n_words,
         coalesce(sum(n_words) OVER (
           ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS w0,
         coalesce(sum(cnt * n_words) OVER (
           ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS t0,
         (SELECT sum(cnt * n_words)::BIGINT FROM h) AS tot
  FROM h
)
SELECT p.pct::BIGINT AS pct,
       (cum.w0 + ((p.pct * cum.tot + 99) // 100 - cum.t0 + cum.cnt - 1)
                 // cum.cnt)::BIGINT AS vocab_size,
       (cum.t0 + (((p.pct * cum.tot + 99) // 100 - cum.t0 + cum.cnt - 1)
                  // cum.cnt) * cum.cnt)::BIGINT AS covered_tokens
FROM (VALUES (50), (90), (99)) p(pct)
JOIN cum ON cum.t0 < (p.pct * cum.tot + 99) // 100
        AND cum.t0 + cum.cnt * cum.n_words
            >= (p.pct * cum.tot + 99) // 100
"""


def q_joint_decile_grid(sf_dir: str):
    """JOINT DECILE GRID — the 2-D dependence heatmap between quantity
    and price: every lineitem lands in (qty-decile, price-decile) with
    decile(v) = (rank(v) - 1) * 10 // n (rank() semantics: ties share
    a cell), and the grid counts expose correlation structure a single
    1-D quantile never shows. The `rank_normalize` two-pass plan twice
    over: per-batch VALUE-histogram partials (bounded by distinct
    values, not rows) fold to two broadcast rank maps, pass 2 assigns
    both deciles per batch and folds straight to the <= 100-cell grid
    — no sort, no row shuffle."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"]).cast(pa.int64())
        c = _cents(t["l_extendedprice"])
        gq = pa.table({"v": q}).group_by("v").aggregate([("v", "count")])
        gc = pa.table({"v": c}).group_by("v").aggregate([("v", "count")])
        return pa.table({
            "dim": pa.array(["q"] * gq.num_rows + ["c"] * gc.num_rows),
            "v": pa.concat_arrays([gq["v"].combine_chunks(),
                                   gc["v"].combine_chunks()]),
            "n": pa.concat_arrays([
                gq["v_count"].cast(pa.int64()).combine_chunks(),
                gc["v_count"].cast(pa.int64()).combine_chunks()]),
        })

    hist = (li.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby(["dim", "v"], as_index=False)["n"]
            .sum())

    def rank_map(dim: str):
        h = hist[hist["dim"] == dim].sort_values("v")
        v = h["v"].to_numpy(dtype=np.int64)
        n = h["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        below = np.cumsum(n) - n
        return v, (below * 10) // total

    qv, qd = rank_map("q")
    cv, cd = rank_map("c")

    def assign(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        dq = qd[np.searchsorted(qv, q)]
        dp = cd[np.searchsorted(cv, c)]
        g = (pa.table({"dq": pa.array(dq), "dp": pa.array(dp)})
             .group_by(["dq", "dp"]).aggregate([("dq", "count")]))
        return pa.table({"dq": g["dq"], "dp": g["dp"],
                         "n": g["dq_count"].cast(pa.int64())})

    out = (li.map_batches(assign, batch_format="pyarrow")
           .to_pandas().groupby(["dq", "dp"], as_index=False)["n"]
           .sum().sort_values(["dq", "dp"]))
    return pa.table({
        "dq": pa.array(out["dq"].astype("int64"), pa.int64()),
        "dp": pa.array(out["dp"].astype("int64"), pa.int64()),
        "n_rows": pa.array(out["n"].astype("int64"), pa.int64()),
    })


SQL_JOINT_DECILE_GRID = """
WITH l AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
), n AS (SELECT count(*)::BIGINT AS n FROM l),
r AS (
  SELECT ((rank() OVER (ORDER BY q) - 1) * 10) // n.n AS dq,
         ((rank() OVER (ORDER BY c) - 1) * 10) // n.n AS dp
  FROM l, n
)
SELECT dq::BIGINT AS dq, dp::BIGINT AS dp, count(*)::BIGINT AS n_rows
FROM r GROUP BY 1, 2
"""


PERIOD_CANDIDATES = (2, 3, 4, 5, 6, 7)


def q_periodicity_profile(sf_dir: str):
    """PERIODICITY PROFILE — the exact integer ingredients of 'which
    cycle length fits the daily series best': for each candidate
    period p in 2..7 and each residue day%p, the (n_days, sum, sum of
    squares) of the daily event counts. The within-residue variance —
    what a seasonality detector minimizes over p — is a pure function
    of these rows, and everything is integer so the oracle is exact.
    Daily counts fold from O(blocks x 31) partials; the p x residue
    grid (<= 27 rows) is a driver fold."""
    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by("day").aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "n": g["day_count"].cast(pa.int64())})

    daily = (ev.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("day")["n"].sum().sort_index())
    d = daily.index.to_numpy(dtype=np.int64)
    c = daily.to_numpy(dtype=np.int64)
    rows = []
    for p in PERIOD_CANDIDATES:
        res = d % p
        for r in np.unique(res):
            m = res == r
            rows.append((p, int(r), int(m.sum()), int(c[m].sum()),
                         int((c[m] * c[m]).sum())))
    return pa.table({
        "period": pa.array([r[0] for r in rows], pa.int64()),
        "residue": pa.array([r[1] for r in rows], pa.int64()),
        "n_days": pa.array([r[2] for r in rows], pa.int64()),
        "sum_c": pa.array([r[3] for r in rows], pa.int64()),
        "sum_c2": pa.array([r[4] for r in rows], pa.int64()),
    })


SQL_PERIODICITY_PROFILE = """
WITH x AS (
  SELECT day(ts)::BIGINT AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT p.p::BIGINT AS period, (x.d % p.p)::BIGINT AS residue,
       count(*)::BIGINT AS n_days, sum(x.n)::BIGINT AS sum_c,
       sum(x.n * x.n)::BIGINT AS sum_c2
FROM x, (VALUES (2), (3), (4), (5), (6), (7)) p(p)
GROUP BY 1, 2
"""


SEL_QTY_MIN = 30
SEL_CENTS_MIN = 3_000_000


def q_selectivity_audit(sf_dir: str):
    """OPTIMIZER CARDINALITY-ESTIMATE AUDIT — the independence
    assumption every cost model leans on, measured: for the conjunct
    (qty >= 30 AND price >= $30k), the marginal counts, the exact
    conjunct count, and the sign of (exact/n - est/n) where
    est = n_a * n_b / n — published as the integer cross-product
    comparison n_ab * n <=> n_a * n_b, so no division. sign > 0 means
    the predicates are positively correlated and the independence
    estimate UNDERcounts. One map-side pass: per-batch 4-counter
    partials, a 4-int driver fold."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.round(t["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        a = q >= SEL_QTY_MIN
        b = c >= SEL_CENTS_MIN
        return pa.table({
            "n": pa.array([len(q)], pa.int64()),
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "n_ab": pa.array([int((a & b).sum())], pa.int64()),
        })

    p = (li.map_batches(partial, batch_format="pyarrow")
         .to_pandas().sum())
    n, na, nb, nab = (int(p["n"]), int(p["n_a"]), int(p["n_b"]),
                      int(p["n_ab"]))
    x = nab * n - na * nb
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "n_ab": pa.array([nab], pa.int64()),
        "corr_sign": pa.array([(x > 0) - (x < 0)], pa.int64()),
    })


SQL_SELECTIVITY_AUDIT = f"""
WITH l AS (
  SELECT (CAST(round(l_quantity) AS BIGINT) >= {SEL_QTY_MIN}) AS a,
         (CAST(round(l_extendedprice * 100) AS BIGINT)
          >= {SEL_CENTS_MIN}) AS b
  FROM lineitem
), s AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n_ab
  FROM l
)
SELECT n, n_a, n_b, n_ab,
       sign(n_ab * n - n_a * n_b)::BIGINT AS corr_sign
FROM s
"""


def q_hdr_error_audit(sf_dir: str):
    """SKETCH-BOUND VERIFICATION — closes the estimator-audit loop the
    CMS/count-sketch audits opened, for quantiles: the EXACT p50/90/99
    of order totals (rank-selection semantics: smallest value whose
    cumulative count reaches ceil(p*n/100)) next to the HdrHistogram
    log2-bucket bounds of `hdr_quantiles`, plus the in_bound flag the
    sketch contract promises is always 1. Exact quantiles come from
    the value-histogram fold (bounded by distinct cents), the bounds
    from the 64-row bucket histogram — both map-side passes."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"c": _cents(t["o_totalprice"])})
             .group_by("c").aggregate([("c", "count")]))
        return pa.table({"c": g["c"],
                         "n": g["c_count"].cast(pa.int64())})

    hist = (orders.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby("c")["n"].sum().sort_index())
    vals = hist.index.to_numpy(dtype=np.int64)
    cum = np.cumsum(hist.to_numpy(dtype=np.int64))
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for pct in HDR_PCTS:
        rank = (pct * total + 99) // 100
        exact = int(vals[int(np.searchsorted(cum, rank))])
        b = int(exact).bit_length()
        lo, hi = 1 << (b - 1), (1 << b) - 1
        rows.append((pct, exact, lo, hi, int(lo <= exact <= hi)))
    return pa.table({
        "pct": pa.array([r[0] for r in rows], pa.int64()),
        "exact_cents": pa.array([r[1] for r in rows], pa.int64()),
        "lo_cents": pa.array([r[2] for r in rows], pa.int64()),
        "hi_cents": pa.array([r[3] for r in rows], pa.int64()),
        "in_bound": pa.array([r[4] for r in rows], pa.int64()),
    })


SQL_HDR_ERROR_AUDIT = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
), r AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn,
         count(*) OVER () AS n
  FROM c
), q AS (
  SELECT p.pct, min(r.c) AS exact_cents
  FROM (VALUES (50), (90), (99)) p(pct)
  JOIN r ON r.rn = (p.pct * r.n + 99) // 100
  GROUP BY 1
)
SELECT pct::BIGINT AS pct, exact_cents::BIGINT AS exact_cents,
       (1::BIGINT << (length(bin(exact_cents))::INT - 1))::BIGINT
         AS lo_cents,
       ((1::BIGINT << length(bin(exact_cents))::INT) - 1)::BIGINT
         AS hi_cents,
       1::BIGINT AS in_bound
FROM q
"""


def q_revenue_identity_audit(sf_dir: str):
    """EXACT DECIMAL IDENTITY AUDIT — the reconciliation a billing
    pipeline runs in scaled-integer space: with price in cents and
    discount/tax as integer percents, gross * (100-d) * (100+t) must
    equal the itemized decomposition term-for-term at the 10^-6-dollar
    scale, NO floats anywhere. Publishes the corpus-wide identity:
    n, gross cents, net (x10^4 cents) and the re-derived
    gross*10^4 - disc_term + tax_term cross-check delta (always 0 —
    and the oracle proves the zero). Per-batch 5-int partials."""
    li = _read(sf_dir, "lineitem",
               ["l_extendedprice", "l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        g = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        d = pc.round(pc.multiply(t["l_discount"], 100)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = pc.round(pc.multiply(t["l_tax"], 100)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        net = g * (100 - d) * (100 + x)
        disc_term = g * d * (100 + x)
        tax_term = g * 100 * x
        return pa.table({
            "n": pa.array([len(g)], pa.int64()),
            "gross_cents": pa.array([int(g.sum())], pa.int64()),
            "net_e4": pa.array([int(net.sum())], pa.int64()),
            "disc_e4": pa.array([int(disc_term.sum())], pa.int64()),
            "tax_e4": pa.array([int(tax_term.sum())], pa.int64()),
        })

    p = (li.map_batches(partial, batch_format="pyarrow")
         .to_pandas().sum())
    n, gross = int(p["n"]), int(p["gross_cents"])
    net, disc, tax = int(p["net_e4"]), int(p["disc_e4"]), int(p["tax_e4"])
    # identity: net = gross*10^4 - disc_term + tax_term
    delta = net - (gross * 10_000 - disc + tax)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "gross_cents": pa.array([gross], pa.int64()),
        "net_e4": pa.array([net], pa.int64()),
        "identity_delta": pa.array([delta], pa.int64()),
    })


SQL_REVENUE_IDENTITY_AUDIT = """
WITH l AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS g,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_tax * 100) AS BIGINT) AS t
  FROM lineitem
), s AS (
  SELECT count(*)::BIGINT AS n, sum(g)::BIGINT AS gross_cents,
         sum(g * (100 - d) * (100 + t))::BIGINT AS net_e4,
         sum(g * d * (100 + t))::BIGINT AS disc_e4,
         sum(g * 100 * t)::BIGINT AS tax_e4
  FROM l
)
SELECT n, gross_cents, net_e4,
       (net_e4 - (gross_cents * 10000 - disc_e4 + tax_e4))::BIGINT
         AS identity_delta
FROM s
"""


def q_widest_path(sf_dir: str):
    """WIDEST (bottleneck) path — `cheapest_path`'s max-min semiring
    twin on the same mini-web: a path is as good as its NARROWEST edge
    (capacity planning / trust propagation), each node reports the
    best bottleneck over <= cap-hop paths from the BFS seed set
    (`graph.widest_paths`: identical shard layout and
    improvements-only exchange, only the two combine directions flip —
    the semiring is a parameter, not a new kernel). Seeds publish the
    WIDEST_SEED_W +infinity stand-in, which the oracle states
    verbatim."""
    from .htmlx import parse_document
    from .pipelines.graph import widest_paths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        w = [1 + (len(s) + len(d)) % 5 for s, d in zip(src, dst)]
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string()),
                         "w": pa.array(w, pa.int64())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    out = widest_paths(edges, urls[:BFS_N_SEEDS], n_shards=8,
                       max_hops=CHEAPEST_MAX_HOPS)
    return out.map_batches(
        lambda t: pa.table({"url": t["url"], "width": t["cost"]}),
        batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _widest_path_sql() -> str:
    """The same bounded max-min walk as a recursive CTE over the
    VALUES edge list; max(width) per node over every <= cap-hop
    path, seeds at the WIDEST_SEED_W infinity stand-in."""
    from .pipelines.graph import WIDEST_SEED_W
    from .synth import World

    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    seed_urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
                 for i in range(BFS_N_SEEDS)]
    seed_rows = ", ".join(f"({_sql_str(u)})" for u in seed_urls)
    return f"""
WITH RECURSIVE e0(src, dst) AS (VALUES
{rows}
),
edges(src, dst, w) AS (
  SELECT src, dst, 1 + (length(src) + length(dst)) % 5 FROM e0
),
seeds(u) AS (
  SELECT u FROM (VALUES {seed_rows}) s(u)
  WHERE u IN (SELECT src FROM edges UNION SELECT dst FROM edges)
),
walk(u, wd, h) AS (
  SELECT u, {WIDEST_SEED_W}, 0 FROM seeds
  UNION
  SELECT e.dst, least(w.wd, e.w), w.h + 1
  FROM walk w JOIN edges e ON e.src = w.u
  WHERE w.h < {CHEAPEST_MAX_HOPS}
)
SELECT u AS url, max(wd)::BIGINT AS width FROM walk GROUP BY u
"""


VORONOI_PACK = 1024


def q_graph_voronoi(sf_dir: str):
    """GRAPH VORONOI — multi-source nearest-seed assignment (which
    mirror serves this page?): each node gets (distance to, rank of)
    its cheapest seed, ties to the LOWEST seed rank. No new kernel:
    the lexicographic (cost, seed) combine PACKS into the min-plus
    integers — edge weights pre-scaled by 1024, each seed starting at
    its own rank (`cheapest_paths(seed_values=...)`), so
    (c1*1024 + s) + w*1024 carries the label through every relax and
    the per-node min is exactly the lexicographic argmin. Unpack with
    divmod at the end; the oracle states the identical packing."""
    from .htmlx import parse_document
    from .pipelines.graph import cheapest_paths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls], override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        w = [(1 + (len(s) + len(d)) % 5) * VORONOI_PACK
             for s, d in zip(src, dst)]
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string()),
                         "w": pa.array(w, pa.int64())})

    edges = seeds.map_batches(edges_of, batch_format="pyarrow")
    seed_urls = urls[:BFS_N_SEEDS]
    out = cheapest_paths(edges, seed_urls, n_shards=8,
                         max_hops=CHEAPEST_MAX_HOPS,
                         seed_values=list(range(len(seed_urls))))

    def unpack(t: pa.Table) -> pa.Table:
        c = t["cost"].to_numpy(zero_copy_only=False)
        return pa.table({
            "url": t["url"],
            "dist": pa.array(c // VORONOI_PACK),
            "seed_rank": pa.array(c % VORONOI_PACK),
        })

    return out.map_batches(unpack, batch_format="pyarrow")


@functools.lru_cache(maxsize=1)
def _graph_voronoi_sql() -> str:
    """The identical packed walk as a recursive CTE: seeds start at
    their rank, scaled weights add, min() per node IS the
    lexicographic (dist, seed) argmin; divmod unpacks."""
    from .synth import World

    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(
        f"({_sql_str(s)}, {_sql_str(t)})" for s, t in zip(src, dst)
    )
    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    seed_urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
                 for i in range(BFS_N_SEEDS)]
    seed_rows = ", ".join(
        f"({_sql_str(u)}, {i})" for i, u in enumerate(seed_urls))
    return f"""
WITH RECURSIVE e0(src, dst) AS (VALUES
{rows}
),
edges(src, dst, w) AS (
  SELECT src, dst,
         (1 + (length(src) + length(dst)) % 5) * {VORONOI_PACK}
  FROM e0
),
seeds(u, r) AS (
  SELECT u, r FROM (VALUES {seed_rows}) s(u, r)
  WHERE u IN (SELECT src FROM edges UNION SELECT dst FROM edges)
),
walk(u, c, h) AS (
  SELECT u, r, 0 FROM seeds
  UNION
  SELECT e.dst, w.c + e.w, w.h + 1
  FROM walk w JOIN edges e ON e.src = w.u
  WHERE w.h < {CHEAPEST_MAX_HOPS}
)
SELECT u AS url, (min(c) // {VORONOI_PACK})::BIGINT AS dist,
       (min(c) % {VORONOI_PACK})::BIGINT AS seed_rank
FROM walk GROUP BY u
"""


def q_margin_of_victory(sf_dir: str):
    """MARGIN OF VICTORY — how contested is each nation's top brand?
    Per customer nation, the revenue gap between the #1 and #2 brand
    (ties by brand asc; single-brand nations report the full #1
    revenue as the margin). The Q9/Q10 regime: customer and part are
    DIM broadcasts (dense LUTs), but orders is a fact table, so
    lineitem partials meet the (orderkey -> nation) side through the
    bucketed hash exchange on orderkey; a second tiny exchange by
    nation finishes the per-bucket sort + head(2) + diff."""
    from .pipelines.relational import bucketed_hash_join, bucketed_reduce

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    nlut = np.full(int(cust["c_custkey"].max()) + 2, -1, np.int32)
    nlut[cust["c_custkey"].to_numpy()] = (
        cust["c_nationkey"].to_numpy().astype(np.int32))
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    codes, brands = pd.factorize(part["p_brand"])
    blut = np.full(int(part["p_partkey"].max()) + 2, -1, np.int32)
    blut[part["p_partkey"].to_numpy()] = codes.astype(np.int32)
    vocab = np.asarray(brands, object)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def order_nat(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "okey": t["o_orderkey"],
            "nat": pa.array(nlut[np.minimum(ck, len(nlut) - 1)]
                            .astype(np.int64)),
        })

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_extendedprice"])

    def li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        bid = blut[np.minimum(pk, len(blut) - 1)]
        g = (pa.table({"okey": t["l_orderkey"],
                       "bid": pa.array(bid.astype(np.int64)),
                       "c": _cents(t["l_extendedprice"])})
             .group_by(["okey", "bid"]).aggregate([("c", "sum")]))
        return pa.table({"okey": g["okey"], "bid": g["bid"],
                         "c": g["c_sum"]})

    joined = bucketed_hash_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(order_nat, batch_format="pyarrow"),
        "okey", n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["nat", "bid", "c"])
             .group_by(["nat", "bid"]).aggregate([("c", "sum")]))
        return pa.table({"nat": g["nat"], "bid": g["bid"],
                         "c": g["c_sum"]})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.nulls(0, pa.int64()),
                          "top_brand": pa.nulls(0, pa.string()),
                          "top_revenue_cents": pa.nulls(0, pa.int64()),
                          "margin_cents": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().groupby(["nat", "bid"], as_index=False)
              ["c"].sum())
        df["brand"] = vocab[df["bid"].to_numpy()]
        rows = []
        for nat, g in df.groupby("nat"):
            g = g.sort_values(["c", "brand"],
                              ascending=[False, True], kind="stable")
            top = g.iloc[0]
            runner = int(g.iloc[1]["c"]) if len(g) > 1 else 0
            rows.append((int(nat), top["brand"], int(top["c"]),
                         int(top["c"]) - runner))
        return pa.table({
            "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
            "top_brand": pa.array([r[1] for r in rows], pa.string()),
            "top_revenue_cents": pa.array([r[2] for r in rows],
                                          pa.int64()),
            "margin_cents": pa.array([r[3] for r in rows], pa.int64()),
        })

    return bucketed_reduce(
        joined.map_batches(partial, batch_format="pyarrow"),
        "nat", bucket_fn, n_buckets=8,
        schema=pa.schema([("nat", pa.int64()), ("bid", pa.int64()),
                          ("c", pa.int64())]))


SQL_MARGIN_OF_VICTORY = """
WITH rev AS (
  SELECT c.c_nationkey::BIGINT AS c_nationkey, p.p_brand AS brand,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
           AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), r AS (
  SELECT c_nationkey, brand, c,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c DESC, brand) AS rn
  FROM rev
)
SELECT a.c_nationkey, a.brand AS top_brand,
       a.c AS top_revenue_cents,
       (a.c - coalesce(b.c, 0))::BIGINT AS margin_cents
FROM r a LEFT JOIN r b
  ON b.c_nationkey = a.c_nationkey AND b.rn = 2
WHERE a.rn = 1
"""


FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
)


def q_fd_audit(sf_dir: str):
    """FUNCTIONAL-DEPENDENCY DISCOVERY — the schema-profiling pass
    that finds hidden keys: candidate lhs -> rhs holds iff
    |distinct lhs| == |distinct (lhs, rhs)|. Each candidate dedups
    (lhs, rhs) pairs per batch, exchanges ONCE by lhs (every lhs value
    completes in one bucket, so both distinct counts are per-bucket
    sums — no global distinct structure), and reports the two counts
    plus the verdict. Audits a real key, a false dependency, and a
    low-cardinality coincidence candidate."""
    from .pipelines.relational import bucketed_reduce

    rows = []
    for lhs, rhs in FD_CANDIDATES:
        orders = _read(sf_dir, "orders", [lhs, rhs])

        def dedup(t: pa.Table) -> pa.Table:
            return t.group_by([lhs, rhs]).aggregate([])

        def bucket_fn(t: pa.Table) -> pa.Table:
            empty = pa.table({"n_lhs": pa.nulls(0, pa.int64()),
                              "n_pairs": pa.nulls(0, pa.int64())})
            if t.num_rows == 0:
                return empty
            pairs = t.group_by([lhs, rhs]).aggregate([])
            nl = len(pc.unique(pairs[lhs]))
            return pa.table({
                "n_lhs": pa.array([nl], pa.int64()),
                "n_pairs": pa.array([pairs.num_rows], pa.int64()),
            })

        p = bucketed_reduce(
            orders.map_batches(dedup, batch_format="pyarrow"),
            lhs, bucket_fn, n_buckets=8).to_pandas()
        nl, npair = int(p["n_lhs"].sum()), int(p["n_pairs"].sum())
        rows.append((lhs, rhs, nl, npair, int(nl == npair)))
    return pa.table({
        "lhs": pa.array([r[0] for r in rows], pa.string()),
        "rhs": pa.array([r[1] for r in rows], pa.string()),
        "n_lhs": pa.array([r[2] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[3] for r in rows], pa.int64()),
        "holds": pa.array([r[4] for r in rows], pa.int64()),
    })


SQL_FD_AUDIT = """
SELECT * FROM (
  SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
         count(DISTINCT o_orderkey)::BIGINT AS n_lhs,
         count(DISTINCT (o_orderkey, o_custkey))::BIGINT AS n_pairs,
         (count(DISTINCT o_orderkey)
          = count(DISTINCT (o_orderkey, o_custkey)))::BIGINT AS holds
  FROM orders
  UNION ALL
  SELECT 'o_custkey', 'o_orderpriority',
         count(DISTINCT o_custkey)::BIGINT,
         count(DISTINCT (o_custkey, o_orderpriority))::BIGINT,
         (count(DISTINCT o_custkey)
          = count(DISTINCT (o_custkey, o_orderpriority)))::BIGINT
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', 'o_orderstatus',
         count(DISTINCT o_orderpriority)::BIGINT,
         count(DISTINCT (o_orderpriority, o_orderstatus))::BIGINT,
         (count(DISTINCT o_orderpriority)
          = count(DISTINCT (o_orderpriority, o_orderstatus)))::BIGINT
  FROM orders
)
"""


XCOV_WINDOW = 7


def q_rolling_xcov(sf_dir: str):
    """ROLLING CROSS-COVARIANCE ingredients between two DAILY series —
    'do event spikes co-move with order spikes this week?': for every
    7-day window start over the day-of-month grid, the exact integer
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) of (daily event
    count, daily order count) pairs, zeros filled for silent days.
    Two independent O(blocks x 31) partial scans align on the driver's
    bounded calendar — the two fact tables never join row-level."""
    ev = _read(sf_dir, "events", ["ts"])
    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def day_counts(col):
        def f(t: pa.Table) -> pa.Table:
            g = (pa.table({"day": pc.day(t[col]).cast(pa.int64())})
                 .group_by("day").aggregate([("day", "count")]))
            return pa.table({"day": g["day"],
                             "n": g["day_count"].cast(pa.int64())})
        return f

    e = (ev.map_batches(day_counts("ts"), batch_format="pyarrow")
         .to_pandas().groupby("day")["n"].sum())
    o = (orders.map_batches(day_counts("o_orderdate"),
                            batch_format="pyarrow")
         .to_pandas().groupby("day")["n"].sum())
    days = np.arange(1, 32, dtype=np.int64)
    x = np.array([int(e.get(d, 0)) for d in days], np.int64)
    y = np.array([int(o.get(d, 0)) for d in days], np.int64)
    rows = []
    for s in range(0, 31 - XCOV_WINDOW + 1):
        xs, ys = x[s:s + XCOV_WINDOW], y[s:s + XCOV_WINDOW]
        rows.append((int(days[s]), XCOV_WINDOW, int(xs.sum()),
                     int(ys.sum()), int((xs * ys).sum()),
                     int((xs * xs).sum()), int((ys * ys).sum())))
    return pa.table({
        "start_day": pa.array([r[0] for r in rows], pa.int64()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "sx": pa.array([r[2] for r in rows], pa.int64()),
        "sy": pa.array([r[3] for r in rows], pa.int64()),
        "sxy": pa.array([r[4] for r in rows], pa.int64()),
        "sxx": pa.array([r[5] for r in rows], pa.int64()),
        "syy": pa.array([r[6] for r in rows], pa.int64()),
    })


SQL_ROLLING_XCOV = f"""
WITH days AS (
  SELECT unnest(generate_series(1, 31))::BIGINT AS day
), e AS (
  SELECT day(ts)::BIGINT AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1
), o AS (
  SELECT day(o_orderdate)::BIGINT AS day, count(*)::BIGINT AS n
  FROM orders GROUP BY 1
), g AS (
  SELECT d.day, coalesce(e.n, 0)::BIGINT AS x,
         coalesce(o.n, 0)::BIGINT AS y
  FROM days d LEFT JOIN e ON e.day = d.day
  LEFT JOIN o ON o.day = d.day
), w AS (
  SELECT s.day AS start_day, g.x, g.y
  FROM g s JOIN g
    ON g.day BETWEEN s.day AND s.day + {XCOV_WINDOW} - 1
  WHERE s.day <= 31 - {XCOV_WINDOW} + 1
)
SELECT start_day, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
       sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
       sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
FROM w GROUP BY 1
"""


def q_zero_activity_cells(sf_dir: str):
    """DENSE-GRID ANTI-JOIN — the monitoring gap detector: which
    (event_type, day) cells of the full type x 31-day calendar saw
    ZERO events? The grid is the small side (types x days, built from
    the distinct-type partials), the observed cells fold from
    O(blocks x types x 31) partials, and the report is grid MINUS
    observed — per type: missing-day count and the first silent day
    (-1 when fully covered)."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"et": t["event_type"],
                       "day": pc.day(t["ts"]).cast(pa.int64())})
             .group_by(["et", "day"]).aggregate([]))
        return g

    obs = (ev.map_batches(partial, batch_format="pyarrow")
           .to_pandas().drop_duplicates())
    types = sorted(obs["et"].unique())
    have = set(zip(obs["et"], obs["day"]))
    rows = []
    for et in types:
        missing = [d for d in range(1, 32) if (et, d) not in have]
        rows.append((et, len(missing),
                     missing[0] if missing else -1))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_missing_days": pa.array([r[1] for r in rows], pa.int64()),
        "first_missing_day": pa.array([r[2] for r in rows],
                                      pa.int64()),
    })


SQL_ZERO_ACTIVITY_CELLS = """
WITH t AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type, d.day
  FROM t, (SELECT unnest(generate_series(1, 31))::BIGINT AS day) d
), obs AS (
  SELECT DISTINCT event_type, day(ts)::BIGINT AS day FROM events
), miss AS (
  SELECT g.event_type, g.day
  FROM grid g LEFT JOIN obs o
    ON o.event_type = g.event_type AND o.day = g.day
  WHERE o.day IS NULL
)
SELECT t.event_type,
       count(miss.day)::BIGINT AS n_missing_days,
       coalesce(min(miss.day), -1)::BIGINT AS first_missing_day
FROM t LEFT JOIN miss ON miss.event_type = t.event_type
GROUP BY 1
"""


def q_dominance_counts(sf_dir: str):
    """2-D DOMINANCE COUNTING — the full-population companion of the
    skyline: for every part, how many OTHER parts it dominates-or-ties
    on (size <=, price <=) — i.e. the joint empirical CDF evaluated at
    every point, minus self. The size domain is tiny (~50), so the
    joint distribution folds to per-(size, price) histogram partials
    (bounded by distinct pairs, a dim-table scale), the driver builds
    one sorted price array + prefix counts PER SIZE, and pass 2 maps
    every part through 50 vectorized searchsorteds — the classic
    sweep turned into a broadcast-CDF lookup, no quadratic join
    anywhere. The oracle IS the quadratic self-join, at gate scale."""
    import ray

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_retailprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"s": t["p_size"].cast(pa.int64()),
                       "c": _cents(t["p_retailprice"])})
             .group_by(["s", "c"]).aggregate([("c", "count")]))
        return pa.table({"s": g["s"], "c": g["c"],
                         "n": g["c_count"].cast(pa.int64())})

    hist = (parts.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby(["s", "c"], as_index=False)["n"]
            .sum())
    by_size = {}
    for s, g in hist.groupby("s"):
        g = g.sort_values("c")
        by_size[int(s)] = (g["c"].to_numpy(dtype=np.int64),
                           np.cumsum(g["n"].to_numpy(dtype=np.int64)))
    ref = ray.put(by_size)

    class Dominance:
        def __init__(self):
            self.by_size = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            size = t["p_size"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c = _cents(t["p_retailprice"]) \
                .to_numpy(zero_copy_only=False)
            dom = np.zeros(len(c), np.int64)
            for s, (vals, cum) in self.by_size.items():
                m = size >= s
                if not m.any():
                    continue
                pos = np.searchsorted(vals, c[m], "right")
                add = np.where(pos > 0, cum[np.maximum(pos - 1, 0)], 0)
                dom[m] += add
            return pa.table({
                "p_partkey": t["p_partkey"],
                "n_dominated": pa.array(dom - 1),   # minus self
            })

    return parts.map_batches(Dominance, batch_format="pyarrow",
                             concurrency=(1, 4))


SQL_DOMINANCE_COUNTS = """
WITH p AS (
  SELECT p_partkey, p_size::BIGINT AS s,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
)
SELECT a.p_partkey,
       (count(b.p_partkey) - 1)::BIGINT AS n_dominated
FROM p a JOIN p b ON b.s <= a.s AND b.c <= a.c
GROUP BY 1
"""


# The 13 Allen interval relations, in the FIXED classification order both
# engines evaluate (np.select / SQL CASE pick the first true branch; the
# conditions are mutually exclusive for proper intervals, so order only
# matters for the shared exhaustiveness contract).
_ALLEN_RELATIONS = (
    "before", "meets", "overlaps", "finished_by", "contains",
    "starts", "equals", "started_by", "during", "finishes",
    "overlapped_by", "met_by", "after",
)


def _allen_classify(s1, e1, s2, e2) -> np.ndarray:
    """Vectorized Allen classification of intervals [s, e). For PROPER
    intervals (s < e) the 13 relations are a true partition; the
    first-match ordering (shared with the SQL CASE) additionally makes
    the classification total over arbitrary endpoint quadruples
    (brute-force-verified in tests), so the -1 guard is a defensive
    invariant, not a reachable branch."""
    conds = [
        e1 < s2,                            # before
        e1 == s2,                           # meets
        (s1 < s2) & (s2 < e1) & (e1 < e2),  # overlaps
        (s1 < s2) & (e1 == e2),             # finished_by
        (s1 < s2) & (e1 > e2),              # contains
        (s1 == s2) & (e1 < e2),             # starts
        (s1 == s2) & (e1 == e2),            # equals
        (s1 == s2) & (e1 > e2),             # started_by
        (s1 > s2) & (e1 < e2),              # during
        (s1 > s2) & (e1 == e2),             # finishes
        (s2 < s1) & (s1 < e2) & (e2 < e1),  # overlapped_by
        s1 == e2,                           # met_by
        s1 > e2,                            # after
    ]
    code = np.select(conds, np.arange(13), default=-1)
    if (code < 0).any():
        raise AssertionError("Allen classification not exhaustive — "
                             "improper interval reached the kernel")
    return code


def _order_ship_windows(sf_dir: str) -> "rd.Dataset":
    """(o_orderkey, o_custkey, d, s, e): each order's ship WINDOW as a
    proper half-open interval [min shipdate, max shipdate + 1 day) in
    epoch days, plus the orderdate sequencing key. Built with ONE
    exchange: per-batch min/max shipdate partials (O(blocks x
    orders-per-block) rows, never raw lineitem) UNION the tagged order
    headers -> one exchange by orderkey whose bucket_fn both finishes
    the per-order window AND joins the header (the tagged-union
    fused-exchange idiom: two logical ops, one shuffle). Shared by
    ``allen_relations`` and ``interval_scheduling``."""
    from .pipelines.relational import bucketed_reduce

    US_DAY = 86_400_000_000
    UNION_SCHEMA = pa.schema([
        ("o_orderkey", pa.int64()), ("s", pa.int64()), ("e_raw", pa.int64()),
        ("o_custkey", pa.int64()), ("d", pa.int64()),
    ])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["l_shipdate"].cast(pa.int64()),
                        US_DAY).cast(pa.int64())
        g = (pa.table({"o_orderkey": t["l_orderkey"], "d": day})
             .group_by(["o_orderkey"])
             .aggregate([("d", "min"), ("d", "max")]))
        n = g.num_rows
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "s": g["d_min"].cast(pa.int64()),
                         "e_raw": g["d_max"].cast(pa.int64()),
                         "o_custkey": pa.nulls(n, pa.int64()),
                         "d": pa.nulls(n, pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "s": pa.nulls(n, pa.int64()),
                         "e_raw": pa.nulls(n, pa.int64()),
                         "o_custkey": t["o_custkey"],
                         "d": t["o_orderdate"].cast(pa.int64())})

    tagged = (li.map_batches(li_partial, batch_format="pyarrow")
              .union(orders.map_batches(o_prep, batch_format="pyarrow")))

    def finish_join(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.nulls(0, pa.int64()),
                          "o_custkey": pa.nulls(0, pa.int64()),
                          "d": pa.nulls(0, pa.int64()),
                          "s": pa.nulls(0, pa.int64()),
                          "e": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        is_li = t["s"].is_valid().to_numpy(zero_copy_only=False)
        li_t = t.filter(pa.array(is_li))
        o_t = t.filter(pa.array(~is_li))
        if li_t.num_rows == 0 or o_t.num_rows == 0:
            return empty
        g = (li_t.select(["o_orderkey", "s", "e_raw"])
             .group_by(["o_orderkey"])
             .aggregate([("s", "min"), ("e_raw", "max")]))
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False)
        smin = g["s_min"].to_numpy(zero_copy_only=False)
        # +1 day: half-open [s, e) is proper even for single-day
        # windows, the classifier's contract
        emax = g["e_raw_max"].to_numpy(zero_copy_only=False) + 1
        order = np.argsort(ok)
        ok, smin, emax = ok[order], smin[order], emax[order]
        keys = o_t["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok, keys)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == keys                 # inner-join semantics
        pos = pos_c[hit]
        return pa.table({
            "o_orderkey": pa.array(keys[hit], pa.int64()),
            "o_custkey": o_t["o_custkey"].filter(pa.array(hit)),
            "d": o_t["d"].filter(pa.array(hit)),
            "s": pa.array(smin[pos], pa.int64()),
            "e": pa.array(emax[pos], pa.int64()),
        })

    return bucketed_reduce(tagged, "o_orderkey", finish_join,
                           n_buckets=32, schema=UNION_SCHEMA)


_WINDOWS_SCHEMA = pa.schema([
    ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
    ("d", pa.int64()), ("s", pa.int64()), ("e", pa.int64()),
])


def q_allen_relations(sf_dir: str):
    """ALLEN INTERVAL-ALGEBRA histogram — classify every pair of
    CONSECUTIVE order ship-windows per customer (interval =
    [min shipdate, max shipdate + 1 day) in epoch days, orders
    sequenced by (orderdate, orderkey)) into exactly one of Allen's 13
    interval relations (before/meets/overlaps/.../after) and count
    each. The temporal-join vocabulary made first-class: the same
    endpoint tests behind every interval join, pinned as a total,
    deterministic taxonomy. Plan: the shared one-exchange
    ``_order_ship_windows`` -> one exchange by custkey where
    consecutive pairs classify vectorized (np.select over the 13
    conditions, an asserted partition) -> <= 13 partial rows per
    bucket, folded on the driver. Nothing wider than O(orders) ever
    shuffles."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    joined = _order_ship_windows(sf_dir)

    def pair_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"relation": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, u))
        u, s, e = u[order], s[order], e[order]
        nxt = u[:-1] == u[1:]               # consecutive same-customer
        if not nxt.any():
            return empty
        i = np.flatnonzero(nxt)
        code = _allen_classify(s[i], e[i], s[i + 1], e[i + 1])
        cnt = np.bincount(code, minlength=13)
        keep = np.flatnonzero(cnt)
        return pa.table({
            "relation": pa.array([_ALLEN_RELATIONS[k] for k in keep]),
            "n": pa.array(cnt[keep], pa.int64()),
        })

    parts = bucketed_reduce(drop_empty_blocks(joined), "o_custkey",
                            pair_fn, n_buckets=32,
                            schema=_WINDOWS_SCHEMA)
    out = parts.to_pandas()                  # <= 13 x 32 partial rows
    return (out.groupby("relation", as_index=False)["n"].sum()
            .astype({"n": "int64"}))


SQL_ALLEN_RELATIONS = """
WITH li AS (
  SELECT l_orderkey,
         min(CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)) AS s,
         max(CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)) + 1 AS e
  FROM lineitem GROUP BY 1
), iv AS (
  SELECT o.o_custkey AS c, o.o_orderdate AS d, o.o_orderkey AS k,
         li.s, li.e
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
), pr AS (
  SELECT c, s AS s1, e AS e1,
         lead(s) OVER w AS s2, lead(e) OVER w AS e2
  FROM iv WINDOW w AS (PARTITION BY c ORDER BY d, k)
), cl AS (
  SELECT CASE
    WHEN e1 < s2 THEN 'before'
    WHEN e1 = s2 THEN 'meets'
    WHEN s1 < s2 AND s2 < e1 AND e1 < e2 THEN 'overlaps'
    WHEN s1 < s2 AND e1 = e2 THEN 'finished_by'
    WHEN s1 < s2 AND e1 > e2 THEN 'contains'
    WHEN s1 = s2 AND e1 < e2 THEN 'starts'
    WHEN s1 = s2 AND e1 = e2 THEN 'equals'
    WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
    WHEN s1 > s2 AND e1 < e2 THEN 'during'
    WHEN s1 > s2 AND e1 = e2 THEN 'finishes'
    WHEN s2 < s1 AND s1 < e2 AND e2 < e1 THEN 'overlapped_by'
    WHEN s1 = e2 THEN 'met_by'
    WHEN s1 > e2 THEN 'after'
  END AS relation
  FROM pr WHERE s2 IS NOT NULL
)
SELECT relation, count(*)::BIGINT AS n FROM cl GROUP BY 1
"""


def q_isotonic_trend(sf_dir: str):
    """ISOTONIC (monotone non-decreasing) REGRESSION of the daily
    event count, published as EXACT reduced rationals — the
    order-constrained fit behind trend monotonicity tests, via the
    minimax closed form g(i) = max_{j<=i} min_{k>=i} mean(y[j..k])
    instead of the sequential pool-adjacent-violators recursion (same
    move as the CUSUM closed form: a textbook recursion becomes
    order-free algebra both engines can state). Plan: O(blocks x days)
    count partials (the calendar-bounded domain) fold to one
    O(days) array on the driver; the minimax runs over exact
    `fractions.Fraction`s (days^3/6 window means — trivial for a
    bounded calendar; production would run O(days) PAVA on the same
    partials). The oracle enumerates the same windows and orders
    rationals as doubles — safe because distinct window means with
    den <= days differ by >= 1/days^2, ~9 orders above double eps at
    these magnitudes; value-equal rationals reduce to the identical
    (num, den) pair, so arg ties cannot diverge."""
    from fractions import Fraction

    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    days = daily.index.to_numpy(dtype=np.int64)
    y = daily.to_numpy(dtype=np.int64)
    n = len(y)
    pre = np.concatenate([[0], np.cumsum(y)])

    def mean(j, k):                          # mean of y[j..k], 0-based incl.
        return Fraction(int(pre[k + 1] - pre[j]), k - j + 1)

    fit_num = np.empty(n, np.int64)
    fit_den = np.empty(n, np.int64)
    for i in range(n):
        best = None
        for j in range(i + 1):
            inner = min(mean(j, k) for k in range(i, n))
            if best is None or inner > best:
                best = inner
        fit_num[i] = best.numerator
        fit_den[i] = best.denominator

    return pd.DataFrame({"day": days, "fit_num": fit_num,
                         "fit_den": fit_den})


SQL_ISOTONIC_TREND = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), d AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
), p AS (
  SELECT i, day, y, sum(y) OVER (ORDER BY i) AS pre FROM d
), p0 AS (
  SELECT i, day, pre, pre - y AS pre0 FROM p
), w AS (
  SELECT i.i AS i, j.i AS j, k.i AS k,
         (k.pre - j.pre0)::BIGINT AS num, (k.i - j.i + 1)::BIGINT AS den
  FROM p0 i JOIN p0 j ON j.i <= i.i JOIN p0 k ON k.i >= i.i
), inner_min AS (
  SELECT i, j, num, den,
         row_number() OVER (PARTITION BY i, j
                            ORDER BY num * 1.0 / den, k) AS rn
  FROM w
), outer_max AS (
  SELECT i, num, den,
         row_number() OVER (PARTITION BY i
                            ORDER BY num * 1.0 / den DESC, j) AS rn
  FROM inner_min WHERE rn = 1
)
SELECT p0.day,
       (o.num / gcd(o.num, o.den))::BIGINT AS fit_num,
       (o.den / gcd(o.num, o.den))::BIGINT AS fit_den
FROM outer_max o JOIN p0 ON p0.i = o.i
WHERE o.rn = 1
"""


_RDV_NODES = tuple(f"node{i:02d}" for i in range(16))


def q_rendezvous_shards(sf_dir: str):
    """RENDEZVOUS (highest-random-weight) SHARD ASSIGNMENT — every
    document goes to argmax over 16 named nodes of
    md5('<doc_id>:<node>'), the consistent-placement scheme where
    removing a node relocates ONLY that node's keys (the layout
    planner for the seen-shard state; contrast mod-N, which reshuffles
    everything). Output: per-node document count and total char load.
    Plan: the node list is a static constant (nothing broadcast);
    each batch hashes rows x 16 nodes (the md5 contract is inherently
    per-string, the house per-batch kernel) and keeps a running
    lexicographic argmax over hex digests — numpy string compares,
    no per-row Python argmax; O(16 x blocks) partial rows fold on
    the driver. DuckDB's md5() restates the digest bit-for-bit."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        chars = t["n_chars"].to_numpy(zero_copy_only=False)
        best = np.zeros(len(ids), np.int64)
        best_h = None
        for ni, node in enumerate(_RDV_NODES):
            suffix = (":" + node).encode()
            h = np.array([hashlib.md5(str(i).encode() + suffix).hexdigest()
                          for i in ids], dtype="<U32")
            if best_h is None:
                best_h = h
            else:
                m = h > best_h
                best[m] = ni
                best_h = np.where(m, h, best_h)
        cnt = np.bincount(best, minlength=16)
        load = np.bincount(best, weights=chars, minlength=16)
        keep = np.flatnonzero(cnt)
        return pa.table({
            "node": pa.array([_RDV_NODES[k] for k in keep]),
            "n_docs": pa.array(cnt[keep], pa.int64()),
            "total_chars": pa.array(load[keep].astype(np.int64)),
        })

    out = (docs.map_batches(assign, batch_format="pyarrow")
           .to_pandas())                     # O(16 x blocks) partials
    return (out.groupby("node", as_index=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .astype({"n_docs": "int64", "total_chars": "int64"}))


SQL_RENDEZVOUS_SHARDS = """
WITH nodes AS (
  SELECT 'node' || lpad(CAST(r AS VARCHAR), 2, '0') AS node
  FROM range(16) t(r)
), sc AS (
  SELECT d.doc_id, n.node, d.n_chars,
         md5(CAST(d.doc_id AS VARCHAR) || ':' || n.node) AS h
  FROM documents d CROSS JOIN nodes n
), a AS (
  SELECT doc_id, arg_max(node, h) AS node, any_value(n_chars) AS n_chars
  FROM sc GROUP BY doc_id
)
SELECT node, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM a GROUP BY 1
"""


def _hilbert_d(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Vectorized Hilbert xy->d on a 2^order grid: the classic loop over
    LEVELS (quadrant test, distance accumulate, rotate), each step a
    whole-array numpy op. Bijective on the grid; consecutive d are
    always 4-neighbors (tested)."""
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    d = np.zeros(len(x), np.int64)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0)
        ry = ((y & s) > 0)
        # quadrant value (3*rx) XOR ry: 00->0 01->1 11->2 10->3
        q = np.where(rx, np.where(ry, 2, 3), np.where(ry, 1, 0))
        d += s * s * q
        # rotate: ry==0 -> (flip if rx) then swap x/y
        flip = ~ry & rx
        nx = np.where(ry, x, np.where(flip, s - 1 - y, y))
        ny = np.where(ry, y, np.where(flip, s - 1 - x, x))
        x, y = nx, ny
        s >>= 1
    return d


def q_hilbert_layout(sf_dir: str):
    """HILBERT-CURVE layout indexing over (partkey, suppkey) — the
    locality-tighter sibling of ``zorder_layout``: the Hilbert curve
    never makes the Morton curve's long diagonal jumps, so file-level
    min/max zones cover smaller key rectangles (why Delta chose it for
    liquid clustering). Same two-pass plan as zorder: min/max partials
    fold to 4 driver ints; pass 2 scales both keys to a 16-bit grid
    (identical exact floor form) and runs the classic xy->d loop —
    16 level iterations, each a vectorized quadrant test + rotation
    over the whole batch, a Python loop over LEVELS never rows. The
    oracle restates the identical 16 iterations as chained CTEs, one
    per level, carrying (x, y, d) through the same CASE rotations."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])

    def mm_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "pmin": pa.array([pc.min(t["l_partkey"]).as_py()], pa.int64()),
            "pmax": pa.array([pc.max(t["l_partkey"]).as_py()], pa.int64()),
            "smin": pa.array([pc.min(t["l_suppkey"]).as_py()], pa.int64()),
            "smax": pa.array([pc.max(t["l_suppkey"]).as_py()], pa.int64()),
        })

    pmin = smin = None
    pmax = smax = None
    for r in ds.map_batches(mm_partial, batch_format="pyarrow").take_all():
        pmin = r["pmin"] if pmin is None else min(pmin, r["pmin"])
        pmax = r["pmax"] if pmax is None else max(pmax, r["pmax"])
        smin = r["smin"] if smin is None else min(smin, r["smin"])
        smax = r["smax"] if smax is None else max(smax, r["smax"])
    pspan = max(pmax - pmin, 1)
    sspan = max(smax - smin, 1)

    def hmap(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (pk - pmin) * 65535 // pspan
        y = (sk - smin) * 65535 // sspan
        d = _hilbert_d(x, y)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "hcode": pa.array(d, pa.int64()),
            "hpart": pa.array(d >> 26, pa.int64()),
        })

    return ds.map_batches(hmap, batch_format="pyarrow")


def _hilbert_sql() -> str:
    ctes = []
    prev = "g"
    for lvl, s in enumerate(1 << np.arange(15, -1, -1)):
        s = int(s)
        q = (f"CASE WHEN (x & {s}) > 0 THEN "
             f"(CASE WHEN (y & {s}) > 0 THEN 2 ELSE 3 END) "
             f"ELSE (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) END")
        nx = (f"CASE WHEN (y & {s}) > 0 THEN x "
              f"WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END")
        ny = (f"CASE WHEN (y & {s}) > 0 THEN y "
              f"WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END")
        ctes.append(f"""
h{lvl} AS (
  SELECT l_orderkey, l_linenumber,
         d + {s * s}::BIGINT * ({q}) AS d, {nx} AS x, {ny} AS y
  FROM {prev}
)""")
        prev = f"h{lvl}"
    return f"""
WITH mm AS (
  SELECT min(l_partkey) AS pmin,
         greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
         min(l_suppkey) AS smin,
         greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
  FROM lineitem
), g AS (
  SELECT l_orderkey, l_linenumber, 0::BIGINT AS d,
         (l_partkey - mm.pmin) * 65535 // mm.pspan AS x,
         (l_suppkey - mm.smin) * 65535 // mm.sspan AS y
  FROM lineitem, mm
),
{','.join(ctes)}
SELECT l_orderkey, l_linenumber, d::BIGINT AS hcode,
       (d >> 26)::BIGINT AS hpart
FROM {prev}
"""


def _event_transition_matrix(sf_dir: str):
    """(states, row-stochastic P) of the per-user event-type chain:
    transition counts from ONE exchange by user (the consecutive-pair
    kernel, O(types^2) partials out of each bucket), matrix built on
    the driver (the state space is O(event types)). Rows with no
    outgoing transitions stay all-zero (the pagerank dangling
    contract). Shared by ``markov_stationary`` and
    ``markov_hitting_truncated``."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"],
                         "et": t["event_type"]})

    def pair_counts(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.nulls(0, pa.string()),
                          "dst": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["et"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = u[:-1] == u[1:]
        if not same.any():
            return empty
        i = np.flatnonzero(same)
        df = pd.DataFrame({"src": et[i], "dst": et[i + 1]})
        g = df.groupby(["src", "dst"], as_index=False).size()
        return pa.table({"src": pa.array(g["src"], pa.string()),
                         "dst": pa.array(g["dst"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    parts = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", pair_counts, n_buckets=32).to_pandas()
    counts = (parts.groupby(["src", "dst"], as_index=False)["n"].sum())

    states = sorted(set(counts["src"]) | set(counts["dst"]))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    mat = np.zeros((k, k), np.float64)
    for src, dst, n in counts.itertuples(index=False):
        mat[idx[src], idx[dst]] = n
    out = mat.sum(axis=1)
    np.divide(mat, out[:, None], out=mat, where=out[:, None] > 0)
    return states, mat


MARKOV_ITERS = 20


def q_markov_stationary(sf_dir: str):
    """MARKOV STATIONARY DISTRIBUTION of the event-type chain — power
    iteration v <- vP over the per-user transition matrix (the
    behavioral steady state 'where do users spend their time'), the
    pagerank float contract reused on a DENSE chain: 20 synchronous
    iterations from the uniform vector over double64, published at
    round(p, 6) (both engines sum <= |types| products per entry; the
    summation-order slack is ~1e-16, nine orders under the rounding
    grain). Transition counts come from one exchange by user (the
    consecutive-pair kernel); the state space is O(event types), so
    the matrix and the iteration live on the driver — O(types^2)
    partials, never rows. States with no outgoing transitions keep
    their column mass unrenormalized (the documented pagerank dangling
    contract)."""
    states, mat = _event_transition_matrix(sf_dir)
    k = len(states)
    v = np.full(k, 1.0 / k)
    for _ in range(MARKOV_ITERS):
        v = v @ mat
    return pd.DataFrame({"event_type": states,
                         "p": np.round(v, 6)})


def _markov_sql() -> str:
    iter_ctes = []
    prev = "v0"
    for i in range(1, MARKOV_ITERS + 1):
        iter_ctes.append(f"""
v{i} AS (
  SELECT s.et AS et,
         coalesce(sum(p.p * tr.n / dg.g), 0) AS p
  FROM states s
  LEFT JOIN tr ON tr.dst = s.et
  LEFT JOIN {prev} p ON p.et = tr.src
  LEFT JOIN dg ON dg.src = tr.src
  GROUP BY s.et
)""")
        prev = f"v{i}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), tr AS (
  SELECT event_type AS src, nxt AS dst, count(*)::DOUBLE AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
), states AS (
  SELECT src AS et FROM tr UNION SELECT dst FROM tr
), dg AS (
  SELECT src, sum(n) AS g FROM tr GROUP BY 1
), v0 AS (
  SELECT et, 1.0 / (SELECT count(*) FROM states) AS p FROM states
),
{','.join(iter_ctes)}
SELECT et AS event_type, round(p, 6) AS p FROM {prev}
"""


HAAR_N = 32


def q_haar_wavelet(sf_dir: str):
    """UNNORMALIZED HAAR WAVELET transform of the daily event-count
    series — the multi-resolution decomposition behind wavelet
    synopses (Matias/Vitter/Wang SIGMOD'98): level-l detail
    coefficients are pairwise differences of level-(l-1) sums, all
    INTEGER-exact because the unnormalized transform never divides.
    The 30-day calendar zero-pads to 32 slots; 5 levels of details
    (16+8+4+2+1) plus the level-6 root approximation (= the grand
    total) give the 32-coefficient orthogonal basis. Plan: the same
    O(blocks x days) count partials as isotonic_trend fold to one
    32-slot driver array (bounded calendar domain); the butterfly is
    5 vectorized halvings. The oracle restates each level as one
    chained CTE: sum/difference by idx // 2 parity."""
    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    base = int(daily.index.min())
    y = np.zeros(HAAR_N, np.int64)
    y[daily.index.to_numpy(dtype=np.int64) - base] = daily.to_numpy()

    levels, idxs, coeffs = [], [], []
    cur = y
    for lvl in range(1, 6):                  # 5 = log2(HAAR_N)
        sums = cur[0::2] + cur[1::2]
        diffs = cur[0::2] - cur[1::2]
        levels.extend([lvl] * len(diffs))
        idxs.extend(range(len(diffs)))
        coeffs.extend(diffs.tolist())
        cur = sums
    levels.append(6)                         # root approximation
    idxs.append(0)
    coeffs.append(int(cur[0]))
    return pd.DataFrame({"level": np.array(levels, np.int64),
                         "idx": np.array(idxs, np.int64),
                         "coeff": np.array(coeffs, np.int64)})


def _haar_sql() -> str:
    ctes = []
    prev = "s0"
    details = []
    for lvl in range(1, 6):
        ctes.append(f"""
s{lvl} AS (
  SELECT idx // 2 AS idx,
         sum(v)::BIGINT AS v,
         sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
  FROM {prev} GROUP BY idx // 2
)""")
        details.append(f"SELECT {lvl}::BIGINT AS level, idx::BIGINT AS idx,"
                       f" d::BIGINT AS coeff FROM s{lvl}")
        prev = f"s{lvl}"
    details.append(f"SELECT 6::BIGINT, 0::BIGINT, v::BIGINT FROM {prev}")
    return f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), grid AS (
  SELECT r AS idx FROM range({HAAR_N}) t(r)
), s0 AS (
  SELECT grid.idx, coalesce(d.y, 0)::BIGINT AS v
  FROM grid LEFT JOIN daily d
    ON d.day = grid.idx + (SELECT min(day) FROM daily)
),
{','.join(ctes)}
{' UNION ALL '.join(details)}
"""


def q_changepoint_day(sf_dir: str):
    """BINARY-SEGMENTATION CHANGEPOINT on the daily event count — the
    split k maximizing the between-segment sum of squares
    BSS(k) = S_L^2/n_L + S_R^2/n_R - S^2/n, the first step of every
    binary-segmentation / CUSUM-style detector, decided in EXACT
    integer arithmetic: BSS(k) is a rational with denominator
    n_L*n_R*n, and the argmax compares fractions by CROSS-MULTIPLYING
    int64s (numerators ~1e13 x denominators <= 2.7e4 stay far inside
    int64), never by float — so knife-edge near-ties cannot flip the
    winner on either engine. Ties break to the smallest k on both
    sides. Plan: the isotonic/haar O(blocks x days) count partials
    fold to one O(days) driver array; the scan is O(days) exact
    Fractions. The oracle decides the same argmax with a NOT EXISTS
    cross-multiplication anti-join. Output: the last day of the left
    segment plus BSS as a reduced rational."""
    from fractions import Fraction

    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    days = daily.index.to_numpy(dtype=np.int64)
    y = daily.to_numpy(dtype=np.int64)
    n = len(y)
    pre = np.concatenate([[0], np.cumsum(y)])
    total = int(pre[-1])

    best_k, best = None, None
    for k in range(1, n):                   # left = 1..k
        sl, nl = int(pre[k]), k
        sr, nr = total - sl, n - k
        bss = (Fraction(sl * sl, nl) + Fraction(sr * sr, nr)
               - Fraction(total * total, n))
        if best is None or bss > best:
            best_k, best = k, bss
    # Fraction is auto-reduced — num/den publish in lowest terms
    return pd.DataFrame({
        "split_day": np.array([days[best_k - 1]], np.int64),
        "bss_num": np.array([best.numerator], np.int64),
        "bss_den": np.array([best.denominator], np.int64),
    })


SQL_CHANGEPOINT_DAY = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), d AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
), tot AS (
  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s FROM d
), sc AS (
  -- BSS(k) as an UNREDUCED rational num/den, den = n_l*n_r*n
  SELECT d.i AS k, d.day,
         (pl.sl * pl.sl * (tot.n - d.i) * tot.n
          + (tot.s - pl.sl) * (tot.s - pl.sl) * d.i * tot.n
          - tot.s * tot.s * d.i * (tot.n - d.i))::BIGINT AS num,
         (d.i * (tot.n - d.i) * tot.n)::BIGINT AS den
  FROM d, tot,
       LATERAL (SELECT sum(y)::BIGINT AS sl FROM d d2 WHERE d2.i <= d.i) pl
  WHERE d.i < tot.n
), win AS (
  SELECT * FROM sc a
  WHERE NOT EXISTS (
    SELECT 1 FROM sc b
    WHERE b.num * a.den > a.num * b.den
       OR (b.num * a.den = a.num * b.den AND b.k < a.k))
)
SELECT day AS split_day,
       (num / gcd(num, den))::BIGINT AS bss_num,
       (den / gcd(num, den))::BIGINT AS bss_den
FROM win
"""


def q_ewma_halving(sf_dir: str):
    """EXPONENTIAL SMOOTHING (alpha = 1/2) of the daily event count as
    EXACT DYADIC RATIONALS — the one smoothing constant whose whole
    trajectory is integer algebra: S_i = sum_{j<=i} y_j 2^{j-i-1}
    = N_i / 2^i with N_i the prefix sum of y_j * 2^(j-1), so the
    sequential recursion S_i = (S_{i-1} + y_i)/2 becomes one weighted
    prefix sum (the CUSUM closed-form move again). int64 holds N_i for
    a month of days at any tested scale (y * 2^30 ~ 1e13). Published
    reduced: den = 2^i / gcd — i.e. trailing zeros of N_i cancel."""
    from math import gcd

    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    days = daily.index.to_numpy(dtype=np.int64)
    y = daily.to_numpy(dtype=np.int64)
    n = len(y)
    w = 1 << np.arange(n, dtype=np.int64)       # 2^0 .. 2^(n-1) == 2^(j-1)
    num = np.cumsum(y * w)
    out_num = np.empty(n, np.int64)
    out_den = np.empty(n, np.int64)
    for i in range(n):
        g = gcd(int(num[i]), 1 << (i + 1))
        out_num[i] = num[i] // g
        out_den[i] = (1 << (i + 1)) // g
    return pd.DataFrame({"day": days, "ewma_num": out_num,
                         "ewma_den": out_den})


SQL_EWMA_HALVING = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), d AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
), p AS (
  SELECT day, i,
         sum(y * (1::BIGINT << (i - 1)::INT))
             OVER (ORDER BY i)::BIGINT AS num,
         (1::BIGINT << i::INT)::BIGINT AS den
  FROM d
)
SELECT day,
       (num / gcd(num, den))::BIGINT AS ewma_num,
       (den / gcd(num, den))::BIGINT AS ewma_den
FROM p
"""


ALLPAIRS_TAU = 0.5


def q_allpairs_jaccard(sf_dir: str):
    """EXACT all-pairs Jaccard >= tau over the FULL documents table via
    prefix filtering (``dedup.prefix_filter_pairs`` — AllPairs/PPJoin):
    the deterministic, no-missed-pair complement of ``minhash_dedup``,
    and its scale path is candidate PRUNING (df-ordered prefixes + size
    filter), not sampling. The oracle is the quadratic brute force, so
    the gate proves candidate COMPLETENESS on the corpus (the exact
    verify already guarantees precision for any candidate superset)."""
    from .pipelines.dedup import prefix_filter_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return prefix_filter_pairs(docs, jaccard_threshold=ALLPAIRS_TAU)


SQL_ALLPAIRS_JACCARD = f"""
WITH w_arr AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
), shl AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in range(1, len(words) - 1)]) AS sh
  FROM w_arr
), s AS (
  SELECT doc_id, unnest(sh) AS tok FROM shl
), sz AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM s GROUP BY 1
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS ni
  FROM s x JOIN s y ON y.tok = x.tok AND y.doc_id > x.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       (i.ni::DOUBLE / (sa.n + sb.n - i.ni)) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.a
JOIN sz sb ON sb.doc_id = i.b
WHERE i.ni::DOUBLE / (sa.n + sb.n - i.ni) >= {ALLPAIRS_TAU}
"""


def q_interval_scheduling(sf_dir: str):
    """GREEDY INTERVAL SCHEDULING per customer — the maximum number of
    NON-overlapping order ship-windows (half-open [s, e); touching is
    compatible), via the classic earliest-end greedy, which is provably
    OPTIMAL for this objective — so the published count is a
    well-defined function of the interval set, not a heuristic. Plan:
    the shared one-exchange ``_order_ship_windows`` -> one exchange by
    custkey; inside a bucket the greedy chain is inherently sequential
    PER CUSTOMER (pick min end, jump to first start >= end, repeat) —
    a Python loop bounded by orders-per-customer (bounded by
    construction at any scale, the order_upgrades partitioning
    assumption), with customers parallelized across buckets. The
    oracle runs the same greedy as a recursive CTE (min-end seed, then
    repeatedly the min end among starts >= last end)."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    joined = _order_ship_windows(sf_dir)

    def sched_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.nulls(0, pa.int64()),
                          "n_scheduled": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, e, u))       # per customer: end asc
        u, s, e = u[order], s[order], e[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        out_u = u[starts]
        out_n = np.empty(len(starts), np.int64)
        for gi in range(len(starts)):
            lo, hi = starts[gi], ends[gi]
            cnt, last_e = 0, None
            for j in range(lo, hi):         # end-sorted greedy chain
                if last_e is None or s[j] >= last_e:
                    cnt += 1
                    last_e = e[j]
            out_n[gi] = cnt
        return pa.table({"o_custkey": pa.array(out_u, pa.int64()),
                         "n_scheduled": pa.array(out_n, pa.int64())})

    return bucketed_reduce(drop_empty_blocks(joined), "o_custkey",
                           sched_fn, n_buckets=32,
                           schema=_WINDOWS_SCHEMA)


SQL_INTERVAL_SCHEDULING = """
WITH RECURSIVE li AS (
  SELECT l_orderkey,
         min(CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)) AS s,
         max(CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)) + 1 AS e
  FROM lineitem GROUP BY 1
), iv AS (
  SELECT o.o_custkey AS c, li.s, li.e
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
), seed AS (
  SELECT c, e AS last_e, 1 AS cnt FROM (
    SELECT c, e, row_number() OVER (PARTITION BY c ORDER BY e, s) AS rn
    FROM iv) t WHERE rn = 1
), rec(c, last_e, cnt) AS (
  SELECT c, last_e, cnt FROM seed
  UNION ALL
  SELECT r.c,
         (SELECT min(e) FROM iv WHERE iv.c = r.c AND iv.s >= r.last_e),
         r.cnt + 1
  FROM rec r
  WHERE EXISTS (SELECT 1 FROM iv WHERE iv.c = r.c AND iv.s >= r.last_e)
)
SELECT c AS o_custkey, max(cnt)::BIGINT AS n_scheduled
FROM rec GROUP BY c
"""


L_DIVERSITY_THRESHOLD = 3


def q_l_diversity_audit(sf_dir: str):
    """L-DIVERSITY audit — the standard companion of ``k_anonymity``:
    a class of the (nation, segment) quasi-identifier is safe only if
    its SENSITIVE attribute (account-balance bracket, $1000 bins)
    takes >= l distinct values, else every member is inferable.
    Per-batch distinct (nat, seg, bracket) partials (bounded by the
    QI x bracket domain), one tiny exchange by nation, O(1) audit
    rows: class count, classes below l, customers exposed, and the
    minimum diversity."""
    from .pipelines.relational import bucketed_reduce

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        br = pc.divide(cents, 100_000).cast(pa.int64())  # $1000 bins
        g = (pa.table({"nat": t["c_nationkey"].cast(pa.int64()),
                       "seg": t["c_mktsegment"], "br": br})
             .group_by(["nat", "seg", "br"])
             .aggregate([("br", "count")]))
        return pa.table({"nat": g["nat"], "seg": g["seg"], "br": g["br"],
                         "n": g["br_count"].cast(pa.int64())})

    def bucket_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_classes": pa.nulls(0, pa.int64()),
                          "n_low_diversity": pa.nulls(0, pa.int64()),
                          "n_exposed": pa.nulls(0, pa.int64()),
                          "min_diversity": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.group_by(["nat", "seg", "br"]).aggregate([("n", "sum")])
             .group_by(["nat", "seg"])
             .aggregate([("br", "count"), ("n_sum", "sum")]))
        div = g["br_count"].to_numpy(zero_copy_only=False)
        size = g["n_sum_sum"].to_numpy(zero_copy_only=False)
        low = div < L_DIVERSITY_THRESHOLD
        return pa.table({
            "n_classes": pa.array([np.int64(len(div))], pa.int64()),
            "n_low_diversity": pa.array([np.int64(low.sum())], pa.int64()),
            "n_exposed": pa.array([np.int64(size[low].sum())], pa.int64()),
            "min_diversity": pa.array([np.int64(div.min())], pa.int64()),
        })

    parts = bucketed_reduce(
        cust.map_batches(partial, batch_format="pyarrow"),
        "nat", bucket_fn, n_buckets=8).to_pandas()
    return pa.table({
        "n_classes": pa.array([int(parts["n_classes"].sum())], pa.int64()),
        "n_low_diversity": pa.array([int(parts["n_low_diversity"].sum())],
                                    pa.int64()),
        "n_exposed": pa.array([int(parts["n_exposed"].sum())], pa.int64()),
        "min_diversity": pa.array([int(parts["min_diversity"].min())],
                                  pa.int64()),
    })


SQL_L_DIVERSITY_AUDIT = f"""
WITH cls AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)
               // 100000) AS div,
         count(*)::BIGINT AS size
  FROM customer GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_classes,
       sum(CASE WHEN div < {L_DIVERSITY_THRESHOLD} THEN 1
                ELSE 0 END)::BIGINT AS n_low_diversity,
       coalesce(sum(CASE WHEN div < {L_DIVERSITY_THRESHOLD} THEN size
                         ELSE 0 END), 0)::BIGINT AS n_exposed,
       min(div)::BIGINT AS min_diversity
FROM cls
"""


def q_lis_length(sf_dir: str):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE length of each user's
    event-value stream (values in cents, events ordered by (ts,
    event_id)) — the canonical order-statistics DP, run as the
    PATIENCE algorithm (O(n log n) tails array) inside one exchange by
    user: sequential per user, bounded by events-per-user (the
    documented partitioning assumption), users parallel across
    buckets. The oracle computes the same quantity as a recursive-CTE
    chain extension (chains grow one element per recursion level, so
    the fixpoint depth IS the answer) — two unrelated algorithms, one
    exact integer, the strongest kind of cross-check."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"],
                         "v": _cents(t["value"])})

    PREP_SCHEMA = pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                             ("eid", pa.int64()), ("v", pa.int64())])

    def lis_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "lis_len": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, v = u[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        import bisect
        out_u = u[starts]
        out_l = np.empty(len(starts), np.int64)
        for gi in range(len(starts)):
            tails: list[int] = []
            for j in range(starts[gi], ends[gi]):
                p = bisect.bisect_left(tails, v[j])
                if p == len(tails):
                    tails.append(int(v[j]))
                else:
                    tails[p] = int(v[j])
            out_l[gi] = len(tails)
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "lis_len": pa.array(out_l, pa.int64())})

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", lis_fn, n_buckets=32, schema=PREP_SCHEMA)


SQL_LIS_LENGTH = """
WITH RECURSIVE seq AS (
  SELECT user_id AS u,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), chain(u, i, v, len) AS (
  SELECT u, i, v, 1 FROM seq
  UNION
  SELECT s.u, s.i, s.v, c.len + 1
  FROM chain c JOIN seq s ON s.u = c.u AND s.i > c.i AND s.v > c.v
)
SELECT u AS user_id, max(len)::BIGINT AS lis_len
FROM chain GROUP BY u
"""


WAVELET_TOP_B = 8


def q_wavelet_synopsis_audit(sf_dir: str):
    """WAVELET SYNOPSIS error audit (Matias/Vitter/Wang SIGMOD'98) —
    keep only the TOP-B Haar coefficients by |value| (B=8, ties to
    (level, idx)), reconstruct the 32-slot daily series, and publish
    the per-slot reconstruction error EXACTLY: unnormalized Haar
    reconstruction divides by 2 once per level, so working in 1/32nds
    makes everything integer — slot value x32 = approx + sum over
    levels of (+/-) d_l[i >> l] * 2^(5-l), sign = bit (i >> (l-1)) & 1.
    Output: (idx, err32 = 32*y - rec32), the scaled residual the
    synopsis would pay on a point query. Same bounded driver fold as
    ``haar_wavelet``; the oracle ranks coefficients and evaluates the
    same closed-form reconstruction in SQL."""
    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    base = int(daily.index.min())
    y = np.zeros(HAAR_N, np.int64)
    y[daily.index.to_numpy(dtype=np.int64) - base] = daily.to_numpy()

    # forward transform (the haar_wavelet kernel)
    details = {}
    cur = y.copy()
    for lvl in range(1, 6):
        details[lvl] = cur[0::2] - cur[1::2]
        cur = cur[0::2] + cur[1::2]
    approx = int(cur[0])

    # rank detail coefficients by (|coeff| desc, level, idx); keep B
    rows = [(lvl, i, int(c)) for lvl, d in details.items()
            for i, c in enumerate(d)]
    rows.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    kept = {(lvl, i): c for lvl, i, c in rows[:WAVELET_TOP_B]}

    idx = np.arange(HAAR_N)
    rec32 = np.full(HAAR_N, approx, np.int64)
    for lvl in range(1, 6):
        d = np.array([kept.get((lvl, int(i)), 0) for i in idx >> lvl],
                     np.int64)
        sign = 1 - 2 * ((idx >> (lvl - 1)) & 1)
        rec32 += sign * d * (1 << (5 - lvl))
    return pd.DataFrame({"idx": idx.astype(np.int64),
                         "err32": 32 * y - rec32})


def _wavelet_synopsis_sql() -> str:
    sign = " + ".join(
        f"(CASE WHEN (g.idx >> {lvl - 1}) & 1 = 0 THEN 1 ELSE -1 END)"
        f" * coalesce(k{lvl}.d, 0) * {1 << (5 - lvl)}"
        for lvl in range(1, 6))
    joins = "\n".join(
        f"LEFT JOIN kept k{lvl} ON k{lvl}.level = {lvl}"
        f" AND k{lvl}.idx = g.idx >> {lvl}"
        for lvl in range(1, 6))
    return f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), grid AS (
  SELECT r AS idx FROM range({HAAR_N}) t(r)
), s0 AS (
  SELECT grid.idx, coalesce(d.y, 0)::BIGINT AS v
  FROM grid LEFT JOIN daily d
    ON d.day = grid.idx + (SELECT min(day) FROM daily)
), s1 AS (SELECT idx // 2 AS idx, sum(v)::BIGINT AS v,
                 sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
          FROM s0 GROUP BY idx // 2),
s2 AS (SELECT idx // 2 AS idx, sum(v)::BIGINT AS v,
              sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
       FROM s1 GROUP BY idx // 2),
s3 AS (SELECT idx // 2 AS idx, sum(v)::BIGINT AS v,
              sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
       FROM s2 GROUP BY idx // 2),
s4 AS (SELECT idx // 2 AS idx, sum(v)::BIGINT AS v,
              sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
       FROM s3 GROUP BY idx // 2),
s5 AS (SELECT idx // 2 AS idx, sum(v)::BIGINT AS v,
              sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)::BIGINT AS d
       FROM s4 GROUP BY idx // 2),
coeffs AS (
  SELECT 1 AS level, idx, d FROM s1 UNION ALL
  SELECT 2, idx, d FROM s2 UNION ALL
  SELECT 3, idx, d FROM s3 UNION ALL
  SELECT 4, idx, d FROM s4 UNION ALL
  SELECT 5, idx, d FROM s5
), kept AS (
  SELECT level, idx, d FROM (
    SELECT level, idx, d,
           row_number() OVER (ORDER BY abs(d) DESC, level, idx) AS rn
    FROM coeffs) t
  WHERE rn <= {WAVELET_TOP_B}
), approx AS (SELECT v FROM s5)
SELECT g.idx::BIGINT AS idx,
       (32 * s0.v - ((SELECT v FROM approx) + {sign}))::BIGINT AS err32
FROM grid g
JOIN s0 ON s0.idx = g.idx
{joins}
"""


MARKOV_TARGET = "purchase"


def q_markov_hitting_truncated(sf_dir: str):
    """TRUNCATED HITTING PROBABILITY of the event-type chain — for each
    state, P(reach 'purchase' within K=20 steps), the absorbing-chain
    companion of ``markov_stationary`` (conversion probability under
    the behavioral model): p_0(s) = [s = target];
    p_(k+1)(s) = 1 if s = target else sum_t P(s, t) p_k(t) — the
    target absorbs, dangling states contribute 0 (pagerank contract).
    Same one-exchange transition counts, same O(types) driver
    iteration, same round-6dp float contract; the oracle unrolls the
    20 steps as chained CTEs in identical op order."""
    states, mat = _event_transition_matrix(sf_dir)
    k = len(states)
    tgt = states.index(MARKOV_TARGET)
    p = np.zeros(k, np.float64)
    p[tgt] = 1.0
    for _ in range(MARKOV_ITERS):
        nxt = mat @ p
        nxt[tgt] = 1.0
        p = nxt
    return pd.DataFrame({"event_type": states, "p_hit": np.round(p, 6)})


def _markov_hitting_sql() -> str:
    iter_ctes = []
    prev = "p0"
    for i in range(1, MARKOV_ITERS + 1):
        iter_ctes.append(f"""
p{i} AS (
  SELECT s.et AS et,
         CASE WHEN s.et = '{MARKOV_TARGET}' THEN 1.0
              ELSE coalesce(sum(tr.n / dg.g * p.p), 0) END AS p
  FROM states s
  LEFT JOIN tr ON tr.src = s.et
  LEFT JOIN {prev} p ON p.et = tr.dst
  LEFT JOIN dg ON dg.src = s.et
  GROUP BY s.et
)""")
        prev = f"p{i}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), tr AS (
  SELECT event_type AS src, nxt AS dst, count(*)::DOUBLE AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
), states AS (
  SELECT src AS et FROM tr UNION SELECT dst FROM tr
), dg AS (
  SELECT src, sum(n) AS g FROM tr GROUP BY 1
), p0 AS (
  SELECT et, CASE WHEN et = '{MARKOV_TARGET}' THEN 1.0 ELSE 0.0 END AS p
  FROM states
),
{','.join(iter_ctes)}
SELECT et AS event_type, round(p, 6) AS p_hit FROM {prev}
"""


def q_skyline_3d(sf_dir: str):
    """3-D SKYLINE over parts — minimize price, maximize size, maximize
    name length (a synthetic third objective, documented as such):
    where the 2-D family's joint-CDF trick dies, the
    local-skyline-union identity still holds in ANY dimension
    (dominated-in-batch => dominated-globally, and a global skyline
    point survives its own batch), so each batch emits its local
    frontier via a vectorized O(batch^2) dominance matrix and the
    driver re-runs the identical kernel on the bounded candidate
    union. Duplicates on the frontier both survive (dominance needs
    one strict inequality), matching NOT EXISTS. The 3-D funnel bound
    is weaker than 2-D's (frontier <= distinct (size, namelen) pairs
    x batches) — the documented trade of dimensionality."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice",
                                "p_name"])

    def _skyline(key, c, s, nl):
        # dominated[j] = exists i: better-or-equal on all, strict on one
        le = c[:, None] <= c[None, :]
        ge_s = s[:, None] >= s[None, :]
        ge_l = nl[:, None] >= nl[None, :]
        strict = ((c[:, None] < c[None, :]) | (s[:, None] > s[None, :])
                  | (nl[:, None] > nl[None, :]))
        dom = (le & ge_s & ge_l & strict).any(axis=0)
        keep = ~dom
        return key[keep], c[keep], s[keep], nl[keep]

    def local(t: pa.Table) -> pa.Table:
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        s = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = np.array([len(x) for x in t["p_name"].to_pylist()], np.int64)
        key, c, s, nl = _skyline(key, c, s, nl)
        return pa.table({"p_partkey": pa.array(key, pa.int64()),
                         "price_cents": pa.array(c, pa.int64()),
                         "size": pa.array(s, pa.int64()),
                         "name_len": pa.array(nl, pa.int64())})

    # batch_size caps the O(batch^2) dominance matrix (~4 MB of bools)
    cand = ds.map_batches(local, batch_format="pyarrow",
                          batch_size=2048).to_pandas()
    key, c, s, nl = _skyline(cand["p_partkey"].to_numpy(),
                             cand["price_cents"].to_numpy(),
                             cand["size"].to_numpy(),
                             cand["name_len"].to_numpy())
    return pd.DataFrame({"p_partkey": key, "price_cents": c,
                         "size": s, "name_len": nl})


SQL_SKYLINE_3D = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS c,
         p_size::BIGINT AS s, length(p_name)::BIGINT AS nl
  FROM part
)
SELECT a.p_partkey, a.c AS price_cents, a.s AS size, a.nl AS name_len
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.c <= a.c AND b.s >= a.s AND b.nl >= a.nl
    AND (b.c < a.c OR b.s > a.s OR b.nl > a.nl))
"""


CACHE_INF = 1_000_000_000


def _cache_sim_prep(sf_dir: str):
    """Shared prep for the capacity-2 cache-replacement audits: events
    as (u, i, et, nu) with i the per-user position (ts, event_id) and
    nu the position of the NEXT occurrence of the same type (CACHE_INF
    if none) — the self-next-use a Belady simulation can carry in its
    state (a cached type's next use stays valid until its next hit,
    when it refreshes; so no lookahead table is ever consulted
    mid-stream)."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"],
                         "et": t["event_type"]})

    return ev.map_batches(prep, batch_format="pyarrow"), bucketed_reduce


def _cache_bucket_tables(t: pa.Table):
    """Sorted per-user (et codes, next-use) arrays + group bounds."""
    u = t["u"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False)
    eid = t["eid"].to_numpy(zero_copy_only=False)
    et = np.asarray(t["et"].to_pylist(), dtype=object)
    order = np.lexsort((eid, ts, u))
    u, et = u[order], et[order]
    n = len(u)
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], n]
    # next occurrence of the same (user, type): reversed last-seen scan
    nu = np.full(n, CACHE_INF, np.int64)
    last: dict = {}
    for j in range(n - 1, -1, -1):
        k = (u[j], et[j])
        if k in last:
            nu[j] = last[k] - 0            # absolute position
        last[k] = j
    return u, et, nu, starts, ends


_CACHE_PREP_SCHEMA = pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                                ("eid", pa.int64()), ("et", pa.string())])


def q_lru_cache_audit(sf_dir: str):
    """LRU CACHE SIMULATION (capacity 2) over each user's event-type
    stream — per-user hit counts of the classic online policy, the
    baseline half of the LRU-vs-Belady pair. One exchange by user;
    the simulation is inherently sequential per user (bounded by
    events-per-user, the documented partitioning assumption), users
    parallel across buckets. The oracle replays the identical
    automaton as a position-joined recursive CTE (state = the MRU
    ordered pair)."""
    ev, bucketed_reduce = _cache_sim_prep(sf_dir)

    def lru_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "hits": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u, et, _nu, starts, ends = _cache_bucket_tables(t)
        out_u = u[starts]
        out_h = np.empty(len(starts), np.int64)
        for gi in range(len(starts)):
            a = b = None
            hits = 0
            for j in range(starts[gi], ends[gi]):
                x = et[j]
                if x == a:
                    hits += 1
                elif x == b:
                    hits += 1
                    a, b = x, a
                else:
                    a, b = x, a            # evict LRU (old b)
            out_h[gi] = hits
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "hits": pa.array(out_h, pa.int64())})

    return bucketed_reduce(ev, "u", lru_fn, n_buckets=32,
                           schema=_CACHE_PREP_SCHEMA)


SQL_LRU_CACHE_AUDIT = """
WITH RECURSIVE seq AS (
  SELECT user_id AS u, event_type AS et,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events
), rec(u, i, a, b, hits) AS (
  SELECT u, i, et, '', 0 FROM seq WHERE i = 1
  UNION ALL
  SELECT s.u, s.i, s.et,
         CASE WHEN s.et = r.a THEN r.b
              WHEN s.et = r.b THEN r.a
              ELSE r.a END,
         r.hits + CASE WHEN s.et IN (r.a, r.b) THEN 1 ELSE 0 END
  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1
), last AS (
  SELECT u, hits, row_number() OVER (PARTITION BY u ORDER BY i DESC) AS rn
  FROM rec
)
SELECT u AS user_id, hits::BIGINT AS hits FROM last WHERE rn = 1
"""


def q_belady_cache_audit(sf_dir: str):
    """BELADY (offline-optimal MIN) CACHE SIMULATION, capacity 2 — the
    clairvoyant upper bound on any cache policy's hit count, per user:
    on a miss with a full cache, evict the resident whose NEXT USE is
    furthest away (ties — both never used again — evict the non-MRU
    slot, stated identically in both engines). The next-use values
    ride IN THE STATE (each type's self-next-use is precomputed once
    per position by a reversed scan / a lead() window; a cached
    type's carried value stays correct until its next hit refreshes
    it — so neither engine consults a lookahead table mid-stream).
    Same exchange, same bounded sequential-per-user contract as the
    LRU baseline; hits(Belady) >= hits(LRU) per user by optimality,
    asserted in tests."""
    ev, bucketed_reduce = _cache_sim_prep(sf_dir)

    def belady_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "hits": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u, et, nu, starts, ends = _cache_bucket_tables(t)
        out_u = u[starts]
        out_h = np.empty(len(starts), np.int64)
        for gi in range(len(starts)):
            a = b = None
            na = nb = 0
            hits = 0
            for j in range(starts[gi], ends[gi]):
                x, nx = et[j], int(nu[j])
                if x == a:
                    hits += 1
                    na = nx
                elif x == b:
                    hits += 1
                    a, b, na, nb = x, a, nx, na
                elif b is None:
                    a, b, na, nb = x, a, nx, na
                elif na > nb:
                    a, na = x, nx          # evict a (further next use)
                else:
                    a, b, na, nb = x, a, nx, na   # evict b (ties too)
            out_h[gi] = hits
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "hits": pa.array(out_h, pa.int64())})

    return bucketed_reduce(ev, "u", belady_fn, n_buckets=32,
                           schema=_CACHE_PREP_SCHEMA)


SQL_BELADY_CACHE_AUDIT = f"""
WITH RECURSIVE seq0 AS (
  SELECT user_id AS u, event_type AS et,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events
), seq AS (
  SELECT u, et, i,
         coalesce(lead(i) OVER (PARTITION BY u, et ORDER BY i),
                  {CACHE_INF}) AS nu
  FROM seq0
), rec(u, i, a, na, b, nb, hits) AS (
  SELECT u, i, et, nu, '', 0::BIGINT, 0 FROM seq WHERE i = 1
  UNION ALL
  SELECT s.u, s.i,
         s.et, s.nu,
         CASE WHEN s.et = r.a THEN r.b
              WHEN s.et = r.b THEN r.a
              WHEN r.b = '' THEN r.a
              WHEN r.na > r.nb THEN r.b
              ELSE r.a END,
         CASE WHEN s.et = r.a THEN r.nb
              WHEN s.et = r.b THEN r.na
              WHEN r.b = '' THEN r.na
              WHEN r.na > r.nb THEN r.nb
              ELSE r.na END,
         r.hits + CASE WHEN s.et IN (r.a, r.b) THEN 1 ELSE 0 END
  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1
), last AS (
  SELECT u, hits, row_number() OVER (PARTITION BY u ORDER BY i DESC) AS rn
  FROM rec
)
SELECT u AS user_id, hits::BIGINT AS hits FROM last WHERE rn = 1
"""


def q_t_closeness_audit(sf_dir: str):
    """T-CLOSENESS audit — the third leg of the privacy trio
    (k-anonymity: class size; l-diversity: distinct sensitive values;
    t-closeness: the class's sensitive DISTRIBUTION must stay close to
    the global one). Distance = the 1-D Earth Mover's Distance over
    the ordered $1000 acctbal brackets, which collapses to
    sum_b |CDF_class(b) - CDF_global(b)| — published as an EXACT
    reduced rational per (nation, segment) class: both CDFs are
    integer counts over denominators (n_class, n_total), so each term
    cross-multiplies inside int64 and the sum has denominator
    n_class * n_total. Plan: one bounded exchange of (class, bracket)
    count partials (the QI x bracket domain); the global distribution
    is the class-sum (computed from the SAME partials, no second
    scan); per-class EMD is a vectorized scan over O(brackets)."""
    from fractions import Fraction

    from .pipelines.relational import bucketed_reduce

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        br = pc.divide(cents, 100_000).cast(pa.int64())
        g = (pa.table({"nat": t["c_nationkey"].cast(pa.int64()),
                       "seg": t["c_mktsegment"], "br": br})
             .group_by(["nat", "seg", "br"])
             .aggregate([("br", "count")]))
        return pa.table({"nat": g["nat"], "seg": g["seg"], "br": g["br"],
                         "n": g["br_count"].cast(pa.int64())})

    parts = (cust.map_batches(partial, batch_format="pyarrow")
             .to_pandas()                    # O(blocks x QI x brackets)
             .groupby(["nat", "seg", "br"], as_index=False)["n"].sum())
    total = int(parts["n"].sum())
    brackets = np.sort(parts["br"].unique())
    glob = (parts.groupby("br")["n"].sum()
            .reindex(brackets, fill_value=0).to_numpy(dtype=np.int64))
    glob_cdf = np.cumsum(glob)

    rows = []
    for (nat, seg), g in parts.groupby(["nat", "seg"]):
        cls = (g.set_index("br")["n"]
               .reindex(brackets, fill_value=0).to_numpy(dtype=np.int64))
        n_cls = int(cls.sum())
        cls_cdf = np.cumsum(cls)
        # sum_b |cls_cdf/n_cls - glob_cdf/total|: exact over common
        # denominator n_cls * total
        num = int(np.abs(cls_cdf * total - glob_cdf * n_cls).sum())
        f = Fraction(num, n_cls * total)
        rows.append((int(nat), seg, f.numerator, f.denominator))
    out = pd.DataFrame(rows, columns=["nat", "seg", "emd_num", "emd_den"])
    return out.astype({"nat": "int64", "emd_num": "int64",
                       "emd_den": "int64"})


SQL_T_CLOSENESS_AUDIT = """
WITH c AS (
  SELECT c_nationkey::BIGINT AS nat, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS br
  FROM customer
), cls AS (
  SELECT nat, seg, br, count(*)::BIGINT AS n FROM c GROUP BY 1, 2, 3
), brackets AS (SELECT DISTINCT br FROM c),
classes AS (
  SELECT nat, seg, sum(n)::BIGINT AS n_cls FROM cls GROUP BY 1, 2
), grid AS (
  SELECT cl.nat, cl.seg, cl.n_cls, b.br, coalesce(x.n, 0)::BIGINT AS n
  FROM classes cl CROSS JOIN brackets b
  LEFT JOIN cls x ON x.nat = cl.nat AND x.seg = cl.seg AND x.br = b.br
), gl AS (
  SELECT br, sum(n)::BIGINT AS gn FROM cls GROUP BY 1
), cdf AS (
  SELECT g.nat, g.seg, g.n_cls, g.br,
         sum(g.n) OVER (PARTITION BY g.nat, g.seg
                        ORDER BY g.br)::BIGINT AS ccdf,
         (SELECT sum(gn) FROM gl g2 WHERE g2.br <= g.br)::BIGINT AS gcdf,
         (SELECT sum(gn) FROM gl)::BIGINT AS total
  FROM grid g
), emd AS (
  SELECT nat, seg,
         sum(abs(ccdf * total - gcdf * n_cls))::BIGINT AS num,
         (any_value(n_cls) * any_value(total))::BIGINT AS den
  FROM cdf GROUP BY 1, 2
)
SELECT nat, seg,
       (num / gcd(num, den))::BIGINT AS emd_num,
       (den / gcd(num, den))::BIGINT AS emd_den
FROM emd
"""


SAX_SEGMENTS = 8


def q_sax_symbols(sf_dir: str):
    """SAX SYMBOLIZATION of the daily event-count series (Lin/Keogh
    2003 — the discretization behind time-series indexing): PAA first
    (32 zero-padded days -> 8 segments of 4, each an exact rational
    mean num/4), then each segment discretizes against the series' own
    QUARTILE breakpoints (order statistics of the 32 daily counts —
    exact integers, unlike the classic Gaussian breakpoints, which
    are irrational and would break the hash gate). Symbol = # of
    breakpoints strictly below the segment mean, compared by
    cross-multiplication (num vs 4 * Q), so knife-edge means cannot
    misround. Same bounded calendar fold as the wavelet family."""
    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    base = int(daily.index.min())
    y = np.zeros(HAAR_N, np.int64)
    y[daily.index.to_numpy(dtype=np.int64) - base] = daily.to_numpy()

    ys = np.sort(y)
    # lower-quartile order statistics: ranks 8, 16, 24 of 32 (1-based)
    qs = ys[[HAAR_N // 4 - 1, HAAR_N // 2 - 1, 3 * HAAR_N // 4 - 1]]
    seg_len = HAAR_N // SAX_SEGMENTS
    num = y.reshape(SAX_SEGMENTS, seg_len).sum(axis=1)  # mean = num/4
    sym = (num[:, None] > seg_len * qs[None, :]).sum(axis=1)
    return pd.DataFrame({"segment": np.arange(SAX_SEGMENTS, dtype=np.int64),
                         "paa_num": num.astype(np.int64),
                         "symbol": sym.astype(np.int64)})


def _sax_sql() -> str:
    n, k = HAAR_N, SAX_SEGMENTS
    seg_len = n // k
    return f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), grid AS (
  SELECT r AS idx FROM range({n}) t(r)
), s0 AS (
  SELECT grid.idx, coalesce(d.y, 0)::BIGINT AS v
  FROM grid LEFT JOIN daily d
    ON d.day = grid.idx + (SELECT min(day) FROM daily)
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rk FROM s0
), qs AS (
  SELECT max(CASE WHEN rk = {n // 4} THEN v END) AS q1,
         max(CASE WHEN rk = {n // 2} THEN v END) AS q2,
         max(CASE WHEN rk = {3 * n // 4} THEN v END) AS q3
  FROM ranked
), seg AS (
  SELECT idx // {seg_len} AS segment, sum(v)::BIGINT AS paa_num
  FROM s0 GROUP BY idx // {seg_len}
)
SELECT s.segment::BIGINT AS segment, s.paa_num,
       ((CASE WHEN s.paa_num > {seg_len} * q.q1 THEN 1 ELSE 0 END)
        + (CASE WHEN s.paa_num > {seg_len} * q.q2 THEN 1 ELSE 0 END)
        + (CASE WHEN s.paa_num > {seg_len} * q.q3 THEN 1 ELSE 0 END)
       )::BIGINT AS symbol
FROM seg s, qs q
"""


CDC_WINDOW = 16
CDC_PRIME = 1099511628211            # FNV prime, odd -> full-period mod 2^64
CDC_MASK = 64                        # boundary when h % 64 == 0 (~64-char chunks)
_CDC_POWERS = [pow(CDC_PRIME, m, 1 << 64) for m in range(CDC_WINDOW)]


def _cdc_cuts(text: str) -> np.ndarray:
    """1-based cut positions (chunk ends) of content-defined chunking:
    polynomial rolling hash over a 16-char window (code points, wrapped
    uint64), boundary where h % 64 == 0, plus the final position. The
    window dot-product runs as 16 shifted vector multiply-adds — a
    Python loop over WINDOW OFFSETS, never characters."""
    n = len(text)
    if n == 0:
        return np.empty(0, np.int64)
    if n < CDC_WINDOW:
        return np.array([n], np.int64)
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    m = n - CDC_WINDOW + 1               # windows; end positions 16..n
    h = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(CDC_WINDOW):
            h += c[k:k + m] * np.uint64(_CDC_POWERS[CDC_WINDOW - 1 - k])
    ends = np.flatnonzero(h % np.uint64(CDC_MASK) == 0) + CDC_WINDOW
    if len(ends) == 0 or ends[-1] != n:
        ends = np.r_[ends, n]
    return ends.astype(np.int64)


def q_cdc_chunks(sf_dir: str):
    """CONTENT-DEFINED CHUNKING (Rabin-style rolling hash — the
    LBFS/storage-dedup classic): split every document where a 16-char
    polynomial rolling hash hits h % 64 == 0, so chunk boundaries
    follow CONTENT, not offsets — an insertion early in a doc shifts
    every fixed-size block but leaves all later CDC chunks identical
    (the property that makes dedup storage work; asserted in tests).
    Output per doc: chunk count and longest chunk. Fully vectorized
    per batch (the window dot is 16 shifted multiply-adds in wrapped
    uint64); the oracle restates the same hash as a 16-term
    sum-of-unicode() polynomial mod 2^64 per position."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk_stats(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_n, out_mx = [], []
        for txt in t["text"].to_pylist():
            cuts = _cdc_cuts(txt or "")
            lens = np.diff(np.r_[0, cuts])
            out_n.append(len(cuts))
            out_mx.append(int(lens.max()) if len(lens) else 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chunks": pa.array(out_n, pa.int64()),
                         "longest_chunk": pa.array(out_mx, pa.int64())})

    return docs.map_batches(chunk_stats, batch_format="pyarrow")


def _cdc_chunks_ctes() -> str:
    # engine pairs char (i-15+k) with P^(15-k); substituting k' = 15-k,
    # char (i-k') pairs with P^(k')
    terms = " + ".join(
        f"unicode(substr(text, (i - {k})::INT, 1))::HUGEINT"
        f" * {_CDC_POWERS[k]}::HUGEINT"
        for k in range(CDC_WINDOW))
    return f"""
pos AS (
  SELECT doc_id, text,
         unnest(range({CDC_WINDOW}, length(text) + 1)) AS i
  FROM documents
), hashed AS (
  SELECT doc_id, i,
         ({terms}) % 18446744073709551616::HUGEINT AS h
  FROM pos
), bnd AS (
  SELECT doc_id, i::BIGINT AS i FROM hashed WHERE h % {CDC_MASK} = 0
  UNION
  SELECT doc_id, length(text)::BIGINT FROM documents
  WHERE length(text) > 0
), cuts AS (
  SELECT doc_id, i,
         lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM bnd
), chunks AS (
  SELECT c.doc_id, c.i AS cid, (c.i - c.prev)::BIGINT AS clen,
         substr(d.text, (c.prev + 1)::INT, (c.i - c.prev)::INT) AS chunk
  FROM cuts c JOIN documents d USING (doc_id)
)"""


def _cdc_chunks_sql() -> str:
    return f"""
WITH {_cdc_chunks_ctes()}
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       max(clen)::BIGINT AS longest_chunk
FROM chunks GROUP BY doc_id
"""


def q_cdc_dedup_ratio(sf_dir: str):
    """STORAGE DEDUP RATIO under content-defined chunking — total vs
    DISTINCT chunks across the whole corpus (what a dedup store would
    actually hold): near-duplicate docs share every chunk outside the
    edited region, so the ratio directly measures the redundancy CDC
    recovers. Plan: per-batch chunk rows -> one exchange by chunk
    content (hash-bucketed), per-bucket distinct partials, O(buckets)
    rows folded on the driver. Chunk payloads cross the exchange once;
    nothing row-shaped lands on the driver."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk_rows(t: pa.Table) -> pa.Table:
        out = []
        for txt in t["text"].to_pylist():
            txt = txt or ""
            cuts = _cdc_cuts(txt)
            prev = 0
            for c in cuts:
                out.append(txt[prev:c])
                prev = c
        return pa.table({"chunk": pa.array(out, pa.string())})

    def distinct_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_total": pa.nulls(0, pa.int64()),
                             "n_distinct": pa.nulls(0, pa.int64())})
        return pa.table({
            "n_total": pa.array([t.num_rows], pa.int64()),
            "n_distinct": pa.array(
                [pc.count_distinct(t["chunk"]).as_py()], pa.int64()),
        })

    chunks = docs.map_batches(chunk_rows, batch_format="pyarrow")
    parts = bucketed_reduce(
        chunks, "chunk", distinct_partial, n_buckets=16,
        schema=pa.schema([("chunk", pa.string())])).to_pandas()
    return pa.table({
        "n_total": pa.array([int(parts["n_total"].sum())], pa.int64()),
        "n_distinct": pa.array([int(parts["n_distinct"].sum())],
                               pa.int64()),
    })


def _cdc_dedup_sql() -> str:
    return f"""
WITH {_cdc_chunks_ctes()}
SELECT count(*)::BIGINT AS n_total,
       count(DISTINCT chunk)::BIGINT AS n_distinct
FROM chunks
"""


def q_mann_whitney_u(sf_dir: str):
    """MANN-WHITNEY U (Wilcoxon rank-sum) between 'purchase' and
    'view' event values — the standard nonparametric two-sample test,
    published EXACTLY: 2U = 2 * #(purchase > view pairs) + #(ties), an
    integer, so no midrank floats ever exist. The pair count never
    enumerates pairs: both samples fold to cents-domain HISTOGRAM
    partials (O(blocks x bins), the value domain is bounded), and
    U = sum_v p[v] * (#views below v) + ties/2 is one vectorized
    cumsum pass over the merged support — O(bins) driver work where
    the textbook formula is O(n^2). The oracle IS the quadratic pair
    join, feasible at gate scale — complements ``ks_statistic`` (CDF
    sup-norm) with the rank-sum functional."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "view"]))
        t = t.filter(m)
        g = (pa.table({"et": t["event_type"], "c": _cents(t["value"])})
             .group_by(["et", "c"]).aggregate([("c", "count")]))
        return pa.table({"et": g["et"], "c": g["c"],
                         "n": g["c_count"].cast(pa.int64())})

    parts = (ev.map_batches(hist_partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["et", "c"], as_index=False)["n"].sum())
    support = np.sort(parts["c"].unique())
    p = (parts[parts["et"] == "purchase"].set_index("c")["n"]
         .reindex(support, fill_value=0).to_numpy(dtype=np.int64))
    v = (parts[parts["et"] == "view"].set_index("c")["n"]
         .reindex(support, fill_value=0).to_numpy(dtype=np.int64))
    v_below = np.r_[0, np.cumsum(v)[:-1]]
    two_u = int(2 * (p * v_below).sum() + (p * v).sum())
    return pd.DataFrame({
        "n_purchase": np.array([p.sum()], np.int64),
        "n_view": np.array([v.sum()], np.int64),
        "two_u": np.array([two_u], np.int64),
    })


SQL_MANN_WHITNEY_U = """
WITH s AS (
  SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'view')
), pairs AS (
  SELECT sum(CASE WHEN p.c > v.c THEN 2
                  WHEN p.c = v.c THEN 1 ELSE 0 END)::BIGINT AS two_u
  FROM (SELECT c FROM s WHERE et = 'purchase') p
  CROSS JOIN (SELECT c FROM s WHERE et = 'view') v
)
SELECT (SELECT count(*) FROM s WHERE et = 'purchase')::BIGINT AS n_purchase,
       (SELECT count(*) FROM s WHERE et = 'view')::BIGINT AS n_view,
       two_u
FROM pairs
"""


def q_gorilla_dod_bits(sf_dir: str):
    """GORILLA-STYLE timestamp compression estimate (Facebook Gorilla,
    VLDB'15) — per user, the exact bit cost of delta-of-delta encoding
    the event-time stream in SECONDS: dod = 0 costs 1 bit, else the
    header+payload ladder (7-bit payload -> 9 total, 9 -> 12, 12 -> 16,
    else 36), the first event a 64-bit anchor and the second a 32-bit
    raw delta. The time-series-DB answer to 'why sorted-by-time
    layout matters', published as (user, n_events, total_bits). One
    exchange by user; the dod classification is one vectorized
    np.select per bucket. The oracle restates the ladder with two
    lag() windows and the same CASE bands."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        # full-us ts is the ORDER key (matching the oracle's window);
        # the encoded value is its seconds truncation
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"]})

    def bits_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_events": pa.nulls(0, pa.int64()),
                          "total_bits": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, sec = u[order], ts[order] // 1_000_000
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, cnt)
        delta = np.where(pos >= 1, sec - np.r_[0, sec[:-1]], 0)
        dod = np.where(pos >= 2, delta - np.r_[0, delta[:-1]], 0)
        a = np.abs(dod)
        bits = np.select(
            [pos == 0, pos == 1, dod == 0, a < (1 << 6), a < (1 << 8),
             a < (1 << 11)],
            [64, 32, 1, 9, 12, 16], default=36).astype(np.int64)
        total = np.add.reduceat(bits, starts)
        return pa.table({"user_id": pa.array(u[starts], pa.int64()),
                         "n_events": pa.array(cnt, pa.int64()),
                         "total_bits": pa.array(total, pa.int64())})

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", bits_fn, n_buckets=32,
        schema=pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                          ("eid", pa.int64())]))


SQL_GORILLA_DOD_BITS = """
WITH seq AS (
  SELECT user_id AS u,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         row_number() OVER w AS i,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS prev_sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT), 2) OVER w AS prev2_sec
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), bits AS (
  SELECT u,
         CASE WHEN i = 1 THEN 64
              WHEN i = 2 THEN 32
              ELSE (
                CASE WHEN (sec - prev_sec) - (prev_sec - prev2_sec) = 0
                     THEN 1
                     WHEN abs((sec - prev_sec) - (prev_sec - prev2_sec))
                          < 64 THEN 9
                     WHEN abs((sec - prev_sec) - (prev_sec - prev2_sec))
                          < 256 THEN 12
                     WHEN abs((sec - prev_sec) - (prev_sec - prev2_sec))
                          < 2048 THEN 16
                     ELSE 36 END)
         END AS b
  FROM seq
)
SELECT u AS user_id, count(*)::BIGINT AS n_events,
       sum(b)::BIGINT AS total_bits
FROM bits GROUP BY u
"""


VOPT_BUCKETS = 4


def q_voptimal_histogram(sf_dir: str):
    """V-OPTIMAL HISTOGRAM (Jagadish et al., VLDB'98) of the daily
    event counts — the B=4 bucket boundaries minimizing total
    within-bucket SSE, the construction every optimizer's histogram
    chapter cites. Exactness: SSE(bucket) = ssq - S^2/n is a rational
    with denominator n_b, the total has denominator n1*n2*n3*n4, and
    the argmin compares candidates by CROSS-MULTIPLICATION (Python
    big ints / HUGEINT — products clear int64), ties to the
    lexicographically smallest boundary triple on BOTH engines. The
    driver enumerates all C(29, 3) triples over exact Fractions from
    the same O(blocks x days) count partials (production would run
    the O(n^2 B) DP on the identical prefix arrays; enumeration makes
    the tie-break contract explicit); the oracle enumerates the same
    triples and decides the argmin with a NOT EXISTS
    cross-multiplication. Output: boundaries (last day-index of
    buckets 1-3) + total SSE as a reduced rational."""
    from fractions import Fraction

    US_DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), US_DAY).cast(pa.int64())
        g = (pa.table({"day": day}).group_by(["day"])
             .aggregate([("day", "count")]))
        return pa.table({"day": g["day"],
                         "y": g["day_count"].cast(pa.int64())})

    parts = ev.map_batches(day_partial, batch_format="pyarrow").to_pandas()
    daily = parts.groupby("day")["y"].sum().sort_index()
    y = daily.to_numpy(dtype=np.int64)
    n = len(y)
    pre = np.concatenate([[0], np.cumsum(y)])
    pre2 = np.concatenate([[0], np.cumsum(y * y)])

    def sse(i, j):                       # bucket = days i..j (1-based, incl)
        s = int(pre[j] - pre[i - 1])
        q = int(pre2[j] - pre2[i - 1])
        return Fraction(q) - Fraction(s * s, j - i + 1)

    best = None
    best_b = None
    for b1 in range(1, n - 2):
        for b2 in range(b1 + 1, n - 1):
            for b3 in range(b2 + 1, n):
                tot = (sse(1, b1) + sse(b1 + 1, b2)
                       + sse(b2 + 1, b3) + sse(b3 + 1, n))
                if best is None or tot < best:
                    best, best_b = tot, (b1, b2, b3)
    return pd.DataFrame({
        "b1": np.array([best_b[0]], np.int64),
        "b2": np.array([best_b[1]], np.int64),
        "b3": np.array([best_b[2]], np.int64),
        "sse_num": np.array([best.numerator], np.int64),
        "sse_den": np.array([best.denominator], np.int64),
    })


SQL_VOPTIMAL_HISTOGRAM = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), d AS (
  SELECT y, row_number() OVER (ORDER BY day) AS i FROM daily
), p AS (
  SELECT i, sum(y) OVER (ORDER BY i)::BIGINT AS pre,
         sum(y * y) OVER (ORDER BY i)::BIGINT AS pre2
  FROM d
), nn AS (SELECT max(i)::BIGINT AS n FROM p),
pz AS (SELECT 0::BIGINT AS i, 0::BIGINT AS pre, 0::BIGINT AS pre2
       UNION ALL SELECT i, pre, pre2 FROM p),
-- SSE over common denominator: num/den with den = product of lengths
cand AS (
  SELECT b1.i AS b1, b2.i AS b2, b3.i AS b3,
         (b1.i)::HUGEINT AS l1, (b2.i - b1.i)::HUGEINT AS l2,
         (b3.i - b2.i)::HUGEINT AS l3, (nn.n - b3.i)::HUGEINT AS l4,
         (p1.pre2 - z.pre2)::HUGEINT AS q1,
         (p2.pre2 - p1.pre2)::HUGEINT AS q2,
         (p3.pre2 - p2.pre2)::HUGEINT AS q3,
         (pn.pre2 - p3.pre2)::HUGEINT AS q4,
         (p1.pre - z.pre)::HUGEINT AS s1,
         (p2.pre - p1.pre)::HUGEINT AS s2,
         (p3.pre - p2.pre)::HUGEINT AS s3,
         (pn.pre - p3.pre)::HUGEINT AS s4
  FROM p b1 JOIN p b2 ON b2.i > b1.i JOIN p b3 ON b3.i > b2.i, nn,
       pz z, p p1, p p2, p p3, p pn
  WHERE b3.i < nn.n AND z.i = 0 AND p1.i = b1.i AND p2.i = b2.i
    AND p3.i = b3.i AND pn.i = nn.n
), scored AS (
  SELECT b1, b2, b3,
         ((q1 * l1 - s1 * s1) * l2 * l3 * l4
          + (q2 * l2 - s2 * s2) * l1 * l3 * l4
          + (q3 * l3 - s3 * s3) * l1 * l2 * l4
          + (q4 * l4 - s4 * s4) * l1 * l2 * l3) AS num,
         (l1 * l2 * l3 * l4) AS den
  FROM cand
), win AS (
  SELECT * FROM scored a
  WHERE NOT EXISTS (
    SELECT 1 FROM scored x
    WHERE x.num * a.den < a.num * x.den
       OR (x.num * a.den = a.num * x.den
           AND (x.b1, x.b2, x.b3) < (a.b1, a.b2, a.b3)))
)
SELECT b1::BIGINT AS b1, b2::BIGINT AS b2, b3::BIGINT AS b3,
       (num / gcd(num, den))::BIGINT AS sse_num,
       (den / gcd(num, den))::BIGINT AS sse_den
FROM win
"""


CDC_STOP_DF = 64


def q_cdc_shared_chunks(sf_dir: str):
    """CDC-BASED NEAR-DUP SIGNAL — doc pairs sharing >= 2 distinct CDC
    chunks, the THIRD dedup modality next to MinHash (probabilistic)
    and prefix-filtered Jaccard (exact set similarity): two docs that
    share whole content-defined chunks share verbatim runs, the
    storage-dedup notion of similarity. Chunks resident in more than
    64 docs are STOP-CHUNKS and excluded (the stopgram_coverage
    contract — a universal boilerplate chunk would otherwise fan out
    quadratically at corpus scale; the cap bounds any chunk's pair
    contribution at 64^2). Plan: distinct (chunk, doc) rows -> one
    exchange by chunk (every chunk's doc set co-locates; drop stop
    chunks; emit its pairs) -> one exchange by the pair's first doc to
    sum shared-chunk counts -> filter >= 2. Nothing wider than
    O(pairs-above-floor) shuffles."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_c, out_d = [], []
        for k, txt in enumerate(t["text"].to_pylist()):
            txt = txt or ""
            cuts = _cdc_cuts(txt)
            prev = 0
            seen = set()
            for c in cuts:
                seen.add(txt[prev:c])
                prev = int(c)
            out_c.extend(seen)
            out_d.extend([int(ids[k])] * len(seen))
        return pa.table({"chunk": pa.array(out_c, pa.string()),
                         "doc": pa.array(out_d, pa.int64())})

    def pair_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.nulls(0, pa.int64()),
                          "b": pa.nulls(0, pa.int64()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        # factorize chunks once; only MULTI-doc chunks (a tiny minority)
        # ever reach the pair loop — singletons drop vectorized
        codes = pd.factorize(t["chunk"].to_pandas())[0]
        doc = t["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, codes))
        codes, doc = codes[order], doc[order]
        n = len(codes)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        cnt = np.diff(np.r_[starts, n])
        out_a, out_b = [], []
        for gi in np.flatnonzero((cnt >= 2) & (cnt <= CDC_STOP_DF)):
            d = doc[starts[gi]:starts[gi] + cnt[gi]]   # distinct per doc
            i, j = np.triu_indices(len(d), k=1)
            out_a.append(d[i])
            out_b.append(d[j])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        p = pd.DataFrame({"a": a, "b": b}).groupby(["a", "b"],
                                                   as_index=False).size()
        return pa.table({"a": pa.array(p["a"], pa.int64()),
                         "b": pa.array(p["b"], pa.int64()),
                         "n": pa.array(p["size"], pa.int64())})

    chunks = docs.map_batches(chunk_rows, batch_format="pyarrow")
    pairs = bucketed_reduce(
        chunks, "chunk", pair_fn, n_buckets=16,
        schema=pa.schema([("chunk", pa.string()), ("doc", pa.int64())]))

    def sum_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.nulls(0, pa.int64()),
                          "b": pa.nulls(0, pa.int64()),
                          "n_shared": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by(["a", "b"]).aggregate([("n", "sum")])
        m = pc.greater_equal(g["n_sum"], 2)
        g = g.filter(m)
        return pa.table({"a": g["a"], "b": g["b"],
                         "n_shared": g["n_sum"].cast(pa.int64())})

    return bucketed_reduce(
        drop_empty_blocks(pairs), "a", sum_fn, n_buckets=16,
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("n", pa.int64())]))


def _cdc_shared_sql() -> str:
    return f"""
WITH {_cdc_chunks_ctes()}
, dc AS (SELECT DISTINCT doc_id, chunk FROM chunks),
keep AS (
  SELECT chunk FROM dc GROUP BY chunk
  HAVING count(*) BETWEEN 2 AND {CDC_STOP_DF}
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS n_shared
  FROM dc x JOIN dc y ON y.chunk = x.chunk AND y.doc_id > x.doc_id
  JOIN keep k ON k.chunk = x.chunk
  GROUP BY 1, 2
)
SELECT a, b, n_shared FROM pairs WHERE n_shared >= 2
"""


LAYOUT_QUERIES = [
    # (qid, plo_pct, phi_pct, slo_pct, shi_pct) of each key's span
    (1, 20, 30, 0, 100),     # narrow partkey band, all suppliers
    (2, 0, 100, 45, 55),     # all parts, narrow suppkey band
    (3, 40, 50, 40, 50),     # small square
    (4, 10, 90, 10, 90),     # large square
]


def q_layout_prune_compare(sf_dir: str):
    """ZONE-MAP PRUNING under three physical layouts — the payoff
    measurement for the zorder/hilbert work: partition lineitem 64
    ways by (a) partkey range (single-key sort), (b) Morton zcode
    top-6 bits, (c) Hilbert hcode top-6 bits, build each partition's
    (partkey, suppkey) min/max zone map, and for four literal range
    rectangles count the partitions a reader MUST touch (zone box
    intersects the query box). Hilbert's tighter locality shows up
    directly as fewer touched partitions on 2-D rectangles, while the
    single-key sort wins only on its own key. One scan computes all
    three codes and folds O(layouts x 64) zone partials; no shuffle.
    The oracle recomputes both space-filling codes with the unrolled
    bit-interleave / 16-level CTEs and the same intersection CASE."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def mm_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "pmin": pa.array([pc.min(t["l_partkey"]).as_py()], pa.int64()),
            "pmax": pa.array([pc.max(t["l_partkey"]).as_py()], pa.int64()),
            "smin": pa.array([pc.min(t["l_suppkey"]).as_py()], pa.int64()),
            "smax": pa.array([pc.max(t["l_suppkey"]).as_py()], pa.int64()),
        })

    pmin = smin = pmax = smax = None
    for r in ds.map_batches(mm_partial, batch_format="pyarrow").take_all():
        pmin = r["pmin"] if pmin is None else min(pmin, r["pmin"])
        pmax = r["pmax"] if pmax is None else max(pmax, r["pmax"])
        smin = r["smin"] if smin is None else min(smin, r["smin"])
        smax = r["smax"] if smax is None else max(smax, r["smax"])
    pspan = max(pmax - pmin, 1)
    sspan = max(smax - smin, 1)

    def zone_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = (pk - pmin) * 65535 // pspan
        gy = (sk - smin) * 65535 // sspan
        z = (_part1by1(gx) | (_part1by1(gy) << np.uint64(1))).astype(np.int64)
        parts = {
            "sorted": gx >> 10,               # top 6 of 16 bits, 64 parts
            "zorder": z >> 26,
            "hilbert": _hilbert_d(gx, gy) >> 26,
        }
        frames = []
        for name, pid in parts.items():
            df = pd.DataFrame({"pid": pid, "pk": pk, "sk": sk})
            g = df.groupby("pid").agg(pmin=("pk", "min"),
                                      pmax=("pk", "max"),
                                      smin=("sk", "min"),
                                      smax=("sk", "max")).reset_index()
            g.insert(0, "layout", name)
            frames.append(g)
        out = pd.concat(frames)
        return pa.Table.from_pandas(out, preserve_index=False)

    zones = (ds.map_batches(zone_partial, batch_format="pyarrow")
             .to_pandas()                     # O(blocks x 3 x 64)
             .groupby(["layout", "pid"])
             .agg(pmin=("pmin", "min"), pmax=("pmax", "max"),
                  smin=("smin", "min"), smax=("smax", "max"))
             .reset_index())

    rows = []
    for qid, plo, phi, slo, shi in LAYOUT_QUERIES:
        qplo = pmin + pspan * plo // 100
        qphi = pmin + pspan * phi // 100
        qslo = smin + sspan * slo // 100
        qshi = smin + sspan * shi // 100
        hit = ((zones["pmin"] <= qphi) & (zones["pmax"] >= qplo)
               & (zones["smin"] <= qshi) & (zones["smax"] >= qslo))
        for layout, n in zones[hit].groupby("layout").size().items():
            rows.append((layout, qid, int(n)))
    return (pd.DataFrame(rows, columns=["layout", "qid", "n_parts"])
            .astype({"qid": "int64", "n_parts": "int64"}))


def _layout_prune_sql() -> str:
    interleave = " + ".join(
        [f"(((gx0 >> {i}) & 1) << {2 * i})" for i in range(16)]
        + [f"(((gy0 >> {i}) & 1) << {2 * i + 1})" for i in range(16)])
    hctes = []
    prev = "g"
    for lvl, s in enumerate(1 << np.arange(15, -1, -1)):
        s = int(s)
        q = (f"CASE WHEN (x & {s}) > 0 THEN "
             f"(CASE WHEN (y & {s}) > 0 THEN 2 ELSE 3 END) "
             f"ELSE (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) END")
        nx = (f"CASE WHEN (y & {s}) > 0 THEN x "
              f"WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END")
        ny = (f"CASE WHEN (y & {s}) > 0 THEN y "
              f"WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END")
        hctes.append(f"""
h{lvl} AS (
  SELECT pk, sk, gx0, gy0,
         d + {s * s}::BIGINT * ({q}) AS d, {nx} AS x, {ny} AS y
  FROM {prev}
)""")
        prev = f"h{lvl}"
    qrows = ", ".join(f"({qid}, {plo}, {phi}, {slo}, {shi})"
                      for qid, plo, phi, slo, shi in LAYOUT_QUERIES)
    return f"""
WITH mm AS (
  SELECT min(l_partkey) AS pmin,
         greatest(max(l_partkey) - min(l_partkey), 1) AS pspan,
         min(l_suppkey) AS smin,
         greatest(max(l_suppkey) - min(l_suppkey), 1) AS sspan
  FROM lineitem
), g AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, 0::BIGINT AS d,
         (l_partkey - mm.pmin) * 65535 // mm.pspan AS gx0,
         (l_suppkey - mm.smin) * 65535 // mm.sspan AS gy0,
         (l_partkey - mm.pmin) * 65535 // mm.pspan AS x,
         (l_suppkey - mm.smin) * 65535 // mm.sspan AS y
  FROM lineitem, mm
),
{','.join(hctes)}
, coded AS (
  SELECT pk, sk,
         (gx0 >> 10)::BIGINT AS sorted_pid,
         (({interleave}) >> 26)::BIGINT AS zorder_pid,
         (d >> 26)::BIGINT AS hilbert_pid
  FROM {prev}
), zones AS (
  SELECT 'sorted' AS layout, sorted_pid AS pid,
         min(pk) AS pmin, max(pk) AS pmax,
         min(sk) AS smin, max(sk) AS smax
  FROM coded GROUP BY 2
  UNION ALL
  SELECT 'zorder', zorder_pid, min(pk), max(pk), min(sk), max(sk)
  FROM coded GROUP BY 2
  UNION ALL
  SELECT 'hilbert', hilbert_pid, min(pk), max(pk), min(sk), max(sk)
  FROM coded GROUP BY 2
), queries(qid, plo, phi, slo, shi) AS (VALUES {qrows}),
qbox AS (
  SELECT qid,
         mm.pmin + mm.pspan * plo // 100 AS qplo,
         mm.pmin + mm.pspan * phi // 100 AS qphi,
         mm.smin + mm.sspan * slo // 100 AS qslo,
         mm.smin + mm.sspan * shi // 100 AS qshi
  FROM queries, mm
)
SELECT z.layout, q.qid::BIGINT AS qid, count(*)::BIGINT AS n_parts
FROM zones z JOIN qbox q
  ON z.pmin <= q.qphi AND z.pmax >= q.qplo
 AND z.smin <= q.qshi AND z.smax >= q.qslo
GROUP BY 1, 2
"""


LATE_THRESHOLD_SEC = 60


def q_lateness_profile(sf_dir: str):
    """EVENT-TIME LATENESS profile (the watermark question every
    streaming engine asks — MillWheel/Beam): within each user's
    stream, ARRIVAL order is event_id and EVENT time is ts; an
    element's lateness is how far the high-watermark (running max ts
    in arrival order) has already passed its own event time. Output
    per user: events seen, late events (> 60 s), max lateness in
    seconds, and the count of arrival inversions' upper envelope
    (events strictly older than the watermark at arrival). One
    exchange by user; the scan is a vectorized prefix-max per bucket.
    The oracle states the watermark as a running max() window over
    the arrival order."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"]})

    def late_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.nulls(0, pa.int64()),
                          "n_events": pa.nulls(0, pa.int64()),
                          "n_late": pa.nulls(0, pa.int64()),
                          "max_lateness_sec": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, u))        # ARRIVAL order per user
        u, ts = u[order], ts[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, n])
        # per-group prefix max: ADD an increasing per-group offset that
        # dwarfs the ts range, so one global cummax can never carry a
        # previous group's max into the next (its values sit higher)
        off = np.repeat(np.arange(len(starts), dtype=np.int64) << 50, cnt)
        wm = np.maximum.accumulate(ts + off) - off
        late_us = wm - ts                   # >= 0; 0 for in-order
        late_sec = late_us // 1_000_000
        is_late = late_sec > LATE_THRESHOLD_SEC
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_events": pa.array(cnt, pa.int64()),
            "n_late": pa.array(np.add.reduceat(
                is_late.astype(np.int64), starts), pa.int64()),
            "max_lateness_sec": pa.array(np.maximum.reduceat(
                late_sec, starts), pa.int64()),
        })

    return bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", late_fn, n_buckets=32,
        schema=pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                          ("eid", pa.int64())]))


SQL_LATENESS_PROFILE = f"""
WITH seq AS (
  SELECT user_id AS u,
         epoch_us(ts)::BIGINT AS tus,
         max(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY event_id)::BIGINT AS wm
  FROM events
), late AS (
  SELECT u, (wm - tus) // 1000000 AS late_sec FROM seq
)
SELECT u AS user_id, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_sec > {LATE_THRESHOLD_SEC}
                THEN 1 ELSE 0 END)::BIGINT AS n_late,
       max(late_sec)::BIGINT AS max_lateness_sec
FROM late GROUP BY u
"""


DICT_COLUMNS = ["l_returnflag", "l_linestatus"]


def q_dict_encoding_estimate(sf_dir: str):
    """DICTIONARY-ENCODING size planner for the low-cardinality
    lineitem columns — the Parquet/Arrow encoding decision stated as
    data: per column, the distinct count, ceil(log2) index width, the
    dictionary's byte payload (sum of distinct value lengths) and the
    total encoded index bits (rows x width). Completes the encoding
    family (delta, delta-of-delta, prefix, CDC). Per-batch (column,
    value) count partials — bounded by the value domain — fold once;
    the driver never sees a row."""
    cols = [c for c in DICT_COLUMNS]
    ds = _read(sf_dir, "lineitem", cols)

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            g = (pa.table({"v": t[c]}).group_by(["v"])
                 .aggregate([("v", "count")]))
            frames.append(pa.table({
                "col": pa.array([c] * g.num_rows, pa.string()),
                "v": g["v"],
                "n": g["v_count"].cast(pa.int64())}))
        return pa.concat_tables(frames)

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["col", "v"], as_index=False)["n"].sum())
    rows = []
    for c, g in parts.groupby("col"):
        k = len(g)
        # exact integer ceil(log2): smallest w with 2^w >= k
        width = 1
        while (1 << width) < k:
            width += 1
        n_rows = int(g["n"].sum())
        dict_bytes = int(g["v"].str.len().sum())
        rows.append((c, k, width, dict_bytes, n_rows * width))
    return (pd.DataFrame(rows, columns=["col", "n_distinct", "index_bits",
                                        "dict_bytes", "encoded_bits"])
            .astype({"n_distinct": "int64", "index_bits": "int64",
                     "dict_bytes": "int64", "encoded_bits": "int64"}))


def _dict_encoding_sql() -> str:
    sels = " UNION ALL ".join(
        f"SELECT '{c}' AS col, {c} AS v FROM lineitem"
        for c in DICT_COLUMNS)
    return f"""
WITH vals AS ({sels}),
agg AS (
  SELECT col, v, count(*)::BIGINT AS n FROM vals GROUP BY 1, 2
), stats AS (
  SELECT col, count(*)::BIGINT AS n_distinct,
         sum(length(v))::BIGINT AS dict_bytes,
         sum(n)::BIGINT AS n_rows
  FROM agg GROUP BY 1
), width AS (
  SELECT col, n_distinct, dict_bytes, n_rows,
         greatest(1, ceil(log2(n_distinct)))::BIGINT AS index_bits
  FROM stats
)
SELECT col, n_distinct, index_bits, dict_bytes,
       (n_rows * index_bits)::BIGINT AS encoded_bits
FROM width
"""


DBSCAN_SIZE_EPS = 1
DBSCAN_CENTS_EPS = 100
DBSCAN_MINPTS = 4


def q_dbscan_core_points(sf_dir: str):
    """DBSCAN CORE-POINT detection on (size, price) — the
    density-clustering primitive: a part is CORE if >= 4 OTHER parts
    sit within its L-inf ball (+/-1 size, +/-100 cents). Same 1-D
    partitioning + boundary replication as the band self-join, but
    counting PER POINT: every part probes in its home size bucket,
    and replicates as neighbor DATA to buckets size-1/size/size+1,
    so each probe sees exactly the sizes its ball can reach; inside a
    bucket a price sort + two searchsorteds counts ball members
    without materializing pairs (self-subtracted). The second
    dimension never shuffles; the oracle is the quadratic self-join
    count."""
    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_retailprice"])

    def replicate(t: pa.Table) -> pa.Table:
        size = t["p_size"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        return pa.table({
            # probe row (is_probe=1) in home bucket + data-only copies
            # one bucket up and down
            "bucket": pa.array(np.r_[size, size - 1, size + 1]),
            "key": pa.array(np.r_[key, key, key]),
            "c": pa.array(np.r_[c, c, c]),
            "is_probe": pa.array(np.r_[np.ones(len(size), np.int64),
                                       np.zeros(2 * len(size), np.int64)]),
        })

    REPL_SCHEMA = pa.schema([("bucket", pa.int64()), ("key", pa.int64()),
                             ("c", pa.int64()), ("is_probe", pa.int64())])

    def count_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"p_partkey": pa.nulls(0, pa.int64()),
                          "n_neighbors": pa.nulls(0, pa.int64()),
                          "is_core": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        b = t["bucket"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False) == 1
        out_k, out_n = [], []
        for bb in np.unique(b[probe]):
            m = b == bb
            dat_c = np.sort(c[m])           # all sizes bb-1..bb+1
            pm = m & probe
            lo = np.searchsorted(dat_c, c[pm] - DBSCAN_CENTS_EPS, "left")
            hi = np.searchsorted(dat_c, c[pm] + DBSCAN_CENTS_EPS, "right")
            out_k.append(key[pm])
            out_n.append(hi - lo - 1)       # minus self
        if not out_k:
            return empty                    # bucket held only data copies
        k = np.concatenate(out_k)
        n = np.concatenate(out_n)
        return pa.table({
            "p_partkey": pa.array(k, pa.int64()),
            "n_neighbors": pa.array(n, pa.int64()),
            "is_core": pa.array((n >= DBSCAN_MINPTS).astype(np.int64)),
        })

    return bucketed_reduce(
        parts.map_batches(replicate, batch_format="pyarrow"),
        "bucket", count_fn, n_buckets=16, schema=REPL_SCHEMA)


SQL_DBSCAN_CORE_POINTS = f"""
WITH p AS (
  SELECT p_partkey, p_size::BIGINT AS s,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
)
SELECT a.p_partkey,
       count(b.p_partkey)::BIGINT AS n_neighbors,
       (CASE WHEN count(b.p_partkey) >= {DBSCAN_MINPTS}
             THEN 1 ELSE 0 END)::BIGINT AS is_core
FROM p a LEFT JOIN p b
  ON b.p_partkey <> a.p_partkey
 AND abs(b.s - a.s) <= {DBSCAN_SIZE_EPS}
 AND abs(b.c - a.c) <= {DBSCAN_CENTS_EPS}
GROUP BY 1
"""


CVAR_ALPHA_PCT = 90


def q_cvar_tail(sf_dir: str):
    """CONDITIONAL VALUE-AT-RISK (expected shortfall) of order totals
    — the mean of the worst (largest) 10% of orders, published as an
    EXACT rational (sum-of-tail cents, k): the risk functional behind
    'how bad is bad'. Distributed exactly WITHOUT a global sort: the
    tail threshold is the exact (n-k+1)-th order statistic from
    ``stats.exact_quantiles_hist`` (iterative histogram refinement,
    O(blocks x bins) per pass), then one partial pass sums values
    STRICTLY above it, and the boundary tie-mass k - count(>thr)
    enters at exactly thr — so the result equals ORDER BY DESC LIMIT
    k regardless of how ties straddle the cut."""
    from fractions import Fraction

    from .pipelines.stats import exact_quantiles_hist

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t["o_totalprice"])})

    cents = orders.map_batches(prep, batch_format="pyarrow").materialize()
    n = cents.count()
    k = (n + 9) // 10                       # ceil(0.1 n)
    # exact (n-k+1)-th smallest == k-th largest
    q = (n - k) / max(n - 1, 1)             # rank -> quantile position
    thr = exact_quantiles_hist(cents, "c", [q], interpolate=False)[0] \
        if False else None
    # rank-exact threshold via histogram refinement on the rank domain:
    thr = _exact_kth_largest(cents, "c", k)

    def tail_partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        above = c > thr
        return pa.table({
            "n_above": pa.array([int(above.sum())], pa.int64()),
            "sum_above": pa.array([int(c[above].sum())], pa.int64()),
        })

    parts = (cents.map_batches(tail_partial, batch_format="pyarrow")
             .to_pandas())
    n_above = int(parts["n_above"].sum())
    sum_above = int(parts["sum_above"].sum())
    tie = k - n_above                       # >= 1 tie units at thr
    f = Fraction(sum_above + tie * thr, k)
    return pd.DataFrame({
        "k": np.array([k], np.int64),
        "threshold_cents": np.array([thr], np.int64),
        "cvar_num": np.array([f.numerator], np.int64),
        "cvar_den": np.array([f.denominator], np.int64),
    })


def _exact_kth_largest(ds, col: str, k: int) -> int:
    """Exact k-th largest of an integer column by iterative range
    bisection: each pass folds O(blocks) (count-above-mid) partials,
    log2(range) passes — never a sort, never row-shaped driver data."""
    import pyarrow.compute as _pc

    def mm(t: pa.Table) -> pa.Table:
        return pa.table({"lo": pa.array([_pc.min(t[col]).as_py()],
                                        pa.int64()),
                         "hi": pa.array([_pc.max(t[col]).as_py()],
                                        pa.int64())})

    lo = hi = None
    for r in ds.map_batches(mm, batch_format="pyarrow").take_all():
        lo = r["lo"] if lo is None else min(lo, r["lo"])
        hi = r["hi"] if hi is None else max(hi, r["hi"])

    while lo < hi:
        mid = (lo + hi + 1) // 2

        def cnt(t: pa.Table, m=mid) -> pa.Table:
            return pa.table({"n": pa.array(
                [_pc.sum(_pc.greater_equal(t[col], m)).as_py() or 0],
                pa.int64())})

        n_ge = sum(r["n"] for r in
                   ds.map_batches(cnt, batch_format="pyarrow").take_all())
        if n_ge >= k:
            lo = mid
        else:
            hi = mid - 1
    return int(lo)


SQL_CVAR_TAIL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), kk AS (
  SELECT ((count(*) + 9) // 10)::BIGINT AS k FROM c
), tail AS (
  SELECT v FROM c, kk ORDER BY v DESC LIMIT (SELECT k FROM kk)
), agg AS (
  SELECT sum(v)::BIGINT AS s, min(v)::BIGINT AS thr,
         count(*)::BIGINT AS k
  FROM tail
)
SELECT k, thr AS threshold_cents,
       (s / gcd(s, k))::BIGINT AS cvar_num,
       (k / gcd(s, k))::BIGINT AS cvar_den
FROM agg
"""


def q_seasonal_naive_error(sf_dir: str):
    """SEASONAL-NAIVE FORECAST ERROR of the hourly event count — the
    baseline every forecast eval divides by (MASE's denominator
    family): absolute error of 'predict this hour = the same hour
    yesterday' (lag 24) vs the naive 'predict = previous hour'
    (lag 1), both as EXACT integer absolute-error sums over the
    bounded hourly calendar, plus their ratio as a reduced rational
    (< 1 means real daily seasonality). O(blocks x hours) count
    partials fold once; two vectorized lag scans."""
    from fractions import Fraction

    US_HOUR = 3_600_000_000
    ev = _read(sf_dir, "events", ["ts"])

    def hour_partial(t: pa.Table) -> pa.Table:
        h = pc.divide(t["ts"].cast(pa.int64()), US_HOUR).cast(pa.int64())
        g = (pa.table({"h": h}).group_by(["h"])
             .aggregate([("h", "count")]))
        return pa.table({"h": g["h"],
                         "y": g["h_count"].cast(pa.int64())})

    parts = ev.map_batches(hour_partial, batch_format="pyarrow").to_pandas()
    hourly = parts.groupby("h")["y"].sum().sort_index()
    base = int(hourly.index.min())
    n = int(hourly.index.max()) - base + 1
    y = np.zeros(n, np.int64)               # zero-fill silent hours
    y[hourly.index.to_numpy(dtype=np.int64) - base] = hourly.to_numpy()
    ae_seasonal = int(np.abs(y[24:] - y[:-24]).sum())
    ae_naive = int(np.abs(y[1:] - y[:-1]).sum())
    f = Fraction(ae_seasonal, ae_naive)
    return pd.DataFrame({
        "n_hours": np.array([n], np.int64),
        "ae_seasonal24": np.array([ae_seasonal], np.int64),
        "ae_naive1": np.array([ae_naive], np.int64),
        "ratio_num": np.array([f.numerator], np.int64),
        "ratio_den": np.array([f.denominator], np.int64),
    })


SQL_SEASONAL_NAIVE_ERROR = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1
), grid AS (
  -- constant-bounded spine (DuckDB range() rejects subquery params):
  -- 1000 hours > any 31-day calendar; rows past max(h) filter out
  SELECT (SELECT min(h) FROM hourly) + r AS h
  FROM range(1000) t(r)
  WHERE (SELECT min(h) FROM hourly) + r <= (SELECT max(h) FROM hourly)
), s AS (
  SELECT grid.h, coalesce(hourly.y, 0)::BIGINT AS y,
         row_number() OVER (ORDER BY grid.h) AS i
  FROM grid LEFT JOIN hourly USING (h)
), err AS (
  SELECT
    (SELECT sum(abs(a.y - b.y)) FROM s a JOIN s b ON b.i = a.i - 24)
      ::BIGINT AS ae_seasonal24,
    (SELECT sum(abs(a.y - b.y)) FROM s a JOIN s b ON b.i = a.i - 1)
      ::BIGINT AS ae_naive1,
    (SELECT count(*) FROM s)::BIGINT AS n_hours
)
SELECT n_hours, ae_seasonal24, ae_naive1,
       (ae_seasonal24 / gcd(ae_seasonal24, ae_naive1))::BIGINT AS ratio_num,
       (ae_naive1 / gcd(ae_seasonal24, ae_naive1))::BIGINT AS ratio_den
FROM err
"""


def q_labeler_kappa(sf_dir: str):
    """COHEN'S KAPPA between the LangId heuristic and the corpus's
    ground-truth ``lang`` column — inter-rater agreement as an EXACT
    reduced rational: kappa = (n * sum_diag - sum_i row_i * col_i) /
    (n^2 - sum_i row_i * col_i), every term an integer from the
    confusion counts. The ML-eval primitive stated as data: the model
    run, the join to truth, and the chance-corrected agreement all
    inside one scan (prediction and truth live on the SAME row, so
    the confusion partials are per-batch group counts — no join
    anywhere). The oracle recomputes the predictions with the full
    SQL restatement of the stopword argmax and the same kappa
    algebra."""
    from fractions import Fraction

    from .pipelines.textops import LangId

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    class ConfusionPartial:
        def __init__(self):
            self.lang_id = LangId()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pred = self.lang_id(df[["doc_id", "text"]])["lang_pred"]
            out = (pd.DataFrame({"truth": df["lang"].to_numpy(),
                                 "pred": pred.to_numpy()})
                   .groupby(["truth", "pred"], as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out

    parts = (docs.map_batches(ConfusionPartial, batch_format="pandas",
                              concurrency=2)
             .to_pandas()
             .groupby(["truth", "pred"], as_index=False)["n"].sum())
    n = int(parts["n"].sum())
    diag = int(parts.loc[parts["truth"] == parts["pred"], "n"].sum())
    row = parts.groupby("truth")["n"].sum()
    col = parts.groupby("pred")["n"].sum()
    cats = sorted(set(row.index) | set(col.index))
    chance = sum(int(row.get(c, 0)) * int(col.get(c, 0)) for c in cats)
    f = Fraction(n * diag - chance, n * n - chance)
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "n_agree": np.array([diag], np.int64),
        "kappa_num": np.array([f.numerator], np.int64),
        "kappa_den": np.array([f.denominator], np.int64),
    })


def _labeler_kappa_sql() -> str:
    # reuse the full lang-id restatement as the prediction CTE
    from .pipelines.textops import STOPWORDS

    values = ", ".join(
        f"('{w}', '{lang}')"
        for lang, ws in sorted(STOPWORDS.items())
        for w in sorted(ws)
    )
    return f"""
WITH stop(word, lang) AS (VALUES {values}),
w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
         AS word
  FROM documents WHERE trim(text) <> ''
),
hits AS (
  SELECT w.doc_id, s.lang, count(*)::BIGINT AS n
  FROM w JOIN stop s ON w.word = s.word
  GROUP BY w.doc_id, s.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rn
  FROM hits
),
pred AS (
  SELECT d.doc_id, d.lang AS truth, coalesce(b.lang, 'und') AS pred
  FROM documents d
  LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
),
conf AS (
  SELECT truth, pred, count(*)::BIGINT AS n FROM pred GROUP BY 1, 2
),
tot AS (
  SELECT sum(n)::BIGINT AS n,
         sum(CASE WHEN truth = pred THEN n ELSE 0 END)::BIGINT AS diag
  FROM conf
),
marg AS (
  SELECT coalesce(r.c, c.c) AS cat,
         coalesce(r.n, 0)::BIGINT AS rn, coalesce(c.n, 0)::BIGINT AS cn
  FROM (SELECT truth AS c, sum(n) AS n FROM conf GROUP BY 1) r
  FULL OUTER JOIN (SELECT pred AS c, sum(n) AS n FROM conf GROUP BY 1) c
    ON c.c = r.c
),
chance AS (SELECT sum(rn * cn)::BIGINT AS e FROM marg)
SELECT tot.n AS n_docs, tot.diag AS n_agree,
       ((tot.n * tot.diag - chance.e)
        / gcd(tot.n * tot.diag - chance.e,
              tot.n * tot.n - chance.e))::BIGINT AS kappa_num,
       ((tot.n * tot.n - chance.e)
        / gcd(tot.n * tot.diag - chance.e,
              tot.n * tot.n - chance.e))::BIGINT AS kappa_den
FROM tot, chance
"""


def q_fano_burstiness(sf_dir: str):
    """FANO FACTOR (burstiness index) per event type — the
    point-process dispersion test: variance/mean of the per-hour
    arrival counts, published EXACTLY as the reduced rational
    F = (n * sum(x^2) - (sum x)^2) / (n * sum x) over the zero-filled
    hourly calendar (population variance; F = 1 is Poisson, > 1
    bursty). Per-batch (type, hour) count partials — bounded by
    types x hours — fold once; the driver computes three integer
    sufficient statistics per type."""
    from fractions import Fraction

    US_HOUR = 3_600_000_000
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(t["ts"].cast(pa.int64()), US_HOUR).cast(pa.int64())
        g = (pa.table({"et": t["event_type"], "h": h})
             .group_by(["et", "h"]).aggregate([("h", "count")]))
        return pa.table({"et": g["et"], "h": g["h"],
                         "n": g["h_count"].cast(pa.int64())})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["et", "h"], as_index=False)["n"].sum())
    h_min = int(parts["h"].min())
    h_max = int(parts["h"].max())
    n_hours = h_max - h_min + 1             # shared calendar spine
    rows = []
    for et, g in parts.groupby("et"):
        x = np.zeros(n_hours, np.int64)
        x[g["h"].to_numpy(dtype=np.int64) - h_min] = g["n"].to_numpy()
        s = int(x.sum())
        s2 = int((x * x).sum())
        f = Fraction(n_hours * s2 - s * s, n_hours * s)
        rows.append((et, s, f.numerator, f.denominator))
    return (pd.DataFrame(rows, columns=["event_type", "n_events",
                                        "fano_num", "fano_den"])
            .astype({"n_events": "int64", "fano_num": "int64",
                     "fano_den": "int64"}))


SQL_FANO_BURSTINESS = """
WITH hourly AS (
  SELECT event_type AS et,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), span AS (
  SELECT min(h) AS h0, max(h) - min(h) + 1 AS n_hours FROM hourly
), grid AS (
  SELECT e.et, span.h0 + r AS h
  FROM (SELECT DISTINCT et FROM hourly) e, span, range(1000) t(r)
  WHERE r < span.n_hours
), x AS (
  SELECT g.et, coalesce(hourly.n, 0)::BIGINT AS n
  FROM grid g LEFT JOIN hourly ON hourly.et = g.et AND hourly.h = g.h
), stats AS (
  SELECT et, count(*)::BIGINT AS nh, sum(n)::BIGINT AS s,
         sum(n * n)::BIGINT AS s2
  FROM x GROUP BY 1
)
SELECT et AS event_type, s AS n_events,
       ((nh * s2 - s * s) / gcd(nh * s2 - s * s, nh * s))::BIGINT
         AS fano_num,
       ((nh * s) / gcd(nh * s2 - s * s, nh * s))::BIGINT AS fano_den
FROM stats
"""


def q_rle_encoding_estimate(sf_dir: str):
    """RUN-LENGTH-ENCODING size planner over the per-user event-type
    stream — the 'does sorted-by-(user, time) layout RLE well?'
    storage question stated as data: per event type, the row count,
    the number of maximal runs of equal consecutive type (ordered by
    (ts, event_id) within each user) and the longest run. Completes
    the encoding-planner family (dict / delta / delta-of-delta /
    prefix / CDC). A run never crosses users and a user lives in
    exactly one bucket, so per-bucket run detection is globally
    correct; partials are O(buckets x types) and the driver folds
    sums and a max."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"], "et": t["event_type"]})

    def runs_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.nulls(0, pa.string()),
                          "n_rows": pa.nulls(0, pa.int64()),
                          "n_runs": pa.nulls(0, pa.int64()),
                          "max_run": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        vocab, codes = np.unique(
            np.asarray(t["et"].to_numpy(zero_copy_only=False), object),
            return_inverse=True)
        order = np.lexsort((eid, ts, u))
        u, c = u[order], codes[order]
        n = len(u)
        brk = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, n])
        rc = c[starts]                       # run -> type code
        k = len(vocab)
        n_rows = np.bincount(rc, weights=lens, minlength=k).astype(np.int64)
        n_runs = np.bincount(rc, minlength=k).astype(np.int64)
        max_run = np.zeros(k, np.int64)
        np.maximum.at(max_run, rc, lens)
        present = n_runs > 0
        return pa.table({
            "event_type": pa.array(vocab[present], pa.string()),
            "n_rows": pa.array(n_rows[present]),
            "n_runs": pa.array(n_runs[present]),
            "max_run": pa.array(max_run[present])})

    parts = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", runs_fn, n_buckets=32,
        schema=pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                          ("eid", pa.int64()), ("et", pa.string())]))
    out = (parts.to_pandas().groupby("event_type", as_index=False)
           .agg(n_rows=("n_rows", "sum"), n_runs=("n_runs", "sum"),
                max_run=("max_run", "max")))
    return out.astype({"n_rows": "int64", "n_runs": "int64",
                       "max_run": "int64"})


SQL_RLE_ENCODING_ESTIMATE = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
), lens AS (
  SELECT event_type, user_id, run_id, count(*)::BIGINT AS len
  FROM r GROUP BY 1, 2, 3
)
SELECT event_type, sum(len)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_runs, max(len)::BIGINT AS max_run
FROM lens GROUP BY 1
"""


VBYTE_TERMS = ["batch", "hash", "key", "merge", "row",
               "scan", "sort", "spark", "table", "window"]


def q_vbyte_postings_bytes(sf_dir: str):
    """VARIABLE-BYTE POSTINGS compression planner — the
    inverted-index storage decision (Manning/IR ch.5) stated as data:
    for each dictionary term, the posting list is the sorted doc_ids
    whose whitespace tokens contain the term, delta-encoded with the
    7-bit-per-byte varint ladder (1 byte below 128, 2 below 2^14,
    3 below 2^21, else 4); the FIRST posting encodes doc_id + 1 (the
    gap from a -1 sentinel) so every encoded gap is >= 1. Docs are
    unique rows, so within-batch (term, doc) pairs are globally
    distinct without a dedup pass; one exchange by term, gaps and the
    byte ladder vectorized per bucket, O(terms) rows out."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = set(VBYTE_TERMS)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        e = (df[["doc_id"]]
             .assign(term=df["text"].fillna("").str.split())
             .explode("term"))
        e = e[e["term"].isin(terms)].drop_duplicates()
        return pd.DataFrame({"term": e["term"].astype(str),
                             "doc_id": e["doc_id"].astype("int64")})

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.nulls(0, pa.string()),
                          "df": pa.nulls(0, pa.int64()),
                          "vbyte_bytes": pa.nulls(0, pa.int64()),
                          "max_gap": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        vocab, codes = np.unique(
            np.asarray(t["term"].to_numpy(zero_copy_only=False), object),
            return_inverse=True)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        c, i = codes[order], ids[order]
        first = np.r_[True, c[1:] != c[:-1]]
        gap = np.where(first, i + 1, i - np.r_[0, i[:-1]])
        nbytes = (1 + (gap >= 128) + (gap >= 1 << 14)
                  + (gap >= 1 << 21)).astype(np.int64)
        k = len(vocab)
        df_ = np.bincount(c, minlength=k).astype(np.int64)
        vb = np.bincount(c, weights=nbytes, minlength=k).astype(np.int64)
        mg = np.zeros(k, np.int64)
        np.maximum.at(mg, c, gap)
        return pa.table({"term": pa.array(vocab, pa.string()),
                         "df": pa.array(df_), "vbyte_bytes": pa.array(vb),
                         "max_gap": pa.array(mg)})

    return bucketed_reduce(
        docs.map_batches(pairs, batch_format="pandas"),
        "term", fold, n_buckets=8,
        schema=pa.schema([("term", pa.string()), ("doc_id", pa.int64())]))


def _vbyte_sql() -> str:
    lits = ", ".join(f"'{t}'" for t in VBYTE_TERMS)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tok AS (
  SELECT DISTINCT term, doc_id FROM raw WHERE term IN ({lits})
), posts AS (
  SELECT term, doc_id,
         doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
           AS gap
  FROM tok
), g AS (
  SELECT term, coalesce(gap, doc_id + 1)::BIGINT AS g FROM posts
)
SELECT term, count(*)::BIGINT AS df,
       sum(CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2
                WHEN g < 2097152 THEN 3 ELSE 4 END)::BIGINT AS vbyte_bytes,
       max(g)::BIGINT AS max_gap
FROM g GROUP BY 1
"""


BITMAP_CONTAINER = 256    # container width (scaled-down roaring 2^16)
BITMAP_ARRAY_MAX = 63     # array container if n <= 63 (2 B/entry),
                          # else a 256-bit bitmap (32 B)


def q_bitmap_index_estimate(sf_dir: str):
    """ROARING-STYLE bitmap-index planner (Chambi et al. 2016) for an
    event_type -> event_id index: ids chunk into 256-wide containers
    and each (type, container) cell stores its ids as a sorted ARRAY
    (2 bytes/entry) up to 63 entries, else as a 256-bit BITMAP
    (32 bytes) — the roaring array/bitmap switch at 1/256 width.
    event_id is globally unique so the per-cell count IS the distinct
    count. Per-batch (type, container) count partials — bounded by
    types x ceil(id_range/256) — fold once; O(cells) rows ever exist."""
    ev = _read(sf_dir, "events", ["event_type", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        cont = np.asarray(
            t["event_id"].to_numpy(zero_copy_only=False)) // BITMAP_CONTAINER
        g = (pa.table({"et": t["event_type"], "c": pa.array(cont)})
             .group_by(["et", "c"]).aggregate([("c", "count")]))
        return pa.table({"et": g["et"], "c": g["c"],
                         "n": g["c_count"].cast(pa.int64())})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby(["et", "c"], as_index=False)["n"].sum())
    n = parts["n"].to_numpy(dtype=np.int64)
    parts["is_bitmap"] = (n > BITMAP_ARRAY_MAX).astype(np.int64)
    parts["bytes"] = np.where(n > BITMAP_ARRAY_MAX, 32, 2 * n)
    out = (parts.groupby("et", as_index=False)
           .agg(n_containers=("c", "count"), n_bitmap=("is_bitmap", "sum"),
                index_bytes=("bytes", "sum")))
    out["n_array"] = out["n_containers"] - out["n_bitmap"]
    out = out.rename(columns={"et": "event_type"})
    return (out[["event_type", "n_containers", "n_array", "n_bitmap",
                 "index_bytes"]]
            .astype({"n_containers": "int64", "n_array": "int64",
                     "n_bitmap": "int64", "index_bytes": "int64"}))


SQL_BITMAP_INDEX_ESTIMATE = """
WITH cont AS (
  SELECT event_type, event_id // 256 AS c, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       count(*)::BIGINT AS n_containers,
       sum(CASE WHEN n <= 63 THEN 1 ELSE 0 END)::BIGINT AS n_array,
       sum(CASE WHEN n > 63 THEN 1 ELSE 0 END)::BIGINT AS n_bitmap,
       sum(CASE WHEN n <= 63 THEN 2 * n ELSE 32 END)::BIGINT
         AS index_bytes
FROM cont GROUP BY 1
"""


def q_huffman_bits(sf_dir: str):
    """HUFFMAN entropy-coding planner for the event_type column — the
    optimal prefix-code lengths stated as data: per type, the count,
    the Huffman code length in bits and the total encoded bits. The
    merge order is made DETERMINISTIC by ranking nodes on
    (weight, min-member-type-name) — knife-edge weight ties cannot
    flip the tree between engine and oracle. The corpus has exactly 5
    event types, so the oracle unrolls the 4 merge steps as chained
    CTEs carrying each node's member set; a type's code length is the
    number of merges its subtree participated in. Per-batch type
    counts are O(types) partials; the driver runs the O(k log k)
    merge loop over 5 nodes."""
    import heapq

    ev = _read(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"et": t["event_type"]}).group_by(["et"])
             .aggregate([("et", "count")]))
        return pa.table({"et": g["et"],
                         "n": g["et_count"].cast(pa.int64())})

    counts = (ev.map_batches(partial, batch_format="pyarrow")
              .to_pandas().groupby("et", as_index=False)["n"].sum())
    depth = {t: 0 for t in counts["et"]}
    heap = [(int(w), t, (t,)) for t, w in zip(counts["et"], counts["n"])]
    heapq.heapify(heap)
    while len(heap) > 1:
        w1, l1, m1 = heapq.heappop(heap)
        w2, l2, m2 = heapq.heappop(heap)
        for t in m1 + m2:
            depth[t] += 1
        heapq.heappush(heap, (w1 + w2, min(l1, l2), m1 + m2))
    out = pd.DataFrame({
        "event_type": counts["et"],
        "n_events": counts["n"].astype("int64"),
        "code_bits": counts["et"].map(depth).astype("int64")})
    out["encoded_bits"] = (out["n_events"] * out["code_bits"]).astype("int64")
    return out


def _huffman_merge_step(i: int) -> str:
    """One unrolled Huffman merge: rank nodes by (weight, label), keep
    rk > 2, append the combined node; record the two merged member
    sets for the depth count."""
    return f"""
m{i} AS (
  SELECT label, w, members,
         row_number() OVER (ORDER BY w, label) AS rk
  FROM n{i - 1}
),
merged{i} AS (SELECT members FROM m{i} WHERE rk <= 2),
n{i} AS (
  SELECT label, w, members FROM m{i} WHERE rk > 2
  UNION ALL
  SELECT min(label), sum(w),
         string_agg(members, ',' ORDER BY label)
  FROM m{i} WHERE rk <= 2
)"""


def _huffman_sql() -> str:
    steps = ",".join(_huffman_merge_step(i) for i in range(1, 5))
    return f"""
WITH counts AS (
  SELECT event_type AS t, count(*)::BIGINT AS w FROM events GROUP BY 1
),
n0 AS (SELECT t AS label, w, t AS members FROM counts),
{steps},
all_merged AS (
  SELECT members FROM merged1 UNION ALL SELECT members FROM merged2
  UNION ALL SELECT members FROM merged3
  UNION ALL SELECT members FROM merged4
),
depth AS (
  SELECT c.t, c.w,
         (SELECT count(*) FROM all_merged m
          WHERE list_contains(string_split(m.members, ','), c.t)
         )::BIGINT AS code_bits
  FROM counts c
)
SELECT t AS event_type, w AS n_events, code_bits,
       (w * code_bits)::BIGINT AS encoded_bits
FROM depth
"""


APPORTION_SEATS = 97


def q_apportionment(sf_dir: str):
    """HAMILTON / LARGEST-REMAINDER apportionment of 97 budget slots
    across nations by customer count — the proportional-allocation
    primitive (parliament seats, shard quotas, sampling budgets)
    computed EXACTLY: floor_i = (S * n_i) // N by integer division,
    and the leftover slots go to the largest remainders
    (S * n_i) mod N, ranked with the deterministic
    (remainder DESC, name ASC) tiebreak — no floating-point quota
    ever exists. Per-batch nation count partials (O(25)); the driver
    does the integer ranking over 25 rows."""
    cust = _read(sf_dir, "customer", ["c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"nk": t["c_nationkey"].cast(pa.int64())})
             .group_by(["nk"]).aggregate([("nk", "count")]))
        return pa.table({"nk": g["nk"],
                         "n": g["nk_count"].cast(pa.int64())})

    cnt = (cust.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("nk", as_index=False)["n"].sum())
    n2name = dict(zip(nation["n_nationkey"].astype("int64"),
                      nation["n_name"]))
    cnt["n_name"] = cnt["nk"].map(n2name)
    total = int(cnt["n"].sum())
    s = APPORTION_SEATS
    cnt["floor_seats"] = (s * cnt["n"]) // total
    cnt["remainder_num"] = (s * cnt["n"]) % total
    leftover = s - int(cnt["floor_seats"].sum())
    cnt = cnt.sort_values(["remainder_num", "n_name"],
                          ascending=[False, True], kind="stable")
    bump = np.zeros(len(cnt), np.int64)
    bump[:leftover] = 1
    cnt["seats"] = cnt["floor_seats"].to_numpy() + bump
    out = cnt.rename(columns={"n": "customers"})
    return (out[["n_name", "customers", "floor_seats", "remainder_num",
                 "seats"]]
            .astype({"customers": "int64", "floor_seats": "int64",
                     "remainder_num": "int64", "seats": "int64"})
            .reset_index(drop=True))


SQL_APPORTIONMENT = f"""
WITH cnt AS (
  SELECT n.n_name, count(*)::BIGINT AS customers
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
), tot AS (SELECT sum(customers)::BIGINT AS n FROM cnt),
q AS (
  SELECT n_name, customers,
         ({APPORTION_SEATS} * customers) // tot.n AS floor_seats,
         ({APPORTION_SEATS} * customers) % tot.n AS rem
  FROM cnt, tot
), lr AS (
  SELECT q.*,
         row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
         (SELECT {APPORTION_SEATS} - sum(floor_seats) FROM q) AS leftover
  FROM q
)
SELECT n_name, customers, floor_seats::BIGINT AS floor_seats,
       rem::BIGINT AS remainder_num,
       (floor_seats + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT
         AS seats
FROM lr
"""


def q_closest_pair(sf_dir: str):
    """CLOSEST PAIR of points in the (dim0, dim1) embedding plane —
    the classic computational-geometry primitive as a two-phase
    distributed plan. Phase 1: an upper bound d0 from per-block
    x-sorted neighbor scans (each point vs its next 4 x-neighbors;
    one candidate row per block, driver min over O(blocks)). Phase 2:
    points bucket into x-cells of width d0 with a data-only copy one
    cell right — |dx| <= d0 implies same-or-adjacent cell, so every
    pair at distance <= d0 is co-bucketed — and each bucket resolves
    with a y-sorted lag-distance loop that stops at offset k when no
    same-cell pair k apart has dy <= d0 (y is sorted within a cell,
    so dy is monotone in k). The driver takes the (d2, id_a, id_b)
    lexicographic minimum over O(buckets) candidates. float32 ->
    float64 widening is exact and both engines evaluate
    (xa-xb)^2 + (ya-yb)^2 in doubles, so the tie order is identical;
    d2 publishes under the round-6dp float contract. A d0 == 0 draw
    (exact duplicate coordinates) switches to a coordinate-hash
    exchange that pairs the two smallest ids of every duplicate run."""
    from .pipelines.relational import bucketed_reduce

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def points(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy())
        return pa.table({
            "id": t["vec_id"].cast(pa.int64()),
            "x": pa.array(emb[:, 0].astype(np.float64)),
            "y": pa.array(emb[:, 1].astype(np.float64))})

    PTS_SCHEMA = pa.schema([("id", pa.int64()), ("x", pa.float64()),
                            ("y", pa.float64())])
    pts = ds.map_batches(points, batch_format="pyarrow")

    def _best_of(d2, ida, idb):
        """lexicographic (d2, id_a, id_b) minimum over candidate arrays"""
        lo = np.minimum(ida, idb)
        hi = np.maximum(ida, idb)
        j = np.lexsort((hi, lo, d2))[0]
        return float(d2[j]), int(lo[j]), int(hi[j])

    def local_bound(t: pa.Table) -> pa.Table:
        empty = pa.table({"d2": pa.nulls(0, pa.float64()),
                          "id_a": pa.nulls(0, pa.int64()),
                          "id_b": pa.nulls(0, pa.int64())})
        if t.num_rows < 2:
            return empty
        ids = t["id"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, x))
        ids, x, y = ids[o], x[o], y[o]
        cd2, ca, cb = [], [], []
        for k in range(1, min(5, len(ids))):
            dx = x[k:] - x[:-k]
            dy = y[k:] - y[:-k]
            d2 = dx * dx + dy * dy
            cd2.append(d2)
            ca.append(ids[:-k])
            cb.append(ids[k:])
        d2, ia, ib = (np.concatenate(cd2), np.concatenate(ca),
                      np.concatenate(cb))
        b = _best_of(d2, ia, ib)
        return pa.table({"d2": pa.array([b[0]]),
                         "id_a": pa.array([b[1]], pa.int64()),
                         "id_b": pa.array([b[2]], pa.int64())})

    cands = pts.map_batches(local_bound, batch_format="pyarrow").to_pandas()
    if cands.empty:
        # every block held < 2 points (an input small enough that Ray
        # split it into single-row blocks) — coalesce and rescan; this
        # path only exists below one block's worth of data
        cands = (pts.repartition(1)
                 .map_batches(local_bound, batch_format="pyarrow")
                 .to_pandas())
    if cands.empty:
        raise ValueError("closest_pair needs >= 2 points")
    d0sq, a0, b0 = _best_of(cands["d2"].to_numpy(),
                            cands["id_a"].to_numpy(),
                            cands["id_b"].to_numpy())
    d0 = float(np.sqrt(d0sq))

    CAND_SCHEMA = pa.schema([("d2", pa.float64()), ("id_a", pa.int64()),
                             ("id_b", pa.int64())])

    if d0 == 0.0:
        # exact-duplicate regime: pair the two smallest ids per
        # duplicate coordinate run inside a coordinate-hash exchange
        def dup_key(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            key = x.view(np.int64) ^ np.left_shift(y.view(np.int64), 1)
            return t.append_column("k", pa.array(key))

        def dup_fn(t: pa.Table) -> pa.Table:
            empty = pa.table({c: pa.nulls(0, CAND_SCHEMA.field(c).type)
                              for c in CAND_SCHEMA.names})
            if t.num_rows < 2:
                return empty
            ids = t["id"].to_numpy(zero_copy_only=False)
            x = t["x"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            o = np.lexsort((ids, y, x))
            ids, x, y = ids[o], x[o], y[o]
            same = (x[1:] == x[:-1]) & (y[1:] == y[:-1])
            # run starts of duplicate groups: pair (first, second) id
            first = same & np.r_[True, ~same[:-1]]
            if not first.any():
                return empty
            i = np.flatnonzero(first)
            b = _best_of(np.zeros(len(i)), ids[i], ids[i + 1])
            return pa.table({"d2": pa.array([0.0]),
                             "id_a": pa.array([b[1]], pa.int64()),
                             "id_b": pa.array([b[2]], pa.int64())})

        dup = bucketed_reduce(
            pts.map_batches(dup_key, batch_format="pyarrow"),
            "k", dup_fn, n_buckets=16,
            schema=pa.schema([*PTS_SCHEMA, pa.field("k", pa.int64())]))
        c2 = dup.to_pandas()
        best = _best_of(np.r_[c2["d2"].to_numpy(), d0sq],
                        np.r_[c2["id_a"].to_numpy(), a0],
                        np.r_[c2["id_b"].to_numpy(), b0])
    else:
        def cells(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False)
            c = np.floor(x / d0).astype(np.int64)
            ids = t["id"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            return pa.table({
                "cell": pa.array(np.r_[c, c + 1]),
                "id": pa.array(np.r_[ids, ids]),
                "x": pa.array(np.r_[x, x]), "y": pa.array(np.r_[y, y])})

        def resolve(t: pa.Table) -> pa.Table:
            empty = pa.table({c: pa.nulls(0, CAND_SCHEMA.field(c).type)
                              for c in CAND_SCHEMA.names})
            if t.num_rows < 2:
                return empty
            cell = t["cell"].to_numpy(zero_copy_only=False)
            ids = t["id"].to_numpy(zero_copy_only=False)
            x = t["x"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            o = np.lexsort((ids, y, cell))
            cell, ids, x, y = cell[o], ids[o], x[o], y[o]
            n = len(ids)
            cd2, ca, cb = [], [], []
            for k in range(1, n):
                i = np.arange(n - k)
                dy = y[i + k] - y[i]
                live = (cell[i] == cell[i + k]) & (dy <= d0)
                if not live.any():
                    break
                ii = i[live]
                dx = x[ii] - x[ii + k]
                d2 = dx * dx + dy[live] * dy[live]
                cd2.append(d2)
                ca.append(ids[ii])
                cb.append(ids[ii + k])
            if not cd2:
                return empty
            b = _best_of(np.concatenate(cd2), np.concatenate(ca),
                         np.concatenate(cb))
            return pa.table({"d2": pa.array([b[0]]),
                             "id_a": pa.array([b[1]], pa.int64()),
                             "id_b": pa.array([b[2]], pa.int64())})

        c2 = bucketed_reduce(
            pts.map_batches(cells, batch_format="pyarrow"),
            "cell", resolve, n_buckets=16,
            schema=pa.schema([("cell", pa.int64()), ("id", pa.int64()),
                              ("x", pa.float64()), ("y", pa.float64())]))
        c2 = c2.to_pandas()
        best = _best_of(np.r_[c2["d2"].to_numpy(), d0sq],
                        np.r_[c2["id_a"].to_numpy(), a0],
                        np.r_[c2["id_b"].to_numpy(), b0])
    return pd.DataFrame({"id_a": [best[1]], "id_b": [best[2]],
                         "dist2": [float(np.round(best[0], 6))]}).astype(
        {"id_a": "int64", "id_b": "int64", "dist2": "float64"})


SQL_CLOSEST_PAIR = """
WITH pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round((a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y), 6) AS dist2
FROM pts a JOIN pts b ON a.vec_id < b.vec_id
ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
         a.vec_id, b.vec_id
LIMIT 1
"""


TOKEN_BUDGET = 10_000


def q_token_budget_select(sf_dir: str):
    """CORPUS SELECTION UNDER A TOKEN BUDGET — the training-data
    curation cut: rank documents by integer per-mille stopword
    density (the Gopher-style quality proxy already oracled by
    ``quality``), take whole docs in (score DESC, doc_id ASC) order
    until the 10k-token budget, and split the boundary doc
    fractionally. The cut is found WITHOUT sorting the corpus: scores
    live in [0, 1000], so per-batch (score -> n_docs, n_tokens)
    histogram partials fold to O(1001) rows, the driver walks the
    histogram to the crossing score, and ONE filtered exchange of the
    boundary-score tie group (ordered by doc_id, a ~1/1000 slice by
    construction) resolves the exact boundary doc. Publishes a single
    audit row; ties and exact-fit boundaries (take = 0) are
    deterministic on both engines."""
    from .pipelines.relational import bucketed_reduce
    from .pipelines.textops import QualityScorer

    B = TOKEN_BUDGET
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    scored = docs.map_batches(QualityScorer, batch_format="pandas",
                              concurrency=2)

    def with_score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["n_tokens"].to_numpy(dtype=np.int64)
        stops = df["n_stopwords"].to_numpy(dtype=np.int64)
        score = np.where(toks == 0, 0, (stops * 1000) // np.maximum(toks, 1))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "toks": toks, "score": score.astype(np.int64)})

    # materialize the 3-int-column control table once: the histogram
    # pass and the tie-group pass both read it, and re-running the
    # scorer actor pool for the second pass would double the scan;
    # O(docs x 24 B) in the object store — the standard control-table
    # materialization, NOT a corpus materialization
    sc = scored.map_batches(with_score, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("score", as_index=False).agg(
            n_docs=("doc_id", "count"), n_toks=("toks", "sum"))
        return g

    h = (sc.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("score", as_index=False).sum()
         .sort_values("score", ascending=False))
    cum = h["n_toks"].cumsum()
    total = int(h["n_toks"].sum())
    if total <= B:
        n_full = int(h["n_docs"].sum())
        return pd.DataFrame({
            "n_docs_full": [n_full], "tokens_full": [total],
            "boundary_doc_id": [-1], "boundary_take": [0],
            "boundary_score": [-1]}).astype("int64")
    cross = int(np.flatnonzero(cum.to_numpy() > B)[0])
    s_star = int(h["score"].iloc[cross])
    above_docs = int(h["n_docs"].iloc[:cross].sum())
    above_toks = int(h["n_toks"].iloc[:cross].sum())
    remaining = B - above_toks

    def tie_fn(t: pa.Table) -> pa.Table:
        # the whole tie group lands in ONE bucket (constant key), so
        # the doc_id-ordered prefix scan is globally correct
        empty = pa.table({"n_full": pa.nulls(0, pa.int64()),
                          "toks_full": pa.nulls(0, pa.int64()),
                          "b_doc": pa.nulls(0, pa.int64()),
                          "b_take": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = t["toks"].to_numpy(zero_copy_only=False)
        o = np.argsort(ids)
        ids, toks = ids[o], toks[o]
        c = np.cumsum(toks)
        full = c <= remaining               # a prefix: c is monotone
        j = int(np.flatnonzero(~full)[0])   # exists: group crosses
        before = int(c[j] - toks[j])        # == sum of full-doc tokens
        return pa.table({
            "n_full": pa.array([int(full.sum())], pa.int64()),
            "toks_full": pa.array([before], pa.int64()),
            "b_doc": pa.array([int(ids[j])], pa.int64()),
            "b_take": pa.array([remaining - before], pa.int64())})

    def tie_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["score"] == s_star]
        return g.assign(k=np.int64(0))

    tg = bucketed_reduce(
        sc.map_batches(tie_rows, batch_format="pandas"),
        "k", tie_fn, n_buckets=1,
        schema=pa.schema([("doc_id", pa.int64()), ("toks", pa.int64()),
                          ("score", pa.int64()), ("k", pa.int64())]))
    r = tg.to_pandas().dropna().iloc[0]
    return pd.DataFrame({
        "n_docs_full": [above_docs + int(r["n_full"])],
        "tokens_full": [above_toks + int(r["toks_full"])],
        "boundary_doc_id": [int(r["b_doc"])],
        "boundary_take": [int(r["b_take"])],
        "boundary_score": [s_star]}).astype("int64")


SQL_TOKEN_BUDGET_SELECT = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         END::BIGINT AS toks,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             x -> x IN ('the','a','and','of','to','in','is','it')
         ))::BIGINT AS stops
  FROM documents
), s AS (
  SELECT doc_id, toks,
         CASE WHEN toks = 0 THEN 0 ELSE (stops * 1000) // toks END AS score
  FROM d
), o AS (
  SELECT doc_id, toks, score,
         sum(toks) OVER (ORDER BY score DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM s
), sel AS (
  SELECT count(*)::BIGINT AS n_docs_full,
         coalesce(sum(toks), 0)::BIGINT AS tokens_full
  FROM o WHERE cum <= {TOKEN_BUDGET}
), bnd AS (
  SELECT doc_id, score, {TOKEN_BUDGET} - (cum - toks) AS take
  FROM o WHERE cum > {TOKEN_BUDGET}
  ORDER BY score DESC, doc_id LIMIT 1
)
SELECT sel.n_docs_full, sel.tokens_full,
       coalesce(bnd.doc_id, -1)::BIGINT AS boundary_doc_id,
       coalesce(bnd.take, 0)::BIGINT AS boundary_take,
       coalesce(bnd.score, -1)::BIGINT AS boundary_score
FROM sel LEFT JOIN bnd ON TRUE
"""


MULTI_PATTERNS = ["fast merge", "hash join", "key value", "merge batch",
                  "row scan", "sort table", "table scan", "table value"]


def q_multi_pattern_counts(sf_dir: str):
    """MULTI-PATTERN DICTIONARY SCAN over documents — the
    blocklist/PII-dictionary primitive: for each pattern in a
    broadcast dictionary, the number of documents containing it and
    the total non-overlapping occurrence count (both engines consume
    matches left-to-right, so the counts agree for ANY pattern, even
    self-overlapping ones). K compiled-regex vectorized passes per
    batch (pandas ``str.count`` under ``re.escape``), O(K) partial
    rows per block, driver fold O(blocks x K); a production
    dictionary of thousands of patterns would swap the K passes for
    one Aho-Corasick automaton per actor — the batch contract is
    unchanged. Zero-hit patterns still publish a row."""
    import re

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pats = list(MULTI_PATTERNS)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        rows = []
        for p in pats:
            n = s.str.count(re.escape(p)).astype("int64")
            rows.append((p, int((n > 0).sum()), int(n.sum())))
        return pd.DataFrame(rows, columns=["pattern", "n_docs",
                                           "n_occurrences"])

    out = (docs.map_batches(counts, batch_format="pandas")
           .to_pandas().groupby("pattern", as_index=False).sum())
    return out.astype({"n_docs": "int64", "n_occurrences": "int64"})


def _multi_pattern_sql() -> str:
    lits = ", ".join(f"('{p}')" for p in MULTI_PATTERNS)
    return f"""
WITH pats AS (SELECT * FROM (VALUES {lits}) p(pat)),
per AS (
  SELECT p.pat, d.doc_id,
         (length(d.text) - length(replace(d.text, p.pat, '')))
           // length(p.pat) AS n
  FROM documents d CROSS JOIN pats p
)
SELECT pat AS pattern,
       sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs,
       sum(n)::BIGINT AS n_occurrences
FROM per GROUP BY 1
"""


BORDER_MAX = 64


def q_text_border_period(sf_dir: str):
    """LONGEST BORDER / PERIOD detection per document — the KMP
    failure-function view of boilerplate: the longest k <= 64 (and
    k < n) where the text's k-prefix equals its k-suffix, and the
    implied repeat period n - k (a small period flags template/
    boilerplate pages). The engine runs 64 VECTORIZED prefix==suffix
    passes over the whole batch (pandas slice compare), never a
    per-row loop; purely map-side, no shuffle. The oracle enumerates
    the same k range with substr equality."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def borders(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        n = s.str.len().to_numpy(dtype=np.int64)
        border = np.zeros(len(s), np.int64)
        for k in range(1, BORDER_MAX + 1):
            match = (s.str[:k] == s.str[-k:]).to_numpy() & (n > k)
            border = np.where(match, k, border)
        period = np.where(border > 0, n - border, 0)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_chars": n, "border_len": border,
                             "period": period})

    return docs.map_batches(borders, batch_format="pandas")


SQL_TEXT_BORDER_PERIOD = f"""
WITH ks AS (SELECT range AS k FROM range(1, {BORDER_MAX + 1})),
b AS (
  SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
         max(CASE WHEN ks.k < length(d.text)
                   AND substr(d.text, 1, ks.k)
                       = substr(d.text, length(d.text) - ks.k + 1, ks.k)
                  THEN ks.k ELSE 0 END)::BIGINT AS border_len
  FROM documents d CROSS JOIN ks GROUP BY 1, 2
)
SELECT doc_id, n_chars, border_len,
       (CASE WHEN border_len > 0 THEN n_chars - border_len
             ELSE 0 END)::BIGINT AS period
FROM b
"""


SET_COVER_STEPS = 5


def _bigram_pairs_batch(t: pa.Table, key_col: str) -> pd.DataFrame:
    """distinct (key, bigram) pairs for a batch of documents — the
    shared tokenization of the coverage family (whitespace tokens,
    space-joined adjacent pairs)."""
    df = t.select([key_col, "text"]).to_pandas()
    ws = df["text"].fillna("").str.split()
    e = (df[[key_col]].assign(ws=ws).explode("ws"))
    # adjacent pairs inside one doc: shift within the original row
    # grouping (explode preserves the source index)
    e["nxt"] = e.groupby(level=0)["ws"].shift(-1)
    e = e.dropna(subset=["ws", "nxt"])
    e["bg"] = e["ws"] + " " + e["nxt"]
    return e[[key_col, "bg"]].drop_duplicates()


def q_set_cover_sources(sf_dir: str):
    """GREEDY SET COVER over corpus sources — the data-buying
    question 'which 5 sources add the most distinct bigrams?': at
    each step pick the unchosen source covering the most
    still-uncovered bigrams (ties by source name), publish
    (step, source, new_terms), stop early when nothing new remains.
    The source x bigram incidence never reaches the driver as rows:
    a bigram-keyed exchange folds each bigram's source SET to a
    SET-HISTOGRAM — O(distinct source sets) <= 2^|sources| rows, in
    practice tiny because sources correlate — and the driver's greedy
    loop reads every gain off the histogram as bitmask sums
    (gain(s) = sum n[m] over uncovered masks containing s). The
    oracle unrolls the same 5 steps as chained CTEs with NOT IN
    covered sets."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["source", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        e = _bigram_pairs_batch(t, "source")
        return pa.table({"bg": pa.array(e["bg"], pa.string()),
                         "src": pa.array(e["source"], pa.string())})

    def srcset_hist(t: pa.Table) -> pa.Table:
        # histogram keyed by the CANONICAL source-set string (sorted,
        # comma-joined) — no global source->bit mapping needed, so the
        # plan is one pass + one exchange
        empty = pa.table({"srcset": pa.nulls(0, pa.string()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().drop_duplicates()
        sets = (df.sort_values(["bg", "src"]).groupby("bg")["src"]
                .agg(",".join))
        h = sets.value_counts()
        return pa.table({"srcset": pa.array(h.index, pa.string()),
                         "n": pa.array(h.to_numpy(np.int64))})

    # the pairs stream is per-block partials; coalesce the tiny doc
    # blocks so the K-wide split doesn't fan 64 near-empty tasks
    # x n_buckets objects through the store
    hist = bucketed_reduce(
        docs.map_batches(pairs, batch_format="pyarrow").repartition(16),
        "bg", srcset_hist, n_buckets=16,
        schema=pa.schema([("bg", pa.string()), ("src", pa.string())]))
    h = (hist.to_pandas().groupby("srcset", as_index=False)["n"].sum())
    sources = sorted({s for ss in h["srcset"] for s in ss.split(",")})
    bit = {s: i for i, s in enumerate(sources)}
    masks = np.array([sum(1 << bit[s] for s in ss.split(","))
                      for ss in h["srcset"]], np.int64)
    n = h["n"].to_numpy(np.int64)
    chosen_mask = 0
    chosen = set()
    rows = []
    for step in range(1, SET_COVER_STEPS + 1):
        unc = (masks & chosen_mask) == 0
        best = None
        for s in sources:
            if s in chosen:
                continue
            gain = int(n[unc & ((masks >> bit[s]) & 1 == 1)].sum())
            if gain > 0 and (best is None or (-gain, s) < (-best[1], best[0])):
                best = (s, gain)
        if best is None:
            break
        rows.append((step, best[0], best[1]))
        chosen.add(best[0])
        chosen_mask |= 1 << bit[best[0]]
    return pd.DataFrame(rows, columns=["step", "source", "new_terms"]) \
        .astype({"step": "int64", "new_terms": "int64"})


def _set_cover_sql() -> str:
    head = """
WITH toks AS (
  SELECT source, doc_id, string_split(text, ' ') AS ws FROM documents
), pairs AS (
  SELECT DISTINCT source, ws[i] || ' ' || ws[i + 1] AS bg
  FROM toks, unnest(range(1, len(ws))) t(i)
),
g1 AS (SELECT source, count(*)::BIGINT AS gain FROM pairs GROUP BY 1),
c1 AS (SELECT source, gain FROM g1 ORDER BY gain DESC, source LIMIT 1),
cov1 AS (SELECT DISTINCT p.bg FROM pairs p JOIN c1 ON p.source = c1.source),
ch1 AS (SELECT source FROM c1)"""
    steps = [head]
    for i in range(2, SET_COVER_STEPS + 1):
        p = i - 1
        steps.append(f"""
g{i} AS (
  SELECT p.source, count(DISTINCT p.bg)::BIGINT AS gain
  FROM pairs p
  WHERE p.source NOT IN (SELECT source FROM ch{p})
    AND p.bg NOT IN (SELECT bg FROM cov{p})
  GROUP BY 1
),
c{i} AS (SELECT source, gain FROM g{i} WHERE gain > 0
         ORDER BY gain DESC, source LIMIT 1),
cov{i} AS (SELECT bg FROM cov{p}
           UNION
           SELECT p.bg FROM pairs p JOIN c{i} ON p.source = c{i}.source),
ch{i} AS (SELECT source FROM ch{p}
          UNION ALL SELECT source FROM c{i})""")
    tails = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step, source, gain AS new_terms FROM c{i}"
        for i in range(1, SET_COVER_STEPS + 1))
    return ",".join(steps) + "\n" + tails


HEAPS_CHECKPOINTS = [25, 50, 100, 200, 400]


def q_heaps_vocab_growth(sf_dir: str):
    """HEAPS-LAW VOCABULARY GROWTH — the tokenizer-budget curve
    'how many distinct bigrams appear within the first k documents?'
    for k in {25, 50, 100, 200, 400}, WITHOUT materializing any
    vocabulary: each bigram's FIRST document id folds in a
    bigram-keyed exchange (per-batch (bg, min doc_id) partials, then
    the bucket-global min), every bucket emits only its O(K)
    checkpoint counts, and the driver sums K numbers per bucket. The
    curve's growth shape (new bigrams keep arriving) is the empirical
    Heaps signal the count-of-counts `vocab_coverage` cannot see."""
    from .pipelines.relational import bucketed_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ks = np.array(HEAPS_CHECKPOINTS, np.int64)

    def pairs(t: pa.Table) -> pa.Table:
        e = _bigram_pairs_batch(t, "doc_id")
        # per-batch partial min doc_id per bigram; emit ARROW (see
        # set_cover pairs)
        g = (e.groupby("bg", as_index=False)["doc_id"].min()
             .rename(columns={"doc_id": "first_doc"}))
        return pa.table({"bg": pa.array(g["bg"], pa.string()),
                         "first_doc": pa.array(
                             g["first_doc"].to_numpy(np.int64))})

    def counts(t: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.nulls(0, pa.int64()),
                          "vocab_size": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().groupby("bg")["first_doc"].min()
        first = df.to_numpy(np.int64)
        v = (first[None, :] < ks[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"k": pa.array(ks), "vocab_size": pa.array(v)})

    parts = bucketed_reduce(
        docs.map_batches(pairs, batch_format="pyarrow").repartition(16),
        "bg", counts, n_buckets=16,
        schema=pa.schema([("bg", pa.string()), ("first_doc", pa.int64())]))
    out = (parts.to_pandas().groupby("k", as_index=False)["vocab_size"]
           .sum().sort_values("k"))
    return out.astype({"k": "int64", "vocab_size": "int64"}) \
        .reset_index(drop=True)


def _heaps_sql() -> str:
    lits = ", ".join(str(k) for k in HEAPS_CHECKPOINTS)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), firsts AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bg, min(doc_id) AS first_doc
  FROM toks, unnest(range(1, len(ws))) t(i)
  GROUP BY 1
), ks AS (SELECT unnest([{lits}]) AS k)
SELECT k::BIGINT AS k,
       (SELECT count(*) FROM firsts WHERE first_doc < ks.k)::BIGINT
         AS vocab_size
FROM ks
"""


CSV_SNAPSHOT = "/tmp/crawlray_csv/documents.csv"


def q_csv_roundtrip(sf_dir: str):
    """CSV source-format PARITY — the `jsonl_roundtrip` audit for the
    third ingest format: a deterministic CSV snapshot of documents
    (written once, driver-side, keyed to the sf dir; proper quoting
    via the csv module) is read back through ``ray.data.read_csv``
    and aggregated per source; the oracle reads the SAME file through
    DuckDB ``read_csv_auto``. Any quoting, header, or type-inference
    drift between the two CSV readers breaks the char sums."""
    import csv
    import os

    os.makedirs(os.path.dirname(CSV_SNAPSHOT), exist_ok=True)
    marker = CSV_SNAPSHOT + ".src"
    want = sf_dir.rstrip("/")
    if not os.path.exists(marker) or open(marker).read() != want:
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "source", "n_chars", "text"])
        with open(CSV_SNAPSHOT, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["doc_id", "source", "n_chars", "text"])
            for row in t.to_pylist():
                w.writerow([row["doc_id"], row["source"],
                            row["n_chars"], row["text"]])
        with open(marker, "w") as f:
            f.write(want)

    ds = rd.read_csv(CSV_SNAPSHOT)

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"source": t["source"],
                       "n_chars": t["n_chars"].cast(pa.int64()),
                       "text_len": pc.utf8_length(t["text"])
                       .cast(pa.int64())})
             .group_by("source")
             .aggregate([("n_chars", "sum"), ("text_len", "sum"),
                         ("n_chars", "count")]))
        return pa.table({"source": g["source"],
                         "n_docs": g["n_chars_count"].cast(pa.int64()),
                         "sum_chars": g["n_chars_sum"],
                         "sum_text_len": g["text_len_sum"]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("source", as_index=False)
           .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"),
                sum_text_len=("sum_text_len", "sum"))
           .sort_values("source"))
    return out.astype({"n_docs": "int64", "sum_chars": "int64",
                       "sum_text_len": "int64"}).reset_index(drop=True)


SQL_CSV_ROUNDTRIP = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(length(text))::BIGINT AS sum_text_len
FROM read_csv_auto('{CSV_SNAPSHOT}')
GROUP BY 1
"""


HARM_N_SOURCES = 4
HARM_LCM = 840          # lcm(1..8) — depths are capped at BFS_MAX_DEPTH


def q_harmonic_centrality(sf_dir: str):
    """HARMONIC CENTRALITY of the first 4 seed pages over the
    mini-web outlink graph — the disconnected-safe closeness variant
    (sum of 1/d over reachable nodes; unreachable nodes contribute 0
    instead of poisoning the mean): per source, the reachable count
    and the harmonic sum as an EXACT reduced rational (depths are
    BFS levels <= 8, so every term is n_d / d and the driver folds
    Fractions over the O(depths) histogram). Reuses the sharded
    first-visit BFS (`graph.bfs_depths`, edges materialized once);
    per source only the depth histogram crosses to the driver. The
    oracle runs the same multi-source walk as ONE recursive CTE
    carrying the source column and reduces hsum/840 by gcd."""
    from fractions import Fraction

    from .htmlx import parse_document
    from .pipelines.graph import bfs_depths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls],
                          override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = seeds.map_batches(edges_of,
                              batch_format="pyarrow").materialize()

    def depth_hist(t: pa.Table) -> pa.Table:
        g = (pa.table({"d": t["depth"]}).group_by(["d"])
             .aggregate([("d", "count")]))
        return pa.table({"d": g["d"],
                         "n": g["d_count"].cast(pa.int64())})

    rows = []
    for s in urls[:HARM_N_SOURCES]:
        depths = bfs_depths(edges, [s], n_shards=8,
                            max_depth=BFS_MAX_DEPTH)
        h = (depths.map_batches(depth_hist, batch_format="pyarrow")
             .to_pandas().groupby("d")["n"].sum())
        if h.empty:
            continue        # seed absent from the edge set (contract)
        harm = sum((Fraction(int(n), int(d))
                    for d, n in h.items() if d > 0), Fraction(0))
        reach = int(h[h.index > 0].sum())
        rows.append((s, reach, harm.numerator, harm.denominator))
    return (pd.DataFrame(rows, columns=["source_url", "n_reachable",
                                        "harm_num", "harm_den"])
            .astype({"n_reachable": "int64", "harm_num": "int64",
                     "harm_den": "int64"}))


@functools.lru_cache(maxsize=1)
def _harmonic_sql() -> str:
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(f"({_sql_str(s)}, {_sql_str(t)})"
                      for s, t in zip(src, dst))
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    seed_urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
                 for i in range(HARM_N_SOURCES)]
    seed_rows = ", ".join(f"({_sql_str(u)})" for u in seed_urls)
    return f"""
WITH RECURSIVE edges(src, dst) AS (VALUES
{rows}
),
seeds(u) AS (
  SELECT u FROM (VALUES {seed_rows}) s(u)
  WHERE u IN (SELECT src FROM edges UNION SELECT dst FROM edges)
),
walk(s, u, d) AS (
  SELECT u, u, 0 FROM seeds
  UNION
  SELECT w.s, e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.u
  WHERE w.d < {BFS_MAX_DEPTH}
),
md AS (SELECT s, u, min(d) AS d FROM walk GROUP BY 1, 2),
agg AS (
  SELECT s AS source_url,
         count(*) FILTER (WHERE d > 0)::BIGINT AS n_reachable,
         coalesce(sum({HARM_LCM} // d) FILTER (WHERE d > 0), 0)::BIGINT
           AS hsum
  FROM md GROUP BY 1
)
SELECT source_url, n_reachable,
       (CASE WHEN hsum = 0 THEN 0
             ELSE hsum // gcd(hsum, {HARM_LCM}) END)::BIGINT AS harm_num,
       (CASE WHEN hsum = 0 THEN 1
             ELSE {HARM_LCM} // gcd(hsum, {HARM_LCM}) END)::BIGINT
         AS harm_den
FROM agg
"""


SKYBAND_K = 3


def q_skyband_parts(sf_dir: str):
    """K-SKYBAND (k = 3) over parts on (minimize price, maximize
    size) — the skyline's tolerant generalization: every part
    dominated by FEWER than 3 others, with its exact dominator count.
    Two passes via the local-count identity (a batch's dominators are
    a subset of the global set, so local count >= k already proves
    exclusion and a global skyband point always survives its own
    batch): pass 1 keeps per-batch candidates with < k local
    dominators (vectorized O(batch^2) dominance matrix, the
    `skyline_3d` kernel), pass 2 broadcasts the bounded candidate
    set and folds per-batch dominator-count partials (O(cands) rows
    per block). Equal (price, size) twins never dominate each other
    (one strict inequality required), matching the oracle's
    predicate."""
    import ray

    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.nulls(0, pa.int64()),
                          "c": pa.nulls(0, pa.int64()),
                          "s": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        s = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        le = c[:, None] <= c[None, :]
        ge = s[:, None] >= s[None, :]
        strict = (c[:, None] < c[None, :]) | (s[:, None] > s[None, :])
        n_dom = (le & ge & strict).sum(axis=0)
        keep = n_dom < SKYBAND_K
        return pa.table({"key": pa.array(key[keep]),
                         "c": pa.array(c[keep]),
                         "s": pa.array(s[keep])})

    cand = (ds.map_batches(local, batch_format="pyarrow").to_pandas())
    ck = cand["key"].to_numpy(np.int64)
    cc = cand["c"].to_numpy(np.int64)
    cs = cand["s"].to_numpy(np.int64)
    cand_ref = ray.put((ck, cc, cs))

    def count_partial(t: pa.Table) -> pa.Table:
        k_, c_, s_ = ray.get(cand_ref)
        empty = pa.table({"key": pa.nulls(0, pa.int64()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0 or len(k_) == 0:
            return empty
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        s = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        le = c[:, None] <= c_[None, :]
        ge = s[:, None] >= s_[None, :]
        strict = (c[:, None] < c_[None, :]) | (s[:, None] > s_[None, :])
        n = (le & ge & strict).sum(axis=0).astype(np.int64)
        return pa.table({"key": pa.array(k_), "n": pa.array(n)})

    parts = (ds.map_batches(count_partial, batch_format="pyarrow")
             .to_pandas().groupby("key", as_index=False)["n"].sum())
    out = parts[parts["n"] < SKYBAND_K].rename(
        columns={"key": "p_partkey", "n": "n_dominators"})
    return (out.sort_values("p_partkey")
            .astype({"p_partkey": "int64", "n_dominators": "int64"})
            .reset_index(drop=True))


SQL_SKYBAND_PARTS = f"""
WITH d AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
), cnt AS (
  SELECT a.p_partkey, count(b.p_partkey)::BIGINT AS n_dominators
  FROM d a LEFT JOIN d b
    ON b.c <= a.c AND b.p_size >= a.p_size
   AND (b.c < a.c OR b.p_size > a.p_size)
  GROUP BY 1
)
SELECT p_partkey, n_dominators FROM cnt
WHERE n_dominators < {SKYBAND_K}
"""


WM_ALLOWED_SEC = 60


def q_watermark_trigger_counts(sf_dir: str):
    """STREAMING TRIGGER ACCOUNTING — for every hourly event-time
    window, how the 60s-allowed-lateness watermark would fire it:
    the window FIRES at the first arrival (arrival order = event_id)
    whose timestamp reaches window_end + 60s, and every window event
    arriving AFTER that firing arrival is a LATE UPDATE (the
    retraction/upsert cost of a streaming sink). Closed form: the
    firing arrival is T(h) = min event_id with ts >= end(h) + 60s, a
    pure threshold min — so pass 1 folds per-(hour, sub-minute) min-id
    partials (O(blocks x hours) rows) into T per window by suffix
    minima, and pass 2 broadcasts T and counts id > T(hour) per
    window. No prefix scan ever materializes; the sf corpus arrives
    in order so the non-zero late path is pinned by a crafted test
    (the `lateness_profile` precedent)."""
    import ray

    US = 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // US
        hr = sec // 3600
        late_in_hr = (sec - hr * 3600) >= WM_ALLOWED_SEC
        g = pd.DataFrame({"hr": hr, "id": ids, "late": late_in_hr})
        a = g.groupby("hr").agg(n=("id", "count"), min_id=("id", "min"))
        b = (g[g["late"]].groupby("hr")["id"].min()
             .reindex(a.index)
             .fillna(np.iinfo(np.int64).max).astype(np.int64))
        return pa.table({
            "hr": pa.array(a.index.to_numpy(np.int64)),
            "n": pa.array(a["n"].to_numpy(np.int64)),
            "min_id_all": pa.array(a["min_id"].to_numpy(np.int64)),
            "min_id_after60": pa.array(b.to_numpy()),
        })

    p = (ev.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("hr").agg(n=("n", "sum"), min_id_all=("min_id_all", "min"),
                            min_id_after60=("min_id_after60", "min")))
    hrs = p.index.to_numpy(np.int64)
    lo, hi = int(hrs.min()), int(hrs.max())
    span = np.arange(lo, hi + 1, dtype=np.int64)
    BIG = np.iinfo(np.int64).max
    min_all = np.full(len(span), BIG, np.int64)
    min_a60 = np.full(len(span), BIG, np.int64)
    min_all[hrs - lo] = p["min_id_all"].to_numpy(np.int64)
    min_a60[hrs - lo] = p["min_id_after60"].to_numpy(np.int64)
    # suffix min of min_all over hours >= h+2, combined with hour h+1's
    # after-60s min: T(h) = min id with ts >= (h+1)*3600 + 60
    suf = np.minimum.accumulate(min_all[::-1])[::-1]
    t_fire = np.full(len(span), BIG, np.int64)
    t_fire[:-1] = np.minimum(t_fire[:-1], min_a60[1:])
    t_fire[:-2] = np.minimum(t_fire[:-2], suf[2:])
    fire_ref = ray.put((lo, t_fire))

    def late_partial(t: pa.Table) -> pa.Table:
        lo_, fire = ray.get(fire_ref)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // US
        hr = sec // 3600
        thr = fire[hr - lo_]
        g = pd.DataFrame({"hr": hr, "late": ids > thr})
        a = g.groupby("hr")["late"].sum()
        return pa.table({"hr": pa.array(a.index.to_numpy(np.int64)),
                         "n_late": pa.array(a.to_numpy(np.int64))})

    late = (ev.map_batches(late_partial, batch_format="pyarrow")
            .to_pandas().groupby("hr")["n_late"].sum())
    out = pd.DataFrame({
        "window_hour": p.index.to_numpy(np.int64),
        "n_events": p["n"].to_numpy(np.int64),
        "n_late_updates": late.reindex(p.index).fillna(0)
        .to_numpy(np.int64),
        "fired": (t_fire[hrs - lo] < BIG).astype(np.int64)})
    return out.astype({"window_hour": "int64", "n_events": "int64",
                       "n_late_updates": "int64", "fired": "int64"})


SQL_WATERMARK_TRIGGER_COUNTS = f"""
WITH e AS (
  SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h
  FROM events
), thr AS (
  SELECT hh.h,
         (SELECT min(id) FROM e e2
          WHERE e2.t >= (hh.h + 1) * 3600 + {WM_ALLOWED_SEC}) AS t_fire
  FROM (SELECT DISTINCT h FROM e) hh
)
SELECT e.h AS window_hour, count(*)::BIGINT AS n_events,
       sum(CASE WHEN thr.t_fire IS NOT NULL AND e.id > thr.t_fire
                THEN 1 ELSE 0 END)::BIGINT AS n_late_updates,
       (CASE WHEN max(thr.t_fire) IS NOT NULL
             THEN 1 ELSE 0 END)::BIGINT AS fired
FROM e JOIN thr ON thr.h = e.h
GROUP BY 1
"""


def q_encoding_advisor(sf_dir: str):
    """ENCODING ADVISOR — the format decision the three planners feed:
    for each low-cardinality lineitem column, the byte cost under
    PLAIN (sum of value lengths), DICTIONARY (dict payload +
    ceil(rows x index_bits / 8)) and per-order RLE (runs never cross
    an l_orderkey boundary — row-group-aligned RLE — at 3 bytes per
    run: 2-byte length + 1-byte dict index), and the argmin with the
    deterministic name-ascending tie order dict < plain < rle. One
    orderkey exchange computes runs for BOTH columns; dict/plain
    stats fold from O(blocks x values) partials."""
    from .pipelines.relational import bucketed_reduce

    cols = list(DICT_COLUMNS)
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", *cols])

    def vstats(t: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            g = (pa.table({"v": t[c]}).group_by(["v"])
                 .aggregate([("v", "count")]))
            frames.append(pa.table({
                "col": pa.array([c] * g.num_rows, pa.string()),
                "v": g["v"], "n": g["v_count"].cast(pa.int64())}))
        return pa.concat_tables(frames)

    vals = (ds.map_batches(vstats, batch_format="pyarrow").to_pandas()
            .groupby(["col", "v"], as_index=False)["n"].sum())

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"okey": t["l_orderkey"],
                         "lineno": t["l_linenumber"].cast(pa.int64()),
                         **{c: t[c] for c in cols}})

    def runs_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"col": pa.nulls(0, pa.string()),
                          "n_runs": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        ok = t["okey"].to_numpy(zero_copy_only=False)
        ln = t["lineno"].to_numpy(zero_copy_only=False)
        out_c, out_n = [], []
        for c in cols:
            # the synthetic lineitem has duplicate (okey, lineno)
            # pairs, so the value itself is the deterministic final
            # sort key — equal values group together inside a tie
            # (np.unique codes are in lexicographic vocab order,
            # matching the oracle's ORDER BY ... v)
            _, codes = np.unique(
                np.asarray(t[c].to_numpy(zero_copy_only=False), object),
                return_inverse=True)
            order = np.lexsort((codes, ln, ok))
            cv = codes[order]
            ov = ok[order]
            brk = np.r_[True, (ov[1:] != ov[:-1]) | (cv[1:] != cv[:-1])]
            out_c.append(c)
            out_n.append(int(brk.sum()))
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "n_runs": pa.array(out_n, pa.int64())})

    runs = bucketed_reduce(
        ds.map_batches(prep, batch_format="pyarrow"),
        "okey", runs_fn, n_buckets=32,
        schema=pa.schema([("okey", pa.int64()), ("lineno", pa.int64()),
                          *[(c, pa.string()) for c in cols]]))
    run_tot = (runs.to_pandas().groupby("col")["n_runs"].sum())

    rows = []
    for c, g in vals.groupby("col"):
        k = len(g)
        width = 1
        while (1 << width) < k:
            width += 1
        n_rows = int(g["n"].sum())
        plain = int((g["v"].str.len() * g["n"]).sum())
        dict_b = int(g["v"].str.len().sum()) + (n_rows * width + 7) // 8
        rle_b = int(run_tot[c]) * 3
        best = min((dict_b, "dict"), (plain, "plain"), (rle_b, "rle"))[1]
        rows.append((c, plain, dict_b, rle_b, best))
    return (pd.DataFrame(rows, columns=["col", "plain_bytes", "dict_bytes",
                                        "rle_bytes", "best"])
            .astype({"plain_bytes": "int64", "dict_bytes": "int64",
                     "rle_bytes": "int64"}))


def _encoding_advisor_sql() -> str:
    sels = " UNION ALL ".join(
        f"SELECT '{c}' AS col, l_orderkey, l_linenumber, {c} AS v "
        f"FROM lineitem" for c in DICT_COLUMNS)
    return f"""
WITH vals AS ({sels}),
agg AS (SELECT col, v, count(*)::BIGINT AS n FROM vals GROUP BY 1, 2),
stats AS (
  SELECT col, count(*)::BIGINT AS n_distinct,
         sum(length(v) * n)::BIGINT AS plain_bytes,
         sum(length(v))::BIGINT AS dict_payload,
         sum(n)::BIGINT AS n_rows
  FROM agg GROUP BY 1
), width AS (
  SELECT col, plain_bytes,
         (dict_payload
          + (n_rows * greatest(1, ceil(log2(n_distinct))::BIGINT) + 7)
            // 8)::BIGINT AS dict_bytes
  FROM stats
), brk AS (
  SELECT col,
         CASE WHEN lag(v) OVER w IS DISTINCT FROM v
              THEN 1 ELSE 0 END AS b
  FROM vals
  WINDOW w AS (PARTITION BY col, l_orderkey
               ORDER BY l_linenumber, v)
), runs2 AS (
  SELECT col, sum(b)::BIGINT AS n_runs FROM brk GROUP BY 1
)
SELECT w.col, w.plain_bytes, w.dict_bytes,
       (r.n_runs * 3)::BIGINT AS rle_bytes,
       CASE WHEN w.dict_bytes <= w.plain_bytes
             AND w.dict_bytes <= r.n_runs * 3 THEN 'dict'
            WHEN w.plain_bytes <= r.n_runs * 3 THEN 'plain'
            ELSE 'rle' END AS best
FROM width w JOIN runs2 r ON r.col = w.col
"""


def q_ann_recall_audit(sf_dir: str):
    """ANN RECALL@K AUDIT — the pruning trade measured, completing the
    estimator-audit symmetry (CMS/CountSketch/KMV/HLL/HDR audits) for
    the similarity-search family: per query, how many of the PRUNED
    IVF path's top-k survive against exact brute force, as n_overlap
    and integer per-mille recall. Both sides are the already-oracled
    pipelines (`ann_ivf`, `ann_cosine`); their outputs are
    O(queries x k) rows, so the intersection is a bounded driver
    merge — no new shuffle exists. The oracle joins the two SQL
    restatements (nested-WITH CTEs), inheriting `_ann_ivf_sql`'s
    fixed-sf centroid-literal contract."""
    brute = to_table_like(q_ann_cosine(sf_dir))
    ivf = to_table_like(q_ann_ivf(sf_dir))
    b = brute[["query_id", "vec_id"]]
    i = ivf[["query_id", "vec_id"]].assign(hit=np.int64(1))
    m = b.merge(i, on=["query_id", "vec_id"], how="left")
    g = (m.groupby("query_id", as_index=False)["hit"]
         .agg(lambda v: int(v.notna().sum())))
    g = g.rename(columns={"hit": "n_overlap"})
    g["recall_pm"] = (g["n_overlap"] * 1000) // ANN_K
    return g.astype({"query_id": "int64", "n_overlap": "int64",
                     "recall_pm": "int64"}).sort_values("query_id") \
        .reset_index(drop=True)


def to_table_like(res) -> pd.DataFrame:
    """Dataset | Table | DataFrame -> DataFrame (bounded results only)."""
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _ann_recall_sql() -> str:
    return f"""
WITH brute AS ({SQL_ANN_COSINE}),
ivf AS ({_ann_ivf_sql()})
SELECT b.query_id,
       count(i.vec_id)::BIGINT AS n_overlap,
       (count(i.vec_id) * 1000 // {ANN_K})::BIGINT AS recall_pm
FROM brute b
LEFT JOIN ivf i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
GROUP BY 1
"""


def q_diameter_lower_bound(sf_dir: str):
    """GRAPH DIAMETER LOWER BOUND by the classic double-BFS sweep:
    BFS from the first seed page, take the farthest reached node v
    (ties -> lexicographically smallest url), BFS again from v — v's
    eccentricity is a certified lower bound on the directed graph's
    diameter. Both sweeps are the sharded `graph.bfs_depths`; the
    farthest-node pick and the final max fold are per-block argmax
    partials (depth DESC, url ASC), never a driver scan of the node
    set. The oracle runs the same two walks as chained recursive
    CTEs, the second seeded by the first's (d DESC, u ASC) LIMIT 1
    row."""
    from .htmlx import parse_document
    from .pipelines.graph import bfs_depths
    from .synth import World

    cfg = _crawl_cfg(sf_dir)
    world = World(cfg.world)
    urls = [world.url(i % cfg.world.n_hosts, i // cfg.world.n_hosts)
            for i in range(min(PAGERANK_N_URLS, cfg.world.n_urls))]
    seeds = rd.from_items([{"url": u} for u in urls],
                          override_num_blocks=8)

    def edges_of(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u in t["url"].to_pylist():
            for link in parse_document(world.gen_page(u), u).links:
                src.append(u)
                dst.append(link.url)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = seeds.map_batches(edges_of,
                              batch_format="pyarrow").materialize()

    def far_partial(t: pa.Table) -> pa.Table:
        # per-block (depth DESC, url ASC) argmax candidate
        if t.num_rows == 0:
            return pa.table({"url": pa.nulls(0, pa.string()),
                             "depth": pa.nulls(0, pa.int64())})
        df = t.to_pandas().sort_values(["depth", "url"],
                                       ascending=[False, True])
        return pa.table({"url": pa.array([df["url"].iloc[0]], pa.string()),
                         "depth": pa.array([int(df["depth"].iloc[0])])})

    def farthest(depths: rd.Dataset) -> tuple[str, int]:
        c = (depths.map_batches(far_partial, batch_format="pyarrow")
             .to_pandas().sort_values(["depth", "url"],
                                      ascending=[False, True]))
        return str(c["url"].iloc[0]), int(c["depth"].iloc[0])

    d1 = bfs_depths(edges, [urls[0]], n_shards=8,
                    max_depth=BFS_MAX_DEPTH)
    v, _ = farthest(d1)
    d2 = bfs_depths(edges, [v], n_shards=8, max_depth=BFS_MAX_DEPTH)
    w, ecc = farthest(d2)
    return pd.DataFrame({
        "start_url": [urls[0]], "peripheral_url": [v],
        "far_url": [w], "diameter_lb": [ecc]}).astype(
        {"diameter_lb": "int64"})


@functools.lru_cache(maxsize=1)
def _diameter_sql() -> str:
    src, dst = _pagerank_edge_lists(_ORACLE_SF_DIR)
    rows = ",\n".join(f"({_sql_str(s)}, {_sql_str(t)})"
                      for s, t in zip(src, dst))
    from .synth import World

    cfg = _crawl_cfg(_ORACLE_SF_DIR)
    world = World(cfg.world)
    s0 = world.url(0, 0)
    return f"""
WITH RECURSIVE edges(src, dst) AS (VALUES
{rows}
),
walk1(u, d) AS (
  SELECT {_sql_str(s0)}, 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk1 w JOIN edges e ON e.src = w.u
  WHERE w.d < {BFS_MAX_DEPTH}
),
md1 AS (SELECT u, min(d) AS d FROM walk1 GROUP BY 1),
v AS (SELECT u FROM md1 ORDER BY d DESC, u LIMIT 1),
walk2(u, d) AS (
  SELECT u, 0 FROM v
  UNION
  SELECT e.dst, w.d + 1 FROM walk2 w JOIN edges e ON e.src = w.u
  WHERE w.d < {BFS_MAX_DEPTH}
),
md2 AS (SELECT u, min(d) AS d FROM walk2 GROUP BY 1),
far AS (SELECT u, d FROM md2 ORDER BY d DESC, u LIMIT 1)
SELECT {_sql_str(s0)} AS start_url,
       (SELECT u FROM v) AS peripheral_url,
       far.u AS far_url, far.d::BIGINT AS diameter_lb
FROM far
"""


def q_minhash_error_audit(sf_dir: str):
    """MINHASH ESTIMATOR ERROR AUDIT — the near-dup family's entry in
    the estimate-vs-exact audit series (CMS, CountSketch, KMV, HLL,
    HDR, ANN recall): for EVERY LSH candidate pair (threshold 0 — no
    verify cut), the exact Jaccard (the raw IEEE quotient the dedup
    oracle hash-matches) next to the 128-permutation signature
    agreement count n_match, whose n_match/128 is the textbook
    unbiased MinHash estimate. The pair set is the banded-LSH
    collision set (bounded by construction); signatures for candidate
    docs only are re-derived through the same `MinHasher` actor pool
    and joined on the driver at O(pairs). The oracle reuses the full
    md5 permutation chain and counts per-perm equality."""
    from .pipelines.dedup import MinHasher, minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = (minhash_lsh_pairs(docs, jaccard_threshold=0.0,
                               token_hash="md5").to_pandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
    ids = set(np.unique(np.r_[pairs["a"].to_numpy(np.int64),
                              pairs["b"].to_numpy(np.int64)]).tolist())

    def only_cands(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].isin(ids)]

    sigs = (docs.map_batches(only_cands, batch_format="pandas")
            .map_batches(MinHasher, batch_format="pandas",
                         fn_constructor_kwargs={"token_hash": "md5"},
                         concurrency=2)
            .to_pandas())
    lut = {int(d): np.asarray(s, np.uint64)
           for d, s in zip(sigs["doc_id"], sigs["sig"])}
    sa = np.stack([lut[int(x)] for x in pairs["a"]])
    sb = np.stack([lut[int(x)] for x in pairs["b"]])
    pairs["n_match"] = (sa == sb).sum(axis=1).astype(np.int64)
    return pairs.astype({"a": "int64", "b": "int64",
                         "jaccard": "float64", "n_match": "int64"})


def _minhash_error_sql() -> str:
    return f"""
WITH {_minhash_common_ctes()},
cand AS (
  SELECT lag(doc_id) OVER (PARTITION BY band_id, band_hash
                           ORDER BY doc_id) AS a,
         doc_id AS b
  FROM bh
),
pairs AS (SELECT DISTINCT a, b FROM cand WHERE a IS NOT NULL),
verify AS (
  SELECT p.a, p.b,
         len(list_intersect(xa.sh, xb.sh)) AS ni,
         len(xa.sh) + len(xb.sh) - len(list_intersect(xa.sh, xb.sh))
           AS nu
  FROM pairs p
  JOIN shl xa ON xa.doc_id = p.a
  JOIN shl xb ON xb.doc_id = p.b
),
sigm AS (
  SELECT p.a, p.b,
         sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM pairs p
  JOIN mh ma ON ma.doc_id = p.a
  JOIN mh mb ON mb.doc_id = p.b AND mb.i = ma.i
  GROUP BY 1, 2
)
SELECT v.a::BIGINT AS a, v.b::BIGINT AS b,
       (CASE WHEN v.nu = 0 THEN 1.0
             ELSE v.ni::DOUBLE / v.nu END) AS jaccard,
       s.n_match
FROM verify v JOIN sigm s ON s.a = v.a AND s.b = v.b
"""


def q_simhash_error_audit(sf_dir: str):
    """SIMHASH ESTIMATOR ERROR AUDIT — the 64-bit-signature sibling of
    `minhash_error_audit`, and the first ORACLED text-SimHash PAIR
    query (the catalog's `simhash` entry publishes signatures only):
    for every banded candidate pair at Hamming <= 3 (4x16-bit
    pigeonhole blocking — complete by construction at this radius),
    the Hamming distance next to the EXACT distinct-word overlap as
    integers (n_inter, n_union) — no float ever. Pairs come from the
    distributed `simhash_near_dups` chain; word sets for the bounded
    candidate set fold from one filtered pass and the O(pairs) merge
    runs on the driver. The oracle reuses the full SQL_SIMHASH md5
    sign-aggregation chain, a band-equality self-join and
    bit_count(xor(...))."""
    from .pipelines.dedup import simhash_near_dups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = (simhash_near_dups(docs).to_pandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64"),
                             "n_inter": pd.Series([], dtype="int64"),
                             "n_union": pd.Series([], dtype="int64")})
    ids = set(np.unique(np.r_[pairs["a"].to_numpy(np.int64),
                              pairs["b"].to_numpy(np.int64)]).tolist())

    def word_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["doc_id"].isin(ids)]
        e = (g[["doc_id"]]
             .assign(w=g["text"].fillna("").str.split())
             .explode("w").dropna(subset=["w"]).drop_duplicates())
        return pd.DataFrame({"doc_id": e["doc_id"].astype("int64"),
                             "w": e["w"].astype(str)})

    wr = docs.map_batches(word_rows, batch_format="pandas").to_pandas()
    sets: dict[int, frozenset] = {i: frozenset() for i in ids}
    for d, g in wr.groupby("doc_id"):
        sets[int(d)] = frozenset(g["w"])
    ni, nu = [], []
    for a, b in zip(pairs["a"], pairs["b"]):
        A, B = sets[int(a)], sets[int(b)]
        i = len(A & B)
        ni.append(i)
        nu.append(len(A) + len(B) - i)
    pairs["n_inter"] = np.array(ni, np.int64)
    pairs["n_union"] = np.array(nu, np.int64)
    return pairs.astype({"a": "int64", "b": "int64", "hamming": "int64",
                         "n_inter": "int64", "n_union": "int64"})


def _simhash_error_sql() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band, sh_band{i} AS key FROM sigs"
        for i in range(4))
    return f"""
WITH sigs AS ({SQL_SIMHASH}),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
ham AS (
  SELECT c.a, c.b,
         bit_count(xor(sa.simhash, sb.simhash))::BIGINT AS hamming
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.a
  JOIN sigs sb ON sb.doc_id = c.b
),
ws AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE list_distinct(
                regexp_split_to_array(trim(text), '\\s+')) END AS w
  FROM documents
)
SELECT h.a, h.b, h.hamming,
       len(list_intersect(wa.w, wb.w))::BIGINT AS n_inter,
       (len(wa.w) + len(wb.w)
        - len(list_intersect(wa.w, wb.w)))::BIGINT AS n_union
FROM ham h
JOIN ws wa ON wa.doc_id = h.a
JOIN ws wb ON wb.doc_id = h.b
WHERE h.hamming <= 3
"""


SESSION_SWEEP_TIMEOUTS = [900, 1800, 3600]


def q_session_timeout_sweep(sf_dir: str):
    """SESSION-TIMEOUT PARAMETER SWEEP — the 'pick the gap threshold'
    analysis in ONE scan: for timeouts {15, 30, 60} min, the total
    session count and how many sessions are single-event — computed
    from ONE user-keyed exchange where the inter-event gaps are
    derived once and each threshold is a vectorized comparison over
    the same arrays (parameter sweeps share the shuffle, not repeat
    it). Order contract (ts, event_id) per user as in the RLE/gorilla
    kernels; strict `gap > T` break."""
    from .pipelines.relational import bucketed_reduce

    US = 1_000_000
    thr = np.array(SESSION_SWEEP_TIMEOUTS, np.int64) * US
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["user_id"],
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"]})

    def sweep(t: pa.Table) -> pa.Table:
        empty = pa.table({"timeout_sec": pa.nulls(0, pa.int64()),
                          "n_sessions": pa.nulls(0, pa.int64()),
                          "n_singletons": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        out_t, out_s, out_1 = [], [], []
        for T in thr:
            brk = new_user | (gap > T)
            starts = np.flatnonzero(brk)
            lens = np.diff(np.r_[starts, n])
            out_t.append(int(T // US))
            out_s.append(len(starts))
            out_1.append(int((lens == 1).sum()))
        return pa.table({"timeout_sec": pa.array(out_t, pa.int64()),
                         "n_sessions": pa.array(out_s, pa.int64()),
                         "n_singletons": pa.array(out_1, pa.int64())})

    parts = bucketed_reduce(
        ev.map_batches(prep, batch_format="pyarrow"),
        "u", sweep, n_buckets=32,
        schema=pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                          ("eid", pa.int64())]))
    out = (parts.to_pandas().groupby("timeout_sec", as_index=False).sum()
           .sort_values("timeout_sec"))
    return out.astype({"timeout_sec": "int64", "n_sessions": "int64",
                       "n_singletons": "int64"}).reset_index(drop=True)


def _session_sweep_sql() -> str:
    subs = []
    for t_s in SESSION_SWEEP_TIMEOUTS:
        subs.append(f"""
SELECT {t_s}::BIGINT AS timeout_sec,
       count(*) FILTER (WHERE brk = 1)::BIGINT AS n_sessions,
       (SELECT count(*) FROM (
          SELECT user_id, sid, count(*) AS c FROM (
            SELECT user_id,
                   sum(brk) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w
                               > INTERVAL {t_s} SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
          ) GROUP BY 1, 2
        ) WHERE c = 1)::BIGINT AS n_singletons
FROM (
  SELECT CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {t_s} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)""")
    return " UNION ALL ".join(subs)


def q_edge_support(sf_dir: str):
    """PER-EDGE TRIANGLE SUPPORT of the co-purchase graph — the
    k-truss ingredient extending `triangle_counts`' per-node fold to
    edges: for every (a < b) edge in >= 1 triangle, how many
    triangles run through it. Same bounded graph (l_partkey % 5 == 0)
    and the same enumerated-triangle core (`graph.triangle_rows`);
    the per-edge fold packs (a, b) into one int64 key for a single
    np.unique partial per batch. The oracle enumerates oriented
    triangles (u < v < w) with a three-way edge self-join and
    UNION-ALL-projects each onto its three edges."""
    from .pipelines.graph import edge_support

    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")
    return edge_support(li, group="l_orderkey", node="l_partkey")


SQL_EDGE_SUPPORT = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey % {TRIANGLE_PART_MOD} = 0
),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
proj AS (
  SELECT u AS a, v AS b FROM tri
  UNION ALL SELECT u, w FROM tri
  UNION ALL SELECT v, w FROM tri
)
SELECT a, b, count(*)::BIGINT AS support FROM proj GROUP BY 1, 2
"""


def q_open_orders_daily(sf_dir: str):
    """OPEN-ORDER BACKLOG TIMELINE — for every day of the calendar,
    how many orders are placed but not yet fully shipped (order open
    on day d iff o_orderdate_day <= d <= max(l_shipdate)_day). One
    TAGGED-UNION exchange by orderkey fuses the per-order max-ship
    fold with the orders join (no second shuffle); each bucket emits
    only O(days) boundary partials (+1 at open, -1 after close) and
    the driver cumsums the day spine. Orders with no lineitem are
    excluded (join semantics, matching the oracle). Days are epoch
    days (int64)."""
    from .pipelines.relational import bucketed_reduce

    US_DAY = 86_400_000_000
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // US_DAY
        g = (pd.DataFrame({"okey": t["l_orderkey"].to_numpy(
            zero_copy_only=False), "d": ship})
            .groupby("okey", as_index=False)["d"].max())
        return pa.table({"okey": pa.array(g["okey"].to_numpy(np.int64)),
                         "d": pa.array(g["d"].to_numpy(np.int64)),
                         "tag": pa.array(np.ones(len(g), np.int64))})

    def o_prep(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // US_DAY
        return pa.table({"okey": t["o_orderkey"],
                         "d": pa.array(od.astype(np.int64)),
                         "tag": pa.array(np.zeros(t.num_rows, np.int64))})

    both = li.map_batches(li_prep, batch_format="pyarrow").union(
        orders.map_batches(o_prep, batch_format="pyarrow"))

    def bounds(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.nulls(0, pa.int64()),
                          "delta": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        ship = (df[df["tag"] == 1].groupby("okey")["d"].max())
        od = df[df["tag"] == 0].set_index("okey")["d"]
        j = pd.concat([od.rename("od"), ship.rename("ship")], axis=1) \
            .dropna()
        # the synthetic data has INVERTED intervals (max ship day
        # before the order day); those orders are open on NO day
        # (od <= d <= ship is unsatisfiable) — drop them rather than
        # let the -1 land before the +1 and fold a negative span
        j = j[j["ship"] >= j["od"]]
        opens = j["od"].astype(np.int64)
        closes = j["ship"].astype(np.int64) + 1
        days = np.r_[opens.to_numpy(), closes.to_numpy()]
        deltas = np.r_[np.ones(len(j), np.int64),
                       -np.ones(len(j), np.int64)]
        u = pd.DataFrame({"day": days, "delta": deltas}) \
            .groupby("day", as_index=False)["delta"].sum()
        return pa.table({"day": pa.array(u["day"].to_numpy(np.int64)),
                         "delta": pa.array(u["delta"].to_numpy(np.int64))})

    parts = bucketed_reduce(
        both, "okey", bounds, n_buckets=32,
        schema=pa.schema([("okey", pa.int64()), ("d", pa.int64()),
                          ("tag", pa.int64())]))
    b = (parts.to_pandas().groupby("day", as_index=False)["delta"].sum()
         .sort_values("day"))
    lo, hi = int(b["day"].min()), int(b["day"].max())
    spine = np.arange(lo, hi, dtype=np.int64)   # hi is last close+1
    deltas = np.zeros(len(spine), np.int64)
    idx = b["day"].to_numpy(np.int64) - lo
    m = idx < len(spine)
    np.add.at(deltas, idx[m], b["delta"].to_numpy(np.int64)[m])
    return pd.DataFrame({"day": spine,
                         "n_open": np.cumsum(deltas).astype(np.int64)})


SQL_OPEN_ORDERS_DAILY = """
WITH ms AS (
  SELECT l_orderkey,
         max(CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400) AS ship
  FROM lineitem GROUP BY 1
), o AS (
  SELECT o.o_orderkey,
         CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS od,
         ms.ship
  FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey
), span AS (SELECT min(od) AS lo, max(ship) AS hi FROM o),
days AS (
  -- lateral column args are not allowed in range(); filter a fixed
  -- 20000-day (~54 yr) grid instead (the fano-burstiness idiom)
  SELECT lo + r AS day FROM span, range(20000) t(r)
  WHERE r <= hi - lo
)
SELECT d.day::BIGINT AS day,
       (SELECT count(*) FROM o
        WHERE o.od <= d.day AND o.ship >= d.day)::BIGINT AS n_open
FROM days d
"""


def q_dbscan_clusters(sf_dir: str):
    """DBSCAN CLUSTER LABELS for core points — completing
    `dbscan_core_points` into the full density clustering (standard
    core-graph simplification: a cluster is a connected component of
    cores within each other's eps-ball; border assignment is a
    documented out-of-scope tiebreak). Three distributed stages, no
    new shuffle kind: (1) the existing boundary-replicated ball-count
    exchange yields core flags; (2) the core id set broadcasts once
    and a second replication exchange emits core-core edges via the
    y-sorted lag-distance loop (both dims checked; a pair surfacing
    from two buckets is a harmless duplicate edge — min-label
    propagation is idempotent); (3) `connected_components_ds` labels
    every core with its component's min id (self-edges keep isolated
    cores as singletons). The oracle reruns the quadratic core test
    and a recursive-CTE closure."""
    import ray

    from .pipelines.dedup import connected_components_ds
    from .pipelines.relational import bucketed_reduce

    cores_df = to_table_like(q_dbscan_core_points(sf_dir))
    core_ids = np.sort(cores_df.loc[cores_df["is_core"] == 1,
                                    "p_partkey"].to_numpy(np.int64))
    if len(core_ids) == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64")})
    ids_ref = ray.put(core_ids)

    parts = _read(sf_dir, "part",
                  ["p_partkey", "p_size", "p_retailprice"])

    def replicate_cores(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(key, ids)
        size = t["p_size"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[m]
        key = key[m]
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "bucket": pa.array(np.r_[size, size - 1, size + 1]),
            "key": pa.array(np.r_[key, key, key]),
            "c": pa.array(np.r_[c, c, c]),
            "s": pa.array(np.r_[size, size, size]),
            "is_probe": pa.array(np.r_[np.ones(len(size), np.int64),
                                       np.zeros(2 * len(size),
                                                np.int64)])})

    def edges_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.nulls(0, pa.int64()),
                          "b": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        b = t["bucket"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False) == 1
        oa, ob = [], []
        for bb in np.unique(b[probe]):
            m = b == bb
            kk, cc, ss, pp = key[m], c[m], s[m], probe[m]
            o = np.lexsort((kk, cc))
            kk, cc, ss, pp = kk[o], cc[o], ss[o], pp[o]
            n = len(kk)
            for off in range(1, n):
                i = np.arange(n - off)
                dy = cc[i + off] - cc[i]
                live = dy <= DBSCAN_CENTS_EPS
                if not live.any():
                    break
                ii = i[live]
                ok = (np.abs(ss[ii] - ss[ii + off]) <= DBSCAN_SIZE_EPS) \
                    & (pp[ii] | pp[ii + off]) \
                    & (kk[ii] != kk[ii + off])
                jj = ii[ok]
                if len(jj):
                    oa.append(np.minimum(kk[jj], kk[jj + off]))
                    ob.append(np.maximum(kk[jj], kk[jj + off]))
        if not oa:
            return empty
        return pa.table({"a": pa.array(np.concatenate(oa)),
                         "b": pa.array(np.concatenate(ob))})

    edges = bucketed_reduce(
        parts.map_batches(replicate_cores, batch_format="pyarrow"),
        "bucket", edges_fn, n_buckets=16,
        schema=pa.schema([("bucket", pa.int64()), ("key", pa.int64()),
                          ("c", pa.int64()), ("s", pa.int64()),
                          ("is_probe", pa.int64())]))
    selfp = rd.from_arrow(pa.table({"a": pa.array(core_ids),
                                    "b": pa.array(core_ids)}))
    cc = to_table_like(connected_components_ds(edges.union(selfp)))
    cc = cc[cc["doc_id"].isin(set(core_ids.tolist()))]
    return (cc.rename(columns={"doc_id": "p_partkey"})
            .astype({"p_partkey": "int64", "cluster": "int64"})
            .sort_values("p_partkey").reset_index(drop=True))


SQL_DBSCAN_CLUSTERS = f"""
WITH RECURSIVE p AS (
  SELECT p_partkey, p_size::BIGINT AS s,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
), core AS (
  SELECT a.p_partkey, a.s, a.c
  FROM p a JOIN p b
    ON b.p_partkey <> a.p_partkey
   AND abs(b.s - a.s) <= {DBSCAN_SIZE_EPS}
   AND abs(b.c - a.c) <= {DBSCAN_CENTS_EPS}
  GROUP BY 1, 2, 3
  HAVING count(*) >= {DBSCAN_MINPTS}
), e AS (
  SELECT x.p_partkey AS s, y.p_partkey AS d
  FROM core x JOIN core y
    ON x.p_partkey <> y.p_partkey
   AND abs(x.s - y.s) <= {DBSCAN_SIZE_EPS}
   AND abs(x.c - y.c) <= {DBSCAN_CENTS_EPS}
), nodes AS (SELECT p_partkey AS x FROM core),
reach(x, y) AS (
  SELECT x, x FROM nodes
  UNION
  SELECT r.x, e.d FROM reach r JOIN e ON r.y = e.s
)
SELECT x::BIGINT AS p_partkey, min(y)::BIGINT AS cluster
FROM reach GROUP BY x
"""


LCS_TOP_USERS = 8
LCS_SEQ_CAP = 24


def q_lcs_user_pairs(sf_dir: str):
    """LONGEST-COMMON-SUBSEQUENCE behavioral similarity — for the 8
    most active users (count DESC, id ASC), every pair's LCS length
    over their first 24 event types in (ts, event_id) order: the
    classic sequence-alignment primitive, bounded by construction
    (the documented cap IS the contract, like the interval-scheduling
    family's per-group bounds). Stage 1: per-bucket top-8 candidates
    (8 rows per bucket) pick the global top-8 from O(buckets x 8)
    rows. Stage 2: one user-keyed exchange emits <= 8 x 24 (user,
    pos, type) rows. The driver's 24 x 24 DP per pair is provably the
    LCS; the oracle recomputes it by a STRUCTURALLY different
    algorithm — the chain-extension fixpoint over match cells (the
    `lis_length` idiom), an algorithm-diverse cross-check."""
    from .pipelines.relational import bucketed_reduce

    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])

    def ucount(t: pa.Table) -> pa.Table:
        g = (pa.table({"u": t["user_id"]}).group_by(["u"])
             .aggregate([("u", "count")]))
        return pa.table({"u": g["u"],
                         "n": g["u_count"].cast(pa.int64())})

    def top_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.nulls(0, pa.int64()),
                          "n": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = (t.to_pandas().groupby("u", as_index=False)["n"].sum()
             .sort_values(["n", "u"], ascending=[False, True])
             .head(LCS_TOP_USERS))
        return pa.table({"u": pa.array(g["u"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    cands = bucketed_reduce(
        ev.map_batches(ucount, batch_format="pyarrow"),
        "u", top_bucket, n_buckets=32,
        schema=pa.schema([("u", pa.int64()), ("n", pa.int64())]))
    top = (cands.to_pandas()
           .sort_values(["n", "u"], ascending=[False, True])
           .head(LCS_TOP_USERS))
    top_ids = set(top["u"].astype(int))

    def seq_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        m = np.isin(u, list(top_ids))
        return pa.table({
            "u": pa.array(u[m]),
            "ts": t["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)[m],
            "eid": t["event_id"].to_numpy(zero_copy_only=False)[m],
            "et": pa.array(np.asarray(
                t["event_type"].to_numpy(zero_copy_only=False),
                object)[m], pa.string())})

    def head_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.nulls(0, pa.int64()),
                          "pos": pa.nulls(0, pa.int64()),
                          "et": pa.nulls(0, pa.string())})
        if t.num_rows == 0:
            return empty
        df = (t.to_pandas().sort_values(["u", "ts", "eid"])
              .groupby("u").head(LCS_SEQ_CAP))
        df["pos"] = df.groupby("u").cumcount()
        return pa.table({"u": pa.array(df["u"].to_numpy(np.int64)),
                         "pos": pa.array(df["pos"].to_numpy(np.int64)),
                         "et": pa.array(df["et"], pa.string())})

    rows = bucketed_reduce(
        ev.map_batches(seq_rows, batch_format="pyarrow"),
        "u", head_fn, n_buckets=8,
        schema=pa.schema([("u", pa.int64()), ("ts", pa.int64()),
                          ("eid", pa.int64()), ("et", pa.string())]))
    df = rows.to_pandas().sort_values(["u", "pos"])
    seqs = {int(u): list(g["et"]) for u, g in df.groupby("u")}

    def lcs(a: list, b: list) -> int:
        dp = np.zeros(len(b) + 1, np.int64)
        for x in a:
            prev = 0
            for j, y in enumerate(b):
                cur = int(dp[j + 1])
                dp[j + 1] = prev + 1 if x == y else max(dp[j + 1], dp[j])
                prev = cur
        return int(dp[-1])

    users = sorted(top_ids)
    out = []
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            out.append((ua, ub, lcs(seqs[ua], seqs[ub]),
                        len(seqs[ua]), len(seqs[ub])))
    return (pd.DataFrame(out, columns=["user_a", "user_b", "lcs_len",
                                       "len_a", "len_b"])
            .astype("int64"))


SQL_LCS_USER_PAIRS = f"""
WITH RECURSIVE counts AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY 1
),
top8 AS (SELECT user_id FROM counts
         ORDER BY n DESC, user_id LIMIT {LCS_TOP_USERS}),
seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events WHERE user_id IN (SELECT user_id FROM top8)
),
s AS (SELECT * FROM seq WHERE i <= {LCS_SEQ_CAP}),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub
  FROM top8 a JOIN top8 b ON a.user_id < b.user_id
),
m AS (
  SELECT p.ua, p.ub, x.i AS i, y.i AS j
  FROM pairs p
  JOIN s x ON x.user_id = p.ua
  JOIN s y ON y.user_id = p.ub
  WHERE x.event_type = y.event_type
),
chain(ua, ub, i, j, l) AS (
  SELECT ua, ub, i, j, 1 FROM m
  UNION
  SELECT m.ua, m.ub, m.i, m.j, c.l + 1
  FROM chain c JOIN m
    ON m.ua = c.ua AND m.ub = c.ub AND m.i > c.i AND m.j > c.j
),
lens AS (SELECT user_id, count(*) AS L FROM s GROUP BY 1)
SELECT p.ua AS user_a, p.ub AS user_b,
       coalesce((SELECT max(l) FROM chain c
                 WHERE c.ua = p.ua AND c.ub = p.ub), 0)::BIGINT AS lcs_len,
       la.L::BIGINT AS len_a, lb.L::BIGINT AS len_b
FROM pairs p
JOIN lens la ON la.user_id = p.ua
JOIN lens lb ON lb.user_id = p.ub
"""


def q_brand_modularity(sf_dir: str):
    """NEWMAN MODULARITY of the brand partition over the co-purchase
    graph — 'do brands co-purchase within themselves?': the community
    -quality functional Q = sum_c [e_c/m - (d_c/2m)^2] published as
    an EXACT reduced rational (4m * sum e_c - sum d_c^2) / (4m^2),
    where m counts distinct co-purchase edges (the `triangle_counts`
    graph, l_partkey % 5 == 0), e_c the within-brand edges and d_c
    the brand degree sums. The part->brand map broadcasts once; each
    edge block folds O(brands) partials; the driver does one integer
    gcd. The oracle restates the same sums and reduction."""
    import math

    import ray

    from .pipelines.graph import cooccurrence_edges

    def keep(t: pa.Table) -> pa.Table:
        ids = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % TRIANGLE_PART_MOD == 0))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    p2b = dict(zip(part["p_partkey"].astype(int), part["p_brand"]))
    map_ref = ray.put(p2b)

    def partial(t: pa.Table) -> pa.Table:
        mp = ray.get(map_ref)
        empty = pa.table({"brand": pa.nulls(0, pa.string()),
                          "e_in": pa.nulls(0, pa.int64()),
                          "deg": pa.nulls(0, pa.int64()),
                          "m": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        ba = pd.Series(a).map(mp)
        bb = pd.Series(b).map(mp)
        deg = (pd.concat([ba, bb]).value_counts())
        ein = pd.Series(ba[ba.eq(bb).to_numpy()]).value_counts()
        brands = sorted(set(deg.index))
        return pa.table({
            "brand": pa.array(brands, pa.string()),
            "e_in": pa.array([int(ein.get(x, 0)) for x in brands],
                             pa.int64()),
            "deg": pa.array([int(deg.get(x, 0)) for x in brands],
                            pa.int64()),
            "m": pa.array([len(a) if i == 0 else 0
                           for i in range(len(brands))], pa.int64())})

    p = (edges.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("brand", as_index=False).sum())
    m = int(p["m"].sum())
    e_in = int(p["e_in"].sum())
    d2 = int((p["deg"].astype("int64") ** 2).sum())
    num = 4 * m * e_in - d2
    den = 4 * m * m
    g = math.gcd(abs(num), den)
    return pd.DataFrame({
        "n_edges": [m], "within_edges": [e_in],
        "q_num": [num // g], "q_den": [den // g]}).astype("int64")


SQL_BRAND_MODULARITY = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey % {TRIANGLE_PART_MOD} = 0
),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
lab AS (
  SELECT e.a, e.b, pa.p_brand AS ba, pb.p_brand AS bb
  FROM e JOIN part pa ON pa.p_partkey = e.a
         JOIN part pb ON pb.p_partkey = e.b
),
sums AS (
  SELECT count(*)::BIGINT AS m,
         sum(CASE WHEN ba = bb THEN 1 ELSE 0 END)::BIGINT AS e_in
  FROM lab
),
deg AS (
  SELECT brand, count(*)::BIGINT AS d FROM (
    SELECT ba AS brand FROM lab UNION ALL SELECT bb FROM lab
  ) GROUP BY 1
),
d2 AS (SELECT sum(d * d)::BIGINT AS dd FROM deg),
q AS (
  SELECT sums.m, sums.e_in,
         4 * sums.m * sums.e_in - d2.dd AS num,
         4 * sums.m * sums.m AS den
  FROM sums, d2
)
SELECT m AS n_edges, e_in AS within_edges,
       (num / gcd(abs(num), den))::BIGINT AS q_num,
       (den / gcd(abs(num), den))::BIGINT AS q_den
FROM q
"""


CHUNK_SIZE = 64
CHUNK_OVERLAP = 16


def q_passage_chunks(sf_dir: str):
    """RAG PASSAGE CHUNKING PLAN — the retrieval-corpus preparation
    contract as data: documents split into 64-token windows with
    16-token overlap (stride 48); per doc the whitespace token count,
    the chunk count ceil(max(0, n - 64) / 48) + 1 (one chunk for any
    non-empty doc; empty docs chunk 0) and the last chunk's length
    n - stride * (chunks - 1). Pure map-side closed form — the chunk
    boundary arithmetic IS the operator; actual text slicing is the
    trivial per-chunk substring both engines would agree on by
    construction."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    stride = CHUNK_SIZE - CHUNK_OVERLAP

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].fillna("").str.split().str.len()
             .fillna(0).to_numpy(dtype=np.int64))
        chunks = np.where(
            n == 0, 0, -(-(np.maximum(n - CHUNK_SIZE, 0)) // stride) + 1)
        last = np.where(chunks == 0, 0, n - stride * (chunks - 1))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_tokens": n,
                             "n_chunks": chunks.astype(np.int64),
                             "last_chunk_tokens": last.astype(np.int64)})

    return docs.map_batches(plan, batch_format="pandas")


SQL_PASSAGE_CHUNKS = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         END::BIGINT AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CASE WHEN n = 0 THEN 0
              ELSE (greatest(n - {CHUNK_SIZE}, 0)
                    + {CHUNK_SIZE - CHUNK_OVERLAP} - 1)
                   // {CHUNK_SIZE - CHUNK_OVERLAP} + 1
         END::BIGINT AS n_chunks
  FROM d
)
SELECT doc_id, n AS n_tokens, n_chunks,
       (CASE WHEN n_chunks = 0 THEN 0
             ELSE n - {CHUNK_SIZE - CHUNK_OVERLAP} * (n_chunks - 1)
        END)::BIGINT AS last_chunk_tokens
FROM c
"""


RRF_K = 60
RRF_DEPTH = 10
# lcm(61..70) = 2^6 * 3^2 * 5 * 7 * 11 * 13 * 17 * 23 * 31 * 61 * 67 —
# every RRF term L/(60+rank) is an exact int64 for rank <= 10
RRF_LCM = 142_813_628_717_760


def q_rrf_fusion(sf_dir: str):
    """RECIPROCAL RANK FUSION of two retrieval rankers — the standard
    ensemble trick (Cormack et al. 2009), EXACT: for the union of the
    BM25 top-10 and the raw term-frequency top-10 (same broadcast
    query terms), score = sum over present rankers of
    1/(60 + rank), published as the integer numerator over the FIXED
    denominator lcm(61..70) — no float ever touches the fusion.
    The BM25 side reuses the two-pass pruned pipeline; the tf side
    prunes per-batch top-10 candidates (monotone, so the global
    top-10 of <= 10 x blocks candidates is exact). Absent ranks
    publish -1."""
    import math

    from .pipelines.textops import bm25_topk_ds

    terms = set(BM25_TERMS)
    L = RRF_LCM
    assert L == math.lcm(*range(RRF_K + 1, RRF_K + RRF_DEPTH + 1))

    bm = to_table_like(
        bm25_topk_ds(_read(sf_dir, "documents", ["doc_id", "text"]),
                     BM25_TERMS, k=RRF_DEPTH))
    bm = bm.sort_values(["score", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    r1 = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_prune(df: pd.DataFrame) -> pd.DataFrame:
        e = (df[["doc_id"]]
             .assign(w=df["text"].fillna("").str.split())
             .explode("w"))
        e = e[e["w"].isin(terms)]
        tf = e.groupby("doc_id").size().rename("tf").reset_index()
        out = pd.DataFrame({"doc_id": tf["doc_id"].astype("int64"),
                            "tf": tf["tf"].astype("int64")})
        return out.sort_values(["tf", "doc_id"],
                               ascending=[False, True]).head(RRF_DEPTH)

    cand = (docs.map_batches(tf_prune, batch_format="pandas").to_pandas()
            .sort_values(["tf", "doc_id"], ascending=[False, True])
            .head(RRF_DEPTH).reset_index(drop=True))
    r2 = {int(d): i + 1 for i, d in enumerate(cand["doc_id"])}

    union = sorted(set(r1) | set(r2))
    rows = []
    for d in union:
        a = r1.get(d, 0)
        b = r2.get(d, 0)
        num = (L // (RRF_K + a) if a else 0) \
            + (L // (RRF_K + b) if b else 0)
        rows.append((d, a if a else -1, b if b else -1, num, L))
    return (pd.DataFrame(rows, columns=["doc_id", "rank_bm25", "rank_tf",
                                        "rrf_num", "rrf_den"])
            .astype("int64"))


def _rrf_sql() -> str:
    lits = ", ".join(_sql_str(t) for t in BM25_TERMS)
    return f"""
WITH b0 AS ({_bm25_sql()}),
b AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM b0 QUALIFY rk <= {RRF_DEPTH}
),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
tf AS (
  SELECT doc_id, count(*)::BIGINT AS tf FROM toks
  WHERE w IN ({lits}) GROUP BY 1
),
t AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY tf DESC, doc_id) AS rk
  FROM tf QUALIFY rk <= {RRF_DEPTH}
),
u AS (SELECT doc_id FROM b UNION SELECT doc_id FROM t)
SELECT u.doc_id,
       coalesce(b.rk, -1)::BIGINT AS rank_bm25,
       coalesce(t.rk, -1)::BIGINT AS rank_tf,
       (CASE WHEN b.rk IS NULL THEN 0
             ELSE {RRF_LCM} // ({RRF_K} + b.rk) END
        + CASE WHEN t.rk IS NULL THEN 0
               ELSE {RRF_LCM} // ({RRF_K} + t.rk) END)::BIGINT AS rrf_num,
       {RRF_LCM}::BIGINT AS rrf_den
FROM u
LEFT JOIN b ON b.doc_id = u.doc_id
LEFT JOIN t ON t.doc_id = u.doc_id
"""


def q_chao1_estimate(sf_dir: str):
    """CHAO2 SPECIES-RICHNESS estimate of the bigram vocabulary — the
    'how many n-gram types exist that we have NOT yet crawled?'
    estimator (Chao 1984/1987, incidence-based bias-corrected form):
    documents are the sampling units, so with D observed types, f1
    types seen in exactly one doc and f2 in exactly two,
    est = D + f1(f1-1)/(2(f2+1)), published as one EXACT reduced
    rational. The whole statistic is a function of the
    incidence-count histogram (the `vocab_coverage` insight), so one
    bigram-keyed exchange emits O(distinct counts) rows per bucket
    and the driver does integer arithmetic. The oracle recomputes
    the histogram and the same gcd-reduced rational."""
    import math

    from .pipelines.relational import bucketed_reduce
    from .util import drop_empty_blocks

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        # distinct (doc, bg) incidence pairs; docs are unique rows, so
        # summing per-batch doc counts in the exchange is exact
        e = _bigram_pairs_batch(t, "doc_id")
        bg, n = np.unique(e["bg"].to_numpy(), return_counts=True)
        return pa.table({"bg": pa.array(bg, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    def cc_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"cnt": pa.nulls(0, pa.int64()),
                          "n_types": pa.nulls(0, pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t.group_by("bg").aggregate([("n", "sum")])
        cnt, nt = np.unique(g["n_sum"].to_numpy(zero_copy_only=False),
                            return_counts=True)
        return pa.table({"cnt": pa.array(cnt, pa.int64()),
                         "n_types": pa.array(nt.astype(np.int64))})

    hist = (drop_empty_blocks(bucketed_reduce(
        docs.map_batches(pairs, batch_format="pyarrow").repartition(16),
        "bg", cc_fn, n_buckets=16,
        schema=pa.schema([("bg", pa.string()), ("n", pa.int64())])))
        .to_pandas().groupby("cnt")["n_types"].sum())
    d = int(hist.sum())
    f1 = int(hist.get(1, 0))
    f2 = int(hist.get(2, 0))
    num = d * 2 * (f2 + 1) + f1 * (f1 - 1)
    den = 2 * (f2 + 1)
    g = math.gcd(num, den)
    return pd.DataFrame({"n_types": [d], "f1": [f1], "f2": [f2],
                         "chao_num": [num // g],
                         "chao_den": [den // g]}).astype("int64")


SQL_CHAO1_ESTIMATE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT bg, count(DISTINCT doc_id)::BIGINT AS n FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
    FROM toks, unnest(range(1, len(ws))) t(i)
  ) GROUP BY 1
), cc AS (
  SELECT n AS cnt, count(*)::BIGINT AS n_types FROM big GROUP BY 1
), s AS (
  SELECT sum(n_types)::BIGINT AS d,
         coalesce(sum(n_types) FILTER (WHERE cnt = 1), 0)::BIGINT AS f1,
         coalesce(sum(n_types) FILTER (WHERE cnt = 2), 0)::BIGINT AS f2
  FROM cc
)
SELECT d AS n_types, f1, f2,
       ((d * 2 * (f2 + 1) + f1 * (f1 - 1))
        / gcd(d * 2 * (f2 + 1) + f1 * (f1 - 1), 2 * (f2 + 1)))::BIGINT
         AS chao_num,
       ((2 * (f2 + 1))
        / gcd(d * 2 * (f2 + 1) + f1 * (f1 - 1), 2 * (f2 + 1)))::BIGINT
         AS chao_den
FROM s
"""


def catalog():
    """name -> (fn, oracle_sql | None)"""
    return {
        "doc_stats": (q_doc_stats, SQL_DOC_STATS),
        "source_stats": (q_source_stats, SQL_SOURCE_STATS),
        "top_langs": (q_top_langs, SQL_TOP_LANGS),
        "recent_events": (q_recent_events, SQL_RECENT_EVENTS),
        "new_users_daily": (q_new_users_daily, SQL_NEW_USERS_DAILY),
        "daily_ohlc": (q_daily_ohlc, SQL_DAILY_OHLC),
        "event_rollup": (q_event_rollup, SQL_EVENT_ROLLUP),
        "hourly_windows": (q_hourly_windows, SQL_HOURLY_WINDOWS),
        "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
        "brand_revenue": (q_brand_revenue, SQL_BRAND_REVENUE),
        "customer_orders": (q_customer_orders, SQL_CUSTOMER_ORDERS),
        "url_canon": (q_url_canon, SQL_URL_CANON),
        "supplier_regions": (q_supplier_regions, SQL_SUPPLIER_REGIONS),
        "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
        "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
        "quality": (q_quality, SQL_QUALITY),
        "token_totals": (q_token_totals, SQL_TOKEN_TOTALS),
        "distinct_pairs": (q_distinct_pairs, SQL_DISTINCT_PAIRS),
        "ann_cosine": (q_ann_cosine, SQL_ANN_COSINE),
        "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
        "order_priority_revenue": (q_order_priority_revenue, SQL_ORDER_PRIORITY_REVENUE),
        "top_orders": (q_top_orders, SQL_TOP_ORDERS),
        "regional_revenue": (q_regional_revenue, SQL_REGIONAL_REVENUE),
        "daily_top_event": (q_daily_top_event, SQL_DAILY_TOP_EVENT),
        "embedding_near_dups": (q_embedding_near_dups, SQL_EMBEDDING_NEAR_DUPS),
        "running_sum": (q_running_sum, SQL_RUNNING_SUM),
        "sessions": (q_sessions, SQL_SESSIONS),
        "simhash": (q_simhash, SQL_SIMHASH),
        "lang_id": (q_lang_id, SQL_LANG_ID),
        "top_terms_per_lang": (q_top_terms_per_lang, _top_terms_per_lang_sql()),
        "bpe_tokens": (q_bpe_tokens, SQL_BPE_TOKENS),
        "ann_ivf_exhaustive": (q_ann_ivf_exhaustive, SQL_ANN_COSINE),
        "minhash_dedup": (q_minhash_dedup, SQL_MINHASH_DEDUP),
        "minhash_clusters": (q_minhash_clusters, SQL_MINHASH_CLUSTERS),
        "embedding_lsh_dups": (q_embedding_lsh_dups, SQL_EMBEDDING_LSH_DUPS),
        "media_pipeline": (q_media_pipeline, _media_sql()),
        "image_phash_dups": (q_image_phash_dups, _image_phash_sql()),
        "asof_last_view": (q_asof_last_view, SQL_ASOF_LAST_VIEW),
        "sliding_windows": (q_sliding_windows, SQL_SLIDING_WINDOWS),
        "repetition": (q_repetition, SQL_REPETITION),
        "split": (q_split, SQL_SPLIT),
        # sequential VALUES-literal oracles (the _media_sql precedent):
        # the distributed engine must reproduce the single-process
        # restatement of the same kernels row-for-row
        "crawl": (q_crawl, _crawl_sql()),
        "crawl_outlinks": (q_crawl_outlinks, _outlinks_sql()),
        "span_histogram": (q_span_histogram, _span_hist_sql()),
        "range_active_events": (q_range_active_events, SQL_RANGE_ACTIVE_EVENTS),
        "top_events_per_type": (q_top_events_per_type, SQL_TOP_EVENTS_PER_TYPE),
        "price_quantiles": (q_price_quantiles, SQL_PRICE_QUANTILES),
        "pagerank": (q_pagerank, _pagerank_sql()),
        "host_pagerank": (q_host_pagerank, _host_pagerank_sql()),
        "hits": (q_hits, _hits_sql()),
        "association_rules": (q_association_rules, SQL_ASSOCIATION_RULES),
        "bfs_depths": (q_bfs_depths, _bfs_depths_sql()),
        "kmeans_clusters": (q_kmeans_clusters, _kmeans_sql()),
        "robots_lpm": (q_robots_lpm, _robots_lpm_sql()),
        "anchor_index": (q_anchor_index, _anchor_index_sql()),
        "co_citation": (q_co_citation, _co_citation_sql()),
        "degree_histogram": (q_degree_histogram, _degree_histogram_sql()),
        "host_near_matches": (q_host_near_matches, _host_near_matches_sql()),
        "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
        "bm25_topk": (q_bm25_topk, _bm25_sql()),
        "embedding_clusters": (q_embedding_clusters, _embedding_clusters_sql()),
        "rebalance": (q_rebalance, SQL_REBALANCE),
        "inactive_customers": (q_inactive_customers, SQL_INACTIVE_CUSTOMERS),
        "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
        "pack_chunks": (q_pack_chunks, SQL_PACK_CHUNKS),
        "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
        "approx_distinct": (q_approx_distinct, _approx_distinct_sql()),
        "bulk_crawl": (q_bulk_crawl, _bulk_sql()),
        "pii_scan": (q_pii_scan, SQL_PII_SCAN),
        "normalize_text": (q_normalize_text, SQL_NORMALIZE_TEXT),
        "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
        "top_bigrams": (q_top_bigrams, SQL_TOP_BIGRAMS),
        "weekly_retention": (q_weekly_retention, SQL_WEEKLY_RETENTION),
        "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
        "rolling_sum": (q_rolling_sum, SQL_ROLLING_SUM),
        "urgent_customers": (q_urgent_customers, SQL_URGENT_CUSTOMERS),
        "shared_ngrams": (q_shared_ngrams, SQL_SHARED_NGRAMS),
        "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
        "corpus_mix": (q_corpus_mix, SQL_CORPUS_MIX),
        "group_sample": (q_group_sample, SQL_GROUP_SAMPLE),
        "ann_ivf": (q_ann_ivf, _ann_ivf_sql()),
        "customer_urgent_counts": (q_customer_urgent_counts, SQL_CUSTOMER_URGENT_COUNTS),
        "event_ntiles": (q_event_ntiles, SQL_EVENT_NTILES),
        "price_histogram": (q_price_histogram, SQL_PRICE_HISTOGRAM),
        "daily_activity": (q_daily_activity, SQL_DAILY_ACTIVITY),
        "event_pivot": (q_event_pivot, SQL_EVENT_PIVOT),
        "revenue_rollup": (q_revenue_rollup, SQL_REVENUE_ROLLUP),
        "repeat_buyers": (q_repeat_buyers, SQL_REPEAT_BUYERS),
        "lapsed_buyers": (q_lapsed_buyers, SQL_LAPSED_BUYERS),
        "matched_order_pairs": (q_matched_order_pairs, SQL_MATCHED_ORDER_PAIRS),
        "unreturned_shipments": (q_unreturned_shipments, SQL_UNRETURNED_SHIPMENTS),
        "unpivot_measures": (q_unpivot_measures, SQL_UNPIVOT_MEASURES),
        "small_qty_revenue": (q_small_qty_revenue, SQL_SMALL_QTY_REVENUE),
        "priority_statuses": (q_priority_statuses, SQL_PRIORITY_STATUSES),
        "nation_share": (q_nation_share, SQL_NATION_SHARE),
        "revenue_cube": (q_revenue_cube, SQL_REVENUE_CUBE),
        "part_median_price": (q_part_median_price, SQL_PART_MEDIAN_PRICE),
        "big_spenders": (q_big_spenders, SQL_BIG_SPENDERS),
        "monthly_growth": (q_monthly_growth, SQL_MONTHLY_GROWTH),
        "media_frames": (q_media_frames, _media_frames_sql()),
        "media_audio": (q_media_audio, _media_audio_sql()),
        "props_stats": (q_props_stats, SQL_PROPS_STATS),
        "value_quantiles": (q_value_quantiles, SQL_VALUE_QUANTILES),
        "user_day_stats": (q_user_day_stats, SQL_USER_DAY_STATS),
        "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
        "fuzzy_decontaminate": (q_fuzzy_decontaminate,
                                _fuzzy_decontaminate_sql()),
        "triangle_counts": (q_triangle_counts, SQL_TRIANGLE_COUNTS),
        "grouped_distinct": (q_grouped_distinct, _grouped_distinct_sql()),
        "distinct_users": (q_distinct_users, SQL_DISTINCT_USERS),
        "trimmed_stats": (q_trimmed_stats, SQL_TRIMMED_STATS),
        "conversion_lag": (q_conversion_lag, SQL_CONVERSION_LAG),
        "funnel_stages": (q_funnel_stages, SQL_FUNNEL_STAGES),
        "priority_variance": (q_priority_variance, SQL_PRIORITY_VARIANCE),
        "user_top_event": (q_user_top_event, SQL_USER_TOP_EVENT),
        "cm_user_counts": (q_cm_user_counts, _cm_user_counts_sql()),
        "rank_normalize": (q_rank_normalize, SQL_RANK_NORMALIZE),
        "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
        "price_regression": (q_price_regression, SQL_PRICE_REGRESSION),
        "dedup_spans": (q_dedup_spans, SQL_DEDUP_SPANS),
        "price_correlation": (q_price_correlation, SQL_PRICE_CORRELATION),
        "part_price_mad": (q_part_price_mad, SQL_PART_PRICE_MAD),
        "chi_square": (q_chi_square, SQL_CHI_SQUARE),
        "value_outliers": (q_value_outliers, SQL_VALUE_OUTLIERS),
        "part_skyline": (q_part_skyline, SQL_PART_SKYLINE),
        "lm_score": (q_lm_score, SQL_LM_SCORE),
        "wealthy_idle": (q_wealthy_idle, SQL_WEALTHY_IDLE),
        "error_bursts": (q_error_bursts, SQL_ERROR_BURSTS),
        "zorder_layout": (q_zorder_layout, _zorder_sql()),
        "sliding_distinct": (q_sliding_distinct, SQL_SLIDING_DISTINCT),
        "trending_events": (q_trending_events, SQL_TRENDING_EVENTS),
        "collocations": (q_collocations, SQL_COLLOCATIONS),
        "event_trigrams": (q_event_trigrams, SQL_EVENT_TRIGRAMS),
        "preferred_supplier": (q_preferred_supplier, SQL_PREFERRED_SUPPLIER),
        "embedding_top_dims": (q_embedding_top_dims, SQL_EMBEDDING_TOP_DIMS),
        "benford_prices": (q_benford_prices, SQL_BENFORD_PRICES),
        "trailing_hour_sum": (q_trailing_hour_sum, SQL_TRAILING_HOUR_SUM),
        "iqr_outliers": (q_iqr_outliers, SQL_IQR_OUTLIERS),
        "sole_suppliers": (q_sole_suppliers, SQL_SOLE_SUPPLIERS),
        "nation_trade": (q_nation_trade, SQL_NATION_TRADE),
        "promo_share": (q_promo_share, SQL_PROMO_SHARE),
        "bracket_revenue": (q_bracket_revenue, SQL_BRACKET_REVENUE),
        "kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
        "source_divergence": (q_source_divergence, SQL_SOURCE_DIVERGENCE),
        "purchase_attribution": (q_purchase_attribution,
                                 SQL_PURCHASE_ATTRIBUTION),
        "user_drawdown": (q_user_drawdown, SQL_USER_DRAWDOWN),
        "source_vocab_overlap": (q_source_vocab_overlap,
                                 SQL_SOURCE_VOCAB_OVERLAP),
        "source_simpson": (q_source_simpson, SQL_SOURCE_SIMPSON),
        "dow_hour_heatmap": (q_dow_hour_heatmap, SQL_DOW_HOUR_HEATMAP),
        "zone_map_prune": (q_zone_map_prune, SQL_ZONE_MAP_PRUNE),
        "median_cont": (q_median_cont, SQL_MEDIAN_CONT),
        "host_reciprocity": (q_host_reciprocity, _host_reciprocity_sql()),
        "user_active_bitmap": (q_user_active_bitmap, SQL_USER_ACTIVE_BITMAP),
        "clustering_coeff": (q_clustering_coeff, SQL_CLUSTERING_COEFF),
        "degree_assortativity": (q_degree_assortativity,
                                 SQL_DEGREE_ASSORTATIVITY),
        "cohort_ltv": (q_cohort_ltv, SQL_COHORT_LTV),
        "ri_audit": (q_ri_audit, SQL_RI_AUDIT),
        "pareto_share": (q_pareto_share, SQL_PARETO_SHARE),
        "charset_histogram": (q_charset_histogram, SQL_CHARSET_HISTOGRAM),
        "table_diff": (q_table_diff, SQL_TABLE_DIFF),
        "range_partition_bounds": (q_range_partition_bounds,
                                   SQL_RANGE_PARTITION_BOUNDS),
        "latest_state": (q_latest_state, SQL_LATEST_STATE),
        "bounce_rate": (q_bounce_rate, SQL_BOUNCE_RATE),
        "longest_streak": (q_longest_streak, SQL_LONGEST_STREAK),
        "third_largest": (q_third_largest, SQL_THIRD_LARGEST),
        "weighted_median": (q_weighted_median, SQL_WEIGHTED_MEDIAN),
        "quartile_label": (q_quartile_label, SQL_QUARTILE_LABEL),
        "forward_fill": (q_forward_fill, SQL_FORWARD_FILL),
        "week_mask_histogram": (q_week_mask_histogram,
                                SQL_WEEK_MASK_HISTOGRAM),
        "customer_rfm": (q_customer_rfm, SQL_CUSTOMER_RFM),
        "hapax_ratio": (q_hapax_ratio, SQL_HAPAX_RATIO),
        "part_hhi": (q_part_hhi, SQL_PART_HHI),
        "join_size_estimate": (q_join_size_estimate, SQL_JOIN_SIZE_ESTIMATE),
        "key_skew_profile": (q_key_skew_profile, SQL_KEY_SKEW_PROFILE),
        "order_day_share": (q_order_day_share, SQL_ORDER_DAY_SHARE),
        "relational_division": (q_relational_division,
                                SQL_RELATIONAL_DIVISION),
        "weekday_index": (q_weekday_index, SQL_WEEKDAY_INDEX),
        "biggest_jump": (q_biggest_jump, SQL_BIGGEST_JUMP),
        "error_pressure": (q_error_pressure, SQL_ERROR_PRESSURE),
        "max_concurrency": (q_max_concurrency, SQL_MAX_CONCURRENCY),
        "interval_coverage": (q_interval_coverage, SQL_INTERVAL_COVERAGE),
        "twap": (q_twap, SQL_TWAP),
        "spend_drop": (q_spend_drop, SQL_SPEND_DROP),
        "returned_customers": (q_returned_customers,
                               SQL_RETURNED_CUSTOMERS),
        "top_supplier": (q_top_supplier, SQL_TOP_SUPPLIER),
        "supplier_variety": (q_supplier_variety, SQL_SUPPLIER_VARIETY),
        "nation_profit": (q_nation_profit, SQL_NATION_PROFIT),
        "important_parts": (q_important_parts, SQL_IMPORTANT_PARTS),
        "order_part_list": (q_order_part_list, SQL_ORDER_PART_LIST),
        "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
        "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
        "price_kurtosis": (q_price_kurtosis, SQL_PRICE_KURTOSIS),
        "session_patterns": (q_session_patterns, SQL_SESSION_PATTERNS),
        "cheapest_path": (q_cheapest_path, _cheapest_path_sql()),
        "debounce_events": (q_debounce_events, SQL_DEBOUNCE_EVENTS),
        "first_touch": (q_first_touch, SQL_FIRST_TOUCH),
        "kfold_assignment": (q_kfold_assignment, SQL_KFOLD_ASSIGNMENT),
        "q6_revenue": (q_q6_revenue, SQL_Q6_REVENUE),
        "nearest_view": (q_nearest_view, SQL_NEAREST_VIEW),
        "linear_interp": (q_linear_interp, SQL_LINEAR_INTERP),
        "order_count_distribution": (q_order_count_distribution,
                                     SQL_ORDER_COUNT_DISTRIBUTION),
        "big_qty_orders": (q_big_qty_orders, SQL_BIG_QTY_ORDERS),
        "rolling_moments": (q_rolling_moments, SQL_ROLLING_MOMENTS),
        "kcore": (q_kcore, _kcore_sql()),
        "snm_candidates": (q_snm_candidates, SQL_SNM_CANDIDATES),
        "word_length_histogram": (q_word_length_histogram,
                                  SQL_WORD_LENGTH_HISTOGRAM),
        "kmv_jaccard": (q_kmv_jaccard, SQL_KMV_JACCARD),
        "daily_autocov": (q_daily_autocov, SQL_DAILY_AUTOCOV),
        "partition_checksums": (q_partition_checksums,
                                SQL_PARTITION_CHECKSUMS),
        "mutual_knn": (q_mutual_knn, SQL_MUTUAL_KNN),
        "name_edit_pairs": (q_name_edit_pairs, SQL_NAME_EDIT_PAIRS),
        "cumulative_users": (q_cumulative_users, SQL_CUMULATIVE_USERS),
        "ks_statistic": (q_ks_statistic, SQL_KS_STATISTIC),
        "linkage_features": (q_linkage_features, SQL_LINKAGE_FEATURES),
        "acctbal_gini": (q_acctbal_gini, SQL_ACCTBAL_GINI),
        "bloom_fp_audit": (q_bloom_fp_audit, SQL_BLOOM_FP_AUDIT),
        "rolling_median": (q_rolling_median, SQL_ROLLING_MEDIAN),
        "diversified_topk": (q_diversified_topk, SQL_DIVERSIFIED_TOPK),
        "above_p90_counts": (q_above_p90_counts, SQL_ABOVE_P90_COUNTS),
        "ship_delay_histogram": (q_ship_delay_histogram,
                                 SQL_SHIP_DELAY_HISTOGRAM),
        "name_clusters": (q_name_clusters, SQL_NAME_CLUSTERS),
        "ab_lift": (q_ab_lift, SQL_AB_LIFT),
        "km_survival": (q_km_survival, SQL_KM_SURVIVAL),
        "order_total_reconcile": (q_order_total_reconcile,
                                  SQL_ORDER_TOTAL_RECONCILE),
        "best_run": (q_best_run, SQL_BEST_RUN),
        "dau_overlap": (q_dau_overlap, SQL_DAU_OVERLAP),
        "linenumber_gap_audit": (q_linenumber_gap_audit,
                                 SQL_LINENUMBER_GAP_AUDIT),
        "nation_median_spend": (q_nation_median_spend,
                                SQL_NATION_MEDIAN_SPEND),
        "daily_concentration": (q_daily_concentration,
                                SQL_DAILY_CONCENTRATION),
        "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
        "brand_topk_others": (q_brand_topk_others, SQL_BRAND_TOPK_OTHERS),
        "leaderboard_churn": (q_leaderboard_churn, SQL_LEADERBOARD_CHURN),
        "multi_nation_orders": (q_multi_nation_orders,
                                SQL_MULTI_NATION_ORDERS),
        "event_type_phi": (q_event_type_phi, SQL_EVENT_TYPE_PHI),
        "record_highs": (q_record_highs, SQL_RECORD_HIGHS),
        "frequent_triples": (q_frequent_triples, SQL_FREQUENT_TRIPLES),
        "priority_linestatus": (q_priority_linestatus,
                                SQL_PRIORITY_LINESTATUS),
        "first_event_breakdown": (q_first_event_breakdown,
                                  SQL_FIRST_EVENT_BREAKDOWN),
        "type_breadth_histogram": (q_type_breadth_histogram,
                                   SQL_TYPE_BREADTH_HISTOGRAM),
        "weekday_residuals": (q_weekday_residuals, SQL_WEEKDAY_RESIDUALS),
        "premium_parts_by_brand": (q_premium_parts_by_brand,
                                   SQL_PREMIUM_PARTS_BY_BRAND),
        "halflife_histogram": (q_halflife_histogram,
                               SQL_HALFLIFE_HISTOGRAM),
        "order_upgrades": (q_order_upgrades, SQL_ORDER_UPGRADES),
        "repurchase_gap_quantiles": (q_repurchase_gap_quantiles,
                                     SQL_REPURCHASE_GAP_QUANTILES),
        "autocomplete_table": (q_autocomplete_table,
                               SQL_AUTOCOMPLETE_TABLE),
        "daily_p90_median": (q_daily_p90_median, SQL_DAILY_P90_MEDIAN),
        "k_anonymity_audit": (q_k_anonymity_audit, SQL_K_ANONYMITY_AUDIT),
        "prefix_compress_estimate": (q_prefix_compress_estimate,
                                     SQL_PREFIX_COMPRESS_ESTIMATE),
        "daily_cross_metrics": (q_daily_cross_metrics,
                                SQL_DAILY_CROSS_METRICS),
        "tenure_spend_corr": (q_tenure_spend_corr,
                              SQL_TENURE_SPEND_CORR),
        "two_hop_reach": (q_two_hop_reach, SQL_TWO_HOP_REACH),
        "cusum_drift": (q_cusum_drift, SQL_CUSUM_DRIFT),
        "hdr_quantiles": (q_hdr_quantiles, SQL_HDR_QUANTILES),
        "cms_estimates": (q_cms_estimates, SQL_CMS_ESTIMATES),
        "bpe_first_merges": (q_bpe_first_merges, SQL_BPE_FIRST_MERGES),
        "stopgram_coverage": (q_stopgram_coverage,
                              SQL_STOPGRAM_COVERAGE),
        "behavior_signatures": (q_behavior_signatures,
                                SQL_BEHAVIOR_SIGNATURES),
        "theilsen_trend": (q_theilsen_trend, SQL_THEILSEN_TREND),
        "compaction_plan": (q_compaction_plan, SQL_COMPACTION_PLAN),
        "delta_encoding_estimate": (q_delta_encoding_estimate,
                                    SQL_DELTA_ENCODING_ESTIMATE),
        "simpson_reversal_audit": (q_simpson_reversal_audit,
                                   SQL_SIMPSON_REVERSAL_AUDIT),
        "skipgram_pairs": (q_skipgram_pairs, SQL_SKIPGRAM_PAIRS),
        "part_band_pairs": (q_part_band_pairs, SQL_PART_BAND_PAIRS),
        "kendall_ingredients": (q_kendall_ingredients,
                                SQL_KENDALL_INGREDIENTS),
        "merkle_diff": (q_merkle_diff, SQL_MERKLE_DIFF),
        "maxmin_fair_alloc": (q_maxmin_fair_alloc,
                              SQL_MAXMIN_FAIR_ALLOC),
        "countsketch_estimates": (q_countsketch_estimates,
                                  SQL_COUNTSKETCH_ESTIMATES),
        "id_range_runs": (q_id_range_runs, SQL_ID_RANGE_RUNS),
        "weighted_jaccard_sources": (q_weighted_jaccard_sources,
                                     SQL_WEIGHTED_JACCARD_SOURCES),
        "top_with_ties": (q_top_with_ties, SQL_TOP_WITH_TIES),
        "rank_displacement": (q_rank_displacement,
                              SQL_RANK_DISPLACEMENT),
        "schema_evolution_union": (q_schema_evolution_union,
                                   SQL_SCHEMA_EVOLUTION_UNION),
        "crawl_politeness_audit": (q_crawl_politeness_audit,
                                   _politeness_sql()),
        "next_word_top": (q_next_word_top, SQL_NEXT_WORD_TOP),
        "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
        "joint_decile_grid": (q_joint_decile_grid,
                              SQL_JOINT_DECILE_GRID),
        "periodicity_profile": (q_periodicity_profile,
                                SQL_PERIODICITY_PROFILE),
        "selectivity_audit": (q_selectivity_audit,
                              SQL_SELECTIVITY_AUDIT),
        "hdr_error_audit": (q_hdr_error_audit, SQL_HDR_ERROR_AUDIT),
        "revenue_identity_audit": (q_revenue_identity_audit,
                                   SQL_REVENUE_IDENTITY_AUDIT),
        "widest_path": (q_widest_path, _widest_path_sql()),
        "graph_voronoi": (q_graph_voronoi, _graph_voronoi_sql()),
        "margin_of_victory": (q_margin_of_victory,
                              SQL_MARGIN_OF_VICTORY),
        "fd_audit": (q_fd_audit, SQL_FD_AUDIT),
        "rolling_xcov": (q_rolling_xcov, SQL_ROLLING_XCOV),
        "zero_activity_cells": (q_zero_activity_cells,
                                SQL_ZERO_ACTIVITY_CELLS),
        "dominance_counts": (q_dominance_counts, SQL_DOMINANCE_COUNTS),
        "allen_relations": (q_allen_relations, SQL_ALLEN_RELATIONS),
        "isotonic_trend": (q_isotonic_trend, SQL_ISOTONIC_TREND),
        "rendezvous_shards": (q_rendezvous_shards,
                              SQL_RENDEZVOUS_SHARDS),
        "hilbert_layout": (q_hilbert_layout, _hilbert_sql()),
        "markov_stationary": (q_markov_stationary, _markov_sql()),
        "haar_wavelet": (q_haar_wavelet, _haar_sql()),
        "changepoint_day": (q_changepoint_day, SQL_CHANGEPOINT_DAY),
        "ewma_halving": (q_ewma_halving, SQL_EWMA_HALVING),
        "allpairs_jaccard": (q_allpairs_jaccard, SQL_ALLPAIRS_JACCARD),
        "interval_scheduling": (q_interval_scheduling,
                                SQL_INTERVAL_SCHEDULING),
        "l_diversity_audit": (q_l_diversity_audit, SQL_L_DIVERSITY_AUDIT),
        "lis_length": (q_lis_length, SQL_LIS_LENGTH),
        "wavelet_synopsis_audit": (q_wavelet_synopsis_audit,
                                   _wavelet_synopsis_sql()),
        "markov_hitting_truncated": (q_markov_hitting_truncated,
                                     _markov_hitting_sql()),
        "skyline_3d": (q_skyline_3d, SQL_SKYLINE_3D),
        "lru_cache_audit": (q_lru_cache_audit, SQL_LRU_CACHE_AUDIT),
        "belady_cache_audit": (q_belady_cache_audit,
                               SQL_BELADY_CACHE_AUDIT),
        "t_closeness_audit": (q_t_closeness_audit, SQL_T_CLOSENESS_AUDIT),
        "sax_symbols": (q_sax_symbols, _sax_sql()),
        "cdc_chunks": (q_cdc_chunks, _cdc_chunks_sql()),
        "cdc_dedup_ratio": (q_cdc_dedup_ratio, _cdc_dedup_sql()),
        "mann_whitney_u": (q_mann_whitney_u, SQL_MANN_WHITNEY_U),
        "gorilla_dod_bits": (q_gorilla_dod_bits, SQL_GORILLA_DOD_BITS),
        "voptimal_histogram": (q_voptimal_histogram,
                               SQL_VOPTIMAL_HISTOGRAM),
        "cdc_shared_chunks": (q_cdc_shared_chunks, _cdc_shared_sql()),
        "layout_prune_compare": (q_layout_prune_compare,
                                 _layout_prune_sql()),
        "lateness_profile": (q_lateness_profile, SQL_LATENESS_PROFILE),
        "dict_encoding_estimate": (q_dict_encoding_estimate,
                                   _dict_encoding_sql()),
        "dbscan_core_points": (q_dbscan_core_points,
                               SQL_DBSCAN_CORE_POINTS),
        "cvar_tail": (q_cvar_tail, SQL_CVAR_TAIL),
        "seasonal_naive_error": (q_seasonal_naive_error,
                                 SQL_SEASONAL_NAIVE_ERROR),
        "labeler_kappa": (q_labeler_kappa, _labeler_kappa_sql()),
        "fano_burstiness": (q_fano_burstiness, SQL_FANO_BURSTINESS),
        "rle_encoding_estimate": (q_rle_encoding_estimate,
                                  SQL_RLE_ENCODING_ESTIMATE),
        "vbyte_postings_bytes": (q_vbyte_postings_bytes, _vbyte_sql()),
        "bitmap_index_estimate": (q_bitmap_index_estimate,
                                  SQL_BITMAP_INDEX_ESTIMATE),
        "huffman_bits": (q_huffman_bits, _huffman_sql()),
        "apportionment": (q_apportionment, SQL_APPORTIONMENT),
        "closest_pair": (q_closest_pair, SQL_CLOSEST_PAIR),
        "token_budget_select": (q_token_budget_select,
                                SQL_TOKEN_BUDGET_SELECT),
        "multi_pattern_counts": (q_multi_pattern_counts,
                                 _multi_pattern_sql()),
        "text_border_period": (q_text_border_period,
                               SQL_TEXT_BORDER_PERIOD),
        "set_cover_sources": (q_set_cover_sources, _set_cover_sql()),
        "heaps_vocab_growth": (q_heaps_vocab_growth, _heaps_sql()),
        "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
        "harmonic_centrality": (q_harmonic_centrality, _harmonic_sql()),
        "skyband_parts": (q_skyband_parts, SQL_SKYBAND_PARTS),
        "watermark_trigger_counts": (q_watermark_trigger_counts,
                                     SQL_WATERMARK_TRIGGER_COUNTS),
        "encoding_advisor": (q_encoding_advisor, _encoding_advisor_sql()),
        "ann_recall_audit": (q_ann_recall_audit, _ann_recall_sql()),
        "diameter_lower_bound": (q_diameter_lower_bound, _diameter_sql()),
        "minhash_error_audit": (q_minhash_error_audit,
                                _minhash_error_sql()),
        "simhash_error_audit": (q_simhash_error_audit,
                                _simhash_error_sql()),
        "session_timeout_sweep": (q_session_timeout_sweep,
                                  _session_sweep_sql()),
        "edge_support": (q_edge_support, SQL_EDGE_SUPPORT),
        "open_orders_daily": (q_open_orders_daily, SQL_OPEN_ORDERS_DAILY),
        "dbscan_clusters": (q_dbscan_clusters, SQL_DBSCAN_CLUSTERS),
        "lcs_user_pairs": (q_lcs_user_pairs, SQL_LCS_USER_PAIRS),
        "brand_modularity": (q_brand_modularity, SQL_BRAND_MODULARITY),
        "passage_chunks": (q_passage_chunks, SQL_PASSAGE_CHUNKS),
        "rrf_fusion": (q_rrf_fusion, _rrf_sql()),
        "chao1_estimate": (q_chao1_estimate, SQL_CHAO1_ESTIMATE),
    }
