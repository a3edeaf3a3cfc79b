"""Reference-surface queries (SURVEY §2) on the driver's synthetic tables.

Fixture mapping per FIXTURES.md §B: ``events`` stands in for the log/CDC
streams (props = JSON payload, event_type = route key, user_id = mid),
``orders``/``lineitem`` for the trade-side CDC tables, ``nation``/``region``
for the ``base_dic`` lookup dims. Every query is the batch form; streaming
variants share the same transforms (see streaming/ and tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from ..io import load_table
from ..operators import stateful, windows
from ..operators.joins import lookup_join
from . import QuerySpec

BOUNCE_GAP_S = 1800  # session gap for the bounce/CEP analog (events are minutes apart)


# ---------------------------------------------------------------- P1: parse + dirty split
def q_envelope_parse(spark, sf_dir):
    """P1/S3: JSON envelope parse with dirty-split semantics
    (BaseLogApp.java:36-52): corrupt/absent payloads flagged, value extracted."""
    ev = load_table(spark, sf_dir, "events")
    k_val = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        "event_type",
        k_val.cast("bigint").alias("k_val"),
        (k_val.isNull()).cast("int").alias("is_dirty"),
    )


ORACLE_ENVELOPE = """
SELECT event_id, event_type,
       json_extract_string(props, '$.k')::BIGINT AS k_val,
       (json_extract_string(props, '$.k') IS NULL)::INT AS is_dirty
FROM events
"""


# ---------------------------------------------------------------- P2/P4: route filter
def q_route_filter(spark, sf_dir):
    """P2+P4: table-route + type filter (DwdTradeCartAdd.java:41-49,
    DimApp.java:142-160) — keep two 'tables' worth of records, project."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "event_type", "value"
    )


ORACLE_ROUTE = """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type IN ('purchase', 'signup')
"""


# ---------------------------------------------------------------- P6: conditional delta
def q_conditional_delta(spark, sf_dir):
    """P6: if(insert, x, new-old) conditional delta (DwdTradeCartAdd.java:31)
    — status-conditional signed amount, aggregated per status."""
    o = load_table(spark, sf_dir, "orders")
    delta = F.when(F.col("o_orderstatus") == "F", -F.col("o_totalprice")).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.withColumn("delta", delta)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum("delta"), 2).alias("delta_sum"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_DELTA = """
SELECT o_orderstatus,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN -o_totalprice ELSE o_totalprice END), 2) AS delta_sum,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------- P5: transition detect
def q_transition_detect(spark, sf_dir):
    """P5: old-value state-transition predicate
    (DwdTradeCancelDetail.java:89-92). No explicit `old` map in the fixture,
    so the transition is derived per customer's ordered order history:
    rows where status flips into 'F'."""
    o = load_table(spark, sf_dir, "orders")
    out = stateful.transition_rows(
        o,
        "o_custkey",
        "o_orderstatus",
        "F",
        [F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return out.select("o_orderkey", "o_custkey", "o_orderstatus")


ORACLE_TRANSITION = """
WITH h AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT o_orderkey, o_custkey, o_orderstatus
FROM h WHERE o_orderstatus = 'F' AND prev IS NOT NULL AND prev <> 'F'
"""


# ---------------------------------------------------------------- §2.6 scalar functions
def q_scalar_datetime(spark, sf_dir):
    """§2.6: the reference's datetime scalar surface — date_format,
    epoch↔timestamp round-trip (DateFormatUtil.java:13-38,
    DwsTrafficSourceKeywordPageViewWindow.java:118)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("long")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        epoch_s.alias("epoch_s"),
        F.date_format(F.timestamp_seconds(epoch_s), "yyyy-MM-dd HH:mm:ss").alias("ymd_hms"),
    )


ORACLE_SCALAR = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS dt,
       floor(epoch(ts))::BIGINT AS epoch_s,
       strftime(to_timestamp(floor(epoch(ts))::BIGINT)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ymd_hms
FROM events
"""


def q_scalar_string(spark, sf_dir):
    """§2.6 companion: the string scalar surface the reference touches via
    JSON field handling and keyword split (SplitFunction.java:11-22,
    KeywordUtil usage) plus the standard warehouse string kit — every
    expression is a JVM codegen built-in, evaluated in the scan's project
    (one stage, no shuffle, full column pruning)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.substring("c_name", 1, 8).alias("name_pfx"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_pad"),
        F.regexp_replace("c_name", "#", "-").alias("name_dash"),
        F.length("c_name").alias("name_len"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_num"),
        F.split("c_name", "#").getItem(0).alias("name_word"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        F.translate("c_name", "0123456789", "##########").alias("name_masked"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("seg_rep"),
    )


def q_scalar_json(spark, sf_dir):
    """§2.6 companion: the JSON scalar surface — the reference's bread and
    butter (every topic payload goes through JSONObject:
    BaseLogApp.java:43-55, DimSinkFunction, MyKafkaUtil's topic_db DDL).
    get_json_object path extraction, from_json typed parse, validity
    probing, and JSON re-assembly — all JVM built-ins in the scan's
    projection, no shuffle.

    The fixture's ``props`` rows are all valid JSON containing ``k``, which
    would leave the validity branch untested; to exercise it we
    deterministically mangle ~2% of rows in-query (``event_id % 97 == 0``
    → truncated/invalid JSON; ``% 89 == 0`` → key renamed away) and the
    oracle applies the same mangle with ``json_valid``-guarded extraction
    (DuckDB's json functions *error* on invalid input, unlike Spark's
    null-returning ones)."""
    ev = load_table(spark, sf_dir, "events")
    props = (
        F.when(F.col("event_id") % 97 == 0, F.substring("props", 1, 5))
        .when(F.col("event_id") % 89 == 0, F.regexp_replace("props", '"k"', '"x"'))
        .otherwise(F.col("props"))
    )
    ev = ev.select("event_id", props.alias("props"))
    parsed = F.from_json("props", "k int")
    k = parsed["k"]
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k.alias("k_int"),
        (k % 10).alias("k_mod"),
        # from_json PERMISSIVE yields a non-null all-null struct on malformed
        # input, so the validity probe is get_json_object('$') (null ⇔ invalid)
        F.get_json_object("props", "$").isNotNull().cast("int").alias("is_valid"),
        F.to_json(F.struct(F.col("event_id"), k.alias("k"))).alias("rebuilt"),
        F.json_array_length(F.concat(F.lit("["), F.col("props"), F.lit("]"))).alias("arr_len"),
    )


ORACLE_SCALAR_JSON = """
WITH m AS (
  SELECT event_id,
         CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 5)
              WHEN event_id % 89 = 0 THEN replace(props, '"k"', '"x"')
              ELSE props END AS props
  FROM events
)
SELECT event_id,
       CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
       CASE WHEN json_valid(props) THEN (json_extract(props, '$.k'))::INT END AS k_int,
       CASE WHEN json_valid(props) THEN (json_extract(props, '$.k'))::INT % 10 END AS k_mod,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid,
       CASE WHEN json_valid(props) THEN
            CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                 THEN '{"event_id":' || event_id || ',"k":' || json_extract_string(props, '$.k') || '}'
                 ELSE '{"event_id":' || event_id || '}' END
            ELSE '{"event_id":' || event_id || '}' END AS rebuilt,
       CASE WHEN json_valid('[' || props || ']')
            THEN json_array_length('[' || props || ']') END AS arr_len
FROM m
"""


ORACLE_SCALAR_STRING = """
SELECT c_custkey,
       upper(c_mktsegment) AS seg_up,
       lower(c_name) AS name_lo,
       substr(c_name, 1, 8) AS name_pfx,
       lpad(c_custkey::VARCHAR, 12, '0') AS key_pad,
       replace(c_name, '#', '-') AS name_dash,
       length(c_name) AS name_len,
       strpos(c_name, '#') AS hash_pos,
       reverse(c_mktsegment) AS seg_rev,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
       split_part(c_name, '#', 1) AS name_word,
       concat_ws('|', c_mktsegment, c_custkey::VARCHAR) AS seg_key,
       translate(c_name, '0123456789', '##########') AS name_masked,
       repeat(substr(c_mktsegment, 1, 2), 2) AS seg_rep
FROM customer
"""


# ---------------------------------------------------------------- J3: broadcast dim lookup
def q_dim_lookup_join(spark, sf_dir):
    """J3: proc-time lookup join → broadcast hash join, 2-hop
    (base_dic analog = nation/region; DwdTradeCartAdd.java:74-76)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    enriched = lookup_join(
        lookup_join(c, n, c["c_nationkey"] == n["n_nationkey"]),
        r,
        F.col("n_regionkey") == r["r_regionkey"],
    )
    return enriched.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
    )


ORACLE_DIM_LOOKUP = """
SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal_sum
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------- J4+J6: double-alias dim + 4-way chain
def q_double_alias_join(spark, sf_dir):
    """J4 (same dim joined twice under aliases,
    DwdTradeOrderRefund.java:105-114) + J6 (multi-way chain): customer
    nation and supplier nation both resolved against `nation`."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    df = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return df.groupBy("cust_nation", "supp_nation").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )


ORACLE_DOUBLE_ALIAS = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY cn.n_name, sn.n_name
"""


# ---------------------------------------------------------------- J1: stream-stream inner join
def q_inner_join(spark, sf_dir):
    """J1: order_detail ⋈ order_info inner equi-join
    (DwdTradeOrderPreProcess.java:120-167) — lineitem ⋈ orders, aggregated."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


ORACLE_INNER = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------- J2: left outer join
def q_left_outer_join(spark, sf_dir):
    """J2: left-outer enrich (DwdTradeOrderPreProcess.java:168-171): orders
    with zero lineitems survive; distribution of lines-per-order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_outer")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("line_ct"))
    )
    return per_order.groupBy("line_ct").agg(F.count(F.lit(1)).alias("n_orders"))


ORACLE_LEFT_OUTER = """
WITH per_order AS (
  SELECT o_orderkey, count(l_orderkey) AS line_ct
  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey
)
SELECT line_ct, count(*) AS n_orders FROM per_order GROUP BY line_ct
"""


# ---------------------------------------------------------------- J5: multi-key join
def q_multikey_join(spark, sf_dir):
    """J5: composite-key equi-join (rp.order_id=ri.order_id AND
    rp.sku_id=ri.sku_id, DwdTradeRefundPaySuc.java:124-127): lineitem
    self-joined on (orderkey, partkey) — repeated part within an order."""
    li = load_table(spark, sf_dir, "lineitem")
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    )
    return pairs.groupBy(F.col("a.l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum(F.col("a.l_quantity") + F.col("b.l_quantity")), 2).alias("qty_sum"),
    )


ORACLE_MULTIKEY = """
SELECT a.l_returnflag AS returnflag, count(*) AS n_pairs,
       round(sum(a.l_quantity + b.l_quantity), 2) AS qty_sum
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey
 AND a.l_linenumber < b.l_linenumber
GROUP BY a.l_returnflag
"""


# ---------------------------------------------------------------- A1: keyed tumbling window
def q_tumble_keyed(spark, sf_dir):
    """A1: keyed tumbling event-time window count
    (DwsTrafficSourceKeywordPageViewWindow.java:145-154). 1-hour windows on
    the fixture's event spacing; stt/edt as epoch seconds (wall-clock ts
    excluded per SURVEY §2.8.3)."""
    ev = load_table(spark, sf_dir, "events")
    return windows.tumble(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("ct"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
    )


ORACLE_TUMBLE_KEYED = """
SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS stt,
       (floor(epoch(ts) / 3600) * 3600 + 3600)::BIGINT AS edt,
       event_type, count(*) AS ct, round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- A2: keyed multi-metric window
def q_tumble_multimetric(spark, sf_dir):
    """A2: keyed tumbling window, multi-metric reduce
    (DwsTrafficVcChArIsNewPageViewWindow.java:97-144): several sums/extremes
    per key per window (partial/final hash agg = the reference's
    reduce+window pattern)."""
    ev = load_table(spark, sf_dir, "events")
    return windows.tumble(
        ev,
        "ts",
        "6 hours",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("ct"),
            F.round(F.sum("value"), 2).alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            # avg = floor-truncated ratio of the rounded sum: identical IEEE
            # inputs + truncation avoids both sum-order drift and the
            # HALF_UP-vs-binary round() divergence at .5 decimal boundaries
            (F.floor(F.round(F.sum("value"), 2) / F.count(F.lit(1)) * 10000) / 10000).alias("value_avg"),
        ],
    )


ORACLE_TUMBLE_MULTI = """
SELECT (floor(epoch(ts) / 21600) * 21600)::BIGINT AS stt,
       (floor(epoch(ts) / 21600) * 21600 + 21600)::BIGINT AS edt,
       event_type, count(*) AS ct,
       round(sum(value), 2) AS value_sum,
       min(value) AS value_min, max(value) AS value_max,
       floor(round(sum(value), 2) / count(*) * 10000) / 10000 AS value_avg
FROM events GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- A3: global tumbling window
def q_tumble_global(spark, sf_dir):
    """A3: global (non-keyed) tumbling window reduce
    (DwsTrafficPageViewWindow.java:117-137): windowAll sums + distinct users."""
    ev = load_table(spark, sf_dir, "events")
    return windows.tumble(
        ev,
        "ts",
        "1 day",
        [],
        [
            F.count(F.lit(1)).alias("ct"),
            F.countDistinct("user_id").alias("uv"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
    )


ORACLE_TUMBLE_GLOBAL = """
SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS stt,
       (floor(epoch(ts) / 86400) * 86400 + 86400)::BIGINT AS edt,
       count(*) AS ct, count(DISTINCT user_id) AS uv,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------- A4+T8: union pre-agg window
def q_union_preagg(spark, sf_dir):
    """A4+T8: per-branch 1-hot metric encoding, union, window sum
    (DwsTrafficVcChArIsNewPageViewWindow.java:43-86): view/click/error
    branches each contribute one metric, summed per day window."""
    ev = load_table(spark, sf_dir, "events")
    branches = [
        (ev.filter(F.col("event_type") == "view"), {"pv_ct": F.lit(1)}),
        (ev.filter(F.col("event_type") == "click"), {"click_ct": F.lit(1)}),
        (ev.filter(F.col("event_type") == "error"), {"err_ct": F.lit(1)}),
    ]
    unioned = windows.one_hot_branches(branches, ["ts"])
    return windows.tumble(
        unioned,
        "ts",
        "1 day",
        [],
        [
            F.sum("pv_ct").alias("pv_ct"),
            F.sum("click_ct").alias("click_ct"),
            F.sum("err_ct").alias("err_ct"),
        ],
    )


ORACLE_UNION_PREAGG = """
SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS stt,
       (floor(epoch(ts) / 86400) * 86400 + 86400)::BIGINT AS edt,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS pv_ct,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click_ct,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS err_ct
FROM events WHERE event_type IN ('view', 'click', 'error')
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- T3: daily UV dedup
def q_daily_uv(spark, sf_dir):
    """T3: daily unique-visitor dedup (first event per mid per day,
    DwdTrafficUniqueVisitorDetail.java:55-84) → UV per day."""
    ev = load_table(spark, sf_dir, "events")
    firsts = stateful.first_per_key_day(ev, ["user_id"], "ts", ["event_id"])
    return (
        firsts.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("uv"))
    )


ORACLE_DAILY_UV = """
WITH firsts AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, ts::DATE ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS uv
FROM firsts WHERE rn = 1 GROUP BY 1
"""


# ---------------------------------------------------------------- T2: is_new repair
def q_is_new_repair(spark, sf_dir):
    """T2: new-visitor flag repair (BaseLogApp.java:56-91): is_new = 1 only
    on the visitor's first-ever day; daily counts by repaired flag."""
    ev = load_table(spark, sf_dir, "events")
    repaired = stateful.repair_is_new(ev, "user_id", "ts")
    return (
        repaired.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt", "is_new")
        .agg(F.count(F.lit(1)).alias("ct"))
    )


ORACLE_IS_NEW = """
WITH r AS (
  SELECT ts,
         CASE WHEN ts::DATE = min(ts::DATE) OVER (PARTITION BY user_id) THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT strftime(ts, '%Y-%m-%d') AS dt, is_new, count(*) AS ct
FROM r GROUP BY 1, 2
"""


# ---------------------------------------------------------------- T4: home/detail first-visit
def q_home_detail_uv(spark, sf_dir):
    """T4: per-day first-visit counters for two page types
    (DwsTrafficPageViewWindow.java:67-115): view≙home, click≙good_detail."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    firsts = stateful.first_per_key_day(ev, ["user_id", "event_type"], "ts", ["event_id"])
    return (
        firsts.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(
            F.sum((F.col("event_type") == "view").cast("int")).cast("bigint").alias("home_uv"),
            F.sum((F.col("event_type") == "click").cast("int")).cast("bigint").alias("detail_uv"),
        )
    )


ORACLE_HOME_DETAIL = """
WITH firsts AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type, ts::DATE ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('view', 'click')
)
SELECT strftime(ts, '%Y-%m-%d') AS dt,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS home_uv,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS detail_uv
FROM firsts WHERE rn = 1 GROUP BY 1
"""


# ---------------------------------------------------------------- T5: bounce (CEP) detection
def q_bounce_detect(spark, sf_dir):
    """T5: CEP jump-out detection, batch form
    (DwdTrafficUserJumpDetail.java:48-82): entry events whose successor is
    absent within the gap or is itself an entry — match ∪ timeout union —
    counted per day."""
    ev = load_table(spark, sf_dir, "events")
    flagged = stateful.detect_bounces(ev, "user_id", "ts", BOUNCE_GAP_S, ["event_id"])
    return (
        flagged.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt")
        .agg(
            F.sum(F.col("is_entry").cast("int")).cast("bigint").alias("entry_ct"),
            F.sum(F.col("is_bounce").cast("int")).cast("bigint").alias("bounce_ct"),
        )
    )


ORACLE_BOUNCE = f"""
WITH seq AS (
  SELECT ts,
         epoch(ts) AS t,
         lag(epoch(ts))  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t,
         lead(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_t
  FROM events
), flags AS (
  SELECT ts,
         (prev_t IS NULL OR t - prev_t > {BOUNCE_GAP_S}) AS is_entry,
         (prev_t IS NULL OR t - prev_t > {BOUNCE_GAP_S})
           AND (next_t IS NULL OR next_t - t > {BOUNCE_GAP_S}) AS is_bounce
  FROM seq
)
SELECT strftime(ts, '%Y-%m-%d') AS dt,
       sum(is_entry::INT)::BIGINT AS entry_ct,
       sum(is_bounce::INT)::BIGINT AS bounce_ct
FROM flags GROUP BY 1
"""


# ---------------------------------------------------------------- S8: upsert latest-by-key
def q_upsert_latest(spark, sf_dir):
    """S8: upsert-kafka changelog compaction (MyKafkaUtil.java:91-100):
    latest order per customer, keyed changelog read-side semantics."""
    o = load_table(spark, sf_dir, "orders")
    latest = stateful.latest_by_key(
        o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]
    )
    return latest.select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")


ORACLE_UPSERT = """
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------- P11+T10: config-driven projection
DIM_CONFIG = {
    # source_table -> (sink_table, sink_columns, sink_pk)  [TableProcess bean]
    "nation": ("dim_nation", ["n_nationkey", "n_name"], "n_nationkey"),
    "region": ("dim_region", ["r_regionkey", "r_name"], "r_regionkey"),
}


def q_config_projection(spark, sf_dir):
    """P11+T10: config-driven column pruning
    (TableProcessFunction.java:306-324): the `nation` dim projected to its
    configured sink_columns (full dim-sync writer in sinks.upsert_parquet)."""
    _, cols, _ = DIM_CONFIG["nation"]
    n = load_table(spark, sf_dir, "nation")
    from ..operators.envelope import prune_columns_by_config

    return prune_columns_by_config(n, cols)


ORACLE_CONFIG_PROJ = "SELECT n_nationkey, n_name FROM nation"


# ---------------------------------------------------------------- U1+T7: tokenize + explode + count
def q_keyword_count(spark, sf_dir):
    """U1/U2/T7/A1: the keyword pipeline
    (DwsTrafficSourceKeywordPageViewWindow.java:123-154): tokenize → explode
    (LATERAL TABLE analog) → count per keyword. Whitespace tokens here for
    oracle portability; the full CJK tokenizer backs the UDF surface."""
    from ..functions.tokenize import whitespace_tokens
    from ..operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(whitespace_tokens(normalize_text(F.col("text")))).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count(F.lit(1)).alias("keyword_count"))
    )


ORACLE_KEYWORD = r"""
SELECT keyword, count(*) AS keyword_count
FROM (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS keyword
  FROM documents
)
GROUP BY keyword
"""


# ---------------------------------------------------------------- P10/T6/T7: base log split
def q_base_log_split(spark, sf_dir):
    """BaseLogApp end-to-end (P1 parse + T2 repair + T6 five-way split + T7
    display explosion + P10 envelope rewrite, BaseLogApp.java:36-156): the
    events table synthesized into raw log-envelope JSON lines (error→err
    log, signup→start log, rest→page log; view pages carry 2 display
    entries), run through ``apps.base_log_app``; returns the enriched
    display stream with the REPAIRED is_new flag."""
    from ..apps import base_log_app

    ev = load_table(spark, sf_dir, "events")
    common = F.struct(
        (F.col("user_id") % 10).cast("string").alias("ar"),
        F.lit("web").alias("ch"),
        F.lit("v1").alias("vc"),
        F.concat(F.lit("mid_"), F.col("user_id").cast("string")).alias("mid"),
        F.col("user_id").cast("string").alias("uid"),
        F.lit("1").alias("is_new"),
        F.lit("ba0").alias("ba"),
        F.lit("md0").alias("md"),
        F.lit("os0").alias("os"),
    )
    is_page = ~F.col("event_type").isin("error", "signup")
    page = F.when(
        is_page,
        F.struct(
            F.col("event_type").alias("page_id"),
            F.lit("home").alias("last_page_id"),
            F.lit(None).cast("string").alias("item"),
            F.lit(None).cast("string").alias("item_type"),
            F.lit(100).cast("long").alias("during_time"),
        ),
    )
    displays = F.when(
        F.col("event_type") == "view",
        F.expr(
            "transform(sequence(0, 1), i -> named_struct("
            "'item', concat('sku_', event_id % 100), "
            "'item_type', 'sku_id', 'pos_id', cast(i as string)))"
        ),
    )
    actions = F.when(
        F.col("event_type") == "click",
        F.expr(
            "array(named_struct('action_id', 'cart_add', "
            "'item', concat('sku_', event_id % 100), 'item_type', 'sku_id'))"
        ),
    )
    start = F.when(
        F.col("event_type") == "signup",
        F.struct(F.lit("icon").alias("entry"), F.lit("1000").alias("loading_time")),
    )
    err = F.when(F.col("event_type") == "error", F.lit("boom"))
    raw = ev.select(
        F.to_json(
            F.struct(
                common.alias("common"),
                page.alias("page"),
                displays.alias("displays"),
                actions.alias("actions"),
                start.alias("start"),
                err.alias("err"),
                F.unix_millis("ts").alias("ts"),
            )
        ).alias("value")
    )
    disp = base_log_app(raw)["display"]
    return disp.select(
        F.col("common.mid").alias("mid"),
        F.col("common.is_new").alias("is_new"),
        "page_id",
        "ts",
        "item",
        "item_type",
        "pos_id",
    )


ORACLE_BASE_LOG = """
WITH md AS (SELECT user_id, min(ts::DATE) AS d0 FROM events GROUP BY 1),
v AS (
  SELECT e.event_id, e.ts, e.user_id,
         CASE WHEN e.ts::DATE = m.d0 THEN '1' ELSE '0' END AS is_new
  FROM events e JOIN md m ON e.user_id = m.user_id
  WHERE e.event_type = 'view'
),
d AS (SELECT *, unnest([0, 1]) AS pos FROM v)
SELECT 'mid_' || user_id AS mid, is_new, 'view' AS page_id,
       epoch_ms(ts)::BIGINT AS ts,
       'sku_' || (event_id % 100) AS item, 'sku_id' AS item_type,
       pos::VARCHAR AS pos_id
FROM d
"""


SPECS = [
    QuerySpec("p1_envelope_parse", q_envelope_parse, ORACLE_ENVELOPE, tags=("gmall", "P1", "S3")),
    QuerySpec("p10_base_log_split", q_base_log_split, ORACLE_BASE_LOG,
              doc="BaseLogApp E2E: parse + is_new repair + five-way split + display explosion",
              tags=("gmall", "P10", "T6", "T7", "T2", "P1")),
    QuerySpec("p2_route_filter", q_route_filter, ORACLE_ROUTE, tags=("gmall", "P2", "P4")),
    QuerySpec("p6_conditional_delta", q_conditional_delta, ORACLE_DELTA, tags=("gmall", "P6")),
    QuerySpec("p5_transition_detect", q_transition_detect, ORACLE_TRANSITION, tags=("gmall", "P5")),
    QuerySpec("fn_scalar_datetime", q_scalar_datetime, ORACLE_SCALAR, tags=("gmall", "2.6")),
    QuerySpec("fn_scalar_string", q_scalar_string, ORACLE_SCALAR_STRING,
              doc="§2.6 string scalar surface: case/pad/substr/regex/split/translate, one codegen stage",
              tags=("gmall", "2.6")),
    QuerySpec("fn_scalar_json", q_scalar_json, ORACLE_SCALAR_JSON,
              doc="§2.6 JSON scalar surface: path extract, typed parse, validity, re-assembly",
              tags=("gmall", "2.6", "S2")),
    QuerySpec("j3_dim_lookup_join", q_dim_lookup_join, ORACLE_DIM_LOOKUP, tags=("gmall", "J3")),
    QuerySpec("j4_double_alias_join", q_double_alias_join, ORACLE_DOUBLE_ALIAS, tags=("gmall", "J4", "J6")),
    QuerySpec("j1_inner_join", q_inner_join, ORACLE_INNER, tags=("gmall", "J1")),
    QuerySpec("j2_left_outer_join", q_left_outer_join, ORACLE_LEFT_OUTER, tags=("gmall", "J2")),
    QuerySpec("j5_multikey_join", q_multikey_join, ORACLE_MULTIKEY, tags=("gmall", "J5")),
    QuerySpec("a1_tumble_keyed", q_tumble_keyed, ORACLE_TUMBLE_KEYED, tags=("gmall", "A1")),
    QuerySpec("a2_tumble_multimetric", q_tumble_multimetric, ORACLE_TUMBLE_MULTI, tags=("gmall", "A2")),
    QuerySpec("a3_tumble_global", q_tumble_global, ORACLE_TUMBLE_GLOBAL, tags=("gmall", "A3")),
    QuerySpec("a4_union_preagg", q_union_preagg, ORACLE_UNION_PREAGG, tags=("gmall", "A4", "T8")),
    QuerySpec("t3_daily_uv", q_daily_uv, ORACLE_DAILY_UV, tags=("gmall", "T3")),
    QuerySpec("t2_is_new_repair", q_is_new_repair, ORACLE_IS_NEW, tags=("gmall", "T2")),
    QuerySpec("t4_home_detail_uv", q_home_detail_uv, ORACLE_HOME_DETAIL, tags=("gmall", "T4")),
    QuerySpec("t5_bounce_detect", q_bounce_detect, ORACLE_BOUNCE, tags=("gmall", "T5")),
    QuerySpec("s8_upsert_latest", q_upsert_latest, ORACLE_UPSERT, tags=("gmall", "S8")),
    QuerySpec("p11_config_projection", q_config_projection, ORACLE_CONFIG_PROJ, tags=("gmall", "P11", "T10")),
    QuerySpec("u1_keyword_count", q_keyword_count, ORACLE_KEYWORD, tags=("gmall", "U1", "U2", "T7", "A1")),
]
