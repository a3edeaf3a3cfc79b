"""End-to-end app tests: every reference app runs over a synthetic mini
corpus of Maxwell CDC + log-envelope records (FIXTURES.md A1/A2 shapes)."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gmall_flink_230422_spark import apps
from gmall_flink_230422_spark.operators.cdc import parse_cdc


def cdc_line(table, typ, data, old=None, ts="1652499176"):
    return json.dumps({"database": "gmall", "table": table, "type": typ,
                       "data": data, "old": old, "ts": ts})


CDC_LINES = [
    # order lifecycle: detail + info insert, cancel flip
    cdc_line("order_detail", "insert",
             {"id": "d1", "order_id": "o1", "sku_id": "s1", "sku_name": "phone",
              "order_price": "999", "sku_num": "1", "create_time": "2022-05-14 10:00:00",
              "source_type": "2401", "source_id": "", "split_total_amount": "999",
              "split_activity_amount": "0", "split_coupon_amount": "0"}),
    cdc_line("order_detail", "insert",
             {"id": "d2", "order_id": "o2", "sku_id": "s2", "sku_name": "case",
              "order_price": "19", "sku_num": "2", "create_time": "2022-05-14 11:00:00",
              "source_type": "2402", "source_id": "a1", "split_total_amount": "38",
              "split_activity_amount": "0", "split_coupon_amount": "0"}),
    cdc_line("order_info", "insert",
             {"id": "o1", "user_id": "u1", "province_id": "11",
              "operate_time": "2022-05-14 10:00:00", "order_status": "1001"}),
    cdc_line("order_info", "insert",
             {"id": "o2", "user_id": "u2", "province_id": "12",
              "operate_time": "2022-05-14 11:00:00", "order_status": "1001"}),
    cdc_line("order_info", "update",
             {"id": "o2", "user_id": "u2", "province_id": "12",
              "operate_time": "2022-05-14 11:30:00", "order_status": "1003"},
             {"order_status": "1001"}),
    cdc_line("order_detail_activity", "insert",
             {"order_detail_id": "d2", "activity_id": "a1", "activity_rule_id": "r1"}),
    cdc_line("order_detail_coupon", "insert",
             {"order_detail_id": "d1", "coupon_id": "c9"}),
    # cart adds: insert + positive delta + negative delta (dropped)
    cdc_line("cart_info", "insert",
             {"id": "k1", "user_id": "u1", "sku_id": "s1", "sku_num": "2",
              "source_type": "2401"}),
    cdc_line("cart_info", "update",
             {"id": "k1", "user_id": "u1", "sku_id": "s1", "sku_num": "5",
              "source_type": "2401"}, {"sku_num": "2"}),
    cdc_line("cart_info", "update",
             {"id": "k1", "user_id": "u1", "sku_id": "s1", "sku_num": "1",
              "source_type": "2401"}, {"sku_num": "5"}),
    # payment success
    cdc_line("payment_info", "update",
             {"id": "p1", "user_id": "u1", "order_id": "o1", "payment_type": "1102",
              "payment_status": "1602", "callback_time": "2022-05-14 10:05:00"},
             {"payment_status": "1601"}),
    # refund flow
    cdc_line("order_refund_info", "insert",
             {"id": "rf1", "user_id": "u1", "order_id": "o1", "sku_id": "s1",
              "refund_type": "1501", "refund_num": "1", "refund_amount": "999",
              "refund_reason_type": "1301", "create_time": "2022-05-15 09:00:00"}),
    cdc_line("refund_payment", "update",
             {"id": "rp1", "order_id": "o1", "sku_id": "s1", "payment_type": "1102",
              "callback_time": "2022-05-15 10:00:00", "total_amount": "999",
              "refund_status": "0702"},
             {"refund_status": "0701"}),
    # coupons
    cdc_line("coupon_use", "insert",
             {"id": "cu1", "coupon_id": "c9", "user_id": "u1",
              "get_time": "2022-05-13 08:00:00", "coupon_status": "1401"}),
    cdc_line("coupon_use", "update",
             {"id": "cu1", "coupon_id": "c9", "user_id": "u1", "order_id": "o1",
              "using_time": "2022-05-14 10:00:00", "coupon_status": "1402"},
             {"coupon_status": "1401"}),
    cdc_line("coupon_use", "update",
             {"id": "cu1", "coupon_id": "c9", "user_id": "u1", "order_id": "o1",
              "used_time": "2022-05-14 10:05:00", "coupon_status": "1403"},
             {"coupon_status": "1402"}),
    # interactions + user
    cdc_line("favor_info", "insert",
             {"id": "f1", "user_id": "u2", "sku_id": "s2",
              "create_time": "2022-05-14 12:00:00"}),
    cdc_line("comment_info", "insert",
             {"id": "cm1", "user_id": "u1", "sku_id": "s1", "order_id": "o1",
              "create_time": "2022-05-15 12:00:00", "appraise": "1201"}),
    cdc_line("user_info", "insert",
             {"id": "u3", "create_time": "2022-05-14 09:00:00"}),
]

DIC_ROWS = [
    ("2401", "user query"), ("2402", "promo activity"), ("1102", "alipay"),
    ("1501", "refund money"), ("1301", "bad quality"), ("1201", "good"),
]


@pytest.fixture(scope="module")
def cdc(spark):
    raw = spark.createDataFrame([(l,) for l in CDC_LINES], ["value"])
    return parse_cdc(raw).cache()


@pytest.fixture(scope="module")
def dic(spark):
    return spark.createDataFrame(DIC_ROWS, ["dic_code", "dic_name"])


def test_all_dwd_specs_run(cdc, dic):
    expected_rows = {
        "dwd_trade_cart_add": 2,          # insert + positive delta
        "dwd_trade_order_detail_raw": 2,
        "dwd_trade_order_info": 3,
        "dwd_trade_cancel_detail": 1,
        "dwd_trade_pay_detail_suc": 1,
        "dwd_trade_order_refund": 1,
        "dwd_trade_refund_pay_suc": 1,
        "dwd_tool_coupon_get": 1,
        "dwd_tool_coupon_order": 1,
        "dwd_tool_coupon_pay": 1,
        "dwd_interaction_favor_add": 1,
        "dwd_interaction_comment": 1,
        "dwd_user_register": 1,
    }
    for name, spec in apps.DWD_SPECS.items():
        out = apps.run_dwd_app(cdc, spec, dic)
        assert out.count() == expected_rows[name], name


def test_dic_lookup_names(cdc, dic):
    cart = apps.run_dwd_app(cdc, apps.DWD_SPECS["dwd_trade_cart_add"], dic)
    assert {r["source_type_name"] for r in cart.collect()} == {"user query"}
    refund = apps.run_dwd_app(cdc, apps.DWD_SPECS["dwd_trade_order_refund"], dic)
    r = refund.collect()[0]
    # J4: same dic joined twice under different aliases
    assert r["refund_type_name"] == "refund money"
    assert r["refund_reason_type_name"] == "bad quality"
    assert r["date_id"] == "2022-05-15"


def test_order_detail_five_way_join(cdc, dic):
    out = apps.dwd_trade_order_detail(cdc, dic).collect()
    by_id = {r["id"]: r for r in out}
    assert set(by_id) == {"d1", "d2"}
    # left joins: d1 has coupon, no activity; d2 has activity, no coupon
    assert by_id["d1"]["coupon_id"] == "c9" and by_id["d1"]["activity_id"] is None
    assert by_id["d2"]["activity_id"] == "a1" and by_id["d2"]["coupon_id"] is None
    assert by_id["d1"]["source_type_name"] == "user query"
    # order_info carries the latest status image per order key
    assert by_id["d1"]["user_id"] == "u1"


def test_cancel_detail(cdc, dic):
    out = apps.dwd_trade_cancel_detail(cdc, dic).collect()
    assert len(out) == 1
    assert out[0]["order_id"] == "o2"
    assert out[0]["cancel_time"] == "2022-05-14 11:30:00"


def test_dim_app_config_driven(spark, cdc):
    d = tempfile.mkdtemp(prefix="gmall_dim_")
    try:
        config = spark.createDataFrame(
            [("order_info", "dim_order_info", "id,user_id,order_status", "id", 1),
             ("user_info", "dim_user_info", "id,create_time", "id", 1)],
            ["source_table", "sink_table", "sink_columns", "sink_pk", "config_seq"],
        )
        dims = apps.dim_app(spark, cdc, config, d)
        assert set(dims) == {"dim_order_info", "dim_user_info"}
        oi = {r["id"]: r for r in dims["dim_order_info"].collect()}
        assert set(oi) == {"o1", "o2"}  # upserted by pk, latest image wins
        assert oi["o2"]["order_status"] == "1003"
        assert dims["dim_order_info"].columns == ["id", "user_id", "order_status", "_seq", "_arr"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dim_app_incremental_config_delete(spark, cdc):
    """Incremental path: a config-row DELETE between batches stops syncing
    that table — later CDC records for it are dropped, rows already synced
    stay (the reference's broadcast-state remove semantics)."""
    d = tempfile.mkdtemp(prefix="gmall_dim_incr_")
    try:
        changelog = spark.createDataFrame(
            [
                ("order_info", "dim_order_info", "id,user_id,order_status", "id", 1, "u"),
                ("user_info", "dim_user_info", "id,create_time", "id", 1, "u"),
                ("order_info", "dim_order_info", "", "", 2, "d"),
            ],
            ["source_table", "sink_table", "sink_columns", "sink_pk", "config_seq", "op"],
        )
        # batch 2 carries NEW ids (suffix _b2) so the delete's effect is
        # observable: after the config delete only user_info still syncs
        from pyspark.sql import functions as F

        batch2 = cdc.withColumn(
            "data",
            F.expr(
                "map_concat(map_filter(data, (k, v) -> k != 'id'), "
                "map('id', concat(data['id'], '_b2')))"
            ),
        )
        dims = apps.dim_app_incremental(
            spark, [(cdc, 1), (batch2, 2)], changelog, d
        )
        assert set(dims) == {"dim_order_info", "dim_user_info"}
        oi_ids = {r["id"] for r in dims["dim_order_info"].collect()}
        ui_ids = {r["id"] for r in dims["dim_user_info"].collect()}
        # order_info: frozen at batch-1 state, no _b2 ids leaked past the delete
        assert oi_ids == {"o1", "o2"}
        # user_info: still routed — batch-2 ids present alongside batch-1's
        assert any(i.endswith("_b2") for i in ui_ids)
        assert any(not i.endswith("_b2") for i in ui_ids)
    finally:
        shutil.rmtree(d, ignore_errors=True)


LOG_LINES = [
    json.dumps({
        "common": {"ar": "110000", "ch": "web", "vc": "v2", "mid": f"mid_{m}",
                   "uid": str(m), "is_new": "1", "ba": "x", "md": "y", "os": "z"},
        "page": {"page_id": "good_detail", "last_page_id": "search",
                 "item": "apple iphone", "item_type": "keyword", "during_time": 1000},
        "ts": 1652000000000 + m * 1000,
    })
    for m in range(3)
] + [
    json.dumps({
        "common": {"ar": "110000", "ch": "web", "vc": "v2", "mid": "mid_0",
                   "uid": "0", "is_new": "1", "ba": "x", "md": "y", "os": "z"},
        "page": {"page_id": "home", "last_page_id": None, "item": None,
                 "item_type": None, "during_time": 500},
        "ts": 1652000000000 + 86400_000,  # next day → is_new must repair to 0
    }),
]


def test_base_log_app_and_keyword_window(spark):
    raw = spark.createDataFrame([(l,) for l in LOG_LINES], ["value"])
    streams = apps.base_log_app(raw)
    assert streams["page"].count() == 4
    assert streams["dirty"].count() == 0
    # T2: mid_0's second-day event repaired to is_new=0
    flags = {(r["common"]["mid"], r["ts"]): r["common"]["is_new"]
             for r in streams["page"].collect()}
    assert flags[("mid_0", 1652000000000)] == "1"
    assert flags[("mid_0", 1652000000000 + 86400_000)] == "0"
    # U1/U2 + A1: keyword window over search entries
    kw = apps.dws_keyword_window(streams["page"]).collect()
    counts = {r["keyword"]: r["keyword_count"] for r in kw}
    assert counts == {"apple": 3, "iphone": 3}


def test_dws_traffic_page_view_window(spark):
    raw = spark.createDataFrame([(l,) for l in LOG_LINES], ["value"])
    streams = apps.base_log_app(raw)
    out = apps.dws_traffic_page_view_window(streams).collect()
    total_pv = sum(r["pv_ct"] for r in out)
    total_sv = sum(r["sv_ct"] for r in out)
    assert total_pv == 4
    assert total_sv == 1  # only the home entry has last_page_id null
    assert all(r["edt"] - r["stt"] == 10 for r in out)
