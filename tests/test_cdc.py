"""CDC-envelope kernel tests (SURVEY §2.2 P2-P6) with Maxwell-shaped rows
(FIXTURES.md A1)."""

import json

from gmall_flink_230422_spark.operators.cdc import (
    cdc_table,
    delta_column,
    map_project,
    parse_cdc,
    transition_filter,
)


def envelope(table, typ, data, old=None, ts="1652499176"):
    return json.dumps(
        {"database": "gmall", "table": table, "type": typ, "data": data,
         "old": old, "ts": ts}
    )


ROWS = [
    envelope("order_info", "insert", {"id": "1", "order_status": "1001", "total_amount": "99.5"}),
    envelope("order_info", "update", {"id": "1", "order_status": "1003", "total_amount": "99.5"},
             {"order_status": "1001"}),
    envelope("order_info", "update", {"id": "1", "total_amount": "88.0"}, {"total_amount": "99.5"}),
    envelope("cart_info", "insert", {"id": "c1", "sku_num": "2"}),
    envelope("cart_info", "update", {"id": "c1", "sku_num": "5"}, {"sku_num": "2"}),
    envelope("cart_info", "update", {"id": "c1", "sku_num": "1"}, {"sku_num": "5"}),
    envelope("other_db_table", "delete", {"id": "9"}),
    "garbage-not-json",
]


def make_cdc(spark):
    return parse_cdc(spark.createDataFrame([(r,) for r in ROWS], ["value"]))


def test_parse_and_route(spark):
    cdc = make_cdc(spark)
    assert cdc.count() == 7  # garbage dropped
    oi = cdc_table(cdc, "order_info", ("insert", "update"))
    assert oi.count() == 3
    assert cdc_table(cdc, "cart_info", ("insert",)).count() == 1


def test_map_project(spark):
    cdc = make_cdc(spark)
    oi = cdc_table(cdc, "order_info", ("insert", "update"))
    out = map_project(oi, {"id": "id", "status": "order_status"}, keep=["type"])
    rows = {(r["type"], r["id"], r["status"]) for r in out.collect()}
    assert ("insert", "1", "1001") in rows
    assert ("update", "1", "1003") in rows
    assert ("update", "1", None) in rows  # missing key → null, like map access


def test_transition_filter(spark):
    """old['order_status'] is not null and order_status='1003'
    (DwdTradeCancelDetail.java:89-92)."""
    cdc = make_cdc(spark)
    oi = cdc_table(cdc, "order_info", ("update",))
    cancelled = transition_filter(oi, "order_status", "1003").collect()
    assert len(cancelled) == 1
    assert cancelled[0]["old"]["order_status"] == "1001"
    # amount-only update has old.order_status null → excluded
    assert transition_filter(oi, "order_status", "1001").count() == 0


def test_delta_column(spark):
    """if(insert, sku_num, data.sku_num - old.sku_num) with delta>0 kept
    (DwdTradeCartAdd.java:31,44-49)."""
    cdc = make_cdc(spark)
    ci = cdc_table(cdc, "cart_info", ("insert", "update"))
    out = {(r["type"], r["delta"]) for r in delta_column(ci, "sku_num", "delta").collect()}
    assert out == {("insert", 2), ("update", 3)}  # 5-2=3 kept; 1-5=-4 dropped
