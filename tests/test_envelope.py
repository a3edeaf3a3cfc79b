"""Envelope parsing + five-way split (SURVEY §2.2 P1/P10/P11, §2.5 T6/T7).

Fixture shapes per FIXTURES.md A2 (the BaseLogApp log envelope).
"""

import json

from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators.envelope import (
    LOG_SCHEMA,
    explode_enriched,
    parse_with_dirty_split,
    prune_columns_by_config,
    split_log_streams,
)

PAGE_LOG = {
    "common": {"ar": "110000", "ch": "web", "vc": "v2", "mid": "mid_1",
               "uid": "u1", "is_new": "1", "ba": "iPhone", "md": "X", "os": "iOS"},
    "page": {"page_id": "good_detail", "last_page_id": "home",
             "item": "sku_7", "item_type": "sku_id", "during_time": 4200},
    "displays": [
        {"item": "sku_1", "item_type": "sku_id", "pos_id": "1"},
        {"item": "sku_2", "item_type": "sku_id", "pos_id": "2"},
    ],
    "actions": [{"action_id": "cart_add", "item": "sku_7", "item_type": "sku_id"}],
    "ts": 1652000000000,
}
START_LOG = {
    "common": {"ar": "110000", "ch": "app", "vc": "v2", "mid": "mid_2",
               "uid": "u2", "is_new": "0", "ba": "Pixel", "md": "8", "os": "android"},
    "start": {"entry": "icon", "loading_time": "1200"},
    "ts": 1652000001000,
}
ERR_LOG = {**START_LOG, "err": "boom", "ts": 1652000002000}


def make_raw(spark):
    lines = [json.dumps(PAGE_LOG), json.dumps(START_LOG), json.dumps(ERR_LOG),
             "not-json-at-all", ""]
    return spark.createDataFrame([(l,) for l in lines], ["value"])


def test_dirty_split(spark):
    clean, dirty = parse_with_dirty_split(make_raw(spark), "value", LOG_SCHEMA)
    assert clean.count() == 3
    assert dirty.count() == 2  # non-JSON + empty line → side output


def test_five_way_split(spark):
    clean, _ = parse_with_dirty_split(make_raw(spark), "value", LOG_SCHEMA)
    streams = split_log_streams(clean)
    assert streams["err"].count() == 1
    assert streams["start"].count() == 1
    assert streams["page"].count() == 1
    assert streams["display"].count() == 2  # exploded
    assert streams["action"].count() == 1


def test_explode_enrichment(spark):
    clean, _ = parse_with_dirty_split(make_raw(spark), "value", LOG_SCHEMA)
    page = clean.filter(F.col("err").isNull() & F.col("start").isNull())
    d = explode_enriched(page, "displays").collect()
    assert {r["item"] for r in d} == {"sku_1", "sku_2"}
    # enriched with page context (BaseLogApp.java:122-144)
    assert all(r["page_id"] == "good_detail" and r["ts"] == 1652000000000 for r in d)


def test_prune_columns_by_config(spark):
    df = spark.createDataFrame([(1, "a", "x")], ["id", "name", "extra"])
    out = prune_columns_by_config(df, ["name", "id", "absent"])
    assert out.columns == ["name", "id"]  # config order, unknown cols dropped
