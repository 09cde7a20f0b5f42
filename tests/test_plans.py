"""Registry consistency guards: the driver contract must stay coherent."""

from __future__ import annotations

from aws_data_wrangler_spark.plans import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    missing = [name for name in ORACLES if name not in QUERIES]
    assert missing == []


def test_rows_only_set_is_intentional():
    # approximate operators deliberately lack oracles; anything else
    # missing one is a regression
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert rows_only == [
        "ann_cosine_topk_arrow",
        "ann_ivf_topk",
        "ann_lsh_topk",
        "dedup_simhash",
        "multimodal_decode_stub",
    ]


def test_entry_module_contract():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    assert callable(qs["q1_pricing_summary"])
    assert "SELECT" in oracles["q1_pricing_summary"].upper()
