"""Registry ordering contract: the external harness checks the first N
registered queries in dict order, so the rotation list must stay valid."""

from __future__ import annotations


def test_check_first_names_all_registered():
    from etl_his_spark.registry import _CHECK_FIRST, QUERIES

    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert not missing, f"_CHECK_FIRST names not registered: {missing}"
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))


def test_priority_window_order_applied():
    # ordered_queries re-applies ordering at call time, so this holds
    # regardless of which test imported which plans module first.
    import __spark_entry__ as entry
    from etl_his_spark.registry import _CHECK_FIRST

    names = list(entry.queries())
    assert names[: len(_CHECK_FIRST)] == _CHECK_FIRST
