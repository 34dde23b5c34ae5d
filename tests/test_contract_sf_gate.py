"""End-of-round evidence gate (round-4 verdict ask #4).

The per-round driver runs the correctness window at sf0.01, while the
local contract suite defaults to sf0.001 for speed. Before committing
registry changes — and always at end of round — run the contract at the
driver's EXACT tier so local evidence matches what the driver will see:

    SPARK_GRAFT_CONTRACT_SF=/root/testdata/sf0.01 \
        python -m pytest tests/test_driver_contract.py -q

This module pins the pieces that make that gate work: the sf0.01
fixture tier exists with every table the oracles read, and
test_driver_contract honors the env knob.
"""

from __future__ import annotations

import importlib
import os

SF01 = "/root/testdata/sf0.01"


def test_driver_tier_fixtures_exist():
    from sparklucene.driver_queries import TABLES

    missing = [t for t in TABLES
               if not os.path.exists(f"{SF01}/{t}.parquet")]
    assert not missing, f"driver tier {SF01} lacks {missing}"


def test_contract_suite_honors_sf_env_knob(monkeypatch):
    import tests.test_driver_contract as tdc

    monkeypatch.setenv("SPARK_GRAFT_CONTRACT_SF", SF01)
    try:
        reloaded = importlib.reload(tdc)
        assert reloaded.SF_DIR == SF01
        # the parametrized entry list must cover the full registry
        from sparklucene.driver_queries import registry
        assert len(reloaded.ENTRIES) == len(registry())
    finally:
        monkeypatch.delenv("SPARK_GRAFT_CONTRACT_SF")
        importlib.reload(tdc)
