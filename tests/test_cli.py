"""CLI smoke: list and oracle subcommands (no Spark session needed)."""

from __future__ import annotations

from politician_etl_project_spark.__main__ import main


def test_cli_list_and_oracle(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q_ann_lsh" in out

    assert main(["oracle", "q06_forecast_revenue"]) == 0
    out = capsys.readouterr().out
    assert "SELECT" in out and "lineitem" in out


def test_cli_unknown_query(capsys):
    assert main(["oracle", "q_does_not_exist"]) == 2
