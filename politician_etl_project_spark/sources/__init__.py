"""Source connectors + ingest pipelines (SURVEY §2.1 scans, §2.9 nested
flatteners): FEC pipe-CSV, vote JSON, billstatus XML, committee YAML,
member JSON.  Each pipeline is declarative DataFrame ops end-to-end — the
reference's per-row Python loops become explode/when/regexp expressions."""
