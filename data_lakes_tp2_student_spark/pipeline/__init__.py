"""End-to-end pipeline parity with the reference (raw → staging → curated)."""
