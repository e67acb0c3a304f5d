"""E2E test harness: ground-truth runner, metrics, regression gate,
failure analysis (reference tests/e2e_runner.py, tests/metrics.py,
tests/failure_analysis.py capabilities)."""
