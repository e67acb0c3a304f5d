"""End-to-end pipelines: one jitted perception graph + host reasoning/solve.

run.py   — v1 pipeline (reference pipeline/run.py capability).
run_v2.py — robust pipeline with quality gate + error correction
            (reference pipeline/run_v2.py capability).
graph.py — the fused device graph both share.
"""
