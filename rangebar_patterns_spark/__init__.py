"""rangebar_patterns_spark — a PySpark-native range-bar pattern-mining engine.

A ground-up Spark reimplementation of the capabilities of the reference
engine ``terrylica/rangebar-patterns`` (ClickHouse SQL sweep harness +
Python eval layer).  Architecture is DataFrame/Catalyst-first: the
301K-sed-templated-queries sweep of the reference collapses into a single
parameterized logical plan (configs are *data*, not query text).

Layout:
    sources/    table loaders + the deterministic events->bars adapter
    functions/  expression-level helpers (exclusive quantiles, arrays, stats)
    operators/  DataFrame transforms (windows, signals, barrier sim, sweep,
                eval metrics, dedup, similarity, text, multimodal)
    streaming/  Structured Streaming extensions (range-bar construction)
"""

__version__ = "0.1.0"
