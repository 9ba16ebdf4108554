"""pqc — PySpark-native product/pixel quality-check engine.

A from-scratch, DataFrame-first re-expression of the validation
semantics of NathanShenton/product-quality-check (see SURVEY.md):
declarative constraint suites over an image+caption table, per-partition
column statistics, two-stage screen→confirm text rules, vectorized
Arrow image decode with pixel-integrity gates, near-duplicate detection,
distribution drift, and checkpointed resumable runs.

Everything here targets Catalyst-optimizable DataFrame plans; Python
appears only inside Arrow-batched pandas UDF islands (image decode,
fuzzy scoring). No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
