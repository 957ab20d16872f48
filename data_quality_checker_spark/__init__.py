"""PySpark-native data-quality engine.

A brand-new, Spark-first reimplementation of the validation semantics of
``Alemaksus/data-quality-checker`` (see /root/reference, SURVEY.md) as a
language-ID + quality-filter + PII-scrub pipeline over an audio clip +
transcript corpus.

Everything is expressed as lazy DataFrame plans (Catalyst optimizes) plus a
small set of Arrow-batched pandas UDFs; there is no per-row Python anywhere
on the Spark side.
"""

__version__ = "0.1.0"
