"""alerta_spark — a PySpark-native security-alerting analytics engine.

A from-scratch rebuild of the capabilities of the reference engine
(0xdefendA/alertA): SQL-criteria alert rules (threshold / deadman /
sequence) evaluated over a partitioned event lake, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Architecture is Spark-first: every operator is a declarative DataFrame
plan optimized by Catalyst; Python touches data only through
Arrow-batched pandas UDFs where built-ins genuinely cannot express the
semantics (stateful sequence correlation).
"""

__version__ = "0.1.0"

from alerta_spark.session import get_spark  # noqa: F401
from alerta_spark.dialect import trino_to_spark  # noqa: F401
