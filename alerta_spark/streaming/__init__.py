from alerta_spark.streaming.correlator import (  # noqa: F401
    sequence_correlator,
    streaming_threshold_alerts,
    streaming_dedup,
)
