from alerta_spark.sources.lake import load_table, load_events, time_window  # noqa: F401
from alerta_spark.sources.sinks import save_alerts, load_alerts  # noqa: F401
