from alerta_spark.operators.mostcommon import most_common  # noqa: F401
from alerta_spark.operators.dedup import (  # noqa: F401
    alerted_event_ids,
    remove_previously_alerted,
)
from alerta_spark.operators.threshold import threshold_alerts, apply_criteria  # noqa: F401
from alerta_spark.operators.deadman import deadman_alerts  # noqa: F401
