from alerta_spark.functions.scalars import (  # noqa: F401
    to_utc,
    utc_epoch,
    date_parts,
    meteor_id,
    short_uuid,
    is_ipv4,
    is_ipv6,
    is_ip,
)
