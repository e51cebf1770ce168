from pulsar_ingestion_spark.schemas.cmf import (  # noqa: F401
    CMF_SCHEMA,
    COMMON_EVENTS_SCHEMA,
    COMMON_TELEMETRY_SCHEMA,
    LOCATION_SCHEMA,
    META_SCHEMA,
    SOURCE_TYPES,
)
from pulsar_ingestion_spark.schemas.raw import (  # noqa: F401
    CALAMP_RAW_SCHEMA,
    FORD_RAW_SCHEMA,
    GEOTAB_RAW_SCHEMA,
    LEGACY_RAW_SCHEMAS,
)
