"""Timestamp codecs — the reference's epoch-unit zoo as column expressions.

The reference carries timestamps as ISO-8601 strings plus epoch millis:
  * ISO → epoch ms:   Instant.parse(...).toEpochMilli()   (GeotabTranslator.kt:108)
  * epoch s → ms:     msg_ts * 1000                        (CalAmpTranslator.kt:100)
  * epoch ms → ISO:   Instant.ofEpochMilli(...).atOffset(UTC)
                        .format(ISO_OFFSET_DATE_TIME)      (GeotabTranslator.kt:89,109)

The golden strings are second-precision UTC with a trailing ``Z``
(``2023-10-26T10:00:00Z`` — GeotabTranslatorTest.kt:60), so the encode
pattern is ``yyyy-MM-dd'T'HH:mm:ssXXX`` under a UTC session timezone
(XXX renders offset 0 as ``Z``).  All pure built-ins → whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Second-precision ISO-8601 with Z for UTC — matches
# DateTimeFormatter.ISO_OFFSET_DATE_TIME output for whole-second instants.
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def epoch_millis_to_iso8601(col: Column) -> Column:
    """epoch-millis long → canonical ISO-8601 UTC string (trailing Z)."""
    return F.date_format(F.timestamp_millis(col), ISO_FMT)


def epoch_seconds_to_iso8601(col: Column) -> Column:
    """epoch-seconds long → canonical ISO-8601 UTC string."""
    return F.date_format(F.timestamp_seconds(col), ISO_FMT)


def iso8601_to_epoch_millis(col: Column) -> Column:
    """ISO-8601 string → epoch millis (null on unparseable, like a failed
    Instant.parse that the translator catches and drops)."""
    return F.unix_millis(F.to_timestamp(col))


def to_event_time(col: Column) -> Column:
    """ISO-8601 string → TimestampType for event-time operations
    (windows, watermarks).  Internal representation only; the envelope
    keeps the string + millis forms at the edges."""
    return F.to_timestamp(col)
