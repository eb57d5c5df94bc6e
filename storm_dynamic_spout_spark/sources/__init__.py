"""Source/sink registry + deserializers (SURVEY §2.1, §2.2 P1).

The reference's pluggable consumer SPI (``consumer/Consumer.java:40-103``)
and deserializer SPI (``kafka/deserializer/Deserializer.java:36-50``)
map to a format registry over Spark's DataSource API: every source is
``spark.read``/``spark.readStream`` with format-specific options, every
parse step is a Catalyst expression (``from_json``/``from_csv``/cast),
never a row-at-a-time Python UDF.
"""

from storm_dynamic_spout_spark.sources.deserializers import (
    DESERIALIZERS,
    csv_deserializer,
    drop_undeserializable,
    json_deserializer,
    utf8_deserializer,
)
from storm_dynamic_spout_spark.sources.registry import (
    SinkRegistry,
    SourceRegistry,
    kafka_options,
)

__all__ = [
    "DESERIALIZERS",
    "SinkRegistry",
    "SourceRegistry",
    "csv_deserializer",
    "drop_undeserializable",
    "json_deserializer",
    "kafka_options",
    "utf8_deserializer",
]
