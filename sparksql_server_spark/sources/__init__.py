"""Sources and sinks (reference surface: SURVEY.md §2 A1/A11/A12, §1.2)."""

from sparksql_server_spark.sources.readers import (  # noqa: F401
    read_any,
    read_avro,
    read_binary,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
)
from sparksql_server_spark.sources.sinks import (  # noqa: F401
    compact_parquet,
    write_demux,
    write_json,
    write_orc,
    write_parquet,
    write_text,
)
