"""Sources / sinks (SURVEY §2.2)."""

from .connectors import (
    bigquery_read_options,
    bigquery_write_options,
    elasticsearch_read_options,
    elasticsearch_write_options,
    kafka_read_options,
    kafka_write_options,
    read_kafka,
    write_kafka,
)
from .files import (
    generate_input,
    read_edn_file,
    read_json_file,
    read_text_file,
    read_text_files,
    rename_shards,
    write_edn_file,
    write_json_file,
    write_text_file,
)

__all__ = [
    "bigquery_read_options",
    "bigquery_write_options",
    "elasticsearch_read_options",
    "elasticsearch_write_options",
    "generate_input",
    "kafka_read_options",
    "kafka_write_options",
    "read_edn_file",
    "read_json_file",
    "read_kafka",
    "read_text_file",
    "read_text_files",
    "rename_shards",
    "write_edn_file",
    "write_json_file",
    "write_kafka",
    "write_text_file",
]
