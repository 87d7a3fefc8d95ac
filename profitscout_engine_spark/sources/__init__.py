"""Sources & sinks layer (SURVEY §2.1). See :mod:`.io` and :mod:`.paginated`."""

from .paginated import read_paged_json, register_paged_json  # noqa: F401

from .io import (  # noqa: F401
    already_ran,
    append_evolving,
    append_rows,
    compact_parquet,
    ctas,
    flatten_structs,
    merge_upsert,
    overwrite_day_partition,
    read_csv,
    read_evolved,
    read_json_flat,
    read_table,
    read_universe,
    truncate_load,
    verify_columns,
    write_csv,
    write_bucketed,
    write_keyed_documents,
    write_partitioned,
)
