"""Engine-portable expression helpers."""

from hbase_sep_spark.functions.portable import (  # noqa: F401
    HOSTILE_JSON_RE,
    arr_str,
    ascii_lower,
    davg,
    dsum,
    dsum_window,
    fin,
    hostile_json_sql,
    json_gate,
    json_int,
    json_int_sql,
    msum_window,
    nz,
    round_nz,
)
