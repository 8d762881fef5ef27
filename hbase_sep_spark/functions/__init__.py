"""Engine-portable expression helpers."""

from hbase_sep_spark.functions.portable import (  # noqa: F401
    arr_str,
    ascii_lower,
    davg,
    dsum,
    dsum_window,
    fin,
    json_int,
    json_int_sql,
    msum_window,
    nz,
    round_nz,
)
