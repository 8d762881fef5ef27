"""Engine-portable expression helpers."""

from hbase_sep_spark.functions.portable import (  # noqa: F401
    arr_str,
    davg,
    dsum,
    dsum_window,
    msum_window,
    nz,
    round_nz,
)
