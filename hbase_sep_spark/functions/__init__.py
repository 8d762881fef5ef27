"""Engine-portable expression helpers."""

from hbase_sep_spark.functions.portable import arr_str, davg, dsum, dsum_window, nz, round_nz  # noqa: F401
