from .readers import load_fixture, load_fixtures, read_ohlcv_csv
from .sinks import append_if_absent, overwrite_parquet

__all__ = [
    "load_fixture",
    "load_fixtures",
    "read_ohlcv_csv",
    "append_if_absent",
    "overwrite_parquet",
]
