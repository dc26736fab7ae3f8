from .datetime import pg_dow, week_start
from .finance import pct_change, prev_value

__all__ = ["pg_dow", "week_start", "pct_change", "prev_value"]
